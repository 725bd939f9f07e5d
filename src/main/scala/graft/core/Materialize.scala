package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Eager lineage cuts with a durability switch.
  *
  * Operators that materialize derived state mid-plan (mined pair tables,
  * ball-cover assignments) default to `localCheckpoint(true)`: cheap, but
  * the blocks live in executor storage and are NOT recomputable after
  * executor loss — fine on local[n] (no executor loss), a real risk on a
  * long-lived cluster. Setting
  *
  *   spark.conf.set("spark.graft.materialize.durable", "true")
  *
  * flips every [[cut]] site to a warehouse-table round-trip instead: the
  * frame is written as a session-scoped parquet table and read back, so a
  * lost executor re-reads files rather than failing the job. One conf,
  * not N call sites; results are bit-identical either way (DedupSpec
  * asserts the near-dup hash under both modes — parquet round-trips
  * preserve the engine's long/double/string values exactly).
  *
  * ROUTING POLICY (audited round 12 — every `localCheckpoint` site in
  * `src/main` is one of these three, with a justifying comment):
  *
  *   1. MEMOIZED / CORPUS-DERIVED state consumed across queries or by
  *      multiple downstream stages (mined pair tables, perceptual-hash
  *      frames, DSIR doc×dim features, classifier features, CC loop
  *      inputs, scoring frames) → routed THROUGH [[cut]], so the one
  *      durability conf governs all of them;
  *   2. iterative ROUND state (connected-components labels, pagerank
  *      ranks, the BPE fit's per-round corpus/counts) — deliberately
  *      stays on localCheckpoint even in durable mode: a table write
  *      per loop round would thrash the warehouse, and those loops
  *      re-derive from their own (durably-cut) inputs on restart;
  *   3. TINY driver-bounded frames (≤|langs|/≤k/1-row quota and margin
  *      tables) — a warehouse round-trip costs more than recomputing
  *      them; executor loss re-runs a sub-second aggregation.
  */
object Materialize {

  def durable(s: SparkSession): Boolean =
    s.conf.get("spark.graft.materialize.durable", "false").toBoolean

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Materialize `df` eagerly and return a lineage-cut frame. `tag`
    * names the table in durable mode (diagnosability — the warehouse
    * shows WHICH operator's state a table holds); a per-JVM sequence
    * keeps repeated cuts from clobbering each other.
    */
  def cut(df: DataFrame, tag: String): DataFrame =
    if (!durable(df.sparkSession)) df.localCheckpoint(true)
    else {
      val name = graft.sources.Warehouse.sessionScopedName(df.sparkSession,
        "graft_mat_" + tag.replaceAll("[^a-zA-Z0-9]", "_").take(40) +
          "_" + seq.incrementAndGet())
      graft.sources.Warehouse.writeTable(df, name)
      df.sparkSession.table(name)
    }
}

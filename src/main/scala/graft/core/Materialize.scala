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
  * Iterative ROUND state (connected-components labels, pagerank ranks,
  * the BPE fit) deliberately stays on localCheckpoint even in durable
  * mode: a table write per loop round would thrash the warehouse, and
  * those loops re-derive from their own inputs on restart.
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

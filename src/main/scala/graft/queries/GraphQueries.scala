package graft.queries

import graft.core.Tables
import graft.operators.Graph
import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph-analytics operator inventory — link analysis over a co-purchase
  * graph derived from the star schema (parts co-occurring in an order are
  * connected, both directions, so the graph is symmetric and nothing
  * dangles). Exercises [[graft.operators.Graph.pageRank]], the iterative
  * join+aggregate operator family next to connected components (q67).
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  private val Iters = 3

  /** Catalog name of the bucketed PageRank edge table for one sf dir —
    * dir-derived, so a session touching several datasets can't have one
    * dataset's rewrite corrupt another's memoized frame (PlanQualitySpec
    * probes the per-iteration join shape against it).
    */
  def edgeTable(dir: String): String =
    "graft_q90_edges_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** The edge materialization is memoized per (session, dir) — the same
    * discipline as the Jaccard pair-mining memo: a deterministic derived
    * artifact is built once per dataset and shared by every consumer in
    * the session (repeat q90 invocations, the PlanQualitySpec probe).
    */
  private val edgeCache = new graft.core.SessionCache[String]

  val defs: Map[String, Q] = Map(
    // ---------------------------------------------------------------
    // q90: PageRank over the part co-purchase graph, 3 iterations,
    // damping 0.85, integer-scaled (1e-12 rank units) so every sum is
    // associative-exact and the result hash-gates — see Graph.pageRank
    // for the determinism + 100 TB contract. The unrolled 3-iteration
    // DAG references the edge list 4× (3 contribs + degree), so it is
    // materialized ONCE to a src-bucketed warehouse table: every
    // iteration then scans a layout already hash-partitioned on the
    // join key, and the per-iteration join plans with NO Exchange on
    // the edge side (PlanQualitySpec asserts it) — the 100 TB iteration
    // shape. Bucketing also retires the session-lifetime .cache() this
    // query used to leak (each call now just overwrites the table).
    // ---------------------------------------------------------------
    "q90_pagerank" -> { (s, dir) =>
      val bucketed = edgeCache.getOrElseUpdate(s, dir) {
        val t  = Tables(s, dir)
        val li = t.lineitem.select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        val edges = li.as("a")
          .join(li.as("b"),
                col("a.okey") === col("b.okey") && col("a.part") =!= col("b.part"))
          .select(col("a.part").as("src"), col("b.part").as("dst"))
          .distinct()
        Warehouse.writeBucketed(edges, edgeTable(dir), "src", numBuckets = 32)
        s.table(edgeTable(dir))
      }
      Graph.pageRank(bucketed, Iters)
        .select(col("node").as("part"), col("rank_e12"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q90_pagerank" -> {
      val S = Graph.Scale
      def iter(prev: String, i: Int) =
        s"""c$i AS (
           |  SELECT dst,
           |         CAST(sum((rank * 85) // (outdeg * 100)) AS BIGINT) AS in_rank
           |  FROM edges JOIN outdeg USING (src)
           |       JOIN $prev ON $prev.node = edges.src
           |  GROUP BY dst),
           |r$i AS (
           |  SELECT node, ($S * 15) // (n * 100) + coalesce(in_rank, 0) AS rank
           |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = nodes.node)""".stripMargin
      s"""WITH li AS (SELECT l_orderkey AS okey, l_partkey AS part FROM lineitem),
         |edges AS (
         |  SELECT DISTINCT a.part AS src, b.part AS dst
         |  FROM li a JOIN li b ON a.okey = b.okey AND a.part <> b.part),
         |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, $S // n AS rank FROM nodes CROSS JOIN nn),
         |${(1 to Iters).map(i => iter(s"r${i - 1}", i)).mkString(",\n")}
         |SELECT node AS part, CAST(rank AS BIGINT) AS rank_e12 FROM r$Iters""".stripMargin
    }
  )
}

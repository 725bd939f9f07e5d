package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Dev measurement harness behind PERF.md's numbers — ONE main with
  * subcommands, replacing the ten ad-hoc `Probe*` mains of rounds 2–6
  * (same warmup/collect discipline, minus the boilerplate copies).
  *
  * Usage (via sbt):
  *   runMain graft.Probe time <sfDir> <q1,q2,...|all> [reps]
  *     — per-query wall time over `reps` runs (default 2) in ONE warm JVM;
  *       prints every rep so noise is visible, plus the best.
  *   runMain graft.Probe plan <sfDir> <query>
  *     — executed physical plan of a SparkEntry query (first 8 KB).
  *   runMain graft.Probe q67 <sfDir>
  *     — stage split of q67 dup clusters: pair mining vs the label-
  *       propagation loop (the PERF.md "loop measured 1.8 s" claim).
  *   runMain graft.Probe pipeline <sfDir>
  *     — staged timing of the staging→intermediate→mart→analytics DAG.
  */
object Probe {

  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $tag%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "subcommand required: time | plan | q67 | pipeline")
    val spark = core.Sessions.local(32, s"probe-${args(0)}")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    args(0) match {
      case "time" =>
        val dir  = args(1)
        val reps = if (args.length > 3) args(3).toInt else 2
        val names =
          if (args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
          else args(2).split(',').toSeq
        for (name <- names; fn = SparkEntry.queries(name)) {
          val times = (1 to reps).map { i =>
            val t0 = System.nanoTime()
            fn(spark, dir).count()
            val s = (System.nanoTime() - t0) / 1e9
            println(f"PROBE $name rep$i $s%8.2f s")
            s
          }
          println(f"PROBE $name best ${times.min}%8.2f s")
        }
      case "plan" =>
        val df = SparkEntry.queries(args(2))(spark, args(1))
        println(df.queryExecution.executedPlan.toString.take(8000))
      case "fmt" =>
        // full explain("formatted") text of queries (comma-separated) —
        // the judge-facing plans/rNN/<query>_{before,after}.txt evidence
        // files. args: fmt <sfDir> <q1,q2,...> [outDir suffix] — with an
        // outDir, writes <outDir>/<query>_<suffix>.txt per query (suffix
        // "before"/"after"); without, prints to stdout.
        val names = args(2).split(',').toSeq
        val out = if (args.length > 4) Some((args(3), args(4))) else None
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, args(1))
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          out match {
            case Some((dir, suffix)) =>
              val hdr = s"# $name — formatted physical plan ($suffix, " +
                s"Probe fmt on ${args(1)})\n\n"
              java.nio.file.Files.writeString(
                java.nio.file.Paths.get(s"$dir/${name}_$suffix.txt"), hdr + txt)
              println(s"PROBE fmt wrote $dir/${name}_$suffix.txt (${txt.length} chars)")
            case None => println(txt)
          }
        }
      case "shuffles" =>
        // post-execution shuffle metrics — the quantitative side of the
        // PlanQualitySpec exchange-count pins: how many BYTES/ROWS each
        // exchange actually moved (run at any sfDir)
        val df = SparkEntry.queries(args(2))(spark, args(1))
        df.collect()
        // QueryStageExec nodes are LEAVES in the adaptive final plan —
        // their materialized subtree hangs off `.plan`, so a plain
        // collect sees nothing; walk through the wrappers explicitly
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
          (p +: (p match {
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
            case other => other.children.flatMap(walk)
          })) ++
            // scalar / dynamic-pruning subqueries hang off EXPRESSIONS,
            // not children — without this their exchanges go uncounted
            p.subqueries.flatMap(walk)
        val root = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case other => other
        }
        val exchanges = walk(root).collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        println(s"PROBE ${args(2)} shuffle_exchanges=${exchanges.size}")
        exchanges.zipWithIndex.foreach { case (e, i) =>
          val interesting = e.metrics.toSeq
            .filter { case (k, _) => k.contains("dataSize") ||
              k.contains("shuffleBytesWritten") || k.contains("shuffleRecordsWritten") ||
              k.contains("numPartitions") }
            .map { case (k, m) => s"$k=${m.value}" }.sorted.mkString(" ")
          println(s"PROBE   exchange#$i $interesting")
        }
      case "q67" =>
        val d = Tables(spark, args(1)).documents
        val edges = time("q67.dupEdges(build)") {
          graft.operators.Dedup.dupEdges(d, "doc_id", "text", 0.5)
        }
        time("q67.edges.count")(edges.count())
        val comp = time("q67.cc(loop)") {
          graft.operators.Dedup.connectedComponents(
            d.select(col("doc_id").as("id")), edges, "doc_a", "doc_b")
        }
        time("q67.comp.count")(comp.count())
      case "bpe" =>
        // fit-vs-fitDelta: equivalence at a naive-affordable merge count,
        // then fitDelta alone at the q144 gate count.
        val d = Tables(spark, args(1)).documents
        val nEq = if (args.length > 2) args(2).toInt else 12
        val nBig = if (args.length > 3) args(3).toInt else 256
        val naive = time(s"bpe.fit($nEq)") {
          graft.operators.Bpe.fit(d, "text", nEq) }
        val delta = time(s"bpe.fitDelta($nEq)") {
          graft.operators.Bpe.fitDelta(d, "text", nEq) }
        println(s"PROBE bpe.equivalent($nEq) = ${naive == delta}")
        val big = time(s"bpe.fitDelta($nBig)") {
          graft.operators.Bpe.fitDelta(d, "text", nBig) }
        println(s"PROBE bpe.fitDelta($nBig).merges = ${big.length}")
      case "pipeline" =>
        import graft.models._
        val t = Tables(spark, args(1))
        time("raw_unemployment")(TestdataRaw.rawUnemployment(t).count())
        val su = Staging.unemployment(TestdataRaw.rawUnemployment(t)).cache()
        val si = Staging.inflation(TestdataRaw.rawInflation(t)).cache()
        val sg = Staging.gdp(TestdataRaw.rawGdp(t)).cache()
        val sp = Staging.population(TestdataRaw.rawPopulation(t)).cache()
        time("stg cache warm")(su.count() + si.count() + sg.count() + sp.count())
        val ia = Intermediate.annualMetrics(sg, sp, su, si)
        time("int_annual")(ia.count())
        val im = Intermediate.monthlyIndicators(su, si, ia)
        time("int_monthly")(im.count())
        val asOf = java.sql.Timestamp.valueOf("2002-01-01 00:00:00")
        val dm = Marts.dimCountry(TestdataRaw.seedCountryMetadata(t), sg, asOf)
        val f  = Marts.fctEconomicIndicators(im, dm, asOf, "x")
        time("fct")(f.count())
        time("fct again")(f.count())
        time("forecast")(graft.analytics.Forecast.forecast(f, asOf).count())
        time("anomaly")(graft.analytics.Anomaly.detect(f).count())
      case other => sys.error(s"unknown subcommand: $other")
    }
    spark.stop()
  }
}

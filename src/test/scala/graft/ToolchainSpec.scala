package graft

import org.apache.spark.sql.types.TimestampNTZType

/** Toolchain tripwire: the engine's event-time contract depends on HOW
  * this Spark build reads TIMESTAMP(NANOS) parquet, and that behavior has
  * already shifted once under it (the 4.1.2 image bump silently killed the
  * 3.x `nanosAsLong` bigint reading and broke every temporal/streaming leg
  * at once). This spec pins the two environmental facts the engine
  * assumes, so the NEXT image bump fails one obvious test with a named
  * cause instead of three obscure ones.
  */
class ToolchainSpec extends SparkSpec {

  private val events = "/root/testdata/sf0.001/events.parquet"

  test("Spark major version is the one the event-time contract was verified on") {
    assert(spark.version.startsWith("4."),
      s"Spark ${spark.version}: re-verify how this build reads TIMESTAMP(NANOS) " +
        "parquet and update Tables.canonicalEventsTs + this spec")
  }

  test("TIMESTAMP(NANOS) parquet reads as TIMESTAMP_NTZ (micros); the 3.x legacy conf is dead") {
    val plain = spark.read.parquet(events)
    assert(plain.schema("ts").dataType == TimestampNTZType,
      s"events.ts now reads as ${plain.schema("ts").dataType} — the parquet " +
        "nanos reading shifted again; update Tables.canonicalEventsTs")
    // the 3.x escape hatch must NOT change the reading on this toolchain —
    // if it ever does again, the canonicalization logic needs re-deriving,
    // not just this assertion flipped
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(s2.read.parquet(events).schema("ts").dataType == TimestampNTZType,
      "spark.sql.legacy.parquet.nanosAsLong affects the events reading again " +
        "on this Spark build — Tables.canonicalEventsTs assumes it is dead")
  }

  test("temporal operators refuse a raw NTZ time column in a non-UTC session") {
    // the same loud-failure contract as Tables.canonicalEventsTs, at the
    // OPERATOR entry: an NTZ→TIMESTAMP cast in a non-UTC session shifts
    // every instant silently
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val ntz = s2.read.parquet(events) // ts arrives as TIMESTAMP_NTZ
    val ex = intercept[IllegalStateException] {
      graft.operators.TemporalJoins.sessionize(
        ntz, Seq("user_id"), "ts", gapMicros = 60L * 1000000)
    }
    assert(ex.getMessage.contains("UTC"))
    // canonical frames (already TIMESTAMP) pass regardless of zone, and
    // under the UTC session the NTZ frame canonicalizes fine
    graft.operators.TemporalJoins.sessionize(
      graft.core.Tables(spark, "/root/testdata/sf0.001").events,
      Seq("user_id"), "ts", gapMicros = 60L * 1000000).count()
  }

  test("expression-heavy plans compile under Janino's 64 KB method limit — no interpreted fallback") {
    // Round-11 judge log: q174's S-curve projection generated a
    // project_doConsume past 64 KB (nested when-of-power-chains duplicate
    // subtrees — CSE can't hoist out of CASE branches); Spark fell back
    // to interpreted execution SILENTLY except for an ERROR CodeGenerator
    // line. This canary attaches an appender to that logger and runs the
    // formerly-failing queries plus the suite's other expression-dense
    // plans: any codegen compile failure anywhere in these plans fails
    // the test instead of scrolling past in a 4000-line log.
    val logged = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-codegen-canary", null,
        org.apache.logging.log4j.core.layout.PatternLayout.createDefaultLayout(),
        false, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(org.apache.logging.log4j.Level.ERROR))
          logged.add(e.getMessage.getFormattedMessage.take(400))
    }
    appender.start()
    val logger = org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    logger.addAppender(appender)
    try {
      // self-check: a synthetic ERROR must reach the appender, else the
      // whole canary is a no-op that can never fail
      logger.error("graft-canary-self-check")
      assert(logged.size == 1 && logged.get(0).contains("graft-canary-self-check"),
        "canary appender not wired — the codegen gate would pass vacuously")
      logged.clear()
      for (q <- Seq("q174_lsh_parameter_plan", "q162_heaps_law",
                    "q156_gopher_repetition", "q57_quality_scores"))
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      import scala.jdk.CollectionConverters._
      assert(logged.isEmpty,
        "codegen compile failure (interpreted fallback):\n" +
          logged.asScala.mkString("\n---\n"))
    } finally { logger.removeAppender(appender); appender.stop() }
  }
}

package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The canonical event-time contract (`Tables.canonicalEventsTs`): the
  * TIMESTAMP(NANOS) parquet reading (TIMESTAMP_NTZ on Spark ≥4.1)
  * normalizes to session-zoned TIMESTAMP at the true instant; already-
  * canonical frames pass through; any other reading — or a non-UTC
  * session, where the ntz cast would shift the instant — is a loud error,
  * not a silent unit shear. (Replaces the 3.x `nanosAsLong` conf contract,
  * which Spark 4.1 made dead code.)
  */
class SessionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events.ts canonicalizes to TIMESTAMP at the true instant (micros precision)") {
    val e = Tables(spark, dir).events
    assert(e.schema("ts").dataType == TimestampType)
    // the instant survives: first event of the deterministic sf0.001 data
    // is 2024-01-01T00:09:58.778549Z — a nanos/micros/millis unit shear
    // of any direction lands decades away from 2024
    val minMicros = e.agg(min(unix_micros(col("ts")))).head.getLong(0)
    assert(minMicros == 1704067798778549L,
      s"events.ts min instant shifted: $minMicros")
  }

  test("an already-canonical TIMESTAMP frame passes through unchanged") {
    val once  = Tables(spark, dir).events
    val twice = Tables.canonicalEventsTs(once)
    assert(twice.schema("ts").dataType == TimestampType)
    assert(twice.agg(min(unix_micros(col("ts")))).head.getLong(0) ==
           once.agg(min(unix_micros(col("ts")))).head.getLong(0))
  }

  test("an unexpected reading (e.g. the dead 3.x bigint form) is refused loudly") {
    val asLong = spark.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException](Tables.canonicalEventsTs(asLong))
    assert(ex.getMessage.contains("LongType") && ex.getMessage.contains(spark.version))
  }

  test("a non-UTC session cannot canonicalize ntz (the cast would shift the instant)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val raw = s2.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType) // precondition
    val ex = intercept[IllegalStateException](Tables.canonicalEventsTs(raw))
    assert(ex.getMessage.contains("America/New_York"))
  }

  test("isEventTimeType accepts exactly the readings the contract handles") {
    assert(Tables.isEventTimeType(TimestampNTZType))
    assert(Tables.isEventTimeType(TimestampType))
    assert(!Tables.isEventTimeType(LongType))
  }
}

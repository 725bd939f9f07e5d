package graft

import graft.core.Sessions

/** The external-session conf contract: ensureNanosAsLong must
  * self-configure sessions that never set the key (conf.getOption returns
  * the registered DEFAULT for unset keys, so the old match on None was
  * dead code and every external session threw) and reject an explicit
  * conflicting setting rather than silently flipping it.
  */
class SessionsSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"

  test("ensureNanosAsLong accepts/configures sessions and ends with the key true") {
    val s2 = spark.newSession()
    Sessions.ensureNanosAsLong(s2) // must not throw, whatever s2 inherited
    assert(s2.conf.get(key) == "true")
    // idempotent
    Sessions.ensureNanosAsLong(s2)
    assert(s2.conf.get(key) == "true")
  }

  test("an explicitly conflicting setting is an error, not a silent flip") {
    val s3 = spark.newSession()
    s3.conf.set(key, "false")
    intercept[IllegalStateException](Sessions.ensureNanosAsLong(s3))
    assert(s3.conf.get(key) == "false") // untouched
  }

  test("isExplicitlySet distinguishes user-set keys from registered defaults") {
    val s4 = spark.newSession()
    val probe = "spark.sql.parquet.aggregatePushdown" // never set anywhere here
    assert(!org.apache.spark.sql.graftx.Bridge.isExplicitlySet(s4, probe))
    s4.conf.set(probe, "false")
    assert(org.apache.spark.sql.graftx.Bridge.isExplicitlySet(s4, probe))
  }
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for shared/materialized frames (the query-level analog
  * of a pipeline materializing a stage once for all consumers).
  *
  * Sessions are WEAK keys: once a session is stopped and dereferenced, its
  * entries — and the frames they pin — become GC-reclaimable instead of
  * living for the JVM lifetime (a plain `TrieMap[(SparkSession, …), _]`
  * leaks every session ever seen). Entries for the LIVE session do stay
  * pinned for that session's lifetime — that is the point of the memo.
  */
final class SessionCache[K] {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, DataFrame]]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => DataFrame): DataFrame = {
    val inner = bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[K, DataFrame]
        bySession.put(spark, m)
      }
      m
    }
    inner.getOrElseUpdate(key, build)
  }
}

package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for shared/materialized frames (the query-level analog
  * of a pipeline materializing a stage once for all consumers).
  *
  * Eviction is by SPARK LISTENER, not weak keys alone: a cached DataFrame
  * strongly references its own SparkSession, so with a bare WeakHashMap
  * the key stays reachable through the map's own values and is never
  * collected (the documented WeakHashMap pitfall). On application end the
  * session's entry is dropped explicitly, releasing the session graph and
  * every memoized frame; the WeakHashMap remains as a backstop for
  * sessions discarded without a clean stop once their frames are gone.
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
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
            bySession.synchronized { bySession.remove(spark); () }
        })
      }
      m
    }
    inner.getOrElseUpdate(key, build)
  }
}

package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for shared/materialized frames (the query-level analog
  * of a pipeline materializing a stage once for all consumers).
  *
  * Eviction: a cached DataFrame strongly references its own SparkSession,
  * so a bare WeakHashMap never collects (the documented value→key
  * pitfall). Entries are therefore dropped EXPLICITLY — on application
  * end via listener, and for any session whose SparkContext has stopped
  * on the next cache access. Honest scope: a session abandoned WITHOUT
  * stopping, in an application that never touches the cache again, stays
  * pinned until one of those events — acceptable for this engine's
  * drivers (one app, one or few sessions), not a general-purpose
  * session registry.
  */
final class SessionCache[K] {

  /** Lazy holder: `putIfAbsent` races only over cheap allocations of this
    * wrapper; the expensive `build` runs once, on the single canonical
    * holder, when its `value` is first forced. (A bare
    * `TrieMap.getOrElseUpdate(key, build)` may evaluate `build` in more
    * than one losing thread — for eagerly-materializing builds like the
    * Jaccard pair mining that means a duplicate full job whose blocks
    * linger until GC.)
    */
  private final class Memo(build: () => DataFrame) { lazy val value: DataFrame = build() }

  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, Memo]]()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => DataFrame): DataFrame = {
    val inner = bySession.synchronized {
      // evict entries of stopped contexts (their frames are dead anyway)
      bySession.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)
      var m = bySession.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[K, Memo]
        bySession.put(spark, m)
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
            bySession.synchronized { bySession.remove(spark); () }
        })
      }
      m
    }
    val memo = inner.get(key) match {
      case Some(m) => m
      case None =>
        val fresh = new Memo(() => build)
        inner.putIfAbsent(key, fresh).getOrElse(fresh)
    }
    memo.value
  }

  /** Test hook: the keys currently cached for `spark` (empty if none) —
    * lets specs assert reuse directly (one build, N readers) instead of
    * inferring it from plan shape.
    */
  def keys(spark: SparkSession): Set[K] = bySession.synchronized {
    Option(bySession.get(spark)).map(_.keySet.toSet).getOrElse(Set.empty[K])
  }
}

package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-session memo for arbitrary derived values ([[SessionCache]]'s
  * generalization — that one is the DataFrame instance). Used for
  * driver-side state that must follow session lifetime, e.g. IVF
  * centroid Seqs: a plain `TrieMap[(sessionUUID, dir), V]` never evicts
  * and accumulates across sessions in a long-lived JVM.
  *
  * Eviction: a cached value may strongly reference its SparkSession, so
  * a bare WeakHashMap need not collect (the documented value→key
  * pitfall). Entries are therefore dropped EXPLICITLY — on application
  * end via listener, and for any session whose SparkContext has stopped
  * on the next cache access. Honest scope: a session abandoned WITHOUT
  * stopping, in an application that never touches the cache again, stays
  * pinned until one of those events — acceptable for this engine's
  * drivers (one app, one or few sessions), not a general-purpose
  * session registry.
  */
final class SessionMemo[K, V] {

  /** Lazy holder: `putIfAbsent` races only over cheap allocations of this
    * wrapper; the expensive `build` runs once, on the single canonical
    * holder, when its `value` is first forced.
    */
  private final class Memo(build: () => V) { lazy val value: V = build() }

  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, Memo]]()

  /** Non-mutating membership probe (test hook): whether `key` is
    * memoized for `spark` — unlike `getOrElseUpdate`, never inserts.
    */
  def contains(spark: SparkSession, key: K): Boolean = bySession.synchronized {
    Option(bySession.get(spark)).exists(_.contains(key))
  }

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    val inner = bySession.synchronized {
      // evict entries of stopped contexts (their values are dead anyway)
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
}

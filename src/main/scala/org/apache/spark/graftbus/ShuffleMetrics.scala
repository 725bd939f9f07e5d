package org.apache.spark.graftbus

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shuffle-volume attribution between `reset()`/`snapshot()` markers —
  * the quantitative half of the 100 TB extrapolations in PERF.md: a
  * plan-shape argument says WHICH exchanges exist; this listener measures
  * the BYTES/ROWS each pipeline stage actually moves, so a scale-up
  * estimate can cite a measured constant (bytes per corpus row) instead
  * of a shape claim. Same bus-drain discipline as [[ServeMetrics]]
  * (which it mirrors; kept separate so the bench's hot listener stays
  * four counters wide).
  */
final class ShuffleMetrics extends SparkListener {
  private val writeBytes = new AtomicLong(0L)
  private val writeRows  = new AtomicLong(0L)
  private val readBytes  = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      writeRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  /** (shuffle bytes written, records written, bytes read) since reset. */
  def snapshot(sc: SparkContext): (Long, Long, Long) = {
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
    (writeBytes.get(), writeRows.get(), readBytes.get())
  }

  def reset(sc: SparkContext): Unit = {
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
    writeBytes.set(0L); writeRows.set(0L); readBytes.set(0L)
  }
}

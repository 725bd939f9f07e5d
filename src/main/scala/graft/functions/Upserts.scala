package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The in-batch upsert rule shared by the batch incremental materializer
  * (`model.Runner`) and the streaming incremental sink
  * (`streaming.EventsStream`) — ONE implementation so the two documented-
  * equivalent sinks cannot drift.
  */
object Upserts {

  /** One row per `uniqueKey`: with `orderCol` (the watermark), the LATEST
    * value wins; remaining ORDERABLE columns break ties deterministically,
    * and the key itself is appended so the ordering is never empty (a
    * key-only schema carries no other information). Non-orderable columns
    * (maps) cannot participate in the ordering: rows tying on every
    * orderable column but differing only in a map column still collapse to
    * a single survivor, but WHICH one is partitioning-dependent — don't
    * rely on map columns to distinguish duplicate-key rows.
    */
  def latestPerKey(df: DataFrame, uniqueKey: String, orderCol: Option[String]): DataFrame = {
    val rest = df.schema.fields
      .filter(f => f.name != uniqueKey && !orderCol.contains(f.name) &&
        org.apache.spark.sql.graftx.Bridge.isOrderable(f.dataType))
      .map(_.name).sorted.map(col(_).asc_nulls_last)
    val ordering = orderCol.map(col(_).desc_nulls_last).toSeq ++ rest :+ col(uniqueKey).asc
    val w = Window.partitionBy(col(uniqueKey)).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical stateful timeseries scale
  * test (not in pypond's surface, but the natural Spark-first
  * generalization of its event grouping: pypond groups events into
  * fixed windows, this groups them into activity bursts).
  *
  * Two window passes over ONE shuffle on the series key:
  *   1. lag(ts)          -> mark session starts (gap > threshold)
  *   2. running sum      -> session ids
  * then a key+session aggregation (map-side partials apply).
  */
object Sessionize {

  def apply(df: DataFrame, tsCol: String, keyCols: Seq[String],
            gapUs: Long, aggs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val upTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val isNew: Column = {
      val prev = lag(col(tsCol), 1).over(w)
      when(prev.isNull || col(tsCol) - prev > gapUs, lit(1L)).otherwise(lit(0L))
    }

    df.withColumn("__new_sess", isNew)
      .withColumn("session_id", sum(col("__new_sess")).over(upTo))
      .drop("__new_sess")
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

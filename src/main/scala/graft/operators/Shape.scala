package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-shaping processors — the stateless part of pypond's Pipeline:
  * select / collapse / map / filter / take / offset / rename / dedup /
  * crop (reference: pypond/processor/{selector,collapser,mapper,filter,
  * taker,offset}.py, pypond/collection.py:434-663, pypond/series.py:419).
  *
  * All are single narrow projections/filters — they fuse into whatever
  * scan or shuffle surrounds them (no exchange of their own), and
  * filters/projections push down to the parquet scan.
  */
object Shape {

  /** Selector: keep only the listed value columns (plus time/key). */
  def select(df: DataFrame, keep: Seq[String]): DataFrame =
    df.select(keep.map(col): _*)

  /** Collapser (pypond/processor/collapser.py + event.py:544): reduce N
    * columns into one named column; append or replace.
    */
  def collapse(df: DataFrame, fieldSpecList: Seq[String], name: String,
               reducer: Seq[Column] => Column, append: Boolean = true): DataFrame = {
    val reduced = reducer(fieldSpecList.map(col)).as(name)
    if (append) df.withColumn(name, reduced)
    else df.select(reduced)
  }

  def sumReducer(cols: Seq[Column]): Column = cols.reduce(_ + _)
  def avgReducer(cols: Seq[Column]): Column = cols.reduce(_ + _) / cols.size
  def maxReducer(cols: Seq[Column]): Column = greatest(cols: _*)
  def minReducer(cols: Seq[Column]): Column = least(cols: _*)

  /** Offset processor: add a constant to the listed columns. */
  def offsetBy(df: DataFrame, by: Double, valCols: Seq[String]): DataFrame =
    valCols.foldLeft(df)((d, v) => d.withColumn(v, col(v) + lit(by)))

  /** Taker: first `n` events per (key, window-bucket) in time order
    * (pypond/processor/taker.py limits within each group/window).
    */
  def take(df: DataFrame, tsCol: String, keyCols: Seq[String], n: Int,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Positional slice per series key: events [from, until) in time
    * order, Python-slice semantics (pypond/series.py:419 slice →
    * collection.py:552). Same one-shuffle window shape as [[take]].
    */
  def slice(df: DataFrame, tsCol: String, keyCols: Seq[String],
            from: Int, until: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") > from && col("__rn") <= until)
      .drop("__rn")
  }

  /** Collection.dedup (pypond/collection.py:434): one event per key;
    * on duplicates the LATER event's values win (Event.merge contract).
    * `orderCol` stands in for arrival order.
    */
  def dedup(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Collection.clean (pypond/collection.py:633): drop events whose
    * field is missing/invalid (null or NaN).
    */
  def clean(df: DataFrame, fieldPath: String): DataFrame =
    df.where(col(fieldPath).isNotNull && !isnan(col(fieldPath)))

  /** TimeSeries.crop / slice to a [beginUs, endUs] range
    * (pypond/series.py:419-457; TimeRange containment is inclusive,
    * pypond/range.py:358).
    */
  def crop(df: DataFrame, tsCol: String, beginUs: Long, endUs: Long): DataFrame =
    df.where(col(tsCol) >= beginUs && col(tsCol) <= endUs)

  /** TimeSeries.rename_columns (pypond/series.py:1027). */
  def rename(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Collection.sort(field_path) (pypond/collection.py:460): order by a
    * VALUE field rather than time. Distributed form: a per-series rank
    * position rather than a global total order (a global sort is a
    * range-partition shuffle of the whole corpus; the per-key window
    * shuffles once on the series key like every other stateful op).
    * `orderCols` should end in a unique tiebreak for determinism.
    */
  def sortBy(df: DataFrame, keyCols: Seq[String],
             orderCols: Seq[String], posCol: String = "pos"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn(posCol, row_number().over(w))
  }
}

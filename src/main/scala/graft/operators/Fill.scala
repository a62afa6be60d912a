package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fill — repair missing (null/NaN) values in a series
  * (reference: pypond/processor/filler.py).
  *
  * Methods preserved from the reference:
  *  - zero: missing -> 0 (filler.py:174-199 _pad_and_zero);
  *  - pad:  missing -> previous seen value, optionally only the first
  *    `fillLimit` consecutive misses per gap (filler.py key_count);
  *  - linear: time-weighted interpolation between the surrounding good
  *    values (filler.py:316-400 _interpolate_event_list); with a
  *    fillLimit, a gap of >= fillLimit consecutive misses is left
  *    unfilled entirely (filler.py:364-372 flushes the cache unfilled);
  *    leading/trailing gaps stay null (no endpoint to interpolate to).
  *
  * Spark-first shape: `last(..., ignoreNulls)` / `first(..., ignoreNulls)`
  * frame-bounded window functions over the key-partitioned, time-ordered
  * window — one shuffle on the series key, linear per-partition scans,
  * identical asymptotics to the reference's streaming pass but
  * distributed over every series at once.
  */
object Fill {

  private def valid(c: Column): Column = c.isNotNull && !isnan(c)

  def zero(df: DataFrame, valCols: Seq[String]): DataFrame =
    valCols.foldLeft(df)((d, v) =>
      d.withColumn(v, when(valid(col(v)), col(v)).otherwise(lit(0.0))))

  /** Zero fill honoring `fillLimit` (filler.py key_count applies to
    * zero mode too — clean_test.py:590-616): only the first
    * `fillLimit` consecutive misses of each gap become 0, the rest
    * stay null. Unlike pad, a LEADING gap fills (zero needs no
    * previous good value) — its run length counts from the series
    * start, exactly the reference's behavior.
    */
  def zeroLimited(df: DataFrame, tsCol: String, valCols: Seq[String],
                  keyCols: Seq[String], fillLimit: Int): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val upTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valCols.foldLeft(df) { (d, v) =>
      d.withColumn("__rn", row_number().over(w))
        .withColumn("__last_good_rn", last(
          when(valid(col(v)), col("__rn")), ignoreNulls = true).over(upTo))
        .withColumn(v, when(valid(col(v)), col(v)).otherwise(
          when(col("__rn") - coalesce(col("__last_good_rn"), lit(0))
            <= fillLimit, lit(0.0))))
        .drop("__rn", "__last_good_rn")
    }
  }

  def pad(df: DataFrame, tsCol: String, valCols: Seq[String],
          keyCols: Seq[String], fillLimit: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val upTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valCols.foldLeft(df) { (d, v) =>
      val good = when(valid(col(v)), col(v))
      val padded = last(good, ignoreNulls = true).over(upTo)
      fillLimit match {
        case None =>
          d.withColumn(v, when(valid(col(v)), col(v)).otherwise(padded))
        case Some(lim) =>
          // how many consecutive misses since the last good value
          d.withColumn("__rn", row_number().over(w))
            .withColumn("__last_good_rn", last(
              when(valid(col(v)), col("__rn")), ignoreNulls = true).over(upTo))
            .withColumn(v, when(valid(col(v)), col(v)).otherwise(
              when(col("__rn") - coalesce(col("__last_good_rn"), lit(0)) <= lim,
                padded)))
            .drop("__rn", "__last_good_rn")
      }
    }
  }

  def linear(df: DataFrame, tsCol: String, valCol: String,
             keyCols: Seq[String], fillLimit: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val upTo = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valCol)
    val good = when(valid(v), v)
    val goodTs = when(valid(v), col(tsCol))

    val staged = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev_val", last(good, ignoreNulls = true).over(upTo))
      .withColumn("__prev_ts", last(goodTs, ignoreNulls = true).over(upTo))
      .withColumn("__next_val", first(good, ignoreNulls = true).over(after))
      .withColumn("__next_ts", first(goodTs, ignoreNulls = true).over(after))
      // id of the gap this row belongs to = row number of the last good row
      .withColumn("__run_id", coalesce(
        last(when(valid(v), col("__rn")), ignoreNulls = true).over(upTo),
        lit(0)))

    val withRun = fillLimit match {
      case None => staged.withColumn("__run_len", lit(0L))
      case Some(_) =>
        val runW = Window.partitionBy((keyCols :+ "__run_id").map(col): _*)
        staged.withColumn("__run_len", count(when(!valid(v), lit(1))).over(runW))
    }
    val gapOk = fillLimit.map(lim => col("__run_len") < lim).getOrElse(lit(true))

    val frac = (col(tsCol) - col("__prev_ts")).cast("double") /
      (col("__next_ts") - col("__prev_ts")).cast("double")
    val interp = when(col("__prev_ts") === col("__next_ts"),
        (col("__prev_val") + col("__next_val")) / 2)
      .otherwise(col("__prev_val") + (col("__next_val") - col("__prev_val")) * frac)

    withRun
      .withColumn(valCol,
        when(valid(v), v).otherwise(
          when(col("__prev_val").isNotNull && col("__next_val").isNotNull && gapOk,
            interp)))
      .drop("__rn", "__prev_val", "__prev_ts", "__next_val", "__next_ts",
        "__run_id", "__run_len")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeIndex

/** Windowed rollups — pypond's fixed_window_rollup / hourly / daily /
  * monthly / yearly rollups (reference: pypond/series.py:1171-1458) and
  * the windowed Aggregator processor (pypond/processor/aggregator.py).
  *
  * Spark-first shape: ONE hash aggregation on (seriesKey, bucket) where
  * the bucket is integer arithmetic on the epoch-ns long — map-side
  * partial aggregation kicks in, so a 100 TB scan reduces before the
  * shuffle; no per-series state, no driver loops.
  */
object Rollup {

  /** Fixed-window rollup: groups by `win`-sized buckets, emits the
    * pypond "5m-NNN" index string plus the window's [begin,end) ns.
    */
  def fixedWindow(df: DataFrame, tsCol: String, keyCols: Seq[String],
                  win: String, aggs: Seq[Column]): DataFrame = {
    val ts = col(tsCol)
    val gb = keyCols.map(col) :+ TimeIndex.indexOf(ts, win).as("idx")
    df.groupBy(gb: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Like fixedWindow but emits the bucket as a TimeRange
    * ([begin,end) epoch µs) instead of an index string —
    * TimeSeries.collect_by_fixed_window (pypond/series.py:1459).
    */
  def fixedWindowRange(df: DataFrame, tsCol: String, keyCols: Seq[String],
                       win: String, aggs: Seq[Column]): DataFrame = {
    val ts = col(tsCol)
    val gb = keyCols.map(col) ++ Seq(
      TimeIndex.windowStartUs(ts, win).as("ts_begin"),
      TimeIndex.windowEndUs(ts, win).as("ts_end"))
    df.groupBy(gb: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sliding (overlapping) windows — beyond pypond's tumbling rollups:
    * window p covers [p*slide, p*slide + size); an event contributes to
    * size/slide consecutive windows. Generated arithmetically
    * (sequence + explode before the aggregation), so the fan-out
    * happens map-side and partial aggregation still applies.
    */
  def slidingWindow(df: DataFrame, tsCol: String, keyCols: Seq[String],
                    size: String, slide: String, aggs: Seq[Column]): DataFrame = {
    val sizeUs = TimeIndex.durationUs(size)
    val slideUs = TimeIndex.durationUs(slide)
    require(sizeUs % slideUs == 0, "size must be a multiple of slide")
    import org.apache.spark.sql.graft.Bridge.fldiv
    val ts = col(tsCol)
    val firstPos = fldiv(ts - lit(sizeUs), slideUs) + lit(1L)
    val lastPos = fldiv(ts, slideUs)
    val exploded = df
      .withColumn("__pos", explode(sequence(firstPos, lastPos)))
      .withColumn("ts_begin", col("__pos") * lit(slideUs))
      .withColumn("ts_end", col("__pos") * lit(slideUs) + lit(sizeUs))
    exploded
      .groupBy((keyCols.map(col) ++ Seq(col("ts_begin"), col("ts_end"))): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Skew-resistant fixed-window rollup for decomposable aggregates
    * (sum/count/min/max): when one series key is a heavy hitter, a
    * straight groupBy lands its whole window on one reducer. Salting
    * splits each (key, bucket) across `saltBuckets` partial groups,
    * aggregates, then combines — two small shuffles instead of one hot
    * one. Pass the PARTIAL aggregates (e.g. sum, count) and the FINAL
    * combiners keyed by the partial names (e.g. sum(sum), sum(cnt)).
    */
  def fixedWindowSalted(df: DataFrame, tsCol: String, keyCols: Seq[String],
                        win: String, saltBuckets: Int,
                        partialAggs: Seq[Column],
                        finalAggs: Seq[Column]): DataFrame = {
    val ts = col(tsCol)
    val salted = df.withColumn("__salt",
      pmod(hash(ts), lit(saltBuckets)))
    val partial = salted
      .groupBy(keyCols.map(col) ++ Seq(
        TimeIndex.indexOf(ts, win).as("idx"), col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy((keyCols :+ "idx").map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Calendar rollup: granularity in {"daily","monthly","yearly"};
    * index strings "YYYY-MM-DD" / "YYYY-MM" / "YYYY". UTC by default;
    * pass `tz` for pypond's `utc=False` local-time day/month/year
    * boundaries (pypond/series.py:1278,1333,1388) — zone-named rather
    * than implicit, and still ONE partial-agg'd hash aggregation (the
    * zone shift is scan-side column arithmetic, not a repartition).
    */
  def calendar(df: DataFrame, tsCol: String, keyCols: Seq[String],
               granularity: String, aggs: Seq[Column],
               tz: Option[String] = None): DataFrame = {
    val ts = col(tsCol)
    val idx = (granularity, tz) match {
      case ("daily", None)      => TimeIndex.dailyIndex(ts)
      case ("monthly", None)    => TimeIndex.monthlyIndex(ts)
      case ("yearly", None)     => TimeIndex.yearlyIndex(ts)
      case ("daily", Some(z))   => TimeIndex.dailyIndexTz(ts, z)
      case ("monthly", Some(z)) => TimeIndex.monthlyIndexTz(ts, z)
      case ("yearly", Some(z))  => TimeIndex.yearlyIndexTz(ts, z)
      case (g, _) => throw new IllegalArgumentException(s"bad granularity: $g")
    }
    val gb = keyCols.map(col) :+ idx.as("idx")
    df.groupBy(gb: _*).agg(aggs.head, aggs.tail: _*)
  }
}

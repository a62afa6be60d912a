package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: match point events to the half-open
  * time intervals `[begin, end)` that contain them, within the same
  * key, over two UNBOUNDED streams — the streaming twin of
  * graft.operators.RangeJoin (pypond's TimeRange.contains over live
  * pipelines).
  *
  * Spark's stream-stream join keeps both sides' unmatched rows in the
  * state store; an event-time range condition between the two
  * watermarked timestamps is what lets it EVICT state — a point can
  * only match intervals that began within `maxSpanUs` before it, so
  * once the watermark passes, rows age out. Without that bound, state
  * grows forever. The exact `[begin, end)` containment rides along in
  * the same join condition; `maxSpanUs` must be an upper bound on
  * every interval's span.
  */
object StreamRangeJoin {

  /** Matched (interval, point) pairs over two streaming DataFrames.
    * `beginCol`/`endCol`/`ptsTsCol` are epoch-µs longs (the canonical
    * graft shape); `watermark` is how late either side may arrive.
    */
  def pairs(intervals: DataFrame, points: DataFrame, keyCols: Seq[String],
            beginCol: String, endCol: String, ptsTsCol: String,
            maxSpanUs: Long, watermark: String): DataFrame = {
    val iv = intervals
      .withColumn("__iv_time", timestamp_micros(col(beginCol)))
      .withWatermark("__iv_time", watermark)
    val pt = points
      .withColumn("__pt_time", timestamp_micros(col(ptsTsCol)))
      .withWatermark("__pt_time", watermark)
      // prefix point columns that collide with interval columns
      .withColumnRenamed(ptsTsCol, s"pt_$ptsTsCol")
    val keyEq = keyCols.map(k => iv(k) === pt(k)).reduce(_ && _)
    // state-eviction bound (event-time to event-time) + exact containment
    val range = pt("__pt_time") >= iv("__iv_time") &&
      pt("__pt_time") <= iv("__iv_time") + expr(s"INTERVAL $maxSpanUs MICROSECONDS") &&
      pt(s"pt_$ptsTsCol") >= iv(beginCol) && pt(s"pt_$ptsTsCol") < iv(endCol)
    val joined = iv.join(pt, keyEq && range)
    // drop the helper time columns and the duplicate key columns
    keyCols.foldLeft(joined)((d, k) => d.drop(pt(k)))
      .drop("__iv_time", "__pt_time")
  }
}

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
  * grows forever. `maxSpanUs` must be an upper bound on every
  * interval's span.
  *
  * CRITICAL: the join condition must contain ONLY the key equality and
  * the watermarked event-time range. Spark's `StreamingJoinHelper`
  * derives each side's state watermark by symbolically solving the
  * event-time conjuncts; any extra conjunct over raw (non-watermarked)
  * columns — such as the exact `[begin, end)` containment over epoch-µs
  * longs — makes that extraction fail for BOTH sides, and join state is
  * then never evicted. The containment is therefore applied as a
  * post-join filter: same rows out, but the state store stays bounded.
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
    // join condition: ONLY key + watermarked event-time range, so that
    // StreamingJoinHelper can solve for both sides' state watermarks.
    // `__pt_time >= __iv_time` IS the exact `pt_ts >= begin` lower
    // bound (timestamp_micros is monotone), so no separate raw-long
    // conjunct is needed for it.
    val range = pt("__pt_time") >= iv("__iv_time") &&
      pt("__pt_time") <= iv("__iv_time") + expr(s"INTERVAL $maxSpanUs MICROSECONDS")
    val joined = iv.join(pt, keyEq && range)
      // exact upper bound `pt_ts < end` as a post-join filter, pinned
      // by PushdownBarrier: if Catalyst folded it back into the join
      // condition, the raw-long conjunct would break state-watermark
      // extraction (and with it state eviction) for both sides
      .where(org.apache.spark.sql.graft.GraftExpressions.no_pushdown(
        col(s"pt_$ptsTsCol") < col(endCol)))
    // drop the helper time columns and the duplicate key columns
    keyCols.foldLeft(joined)((d, k) => d.drop(pt(k)))
      .drop("__iv_time", "__pt_time")
  }
}

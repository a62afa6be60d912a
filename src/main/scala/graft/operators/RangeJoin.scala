package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge.fldiv

/** Distributed interval (range) join: match point events to the
  * half-open time intervals `[begin, end)` that contain them, within
  * the same key. The reference's TimeRange algebra (pypond/range.py
  * `contains`) answers this one range at a time on the driver; at
  * corpus scale the naive formulation is a per-key cross join with an
  * inequality filter — quadratic in events per key and not something
  * Catalyst can hash on.
  *
  * graft instead BANDS both sides into fixed time buckets: each
  * interval is exploded onto every bucket it overlaps, each point
  * lands in exactly one bucket, and the join becomes an EQUALITY join
  * on (key, bucket) with the containment predicate applied after the
  * match. Because the point's bucket is unique, every true
  * (interval, point) pair surfaces exactly once — no dedup pass.
  *
  * Scale shape: one hash shuffle per side on (key, bucket); shuffle
  * volume is rows × (1 + ceil(span/bucket)) — linear, never a cross
  * product. `bucketUs` is the skew dial: buckets ~= the typical
  * interval span keep the fan-out at <= 2 while holding per-bucket
  * populations small.
  */
object RangeJoin {

  /** Matched (interval, point) pairs. `intervals` must expose
    * `beginCol`/`endCol` (epoch µs, half-open); `points` must expose
    * `ptsTsCol`. Both keep their other columns in the output.
    */
  def pairs(intervals: DataFrame, points: DataFrame, keyCols: Seq[String],
            beginCol: String, endCol: String, ptsTsCol: String,
            bucketUs: Long): DataFrame = {
    // floor division: pre-1970 instants band consistently with posOf.
    // Empty/inverted intervals (end <= begin) can match nothing under
    // half-open containment, but sequence(start, stop) with start > stop
    // DESCENDS by default — an inverted interval would explode into a
    // huge bucket array. Drop them before banding.
    val iv = intervals
      .where(col(endCol) > col(beginCol))
      .withColumn("__b",
        explode(sequence(fldiv(col(beginCol), bucketUs),
          fldiv(col(endCol) - 1, bucketUs))))
    val pt = points.withColumn("__b", fldiv(col(ptsTsCol), bucketUs))
    iv.join(pt, keyCols :+ "__b")
      .where(col(ptsTsCol) >= col(beginCol) && col(ptsTsCol) < col(endCol))
      .drop("__b")
  }

  /** Coalesce overlapping-or-touching half-open intervals per key into
    * maximal disjoint islands (the TimeRange union a pypond user builds
    * by folding `range.py` extents pairwise on the driver): classic
    * gaps-and-islands — a running max-end over the begin-ordered
    * intervals marks each interval that starts past everything seen so
    * far as a new island, a prefix sum numbers the islands, and one
    * aggregation collapses each island to its envelope.
    *
    * Touching intervals ([a,b) then [b,c)) merge: for outage/alert
    * windows a zero-length gap is no gap. Inverted intervals
    * (end < begin) contribute their begin as a degenerate instant —
    * callers should pre-filter if they can carry them.
    *
    * Output: keyCols, begin_ts, end_ts (the island envelope), n_merged.
    *
    * Scale shape: ONE hash shuffle on the series key for both windows
    * (same partitioning), then a (key, island)-keyed partial-agg'd
    * groupBy — state per row is O(1) (the running max), never a
    * per-key interval list on the driver like the reference.
    */
  def coalesceIntervals(intervals: DataFrame, keyCols: Seq[String],
                        beginCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // end is the ORDER tie-break at equal begins: island numbering is
    // then independent of physical row order (equal (b,e) rows are
    // interchangeable; distinct ends at one begin overlap regardless)
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(beginCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(col("__pme").isNull ||
      col(beginCol) > col("__pme"), 1L).otherwise(0L)
    intervals
      .withColumn("__pme", prevMaxEnd)
      .withColumn("__isl", sum(newIsland)
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keyCols.map(col) :+ col("__isl"): _*)
      .agg(min(col(beginCol)).as("begin_ts"), max(col(endCol)).as("end_ts"),
        count(lit(1)).as("n_merged"))
      .drop("__isl")
  }

  /** The COMPLEMENT of a key's interval set inside its own coverage
    * span: coalesce to disjoint islands, then emit each gap between
    * consecutive islands — the downtime/idle windows ("when was the
    * pipeline NOT busy"), the inverse question [[coalesceIntervals]]'s
    * union answers. Touching islands cannot exist post-coalesce, so
    * every emitted gap is strictly positive. Same ONE window-shuffle
    * posture: the island windows, the island agg, and the lead window
    * all share hash(key).
    */
  def intervalGaps(intervals: DataFrame, keyCols: Seq[String],
                   beginCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isl = coalesceIntervals(intervals, keyCols, beginCol, endCol)
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("begin_ts"))
    isl
      .withColumn("__nb", lead(col("begin_ts"), 1).over(ord))
      .where(col("__nb").isNotNull && col("__nb") > col("end_ts"))
      .select(keyCols.map(col) ++ Seq(col("end_ts").as("gap_begin"),
        col("__nb").as("gap_end"),
        (col("__nb") - col("end_ts")).as("gap_dur")): _*)
  }
}

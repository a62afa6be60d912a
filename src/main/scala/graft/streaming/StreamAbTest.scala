package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Live A/B read-out — the streaming twin of q_ab_test (the Welch
  * z-score over purchase values, variant = user parity): per tumbling
  * event-time window, the per-variant counts / µ-snapped sums
  * accumulate in ONE windowed aggregation (six conditional partial
  * aggs — the watermark-bounded windowed-agg state every Stream*
  * rollup here uses, never per-event rows), and the window's Welch z
  * + significance verdict emit in append mode the moment the
  * watermark closes the window.
  *
  * The arithmetic is the batch plan's, verbatim: integer micro-unit
  * sums (round(v·1e6) as long), the DECIMAL(38,0) variance key
  * s2·n·1e6 − s1², |z| > 1.96 — so a closed window's row equals
  * q_ab_test run over that window's slice exactly (spec-pinned). A
  * window with a zero- or one-purchase variant surfaces NULL z /
  * NULL significant (no verdict without both variances), the batch
  * operator's documented degenerate read-out.
  *
  * Scale shape: state is 6 numbers per open window — O(windows in
  * the watermark horizon), independent of event volume; the partial
  * aggs are map-side combinable so the shuffle carries per-partition
  * partials, not purchases.
  */
object StreamAbTest {

  /** `events` carries `user_id`, epoch-µs `ts`, `event_type`,
    * `value`. Emits (win_begin epoch-µs, n0, n1, mean0, mean1, z,
    * significant) per closed window.
    */
  def apply(events: DataFrame, windowLen: String = "1 day",
            watermark: String = "1 hour"): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def side(v: Int, c: Column) =
      sum(when(col("user_id") % 2 === v, c))
    def welchLeg(n: Column, s1: Column, s2: Column): (Column, Column) = {
      val m = s1.cast("double") / lit(1e6) / n.cast("double")
      // sample variance is undefined below 2 rows: the n > 1 guard
      // surfaces NULL (-> NULL z, the degenerate read-out) instead of
      // tripping ANSI division-by-zero on a 1-purchase window
      val vv = when(n > lit(1),
        greatest((dec(s2) * dec(n) * dec(lit(1000000L))
          - dec(s1) * dec(s1)).cast("double"), lit(0.0))
          .divide(lit(1e12)).divide(n.cast("double"))
          .divide((n - lit(1)).cast("double")))
      (m, vv)
    }
    val agg = events
      .where(col("event_type") === "purchase")
      .withColumn("__event_time", timestamp_micros(col("ts")))
      .withWatermark("__event_time", watermark)
      .groupBy(window(col("__event_time"), windowLen).as("__w"))
      .agg(
        side(0, lit(1L)).as("n0"), side(1, lit(1L)).as("n1"),
        side(0, round(col("value") * lit(1e6)).cast("long")).as("s1_0"),
        side(1, round(col("value") * lit(1e6)).cast("long")).as("s1_1"),
        side(0, round(col("value") * col("value") * lit(1e6)).cast("long"))
          .as("s2_0"),
        side(1, round(col("value") * col("value") * lit(1e6)).cast("long"))
          .as("s2_1"))
    val (m0, v0) = welchLeg(col("n0"), col("s1_0"), col("s2_0"))
    val (m1, v1) = welchLeg(col("n1"), col("s1_1"), col("s2_1"))
    val z = (m0 - m1) / sqrt(v0 / col("n0").cast("double")
      + v1 / col("n1").cast("double"))
    agg.select(unix_micros(col("__w.start")).as("win_begin"),
      col("n0"), col("n1"),
      round(m0, 6).as("mean0"), round(m1, 6).as("mean1"),
      round(z, 4).as("z"), (abs(z) > 1.96).as("significant"))
  }
}

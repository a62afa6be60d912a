package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge.fldiv

/** Time-bucket index arithmetic.
  *
  * Re-expresses pypond's `Index` (reference: pypond/index.py:357-530) as
  * native column expressions over epoch-MICROsecond longs, so bucketing
  * is pure integer arithmetic inside whole-stage codegen — no UDFs, no
  * timestamp conversions in the hot path.
  *
  * Canonical tick = 1 µs: it is the finest precision every engine in the
  * verification chain (Spark timestamps, DuckDB parquet reader) can
  * round-trip exactly; pypond itself only keeps ms.
  *
  * Index string shapes (pypond/index.py:408, 486, 508, 529):
  *   - fixed windows:  "5m-4754394"  (suffix = epoch_ms div window_ms)
  *   - daily:          "2015-03-14"
  *   - monthly:        "2015-03"
  *   - yearly:         "2015"
  */
object TimeIndex {
  val UsPerMs = 1000L
  val UsPerSec = 1000000L

  /** Window duration in ms for "30s" / "5m" / "1h" / "1d" style strings
    * (reference: pypond/index.py:357 window_duration).
    */
  def durationMs(win: String): Long = {
    val m = "([0-9]+)([smhd])".r.findFirstMatchIn(win).getOrElse(
      throw new IllegalArgumentException(s"bad window: $win"))
    val n = m.group(1).toLong
    val unit = m.group(2) match {
      case "s" => 1000L
      case "m" => 60L * 1000L
      case "h" => 3600L * 1000L
      case "d" => 86400L * 1000L
    }
    n * unit
  }

  def durationUs(win: String): Long = durationMs(win) * UsPerMs

  /** Window position (index suffix) of an epoch-µs timestamp. Floor
    * division (pypond's Python `//`, index.py:386) so pre-1970
    * timestamps land in the right bucket.
    */
  def posOf(tsUs: Column, win: String): Column = fldiv(tsUs, durationUs(win))

  /** "5m-NNN" style fixed-window index string.
    * reference: pypond/index.py:408 get_index_string.
    */
  def indexOf(tsUs: Column, win: String): Column =
    concat(lit(win + "-"), posOf(tsUs, win).cast("string"))

  /** Every fixed-window index string covering [beginUs, endUs] —
    * reference: pypond/index.py:439 get_index_string_list (the bucket
    * of `begin` through the bucket of `end`, inclusive). Floor
    * division, so pre-1970 ranges band consistently with [[posOf]].
    * Returns array<string>; inverted ranges (end < begin) yield an
    * empty array (sequence() would DESCEND otherwise).
    */
  def indexList(beginUs: Column, endUs: Column, win: String): Column = {
    val b = posOf(beginUs, win)
    val e = posOf(endUs, win)
    when(e < b, array().cast("array<string>"))
      .otherwise(transform(sequence(b, e),
        i => concat(lit(win + "-"), i.cast("string"))))
  }

  /** Begin of the window containing tsUs, in epoch µs. */
  def windowStartUs(tsUs: Column, win: String): Column =
    posOf(tsUs, win) * lit(durationUs(win))

  def windowEndUs(tsUs: Column, win: String): Column =
    (posOf(tsUs, win) + lit(1L)) * lit(durationUs(win))

  /** Epoch µs long -> Spark timestamp (used only for calendar
    * bucketing / display, never for bucket arithmetic).
    */
  def toTimestamp(tsUs: Column): Column = timestamp_micros(tsUs)

  /** Epoch ns long (nanosAsLong parquet read) -> canonical µs.
    * Floor division to match DuckDB's epoch_us on pre-1970 instants.
    */
  def nsToUs(tsNs: Column): Column = fldiv(tsNs, 1000L)

  /** Normalize a time column of any supported physical type to the
    * canonical epoch-µs long, keyed off the frame's actual schema:
    *
    *  - `LONG`           — TIMESTAMP(NANOS) surfaced by the
    *    `nanosAsLong` legacy parquet read → floor-div to µs;
    *  - `TIMESTAMP`      — `unix_micros` (exact, µs is Spark's native
    *    timestamp tick);
    *  - `TIMESTAMP_NTZ`  — wall-clock parquet (isAdjustedToUTC=false);
    *    interpreted as UTC via a cast under the session zone, which
    *    every graft session pins to UTC — the same reading DuckDB's
    *    `epoch_us` gives the raw value, so oracle parity holds.
    *
    * Lets one load path serve both generations of the driver's
    * testdata (events.ts was TIMESTAMP(NANOS), is now timestamp[us]).
    */
  def normalizeUs(df: org.apache.spark.sql.DataFrame, tsCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val c = df.schema(tsCol).dataType match {
      case LongType => nsToUs(col(tsCol))
      case TimestampType => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(s"$tsCol: unsupported time type $other")
    }
    df.withColumn(tsCol, c)
  }

  /** Calendar index strings (UTC). reference: pypond/index.py:486-530. */
  def dailyIndex(tsUs: Column): Column = date_format(toTimestamp(tsUs), "yyyy-MM-dd")
  def monthlyIndex(tsUs: Column): Column = date_format(toTimestamp(tsUs), "yyyy-MM")
  def yearlyIndex(tsUs: Column): Column = date_format(toTimestamp(tsUs), "yyyy")

  /** Calendar index strings in a NAMED zone — pypond's `utc=False`
    * local-time rollups (pypond/series.py:1278,1333,1388), with the
    * zone explicit because a cluster has no meaningful "local".
    * from_utc_timestamp shifts the instant to the zone's wall time
    * (DST-aware via the JVM tz database), so day/month boundaries land
    * where that zone's users expect; still pure column arithmetic
    * inside codegen, one expression per row.
    */
  private def tzWall(tsUs: Column, tz: String): Column =
    from_utc_timestamp(toTimestamp(tsUs), tz)
  def dailyIndexTz(tsUs: Column, tz: String): Column =
    date_format(tzWall(tsUs, tz), "yyyy-MM-dd")
  def monthlyIndexTz(tsUs: Column, tz: String): Column =
    date_format(tzWall(tsUs, tz), "yyyy-MM")
  def yearlyIndexTz(tsUs: Column, tz: String): Column =
    date_format(tzWall(tsUs, tz), "yyyy")
}

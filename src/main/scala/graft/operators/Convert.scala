package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeIndex
import org.apache.spark.sql.graft.Bridge.fldiv

/** Converter processor — switch between the three event shapes
  * (reference: pypond/processor/converter.py):
  *
  *   point Event        (ts)
  *   TimeRangeEvent     (ts_begin, ts_end)
  *   IndexedEvent       (idx string)
  *
  * All conversions are narrow projections (pure column arithmetic,
  * no shuffle).
  */
object Convert {

  /** Event -> TimeRangeEvent. alignment in {front, center, behind}
    * (converter.py:108-116); duration is a window string.
    */
  def eventToTimeRange(df: DataFrame, tsCol: String, win: String,
                       alignment: String = "center"): DataFrame = {
    val dur = TimeIndex.durationUs(win)
    val ts = col(tsCol)
    val (b, e) = alignment match {
      case "front"  => (ts, ts + lit(dur))
      case "center" => (ts - lit(dur / 2), ts + lit(dur / 2))
      case "behind" => (ts - lit(dur), ts)
      case a => throw new IllegalArgumentException(s"bad alignment: $a")
    }
    df.withColumn("ts_begin", b).withColumn("ts_end", e).drop(tsCol)
  }

  /** Event -> IndexedEvent (converter.py:128-131). */
  def eventToIndexed(df: DataFrame, tsCol: String, win: String): DataFrame =
    df.withColumn("idx", TimeIndex.indexOf(col(tsCol), win)).drop(tsCol)

  /** TimeRangeEvent -> Event. alignment in {lag = begin, center =
    * midpoint, lead = end} (converter.py:152-161).
    */
  def timeRangeToEvent(df: DataFrame, beginCol: String = "ts_begin",
                       endCol: String = "ts_end",
                       alignment: String = "center"): DataFrame = {
    val ts = alignment match {
      case "lag"    => col(beginCol)
      case "center" => fldiv(col(beginCol) + col(endCol), 2L)
      case "lead"   => col(endCol)
      case a => throw new IllegalArgumentException(s"bad alignment: $a")
    }
    df.withColumn("ts", ts).drop(beginCol, endCol)
  }

  /** IndexedEvent -> TimeRangeEvent: an index string's [begin, end)
    * (index.py range_from_index_string, fixed windows).
    */
  def indexedToTimeRange(df: DataFrame, idxCol: String = "idx",
                         win: String): DataFrame = {
    val dur = TimeIndex.durationUs(win)
    // lazy prefix keeps the sign of a negative position ("5m--3" =
    // separator dash + minus) and tolerates any window spelling that
    // durationMs accepts (pypond's window regex is prefix-matched too)
    val pos = regexp_extract(col(idxCol), "^.*?-(-?[0-9]+)$", 1)
      .cast("long")
    df.withColumn("ts_begin", pos * lit(dur))
      .withColumn("ts_end", (pos + 1) * lit(dur))
      .drop(idxCol)
  }
}

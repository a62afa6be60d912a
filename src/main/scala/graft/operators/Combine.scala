package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-series combination — Event.merge / Event.combine / Event.sum /
  * Event.avg (reference: pypond/event.py:751-1133) and
  * TimeSeries.timeseries_list_{merge,sum,reduce} (pypond/series.py:
  * 1527-1628), plus the distributed equivalent of at_time/bisect
  * (pypond/series.py:335,395) as an as-of join.
  */
object Combine {

  /** Event.merge for series with DISJOINT value columns: events sharing
    * (key, ts) contribute their columns to one output event. Full outer
    * join on the (key, ts) grain — at scale both sides hash-shuffle on
    * the same key so this is a single co-partitioned merge join.
    */
  def merge(dfs: Seq[DataFrame], on: Seq[String]): DataFrame =
    dfs.reduce(_.join(_, on, "full_outer"))

  /** Event.combine/sum/avg: union the series and pointwise-reduce each
    * value column at the same (key, ts). One partial-agg shuffle.
    */
  def reduceSeries(dfs: Seq[DataFrame], on: Seq[String],
                   aggs: Seq[Column]): DataFrame = {
    val u = dfs.reduce(_.unionByName(_))
    u.groupBy(on.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** As-of join: for every left row, the latest right row with
    * right.ts <= left.ts within the same key. This is the distributed
    * form of TimeSeries.at_time/bisect lookups.
    *
    * Implementation: tag + union + `last(..., ignoreNulls)` over a
    * (key, ts)-ordered window, then keep left rows. ONE shuffle on the
    * series key, no range cross-join — survives 100 TB where a
    * broadcast-range join would not.
    *
    * @param leftCols  payload columns of `left` carried to the output
    * @param rightVals value columns of `right`; emitted as `asof_<name>`
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, leftCols: Seq[String], rightVals: Seq[String]): DataFrame = {
    // Right values travel as ONE struct: the struct is null exactly on
    // left rows, so last(ignoreNulls) matches the latest right ROW —
    // including one whose value fields are genuinely null (a bare
    // last(value, ignoreNulls) would skip past it to an older row).
    val rStruct = struct(rightVals.map(col): _*)
    val rNullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(rightVals.map(v => right.schema(v))))
    val lTagged = left.select(
      (keyCols :+ tsCol).map(col) ++
        leftCols.map(col) :+
        rNullStruct.as("__r") :+
        lit(1).as("__is_l"): _*)
    val rTagged = right.select(
      (keyCols :+ tsCol).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r") :+
        lit(0).as("__is_l"): _*)

    // Right rows sort before left rows at equal ts => "<=" semantics.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))

    filled.where(col("__is_l") === 1)
      .select((keyCols :+ tsCol).map(col) ++ leftCols.map(col) ++
        rightVals.map(v => col(s"__asof.$v").as(s"asof_$v")): _*)
  }

  /** [[asof]] with a MAX-STALENESS tolerance (pandas merge_asof's
    * `tolerance`, kdb's within-window aj): a match older than
    * `toleranceUs` is rejected — the lookup returns null rather than
    * a quote/reading so stale it is misinformation. The matched ts
    * travels inside the carried struct, so the staleness test is one
    * scan-side comparison after the same single-shuffle union +
    * last(ignoreNulls) window; output adds `asof_ts` (the matched
    * right timestamp, null when no match is fresh enough).
    */
  def asofTolerance(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                    tsCol: String, leftCols: Seq[String],
                    rightVals: Seq[String], toleranceUs: Long): DataFrame = {
    val rStruct = struct(col(tsCol).as("__rts") +: rightVals.map(col): _*)
    val rNullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        right.schema(tsCol).copy(name = "__rts") +:
          rightVals.map(v => right.schema(v))))
    val lTagged = left.select(
      (keyCols :+ tsCol).map(col) ++
        leftCols.map(col) :+
        rNullStruct.as("__r") :+
        lit(1).as("__is_l"): _*)
    val rTagged = right.select(
      (keyCols :+ tsCol).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r") :+
        lit(0).as("__is_l"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    val fresh = col("__asof").isNotNull &&
      col(tsCol) - col("__asof.__rts") <= toleranceUs
    filled.where(col("__is_l") === 1)
      .select((keyCols :+ tsCol).map(col) ++ leftCols.map(col) ++
        rightVals.map(v => when(fresh, col(s"__asof.$v")).as(s"asof_$v")) :+
        when(fresh, col("__asof.__rts")).as("asof_ts"): _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row
    * with right.ts >= left.ts within the same key — the
    * "next reading after this point" lookup ([[asof]]'s mirror).
    * Same single-shuffle shape: tag + union + first(ignoreNulls) over
    * a following frame; left rows sort before right rows at equal ts,
    * so an equal-ts right row qualifies (>= semantics).
    */
  def asofNext(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, leftCols: Seq[String],
               rightVals: Seq[String]): DataFrame = {
    val rStruct = struct(rightVals.map(col): _*)
    val rNullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(rightVals.map(v => right.schema(v))))
    val lTagged = left.select(
      (keyCols :+ tsCol).map(col) ++
        leftCols.map(col) :+
        rNullStruct.as("__r") :+
        lit(1).as("__is_l"): _*)
    val rTagged = right.select(
      (keyCols :+ tsCol).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r") :+
        lit(0).as("__is_l"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__is_l").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = lTagged.unionByName(rTagged)
      .withColumn("__asof", first(col("__r"), ignoreNulls = true).over(w))

    filled.where(col("__is_l") === 1)
      .select((keyCols :+ tsCol).map(col) ++ leftCols.map(col) ++
        rightVals.map(v => col(s"__asof.$v").as(s"next_$v")): _*)
  }
}

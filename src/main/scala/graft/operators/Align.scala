package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeIndex
import org.apache.spark.sql.graft.Bridge.fldiv

/** Align — snap an irregular series onto window boundaries by
  * interpolation (reference: pypond/processor/align.py).
  *
  * Semantics preserved from the reference:
  *  - boundaries are emitted only BETWEEN consecutive input events:
  *    positions prevPos+1 .. curPos (align.py:105-119 skips the first);
  *  - the very first event of a series is emitted only if it already
  *    sits exactly on a boundary (align.py:134-139);
  *  - "linear" interpolates on time, "hold" carries the previous value
  *    (align.py:141-201);
  *  - if a single gap produces more than `limit` boundaries, those
  *    boundary values are null (align.py:222-230).
  *
  * Spark-first shape: window functions partitioned by the series key +
  * `sequence`/`explode` for boundary generation — one shuffle on the
  * key, per-partition linear scan, no driver state. At 100 TB this
  * scales with the number of series, and boundary explosion happens
  * after the shuffle so skew is bounded by gap length, not data size.
  */
object Align {

  def apply(df: DataFrame, tsCol: String, valCols: Seq[String],
            keyCols: Seq[String], win: String, method: String = "linear",
            limit: Option[Int] = None): DataFrame = {
    require(method == "linear" || method == "hold", s"bad method: $method")
    val durUs = TimeIndex.durationUs(win)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))

    val withPrev = df
      .select((keyCols :+ tsCol).map(col) ++ valCols.map(col): _*)
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumns(valCols.map(v => s"__prev_$v" -> lag(col(v), 1).over(w)).toMap)

    // floor division: pre-1970 events must land in the window BELOW zero
    val curPos = fldiv(col(tsCol), durUs)
    val prevPos = fldiv(col("__prev_ts"), durUs)

    // Interior boundaries between consecutive events.
    val exploded = withPrev
      .where(col("__prev_ts").isNotNull && curPos > prevPos)
      .withColumn("__n_bounds", (curPos - prevPos).cast("int"))
      .withColumn("__pos", explode(sequence(prevPos + lit(1L), curPos)))
      .withColumn("__b_ts", col("__pos") * lit(durUs))
    val overLimit = limit.map(l => col("__n_bounds") > lit(l)).getOrElse(lit(false))
    val frac = (col("__b_ts") - col("__prev_ts")).cast("double") /
      (col(tsCol) - col("__prev_ts")).cast("double")
    val interior = exploded.select(
      keyCols.map(col) ++ Seq(col("__b_ts").as(tsCol)) ++ valCols.map { v =>
        val value = method match {
          case "hold"   => col(s"__prev_$v")
          case "linear" => col(s"__prev_$v") + (col(v) - col(s"__prev_$v")) * frac
        }
        when(overLimit, lit(null)).otherwise(value).as(v)
      }: _*)

    // First event of each series, only when already exactly aligned.
    val firstAligned = withPrev
      .where(col("__prev_ts").isNull && pmod(col(tsCol), lit(durUs)) === 0)
      .select((keyCols :+ tsCol).map(col) ++ valCols.map(col): _*)

    interior.unionByName(firstAligned)
  }
}

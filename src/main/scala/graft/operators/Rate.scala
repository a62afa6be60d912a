package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeIndex

/** Rate — per-second derivative between consecutive events, emitted as
  * TimeRangeEvents (reference: pypond/processor/rate.py:86-125).
  *
  * Output: keyCols, ts_begin, ts_end (epoch µs of the pair) and one
  * `<field>_rate` column per input field, where
  *   rate = (cur - prev) / Δt_seconds.
  * With allowNegative=false a negative rate becomes null
  * (rate.py:120-124 — for monotonic counters).
  *
  * One shuffle on the series key; `lag` over the key-partitioned window
  * replaces the reference's driver-side previous-event state.
  */
object Rate {

  def apply(df: DataFrame, tsCol: String, valCols: Seq[String],
            keyCols: Seq[String], allowNegative: Boolean = true): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))

    val withPrev = df
      .select((keyCols :+ tsCol).map(col) ++ valCols.map(col): _*)
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumns(valCols.map(v => s"__prev_$v" -> lag(col(v), 1).over(w)).toMap)
      .where(col("__prev_ts").isNotNull)

    val dtSec = (col(tsCol) - col("__prev_ts")).cast("double") /
      lit(TimeIndex.UsPerSec.toDouble)
    val rates = valCols.map { v =>
      val r = (col(v) - col(s"__prev_$v")) / dtSec
      val guarded = if (allowNegative) r else when(r < 0, lit(null)).otherwise(r)
      guarded.as(s"${v}_rate")
    }

    withPrev.select(
      keyCols.map(col) ++
        Seq(col("__prev_ts").as("ts_begin"), col(tsCol).as("ts_end")) ++
        rates: _*)
  }

  /** Counter-semantics rate for monotonic telemetry counters (SNMP
    * octets, packet counts — the data pypond was built for). pypond's
    * allow_negative=false (rate.py:120-124) just NULLS a negative
    * rate; a real counter that went down has RESET, and the post-reset
    * value is itself the new delta (the counter restarted at 0). So:
    * delta = cur - prev, or cur when cur < prev; rate = delta / Δt_s,
    * plus a `reset` flag per emitted pair. Same single-shuffle lag
    * shape as [[apply]].
    */
  def counter(df: DataFrame, tsCol: String, valCol: String,
              keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val withPrev = df
      .select((keyCols :+ tsCol :+ valCol).map(col): _*)
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__prev_v", lag(col(valCol), 1).over(w))
      .where(col("__prev_ts").isNotNull)
    val dtSec = (col(tsCol) - col("__prev_ts")).cast("double") /
      lit(TimeIndex.UsPerSec.toDouble)
    val delta = when(col(valCol) < col("__prev_v"), col(valCol))
      .otherwise(col(valCol) - col("__prev_v"))
    withPrev.select(
      keyCols.map(col) ++ Seq(
        col("__prev_ts").as("ts_begin"), col(tsCol).as("ts_end"),
        round(delta / dtSec, 6).as("rate"),
        (col(valCol) < col("__prev_v")).as("reset")): _*)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt double-exponential smoothing — the unbounded form of
  * graft.operators.Trend.holt, same bounded-span contract: each
  * emitted row folds l' = αx + (1-α)(l+b); b' = β(l'−l) + (1-β)b over
  * the trailing `span` values of its series, seeded with (oldest
  * value, 0).
  *
  * State per key is the last `span` values — bounded regardless of
  * stream length. Re-folding per event (rather than carrying one
  * running (l, b)) is what makes the result IDENTICAL to the batch
  * window operator, so backfill and live stream produce the same
  * level/trend columns. The fold's float order matches HoltAgg's
  * update trees exactly.
  */
object StreamHolt {

  final case class Ev(user_id: Long, ts: Long, value: Double)
  final case class Hist(vals: Seq[Double])
  final case class HoltOut(user_id: Long, ts: Long, value: Double,
                           level: Double, trend: Double)

  private def floor6(x: Double): Double = math.floor(x * 1e6) / 1e6

  def apply(spark: SparkSession, events: Dataset[Ev],
            alpha: Double = 0.3, beta: Double = 0.2,
            span: Int = 20): Dataset[HoltOut] = {
    import spark.implicits._

    def step(user: Long, batch: Iterator[Ev],
             state: GroupState[Hist]): Iterator[HoltOut] = {
      // (ts, value) order = the batch operator's window order
      val sorted = batch.toVector.sortBy(e => (e.ts, e.value))
      var hist = state.getOption.map(_.vals.toVector).getOrElse(Vector.empty)
      val out = sorted.map { e =>
        hist = (hist :+ e.value).takeRight(span)
        var l = hist.head
        var b = 0.0
        hist.tail.foreach { x =>
          val ln = x * alpha + (l + b) * (1.0 - alpha)
          b = (ln - l) * beta + b * (1.0 - beta)
          l = ln
        }
        HoltOut(user, e.ts, e.value, floor6(l), floor6(b))
      }
      state.update(Hist(hist))
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}

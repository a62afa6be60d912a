package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA — the unbounded form of graft.operators.Trend.ewma,
  * same bounded-span contract: each emitted row is the recursive fold
  * s := (1-alpha)*s + alpha*x over the trailing `span` values of its
  * series, seeded with the window's oldest value.
  *
  * State per key is the last `span` values (a few hundred bytes) —
  * bounded regardless of stream length. The fold repeats per event
  * rather than carrying one running s, which is what makes the result
  * IDENTICAL to the batch operator (a running s never forgets history;
  * the bounded fold does, by design), so batch backfill and the live
  * stream produce the same column.
  */
object StreamEwma {

  final case class Ev(user_id: Long, ts: Long, value: Double)
  final case class Hist(vals: Seq[Double])
  final case class EwmaOut(user_id: Long, ts: Long, value: Double, ewma: Double)

  /** µ-unit floor — Trend.ewma's output contract (tie-free across
    * engines, unlike round()).
    */
  private def floor6(x: Double): Double = math.floor(x * 1e6) / 1e6

  def apply(spark: SparkSession, events: Dataset[Ev],
            alpha: Double = 0.3, span: Int = 20): Dataset[EwmaOut] = {
    import spark.implicits._
    val keep = 1.0 - alpha

    def step(user: Long, batch: Iterator[Ev],
             state: GroupState[Hist]): Iterator[EwmaOut] = {
      // (ts, value) order = the batch operator's window order
      val sorted = batch.toVector.sortBy(e => (e.ts, e.value))
      var hist = state.getOption.map(_.vals.toVector).getOrElse(Vector.empty)
      val out = sorted.map { e =>
        hist = (hist :+ e.value).takeRight(span)
        val ew = hist.tail.foldLeft(hist.head)((acc, x) => acc * keep + x * alpha)
        EwmaOut(user, e.ts, e.value, floor6(ew))
      }
      state.update(Hist(hist))
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming pad-fill — the unbounded form of graft.operators.Fill.pad
  * (reference: pypond/processor/filler.py _pad_and_zero): a missing
  * (null/NaN) value takes the last seen good value of its series,
  * optionally only for the first `fillLimit` consecutive misses per
  * gap (filler.py key_count).
  *
  * State per series key is O(1) — the last good value plus the current
  * miss-run length — so an unbounded stream over millions of series
  * holds one tiny state record per key in the state store, and a
  * restart resumes mid-gap without refilling from scratch. Parity with
  * the batch window formulation is spec-enforced (StreamFillSpec).
  */
object StreamFill {

  final case class Ev(user_id: Long, ts: Long, value: Option[Double])
  final case class PadState(lastGood: Option[Double], missRun: Int)
  final case class Out(user_id: Long, ts: Long, value: Option[Double])

  def apply(spark: SparkSession, events: Dataset[Ev],
            fillLimit: Option[Int] = None): Dataset[Out] = {
    import spark.implicits._

    def good(v: Option[Double]): Boolean = v.exists(x => !x.isNaN)

    def step(user: Long, batch: Iterator[Ev],
             state: GroupState[PadState]): Iterator[Out] = {
      var st = state.getOption.getOrElse(PadState(None, 0))
      val out = batch.toVector.sortBy(_.ts).map { e =>
        if (good(e.value)) {
          st = PadState(e.value, 0)
          Out(user, e.ts, e.value)
        } else {
          st = st.copy(missRun = st.missRun + 1)
          // miss #r of a gap fills only while r <= fillLimit — exactly
          // the batch operator's rn - last_good_rn <= lim condition; no
          // previous good value means the miss stays null either way
          val fill = if (fillLimit.forall(st.missRun <= _)) st.lastGood else None
          Out(user, e.ts, fill)
        }
      }
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}

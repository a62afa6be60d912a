package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift alarms — the unbounded form of `Trend.cusum`
  * (Page's cumulative sum): S := max(0, S + (x - target)), emit while
  * S > h. The batch operator rewrites the recursion as prefix-sum +
  * running-min window algebra; the stream runs the recursion DIRECTLY,
  * because here it is the cheaper shape: state per series key is ONE
  * µ-unit long — O(1) and bounded regardless of stream length.
  *
  * Values fold as tie-free µ-unit floors (floor(x·1e6) BIGINT),
  * exactly like the batch side, so a backfill through Trend.cusum and
  * the live stream agree bit-for-bit (spec-pinned).
  */
object StreamCusum {

  final case class Ev(user_id: Long, ts: Long, value: Double)
  final case class Sum(sUs: Long)
  final case class Alarm(user_id: Long, ts: Long, value: Double, cusum: Double)

  def apply(spark: SparkSession, events: Dataset[Ev],
            target: Double, h: Double): Dataset[Alarm] = {
    import spark.implicits._
    val targetUs = math.round(target * 1e6)
    val hUs = math.round(h * 1e6)

    def step(user: Long, batch: Iterator[Ev],
             state: GroupState[Sum]): Iterator[Alarm] = {
      // (ts, value) order mirrors the batch window's equal-ts tie-break
      val sorted = batch.toVector.sortBy(e => (e.ts, e.value))
      var s = state.getOption.map(_.sUs).getOrElse(0L)
      var out = Vector.empty[Alarm]
      sorted.foreach { e =>
        s = math.max(0L, s + math.floor(e.value * 1e6).toLong - targetUs)
        if (s > hUs) out :+= Alarm(user, e.ts, e.value, s.toDouble / 1e6)
      }
      state.update(Sum(s))
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("banded pairs == naive inequality join, each pair exactly once") {
    import spark.implicits._
    // intervals spanning 0-3 buckets (bucket = 100), points across all
    val iv = Seq((1L, 10L, 0L, 250L), (1L, 11L, 90L, 110L),
      (1L, 12L, 300L, 301L), (2L, 20L, 0L, 50L), (2L, 21L, 100L, 100L))
      .toDF("k", "iv_id", "begin", "end")
    val pts = (0L until 400L by 7L).map(t => (1L, t)) ++
      (0L until 400L by 13L).map(t => (2L, t))
    val p = pts.toDF("k", "pt")
    val got = RangeJoin.pairs(iv, p, Seq("k"), "begin", "end", "pt", 100L)
      .select("k", "iv_id", "pt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = iv.as[(Long, Long, Long, Long)].collect().flatMap {
      case (k, id, b, e) =>
        pts.filter { case (pk, t) => pk == k && t >= b && t < e }
          .map { case (_, t) => (k, id, t) }
    }.toSeq
    // sorted Seq compare (not Set): also proves no pair is duplicated
    assert(got.sorted == want.sorted)
    // the empty interval [100,100) matched nothing
    assert(!got.exists(_._2 == 21L))
  }

  test("banding floors negative instants consistently (pre-1970)") {
    import spark.implicits._
    val iv = Seq((1L, 1L, -150L, 50L)).toDF("k", "iv_id", "begin", "end")
    val p = Seq((1L, -150L), (1L, -1L), (1L, 0L), (1L, 49L), (1L, 50L))
      .toDF("k", "pt")
    val got = RangeJoin.pairs(iv, p, Seq("k"), "begin", "end", "pt", 100L)
      .select("pt").as[Long].collect().toSet
    assert(got == Set(-150L, -1L, 0L, 49L))
  }
}

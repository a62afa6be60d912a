package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Align, Rate}
import graft.sources.Wire

/** Replays the reference's own test fixtures and expected values
  * (reference: tests/align_test.py SIMPLE_GAP_DATA / RATE) through the
  * wire-format reader and the align/rate operators — exact-value
  * fidelity against pypond's published assertions.
  */
class ReferenceFixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // tests/align_test.py:14 SIMPLE_GAP_DATA (time in epoch ms)
  private val simpleGapWire =
    """{"name": "traffic", "utc": true, "columns": ["time", "value"],
      |"points": [[1471824030000, 0.75], [1471824105000, 2],
      |[1471824210000, 1], [1471824390000, 1], [1471824510000, 3],
      |[1471824525000, 5]]}""".stripMargin.replace("\n", " ")

  private def simpleSeries = Wire.parse(spark, Seq(simpleGapWire))

  test("align linear reproduces align_test.py:242-250 exactly") {
    val out = Align(simpleSeries.df, "ts", Seq("value"), Seq("name"), "1m",
      "linear").orderBy("ts").collect()
    val want = Seq(1.25, 1.8571428571428572, 1.2857142857142856,
      1.0, 1.0, 1.0, 1.5, 2.5)
    assert(out.length == 8)
    assert(out.map(_.getDouble(2)).toSeq == want)
  }

  test("align hold reproduces align_test.py:257-265 exactly") {
    val out = Align(simpleSeries.df, "ts", Seq("value"), Seq("name"), "1m",
      "hold").orderBy("ts").collect()
    assert(out.map(_.getDouble(2)).toSeq ==
      Seq(0.75, 2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0))
  }

  test("align linear limit=2 nulls the over-limit gap (align_test.py:282-292)") {
    val out = Align(simpleSeries.df, "ts", Seq("value"), Seq("name"), "1m",
      "linear", Some(2)).orderBy("ts").collect()
    val got = out.map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(got == Seq(Some(1.25), Some(1.8571428571428572),
      Some(1.2857142857142856), None, None, None, Some(1.5), Some(2.5)))
  }

  // tests/clean_test.py:335 linear-fill fixture (nested
  // direction.in/out paths map to flat in/out columns in graft)
  test("linear fill reproduces clean_test.py:357-371 (within 1 ulp)") {
    import spark.implicits._
    val rows = Seq(
      (1400425947000000L, Some(1.0), Some(2.0)),
      (1400425948000000L, None, None),
      (1400425949000000L, None, None),
      (1400425950000000L, Some(3.0), None),
      (1400425960000000L, None, None),
      (1400425970000000L, Some(5.0), Some(12.0)),
      (1400425980000000L, Some(6.0), Some(13.0)))
      .toDF("ts", "in", "out")
    val filled = graft.operators.Fill.linear(
      graft.operators.Fill.linear(rows, "ts", "in", Nil), "ts", "out", Nil)
      .orderBy("ts").collect()
    val wantIn = Seq(1.0, 1.6666666666666665, 2.333333333333333, 3.0, 4.0, 5.0, 6.0)
    val wantOut = Seq(2.0, 2.4347826086956523, 2.8695652173913047,
      3.304347826086957, 7.6521739130434785, 12.0, 13.0)
    // pypond chains interpolation from previously-FILLED points; graft
    // interpolates from the good endpoints — same line, so equal to 1 ulp
    filled.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(1) - wantIn(i)) < 1e-12, s"in[$i]")
      assert(math.abs(r.getDouble(2) - wantOut(i)) < 1e-12, s"out[$i]")
    }
  }

  // tests/align_test.py:52 RATE fixture
  test("rate magnitude reproduces align_test.py test_rate_mag") {
    val pts = Seq(0 -> 1, 30000 -> 3, 60000 -> 10, 90000 -> 40, 120000 -> 70,
      150000 -> 130, 180000 -> 190, 210000 -> 220, 240000 -> 300,
      270000 -> 390, 300000 -> 510)
    val wire = s"""{"name": "traffic", "utc": true, "columns": ["time", "in"],
      "points": [${pts.map(p => s"[${p._1}, ${p._2}]").mkString(", ")}]}"""
    val ts = Wire.parse(spark, Seq(wire))
    val out = Rate(ts.df, "ts", Seq("in"), Seq("name")).orderBy("ts_begin").collect()
    assert(out.length == pts.length - 1)
    def rateAt(i: Int): Double = out(i).getDouble(3)
    assert(rateAt(2) == 1.0 && rateAt(3) == 1.0 && rateAt(4) == 2.0 &&
      rateAt(8) == 3.0 && rateAt(9) == 4.0)
  }

  // tests/index_test.py:197 window_duration + :206 get_index_string —
  // the canonical "5m-4754394" fixture shared by pypond AND pond.js
  test("index strings reproduce index_test.py fixtures exactly") {
    import graft.functions.TimeIndex
    assert(TimeIndex.durationMs("30s") == 30000L)
    assert(TimeIndex.durationMs("5m") == 300000L)
    // 2015-03-14T07:32:22Z = epoch ms 1426318342000
    val tUs = 1426318342000L * 1000L
    import spark.implicits._
    val got = Seq(tUs).toDF("ts")
      .select(TimeIndex.indexOf($"ts", "5m")).head.getString(0)
    assert(got == "5m-4754394")
  }

  // tests/index_test.py:235 get_index_string_list: [07:30:00, 08:29:59]
  // spans exactly 12 five-minute buckets 4754394..4754405
  test("index range spans reproduce index_test.py:235 (12 buckets)") {
    import graft.functions.TimeIndex
    import spark.implicits._
    val d1 = 1426318200000L * 1000L // 2015-03-14T07:30:00Z
    val d2 = 1426321799000L * 1000L // 2015-03-14T08:29:59Z
    val pos = Seq(d1, d2).toDF("ts")
      .select(TimeIndex.posOf($"ts", "5m")).as[Long].collect()
    assert(pos(0) == 4754394L && pos(1) == 4754405L)
    assert(pos(1) - pos(0) + 1 == 12)
  }

  // tests/series_test.py:670-700 test_non_fixed_rollups: daily/monthly/
  // yearly rollup with utc=False renders index strings in LOCAL time
  // (index.py:486-530 get_*_index_string(utc=False)). pypond uses the
  // machine's zone; graft names it — semantics replayed here for
  // America/New_York on SEPT_2014_DATA's first point 1409529600000 ms
  // = 2014-09-01T00:00Z, which is 2014-08-31 20:00 in New York.
  test("calendar rollups honor utc=False zone (series_test.py:670-700)") {
    import graft.functions.TimeIndex
    import spark.implicits._
    val df = Seq((1409529600000L * 1000L, 80.0)).toDF("ts", "value")
    def idx(c: org.apache.spark.sql.Column): String =
      df.select(c).head.getString(0)
    // utc=True default strings
    assert(idx(TimeIndex.dailyIndex($"ts")) == "2014-09-01")
    assert(idx(TimeIndex.monthlyIndex($"ts")) == "2014-09")
    // utc=False (zone-named): the instant falls on the previous local day
    assert(idx(TimeIndex.dailyIndexTz($"ts", "America/New_York")) == "2014-08-31")
    assert(idx(TimeIndex.monthlyIndexTz($"ts", "America/New_York")) == "2014-08")
    assert(idx(TimeIndex.yearlyIndexTz($"ts", "America/New_York")) == "2014")
    // DST-aware: the same 04:30 UTC clock time is local day-15 under
    // EDT (UTC-4, July) but still local day-14 under EST (UTC-5, Jan)
    val july = Seq(1405398600000L * 1000L).toDF("ts") // 2014-07-15T04:30Z
    val jan = Seq(1389760200000L * 1000L).toDF("ts")  // 2014-01-15T04:30Z
    assert(july.select(TimeIndex.dailyIndexTz($"ts", "America/New_York"))
      .head.getString(0) == "2014-07-15")
    assert(jan.select(TimeIndex.dailyIndexTz($"ts", "America/New_York"))
      .head.getString(0) == "2014-01-14")
  }

  // tests/range_test.py:293-455 — the TimeRange algebra semantics,
  // replayed on the same 2010 instants (parsed as UTC; the fixtures
  // are zone-relative so only the ordering matters)
  test("TimeRange algebra reproduces range_test.py:293-455") {
    import graft.ts.TimeRange
    def t(s: String): Long =
      java.time.Instant.parse(s"${s.take(10)}T${s.drop(11)}:00Z")
        .toEpochMilli * 1000L
    def r(b: String, e: String) = TimeRange(t(b), t(e))

    // overlap: disjoint ranges no, partially-overlapping yes (both ways)
    assert(!r("2010-01-01 12:00", "2010-02-01 12:00")
      .overlaps(r("2010-03-01 12:00", "2010-04-01 12:00")))
    assert(!r("2010-03-01 12:00", "2010-04-01 12:00")
      .overlaps(r("2010-01-01 12:00", "2010-02-01 12:00")))
    assert(r("2010-01-01 12:00", "2010-09-01 12:00")
      .overlaps(r("2010-08-01 12:00", "2010-11-01 12:00")))
    assert(r("2010-08-01 12:00", "2010-11-01 12:00")
      .overlaps(r("2010-01-01 12:00", "2010-09-01 12:00")))
    // containment: complete yes, partial overlap no
    assert(r("2010-01-01 12:00", "2010-09-01 12:00")
      .contains(r("2010-03-01 12:00", "2010-06-01 12:00")))
    assert(!r("2010-01-01 12:00", "2010-09-01 12:00")
      .contains(r("2010-06-01 12:00", "2010-12-01 12:00")))
    // time containment: before / during / after
    val jun_aug = r("2010-06-01 12:00", "2010-08-01 12:00")
    assert(!jun_aug.containsTime(t("2010-01-15 12:00")))
    assert(jun_aug.containsTime(t("2010-07-15 12:00")))
    assert(!jun_aug.containsTime(t("2010-12-15 12:00")))
    // within: asymmetric
    val inner = r("2010-06-01 12:00", "2010-07-01 12:00")
    val outer = r("2010-05-01 12:00", "2010-08-01 12:00")
    assert(inner.within(outer) && !outer.within(inner))
    // extents covers both
    val ext = r("2010-05-01 12:00", "2010-07-01 12:00")
      .extents(r("2010-06-01 12:00", "2010-08-01 12:00"))
    assert(ext == r("2010-05-01 12:00", "2010-08-01 12:00"))
    // intersection: none when disjoint; clipped when partial;
    // the smaller range when surrounded (both directions)
    val jan_jun = r("2010-01-01 12:00", "2010-06-01 12:00")
    assert(jan_jun
      .intersection(r("2010-07-15 12:00", "2010-08-15 12:00")).isEmpty)
    assert(jan_jun.intersection(r("2010-05-01 12:00", "2010-07-01 12:00"))
      .contains(r("2010-05-01 12:00", "2010-06-01 12:00")))
    val inside = r("2010-02-01 12:00", "2010-04-01 12:00")
    assert(jan_jun.intersection(inside).contains(inside))
    assert(inside.intersection(jan_jun).contains(inside))
  }

  // tests/series_test.py:707-800 — every percentile interpolation
  // method's exact published value on the sensor fixture
  test("percentile methods reproduce series_test.py:707-800 exactly") {
    import spark.implicits._
    import graft.functions.Aggs
    val temps = Seq(22.3, 32.4, 12.1, 76.8, 87.3, 54.6, 45.5, 87.9)
    val df = temps.toDF("temperature")
    def pm(p: Double, m: String): Double =
      df.agg(Aggs.percentileMethod($"temperature", p, m)).head.getDouble(0)
    def lin(p: Double): Double =
      df.agg(org.apache.spark.sql.functions
        .percentile($"temperature", org.apache.spark.sql.functions.lit(p)))
        .head.getDouble(0)
    assert(lin(0.5) == 50.05)
    assert(lin(0.95) == 87.69)
    assert(math.abs(lin(0.99) - 87.858) < 1e-9) // float repr, ref asserts 87.858
    assert(pm(0.99, "lower") == 87.3)
    assert(pm(0.99, "higher") == 87.9)
    assert(pm(0.99, "nearest") == 87.9)
    assert(lin(0.0) == 12.1)
    assert(lin(1.0) == 87.9)
    // single point: every percentile is that point (series_test.py:750)
    val one = Seq(22.3).toDF("temperature")
    for (p <- Seq(0.0, 0.5, 1.0))
      assert(one.agg(org.apache.spark.sql.functions.percentile(
        $"temperature", org.apache.spark.sql.functions.lit(p)))
        .head.getDouble(0) == 22.3)
    // quantile(4) fixtures, every method (series_test.py:765-800)
    def quart(m: String): Seq[Double] =
      Seq(0.25, 0.5, 0.75).map(p => pm(p, m))
    // 29.875: Spark interpolates lo+(hi-lo)·f, numpy lo·(1-f)+hi·f —
    // same value to 4e-15; the oracle-facing queries round to 6dp
    Seq(0.25, 0.5, 0.75).map(lin).zip(Seq(29.875, 50.05, 79.425))
      .foreach { case (got, want) => assert(math.abs(got - want) < 1e-9) }
    assert(quart("lower") == Seq(22.3, 45.5, 76.8))
    assert(quart("higher") == Seq(32.4, 54.6, 87.3))
    assert(quart("nearest") == Seq(32.4, 54.6, 76.8))
    assert(Seq(0.25, 0.5, 0.75).map(p =>
      df.agg(Aggs.percentileMidpoint6($"temperature", p)).head.getDouble(0))
      == Seq(27.35, 50.05, 82.05))
  }

  // tests/clean_test.py:567-645 pad/zero fill_limit=2 over BOTH
  // columns of the canned missing-data series — every published
  // value, including the asymmetry: zero fills a LEADING gap (no
  // previous value needed), pad does not
  test("pad and zero fill limits reproduce clean_test.py:567-645") {
    import spark.implicits._
    import graft.operators.Fill
    val times = Seq(1400425947000L, 1400425948000L, 1400425949000L,
      1400425950000L, 1400425960000L, 1400425970000L, 1400425980000L,
      1400425990000L, 1400426000000L, 1400426010000L, 1400426020000L)
    val ins = Seq[java.lang.Double](1.0, null, null, 3.0, null, null, null,
      7.0, 8.0, 9.0, 10.0)
    val outs = Seq[java.lang.Double](null, null, null, 8.0, null, 12.0, 13.0,
      null, null, null, null)
    val df = times.indices.map(i => (1L, times(i), ins(i), outs(i)))
      .toDF("k", "ts", "in", "out")

    def col6(d: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Double]] =
      d.orderBy("ts").collect().map(r =>
        if (r.isNullAt(r.fieldIndex(c))) None
        else Some(r.getDouble(r.fieldIndex(c)))).toSeq

    val zeroed = Fill.zeroLimited(df, "ts", Seq("in", "out"), Seq("k"), 2)
    assert(col6(zeroed, "in") == Seq(Some(1.0), Some(0.0), Some(0.0),
      Some(3.0), Some(0.0), Some(0.0), None, Some(7.0), Some(8.0),
      Some(9.0), Some(10.0)))
    assert(col6(zeroed, "out") == Seq(Some(0.0), Some(0.0), None, Some(8.0),
      Some(0.0), Some(12.0), Some(13.0), Some(0.0), Some(0.0), None, None))

    val padded = Fill.pad(df, "ts", Seq("in", "out"), Seq("k"),
      fillLimit = Some(2))
    assert(col6(padded, "in") == Seq(Some(1.0), Some(1.0), Some(1.0),
      Some(3.0), Some(3.0), Some(3.0), None, Some(7.0), Some(8.0),
      Some(9.0), Some(10.0)))
    assert(col6(padded, "out") == Seq(None, None, None, Some(8.0), Some(8.0),
      Some(12.0), Some(13.0), Some(13.0), Some(13.0), None, None))
  }

  // tests/series_test.py:512-556 TRAFFIC_DATA_IN/OUT — merge aligns
  // columns at shared instants; list_sum doubles a series added to
  // itself. Exact published values.
  test("merge and list_sum reproduce series_test.py:512-556") {
    import spark.implicits._
    import graft.operators.Combine
    val tIn = Seq((1400425947000L, 52.0), (1400425948000L, 18.0),
      (1400425949000L, 26.0), (1400425950000L, 93.0)).toDF("ts", "in")
    val tOut = Seq((1400425947000L, 34.0), (1400425948000L, 13.0),
      (1400425949000L, 67.0), (1400425950000L, 91.0)).toDF("ts", "out")
    val merged = Combine.merge(Seq(tIn, tOut), Seq("ts"))
      .orderBy("ts").collect()
    // at(2): in=26, out=67
    assert(merged(2).getDouble(1) == 26.0 && merged(2).getDouble(2) == 67.0)
    assert(merged.length == 4)
    val summed = Combine.reduceSeries(Seq(tIn, tIn), Seq("ts"),
      Seq(sum($"in").as("in"))).orderBy("ts").collect()
    // at(0): 104, at(1): 36
    assert(summed(0).getDouble(1) == 104.0 && summed(1).getDouble(1) == 36.0)
  }
}

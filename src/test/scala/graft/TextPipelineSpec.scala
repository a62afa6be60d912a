package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, TextOps}

/** Hand-computed checks for the round-2 training-data operators
  * (normalize / PII scrub / split / stratified sample / vocab).
  */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("blocklistScreen counts terms and keeps exactly at the ppm bound") {
    val docs = Seq(
      (1L, "good clean text here"),
      (2L, "slow slow slow bad"),
      // 19 clean + 1 blocked = exactly 5% -> the <= bound KEEPS it
      (3L, (1 to 19).map(i => s"w$i").mkString(" ") + " slow"),
      (4L, "")).toDF("doc_id", "text")
    val got = graft.operators.TextOps
      .blocklistScreen(docs, Seq("slow", "skew", "stale")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
      .toMap
    assert(got(1L) == ((4L, 0L, Some(0.0), true)))
    assert(got(2L) == ((4L, 3L, Some(0.75), false)))
    assert(got(3L) == ((20L, 1L, Some(0.05), true)))
    assert(got(4L) == ((0L, 0L, None, true)))
  }

  test("bpeTrain learns merges in order with deterministic tie-breaks") {
    import spark.implicits._
    // l-o and o-w tie at 4; (l,o) wins lexicographically, then the
    // merged symbols chain: lo+w, then low+e
    val docs = Seq((1L, "low lower lowest low")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpeTrain(docs, steps = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "low", "e", 2L)))
  }

  test("bpeTrain merges leftmost-non-overlapping; stops when no pairs") {
    import spark.implicits._
    // "aaaa": (a,a) counts 3 overlapping sites but merges to "aa aa";
    // round 2 merges (aa,aa); round 3 has no pairs left -> 2 rows
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpeTrain(docs, steps = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeApply reports post-merge token counts and compression") {
    import spark.implicits._
    // merges (l,o),(lo,w),(low,e): low->1 token, lower->2, lowest->3
    val docs = Seq((1L, "low lower lowest low")).toDF("doc_id", "text")
    val r = graft.operators.TextOps.bpeApply(docs, steps = 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 17L, 7L)))
    assert(math.abs(r.getDouble(4) - 17.0 / 7.0) < 1e-6)
  }

  test("winnow: shared token runs share a fingerprint; short docs get 1") {
    def h(s: String) = TextOps.polyHashBytes(s.getBytes("UTF-8"))
    // doc 1 and 2 share the 6-token run "c d e f g h" = w + n - 1 tokens
    // (w=4, n=3), so winnowing GUARANTEES a common fingerprint
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y c d e f g h z"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val fps = TextOps.winnow(df, 3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    // doc 3 has 2 shingles (< w): exactly its global minimum survives
    assert(fps(3L) == Set(math.min(h("p q r"), h("q r s"))))
    // doc 1: 6 shingles, windows end at 4..6 -> each fp is a min of a
    // 4-run of its own shingle hashes
    val sh1 = (0 to 5).map(i =>
      h(Seq("a", "b", "c", "d", "e", "f", "g", "h").slice(i, i + 3).mkString(" ")))
    val want1 = (3 to 5).map(i => sh1.slice(i - 3, i + 1).min).toSet
    assert(fps(1L) == want1)
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val df = Seq((1L, "Hello,  World!  it IS: fine.")).toDF("doc_id", "text")
    val r = TextOps.normalize(df).select("norm_text", "n_chars_norm").head()
    assert(r.getString(0) == "hello world it is fine")
    assert(r.getLong(1) == 22L)
  }

  test("piiScrub redacts emails and phone shapes, counts matches") {
    val df = Seq(
      (1L, "mail bob@example.com or call +1 (555) 123-4567 now"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val out = TextOps.piiScrub(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") == 1)
    assert(out(0).getAs[Int]("n_phones") == 1)
    assert(out(0).getAs[String]("scrubbed") == "mail <email> or call <phone> now")
    assert(out(1).getAs[Int]("n_emails") == 0)
    assert(out(1).getAs[String]("scrubbed") == "no pii here")
  }

  test("hashSplit is deterministic, partition-stable, and ~80/10/10") {
    val df = spark.range(0, 1000).toDF("doc_id")
    val splits = Sampling.hashSplit(df, col("doc_id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == 1000L)
    assert(splits("train") > 700 && splits("train") < 900)
    // repartitioning must not change any assignment (rand() would)
    val a = Sampling.hashSplit(df, col("doc_id"))
      .select("doc_id", "split").collect().toSet
    val b = Sampling.hashSplit(df.repartition(7), col("doc_id"))
      .select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("stratified keeps per-stratum rates") {
    val df = (0 until 400).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", s"doc text $i"))
      .toDF("doc_id", "lang", "text")
    val kept = Sampling.stratified(df, col("lang"), col("text"),
      Map("en" -> 0), defaultPct = 100)
    val langs = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("en") && langs("de") == 200L)
  }

  test("vocab ranks by tf with token tiebreak and carries doc frequency") {
    val df = Seq((1L, "a b b"), (2L, "b c c")).toDF("doc_id", "text")
    val v = TextOps.vocab(df, topK = 10).orderBy("rank").collect()
    // b: tf 3 df 2; c: tf 2 df 1; a: tf 1 df 1
    assert(v.map(_.getAs[String]("token")).toSeq == Seq("b", "c", "a"))
    assert(v(0).getAs[Long]("tf") == 3L && v(0).getAs[Long]("df_docs") == 2L)
    assert(v(1).getAs[Long]("tf") == 2L && v(1).getAs[Long]("df_docs") == 1L)
  }

  test("tfidf scores rare terms above common ones, per doc") {
    // corpus of 2 docs: "b" appears in both (df 2), "a"/"c" in one (df 1)
    val df = Seq((1L, "a b b"), (2L, "b c c")).toDF("doc_id", "text")
    val r = TextOps.tfidf(df, perDoc = 2).orderBy("doc_id", "rank").collect()
    // doc 1: a -> 1*2/1 = 2.0 ; b -> 2*2/2 = 2.0 ; tie broken by token asc
    assert(r(0).getAs[String]("token") == "a")
    assert(r(0).getAs[Double]("score") == 2.0)
    assert(r(1).getAs[String]("token") == "b")
    // doc 2: c -> 2*2/1 = 4.0 beats b -> 1*2/2 = 1.0
    assert(r(2).getAs[String]("token") == "c")
    assert(r(2).getAs[Double]("score") == 4.0)
    assert(r(3).getAs[String]("token") == "b")
    assert(r(3).getAs[Double]("score") == 1.0)
  }

  test("sampleFrames fans out every-kth frame with deterministic refs") {
    val df = Seq((7L, "some payload text")).toDF("doc_id", "text")
    val h = graft.functions.HashImpl.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString("some payload text"))
    val nFrames = 1L + h % 8L
    val out = graft.operators.Multimodal.sampleFrames(spark, df, everyKth = 2)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == (0L until nFrames by 2L).toSeq)
    assert(out.forall(_.n_frames == nFrames))
    assert(out.forall(f => f.frame_ref == (h * 31L + f.frame_idx) % TextOps.HashMod))
  }
  test("topNgram finds the dominant bigram, char fraction, null when none") {
    val docs = Seq(
      (1L, "a b a b c"),          // "a b" x2 of 9 chars -> 6/9
      (2L, "x y z x y z"),        // "x y" and "y z" tie at 2 -> larger hash
      (3L, "hello")).toDF("doc_id", "text")
    def h(s: String) = TextOps.polyHashBytes(s.getBytes("UTF-8"))
    val tieWinner = if (h("y z") > h("x y")) "y z" else "x y"
    val got = TextOps.topNgram(docs, 2).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(got == Set(
      (1L, Some("a b"), 2L, math.rint(2.0 * 3 / 9 * 1e6) / 1e6),
      (2L, Some(tieWinner), 2L, math.rint(2.0 * 3 / 11 * 1e6) / 1e6),
      (3L, None, -1L, -1.0)))
  }

  test("sceneCuts: cuts exactly at signature changes, running shot ids") {
    // fixtures chosen to cover: a multi-scene video (slen 1 -> every
    // sampled frame cuts), a one-scene video (slen 3 spans both sampled
    // frames -> zero cuts), and a single-frame video (never a cut)
    val docs = Seq(
      (1L, "video two with more frames"), // n=5, slen=1: cuts at idx 2,4
      (2L, "some payload text"),          // n=3, slen=3: no cut
      (3L, "x")                           // n=1: single frame
    ).toDF("doc_id", "text")
    val got = graft.operators.Multimodal.sceneCuts(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 0L, false, 0L), (1L, 2L, true, 1L), (1L, 4L, true, 2L),
      (2L, 0L, false, 0L), (2L, 2L, false, 0L),
      (3L, 0L, false, 0L)))
    // signatures themselves mirror the stub arithmetic
    val sigs = graft.operators.Multimodal.sceneCuts(spark, docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def h(s: String) = TextOps.polyHashBytes(s.getBytes("UTF-8"))
    assert(sigs((2L, 2L)) ==
      (h("some payload text") * 31L + 2L / 3L) % TextOps.HashMod)
  }

  test("distinctNgrams: hand-counted ratios; short docs skip higher n") {
    // src A: "a b a b" -> 4 unigrams (2 distinct), 3 bigrams "a b","b a",
    // "a b" (2 distinct), 2 trigrams "a b a","b a b" (2 distinct)
    // src B: one 2-token doc + one 1-token doc -> 3 uni (2 distinct:
    // c, d, c), 1 bigram, NO trigrams at all (rows absent, not zero)
    val docs = Seq(
      (1L, "A", "a b a b"),
      (2L, "B", "c d"),
      (3L, "B", "c")).toDF("doc_id", "source", "text")
    val got = TextOps.distinctNgrams(docs, col("source")).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("A", 1) -> ((4L, 2L, 0.5)),
      ("A", 2) -> ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)),
      ("A", 3) -> ((2L, 2L, 1.0)),
      ("B", 1) -> ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)),
      ("B", 2) -> ((1L, 1L, 1.0))))
  }

  test("zipf: a planted 1/rank corpus fits slope ~ -1 with high r2") {
    // token t_r appears floor(1000/r) times, r = 1..20 — exact Zipf
    val text = (1 to 20).flatMap(r => Seq.fill(1000 / r)(s"t$r"))
      .mkString(" ")
    val got = TextOps.zipf(Seq((1L, text)).toDF("doc_id", "text"), topK = 20)
      .collect().head
    assert(got.getLong(0) == 20L)
    val slope = got.getDouble(1)
    val r2 = got.getDouble(3)
    // floor() quantization perturbs the fit slightly; the law must
    // still dominate
    assert(slope > -1.05 && slope < -0.95, s"slope $slope not ~ -1")
    assert(r2 > 0.99, s"r2 $r2")
  }

  test("pmiCollocations: a welded pair outranks frequent-but-independent") {
    // "new york" always adjacent (8x); "the" is everywhere so any
    // "the X" pair has low PMI; pairs under minCount are dropped
    val doc = (Seq.fill(8)("new york") ++ Seq.fill(12)("the x") ++
      Seq.fill(12)("the y")).mkString(" ")
    val got = TextOps.pmiCollocations(
      Seq((1L, doc)).toDF("doc_id", "text"), minCount = 5, topK = 10)
      .collect()
    val top = got.head
    assert((top.getString(0), top.getString(1)) == ("new", "york"))
    assert(top.getLong(2) == 8L)   // n_pair
    assert(top.getLong(3) == 8L && top.getLong(4) == 8L)  // marginals
    // every returned pair met the count floor
    assert(got.forall(_.getLong(2) >= 5L))
    // "new york" PMI must clearly exceed any "the *" pair's
    val theBest = got.filter(_.getString(0) == "the").map(_.getDouble(5))
    assert(theBest.nonEmpty && theBest.max < top.getDouble(5))
  }

  test("lmScoreKN: hand-computed KN probabilities; mass sums to 1 per context") {
    // corpus: "a b", "a b", "a c" -> c2(a,b)=2, c2(a,c)=1, c1(a)=3,
    // T(a)=2, cont(b)=cont(c)=1, B=2
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.lmScoreKN(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    // the same fixed left-associative double formula the operator uses
    def p(c2: Double, c1: Double, t1: Double, cont: Double, b: Double) =
      math.max(c2 - 0.75, 0.0) / c1 + 0.75 * t1 / c1 * cont / b
    val pb = p(2, 3, 2, 1, 2)
    val pc = p(1, 3, 2, 1, 2)
    assert(math.abs(pb + pc - 1.0) < 1e-12) // KN sums to 1 per context
    // micro-nat snap then negate: nb = 1 here, so the final round-6 is
    // the identity on the already-6dp quotient
    def nll(x: Double) = -Math.round(math.log(x) * 1e6).toDouble / 1e6
    assert(got(1L) == (1L, nll(pb)) && got(2L) == (1L, nll(pb)))
    assert(got(3L) == (1L, nll(pc)))
    assert(got(4L)._1 == 0L && got(4L)._2.isNaN)
  }

  test("novelty: first occurrence owns the gram, copies score zero") {
    val docs = Seq(
      (1L, "x y z w"),  // grams xyz, yzw -> both novel
      (2L, "x y z w"),  // exact copy -> 0 novel
      (3L, "x y z q"),  // xyz seen (doc 1), yzq novel -> 0.5
      (4L, "a b")       // < 3 tokens -> no grams, null ratio
    ).toDF("doc_id", "text")
    val got = TextOps.novelty(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got(1L) == (2L, 2L, 1.0))
    assert(got(2L) == (2L, 0L, 0.0))
    assert(got(3L) == (2L, 1L, 0.5))
    assert(got(4L)._1 == 0L && got(4L)._2 == 0L && got(4L)._3.isNaN)
  }
}

package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HashImpl
import graft.ts.TimeRange

/** Property checks over the pure kernels (no Spark session needed). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genRange: Gen[TimeRange] = for {
    b <- Gen.chooseNum(-1000000L, 1000000L)
    d <- Gen.chooseNum(0L, 1000000L)
  } yield TimeRange(b, b + d)

  test("TimeRange algebra invariants (pypond range.py semantics)") {
    check(Prop.forAll(genRange, genRange) { (a, b) =>
      // note: pypond's overlaps is NOT symmetric when ranges share an
      // endpoint ([0,10].overlaps([0,20]) is true but not vice versa) —
      // graft preserves that quirk, so only disjoint symmetry holds
      val sym = a.disjoint(b) == b.disjoint(a)
      val disjointNoOverlap = !(a.disjoint(b) && a.overlaps(b))
      // pypond quirk: full containment is NOT "overlaps"
      val containsNoOverlap = !(a.contains(b) && a.overlaps(b))
      val isect = a.intersection(b)
      val isectOk = if (a.disjoint(b)) isect.isEmpty else isect.nonEmpty
      val isectBounded = isect.forall(i =>
        i.durationUs <= math.min(a.durationUs, b.durationUs) &&
          a.contains(i) && b.contains(i))
      val extentsOk = a.extents(b).contains(a) && a.extents(b).contains(b)
      sym && disjointNoOverlap && containsNoOverlap && isectOk &&
        isectBounded && extentsOk
    })
  }

  private val genToken: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("shingleHashes(tokens, n) == polyHash of space-joined shingles") {
    check(Prop.forAll(Gen.listOf(genToken), Gen.chooseNum(1, 4)) { (toks, n) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = HashImpl.shingleHashes(arr, n).toLongArray().toSeq
      val want =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(ws =>
          HashImpl.polyHash(UTF8String.fromString(ws.mkString(" ")))).toSeq
      got == want
    })
  }

  test("polyHash: bytes fold == UTF8String fold on ASCII; unicode-safe") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      HashImpl.polyHash(UTF8String.fromString(s)) ==
        graft.operators.TextOps.polyHashBytes(s.getBytes("UTF-8"))
    })
    check(Prop.forAll(Gen.listOf(Gen.oneOf('a', 'é', '汉', 'ß', ' '))) { cs =>
      val s = cs.mkString
      val expected = {
        var acc = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          acc = (acc * 31L + cp) % HashImpl.Mod
          j += Character.charCount(cp)
        }
        acc
      }
      HashImpl.polyHash(UTF8String.fromString(s)) == expected
    })
  }

  test("simhash24 is permutation-invariant over token multisets") {
    check(Prop.forAll(Gen.nonEmptyListOf(genToken)) { toks =>
      def sh(ts: Seq[String]): Long = HashImpl.simhash24(
        new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any]))
      val shuffled = scala.util.Random.shuffle(toks)
      sh(toks) == sh(shuffled) && sh(toks) >= 0 && sh(toks) < (1L << 24)
    })
  }

  test("levBanded == classic full DP, any strings, any threshold") {
    def levRef(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) =
          if (a(i - 1) == b(j - 1)) d(i - 1)(j - 1)
          else 1 + math.min(math.min(d(i - 1)(j), d(i)(j - 1)), d(i - 1)(j - 1))
      d(a.length)(b.length)
    }
    val genS = Gen.oneOf(
      Gen.asciiPrintableStr,
      // near-dup shape: common prefix + divergent tail
      Gen.zip(Gen.asciiPrintableStr, Gen.asciiPrintableStr).map(p => p._1 + p._2),
      Gen.listOf(Gen.oneOf('a', 'b', ' ')).map(_.mkString))
    check(Prop.forAll(genS, genS, Gen.chooseNum(0, 30)) { (a, b, k) =>
      val want = { val d = levRef(a, b); if (d <= k) d else -1 }
      HashImpl.levBanded(
        UTF8String.fromString(a), UTF8String.fromString(b), k) == want
    })
  }

  test("autoPlanes: smallest p with n >> p <= target, floored at 4") {
    import graft.operators.Knn
    check(Prop.forAll(Gen.chooseNum(1L, 1L << 40)) { n =>
      val p = Knn.autoPlanes(n)
      p >= 4 && (n >> p) <= 125 && (p == 4 || (n >> (p - 1)) > 125)
    })
    // exact boundaries the fp-log formulation could have missed:
    // n = 125·2^k sits exactly on the cell target at p = k
    assert(Knn.autoPlanes(125L << 4) == 4)
    assert(Knn.autoPlanes((125L << 4) + 16) == 5) // one cell over (>>4 gives 126)
    assert(Knn.autoPlanes(2000) == 4)   // sf0.1 corpus
    assert(Knn.autoPlanes(200000) == 11) // sf10 corpus (measured leg)
  }

  test("vecDot: left fold matches BigDecimal-free sequential sum") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-100f, 100f))
    check(Prop.forAll(genVec, genVec) { (a, b) =>
      val ad = new GenericArrayData(a.toArray[Any])
      val bd = new GenericArrayData(b.toArray[Any])
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      HashImpl.vecDot(ad, bd) == want
    })
  }
}

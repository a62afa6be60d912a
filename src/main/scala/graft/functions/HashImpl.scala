package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop implementations backing the native Catalyst expressions
  * in [[GraftExpressions]]. Called from generated code (one static call
  * per row instead of one lambda dispatch per element), so these loops
  * ARE the hot path — keep them allocation-free where possible.
  *
  * Arithmetic parity contract: byte-for-byte the same results as the
  * higher-order-function formulations and the DuckDB oracle SQL —
  * a left fold of (acc*31 + codepoint) mod 1e9+7 for hashes, a left
  * fold of double products for dots.
  */
object HashImpl {
  val Mod = 1000000007L

  /** Rolling hash over Unicode code points (= DuckDB ord()). ASCII
    * fast path iterates raw bytes without decoding.
    */
  def polyHash(s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b < 0) { // non-ASCII: recompute over code points
        val str = s.toString
        acc = 0L
        var j = 0
        while (j < str.length) {
          val cp = str.codePointAt(j)
          acc = (acc * 31L + cp) % Mod
          j += Character.charCount(cp)
        }
        return acc
      }
      acc = (acc * 31L + b) % Mod
      i += 1
    }
    acc
  }

  /** Continue a rolling hash through one more string's code points. */
  private def foldString(acc0: Long, s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var acc = acc0
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 0) {
        acc = (acc * 31L + b) % Mod
        i += 1
      } else {
        // rare non-ASCII: fall back to code-point decoding for the rest
        val str = s.toString
        var j = 0
        acc = acc0
        while (j < str.length) {
          val cp = str.codePointAt(j)
          acc = (acc * 31L + cp) % Mod
          j += Character.charCount(cp)
        }
        return acc
      }
    }
    acc
  }

  /** Hashes of the word n-gram shingles of a token array: shingle i is
    * tokens[i..i+n-1] joined with a single space; its hash equals
    * polyHash of that joined string (computed without building it).
    */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    val out = if (nTok < n) new Array[Long](0) else new Array[Long](nTok - n + 1)
    var i = 0
    while (i < out.length) {
      var acc = 0L
      var k = 0
      while (k < n) {
        if (k > 0) acc = (acc * 31L + 32L) % Mod // the joining space
        acc = foldString(acc, tokens.getUTF8String(i + k))
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 24-bit SimHash over a token array (occurrences weighted): each
    * token's mixed hash ((polyHash*2654435761) mod 2^31) votes +1/-1
    * per bit; bit set when the vote sum is positive. Single pass per
    * document — replaces an explode + 24 aggregates.
    */
  def simhash24(tokens: ArrayData): Long = {
    val votes = new Array[Long](24)
    val nTok = tokens.numElements()
    var t = 0
    while (t < nTok) {
      val th = (polyHash(tokens.getUTF8String(t)) * 2654435761L) % 2147483648L
      var i = 0
      while (i < 24) {
        if (((th >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sh = 0L
    var i = 0
    while (i < 24) {
      if (votes(i) > 0) sh |= (1L << i)
      i += 1
    }
    sh
  }

  /** Left-fold dot product of two float vectors in double precision —
    * same order as the index-fold SQL, so bit-identical.
    */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** [[vecDot]] over double vectors (e.g. centroid arrays) — same
    * left-fold order.
    */
  def vecDotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Squared L2 distance over the 0-based element range
    * [from, from+len) of two float vectors, each element widened to
    * double before the subtract — the PQ subspace distance. Same
    * left-fold order as the (a[i]-b[i])*(a[i]-b[i]) HOF/oracle fold,
    * so bit-identical.
    */
  def vecSubL2(a: ArrayData, b: ArrayData, from: Int, len: Int): Double = {
    val end = math.min(math.min(a.numElements(), b.numElements()), from + len)
    var acc = 0.0
    var i = from
    while (i < end) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Welch two-sample arithmetic SHARED by the batch q_ab_test plan
  * and the streaming StreamAbTest windows, so the spec-pinned
  * stream == batch equality is enforced by construction, not by
  * comment: both sides feed the same exact-integer partials
  * (n = count, s1 = Σ round(v·1e6) as long, s2 = Σ round(v²·1e6) as
  * long) through these column builders.
  *
  * Conventions (mirrored verbatim in the DuckDB oracle):
  *  - mean = s1/1e6/n (double at the edge only);
  *  - sample variance via the DECIMAL(38,0) key s2·n·1e6 − s1²
  *    (exact integers — order-free), clamped at 0, NULL below 2 rows
  *    (no ANSI divide-by-zero on a 1-row variant);
  *  - z = (m0 − m1)/se, NULL when the pooled standard error is 0
  *    (two constant-valued variants) or any input is NULL — the
  *    degenerate "no verdict" read-out, never an ANSI error (DuckDB
  *    would yield ±inf/nan there, so the guard is also what keeps
  *    the two engines identical).
  */
object Welch {

  private def dec(c: Column) = c.cast("decimal(38,0)")

  /** Mean from the µ-snapped sum. */
  def mean(n: Column, s1: Column): Column =
    s1.cast("double") / lit(1e6) / n.cast("double")

  /** Sample variance from the exact-integer partials; NULL when n < 2
    * (undefined — and (n−1) = 0 would trip ANSI division).
    */
  def variance(n: Column, s1: Column, s2: Column): Column =
    when(n > lit(1),
      greatest((dec(s2) * dec(n) * dec(lit(1000000L))
        - dec(s1) * dec(s1)).cast("double"), lit(0.0))
        / lit(1e12) / n.cast("double")
        / (n - lit(1)).cast("double"))

  /** Welch z; NULL on a zero pooled SE or any NULL input. */
  def z(m0: Column, v0: Column, n0: Column,
        m1: Column, v1: Column, n1: Column): Column = {
    val se = sqrt(v0 / n0.cast("double") + v1 / n1.cast("double"))
    when(se > lit(0.0), (m0 - m1) / se)
  }
}

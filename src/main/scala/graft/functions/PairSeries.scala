package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared merge-intersect for the compiled pair kernels
  * ([[KendallCensus]], [[CcfMoments]], [[PairLagMoments]]): aligns two
  * DAY-SORTED `array<struct<day:date, y:long>>` series on their common
  * days in one O(da + db) pass.
  *
  * Null semantics: `collect_list` drops null STRUCTS but keeps structs
  * whose FIELDS are null, so a null source close arrives here as a
  * non-null element with a null `y`. The join-form aggregate plans
  * these kernels replaced (sum/count over nullable columns) ignored
  * such rows; parity demands the same here, so elements with a null
  * day or null y are skipped, never read as 0.
  *
  * Exact-long domain guard: the product-sum kernels (CcfMoments,
  * PairLagMoments) accumulate Σx², Σxy in signed 64-bit longs; every
  * accumulator is a sum of ≤ d terms, each a product of two aligned
  * values, so |sum| ≤ d · M² with M a bound on |y| over the merged
  * rows. Round 15 tracked M INSIDE the merge loop (two abs + two
  * compares per matched element, three BigInt allocations per pair) —
  * the round-15 verdict's isolated A/B measured that branch costing
  * q94 2.97 → 11.44 s at sf0.1. The guard is now O(1) per pair and
  * runs BEFORE the merge ([[checkBound]]): callers pass per-side
  * bounds maxA, maxB ≥ max|y| of each array — precomputed once per
  * TICKER in [[graft.operators.PairPlan]]'s collapse aggregate, so
  * the hot path pays two longs of plumbing and one 128-bit compare
  * per pair — and the check is d_cap · M² > 2⁶³−1 with
  * d_cap = min(na, nb) ≥ d common days and M = max(maxA, maxB).
  * Conservative bound ≥ the actual d · max|y_common|² bound, still
  * far above the reference domain (900 days at the full 1e-4 close
  * grid: 900 · 1e16 = 9.0e18 < 9.22e18 passes), and ADVICE r14's
  * case (1000 days at |y| ≤ 1e6, d·M² = 1e15) computes. A violation
  * throws `ArithmeticException` — a LOUD degrade in place of a
  * silently wrapped sum (the q132 maxExactN posture); callers past
  * the bound use the documented join-form fallback
  * ([[graft.operators.PairPlan]]). A NEGATIVE maxA/maxB is the
  * "unknown" sentinel: the kernel derives the bound itself with one
  * tight scan per array ([[maxAbsY]]) — still outside the merge
  * loop — so the 2/3-arg SQL forms stay safe without precomputed
  * bounds. KendallCensus compares signs only (no products), so it
  * intersects unguarded.
  *
  * Trust contract: a caller-supplied NON-NEGATIVE maxA/maxB is taken
  * as truth; passing a bound smaller than the array's true max|y|
  * re-opens silent wraparound. PairPlan derives it as
  * `max(abs(y))` over exactly the rows the collapse aggregates, so
  * the pair plans cannot violate it.
  */
object PairSeries {
  /** Reference domain: common days per pair that stay exact at the
    * full close grid ([[MaxAbsY]]) — documentation anchor; the
    * runtime guard is on the per-pair d_cap · M² bound.
    */
  val MaxCommonDays = 900
  /** Reference domain: |y| of a close ≤ 10^4 on the 1e-4 fixed-point
    * grid — documentation anchor; the runtime guard is on the
    * per-pair d_cap · M² bound.
    */
  val MaxAbsY = 100000000L

  /** max |y| over the array's non-null elements (0 for none);
    * `abs(Long.MinValue)` maps to Long.MaxValue — its square
    * overflows regardless, so the guard fires. One tight scan, used
    * only on the sentinel (no precomputed bound) path.
    */
  def maxAbsY(xa: ArrayData): Long = {
    val n = xa.numElements()
    var i = 0
    var m = 0L
    while (i < n) {
      if (!xa.isNullAt(i)) {
        val r = xa.getStruct(i, 2)
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val y = r.getLong(1)
          val a = if (y == Long.MinValue) Long.MaxValue else math.abs(y)
          if (a > m) m = a
        }
      }
      i += 1
    }
    m
  }

  /** Throws `ArithmeticException` iff dCap · m² > 2⁶³ − 1 — the
    * conservative product-sum overflow bound checked once per PAIR,
    * before the merge. Exact 128-bit arithmetic via
    * `Math.multiplyHigh`; no allocation, no loop.
    */
  def checkBound(dCap: Long, m: Long): Unit = {
    if (dCap <= 0L || m <= 1L) return // d · 1² = d ≤ 2³¹ is exact
    // m² as a 128-bit product: overflows a signed long iff the high
    // word is non-zero or the low word wrapped negative
    val lo = m * m
    val over =
      if (Math.multiplyHigh(m, m) != 0L || lo < 0L) true
      else Math.multiplyHigh(dCap, lo) != 0L || dCap * lo < 0L
    if (over)
      throw new ArithmeticException(
        s"pair kernel exact-long domain exceeded: up to $dCap common " +
          s"days at max |y| <= $m overflow a signed-64 product sum " +
          s"(d * max|y|^2 > ${Long.MaxValue}); use the join-form " +
          "fallback (PairSeries scaladoc)")
  }

  /** Applies [[checkBound]] with the caller's per-side bounds,
    * deriving any negative (sentinel) side via [[maxAbsY]]. dCap is
    * min(na, nb) — an upper bound on the common-day count without
    * merging.
    */
  def guardPair(xa: ArrayData, xb: ArrayData, maxA: Long, maxB: Long): Unit = {
    val ma = if (maxA < 0L) maxAbsY(xa) else maxA
    val mb = if (maxB < 0L) maxAbsY(xb) else maxB
    checkBound(math.min(xa.numElements(), xb.numElements()).toLong,
      math.max(ma, mb))
  }

  /** Fills ya/yb (caller-sized to min(na, nb)) with the aligned common
    * closes and returns their count d. Inputs MUST be day-sorted.
    * No domain guard here — product-sum callers run [[guardPair]]
    * first; the merge loop carries no other work.
    */
  def intersect(xa: ArrayData, xb: ArrayData,
      ya: Array[Long], yb: Array[Long]): Int = {
    val na = xa.numElements()
    val nb = xb.numElements()
    var i = 0
    var j = 0
    var d = 0
    while (i < na && j < nb) {
      if (xa.isNullAt(i)) i += 1
      else if (xb.isNullAt(j)) j += 1
      else {
        val ra = xa.getStruct(i, 2)
        val rb = xb.getStruct(j, 2)
        if (ra.isNullAt(0) || ra.isNullAt(1)) i += 1
        else if (rb.isNullAt(0) || rb.isNullAt(1)) j += 1
        else {
          val da = ra.getInt(0)
          val db = rb.getInt(0)
          if (da < db) i += 1
          else if (db < da) j += 1
          else {
            ya(d) = ra.getLong(1)
            yb(d) = rb.getLong(1)
            d += 1; i += 1; j += 1
          }
        }
      }
    }
    d
  }
}

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
  * values, so |sum| ≤ d · M² with M = the max |y| actually seen in
  * the intersection. The guard is on that ACTUAL bound — it tracks M
  * during the merge and throws only when d · M² > 2⁶³ − 1 (ADVICE
  * r14: the old worst-case-constant guard rejected 1000 days at
  * |y| ≤ 1e6, which is exactly representable). The reference domain
  * [[MaxCommonDays]] × [[MaxAbsY]] (900 days at the full 1e-4 close
  * grid: 900 · 1e16 = 9.0e18 < 9.22e18) always passes. With
  * `guard = true` a violation throws `ArithmeticException` — a LOUD
  * degrade in place of a silently wrapped sum (the q132 maxExactN
  * posture); callers past the bound use the documented join-form
  * fallback ([[graft.operators.PairPlan]]). KendallCensus compares
  * signs only (no products), so it intersects unguarded.
  */
object PairSeries {
  /** Reference domain: common days per pair that stay exact at the
    * full close grid ([[MaxAbsY]]) — documentation anchor; the
    * runtime guard is on the actual d · M² bound.
    */
  val MaxCommonDays = 900
  /** Reference domain: |y| of a close ≤ 10^4 on the 1e-4 fixed-point
    * grid — documentation anchor; the runtime guard is on the actual
    * d · M² bound.
    */
  val MaxAbsY = 100000000L

  /** Fills ya/yb (caller-sized to min(na, nb)) with the aligned common
    * closes and returns their count d. Inputs MUST be day-sorted.
    */
  def intersect(xa: ArrayData, xb: ArrayData,
      ya: Array[Long], yb: Array[Long], guard: Boolean): Int = {
    val na = xa.numElements()
    val nb = xb.numElements()
    var i = 0
    var j = 0
    var d = 0
    var m = 0L // max |y| seen across both sides' common rows
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
            val a = ra.getLong(1)
            val b = rb.getLong(1)
            if (guard) {
              // abs(Long.MinValue) is negative; map it to MaxValue —
              // its square overflows regardless, so the guard fires
              val aa = if (a == Long.MinValue) Long.MaxValue else math.abs(a)
              val ab = if (b == Long.MinValue) Long.MaxValue else math.abs(b)
              if (aa > m) m = aa
              if (ab > m) m = ab
            }
            ya(d) = a
            yb(d) = b
            d += 1; i += 1; j += 1
          }
        }
      }
    }
    // actual-bound guard: every product-sum accumulator is ≤ d · M²;
    // one BigInt comparison per PAIR (not per element) keeps it exact
    if (guard && d > 0 &&
        BigInt(d) * BigInt(m) * BigInt(m) > BigInt(Long.MaxValue))
      throw new ArithmeticException(
        s"pair kernel exact-long domain exceeded: $d common days at " +
          s"max |y| = $m overflow a signed-64 product sum " +
          s"(d * max|y|^2 > ${Long.MaxValue}); use the join-form " +
          "fallback (PairSeries scaladoc)")
    d
  }
}

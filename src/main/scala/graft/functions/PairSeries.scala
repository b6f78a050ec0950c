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
  * PairLagMoments) accumulate Σx², Σxy in signed 64-bit longs. With
  * |y| ≤ [[MaxAbsY]] (closes on the 1e-4 grid, values ≤ 10^4) each
  * product is ≤ 1e16 and up to [[MaxCommonDays]] terms stay exact
  * (900 · 1e16 = 9.0e18 < 2⁶³ − 1 ≈ 9.22e18). With `guard = true`
  * a violation throws `ArithmeticException` — a LOUD degrade in place
  * of a silently wrapped sum (the q132 maxExactN posture); callers
  * past the bound use the documented join-form fallback
  * ([[graft.operators.PairPlan]]). KendallCensus compares signs only
  * (no products), so it intersects unguarded.
  */
object PairSeries {
  /** Max common days per pair inside the exact-long product-sum domain. */
  val MaxCommonDays = 900
  /** Max |y| (1e8 = close ≤ 10^4 on the 1e-4 fixed-point grid). */
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
            if (guard && (math.abs(a) > MaxAbsY || math.abs(b) > MaxAbsY))
              throw new ArithmeticException(
                s"pair kernel exact-long domain exceeded: |y| = " +
                  s"${math.max(math.abs(a), math.abs(b))} > $MaxAbsY; " +
                  "use the join-form fallback (PairSeries scaladoc)")
            ya(d) = a
            yb(d) = b
            d += 1; i += 1; j += 1
          }
        }
      }
    }
    if (guard && d > MaxCommonDays)
      throw new ArithmeticException(
        s"pair kernel exact-long domain exceeded: $d common days > " +
          s"$MaxCommonDays; use the join-form fallback (PairSeries scaladoc)")
    d
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared primitive-array core of the compiled pair kernels
  * ([[KendallCensus]], [[CcfMoments]], [[PairLagMoments]]).
  *
  * Round-17 layout: each side of a pair arrives as TWO PARALLEL
  * PRIMITIVE ARRAYS — `array<date>` days (ascending, distinct) and
  * `array<bigint>` closes — instead of round 13-16's single
  * `array<struct<day, y>>`. The struct form made the merge-intersect
  * pay one `ArrayData.getStruct` per element, and on the
  * `UnsafeArrayData` hot path every such call ALLOCATES an UnsafeRow
  * wrapper: JFR over the round-16 suite showed `PairSeries.intersect`
  * alone at 47 % of q111's samples, ~3 allocations per merged element
  * × ~22 elements × 5.6M pairs × 5 queries — hundreds of millions of
  * allocations per suite, the memory-bound hot path behind the pair
  * family's 32-core anti-scaling. The parallel-array form converts
  * each side with ONE bulk `toIntArray`/`toLongArray` copy
  * (`Platform.copyMemory` on the unsafe path) and merges pure
  * primitives — no per-element wrapper, no virtual dispatch in the
  * loop.
  *
  * Null contract: the arrays must be NULL-FREE and equal-length per
  * side. [[graft.operators.PairPlan]] guarantees it (its collapse
  * filters null day/close rows — exactly the rows the join-form
  * aggregates these kernels replaced ignored, so parity is preserved
  * one step earlier). A foreign SQL caller violating it gets a LOUD
  * `IllegalArgumentException` from [[dayArray]]/[[closeArray]], never
  * a silently-zeroed element.
  *
  * Exact-long domain guard: the product-sum kernels (CcfMoments,
  * PairLagMoments) accumulate Σx², Σxy in signed 64-bit longs; every
  * accumulator is a sum of ≤ d terms, each a product of two aligned
  * values, so |sum| ≤ d · M² with M = max|y| over both sides. The
  * guard is [[checkBound]] — d_cap · M² > 2⁶³−1 in exact 128-bit
  * arithmetic (`Math.multiplyHigh`), with d_cap = min(na, nb) and M
  * from one tight [[maxAbs]] scan per primitive array (outside the
  * merge loop; the round-15/16 precomputed per-ticker bound columns
  * are gone — on primitive arrays the scan costs ~d compares, which
  * profiling can no longer distinguish from the plumbing that carried
  * the bounds). Still conservative ≥ the actual d · max|y_common|²,
  * still passing the reference domain (900 days at the full 1e-4
  * close grid: 900 · 1e16 < 2⁶³−1) and ADVICE r14's 1000-day |y| ≤ 1e6
  * case. A violation throws `ArithmeticException` — a LOUD degrade in
  * place of a silently wrapped sum; callers past the bound use the
  * documented join-form fallback ([[graft.operators.PairPlan]]).
  * KendallCensus compares signs only (no products), so it intersects
  * unguarded.
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

  private def rejectNulls(a: ArrayData, what: String): Unit = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"pair kernel $what array has a null element at $i: the " +
            "day/close arrays must be null-free (PairPlan's collapse " +
            "filters null rows; see PairSeries)")
      i += 1
    }
  }

  /** Day axis as a primitive int[] (DateType's physical form). One
    * null-check pass (cheap bit tests), one bulk copy.
    */
  def dayArray(a: ArrayData): Array[Int] = {
    rejectNulls(a, "day")
    a.toIntArray()
  }

  /** Close axis as a primitive long[]. */
  def closeArray(a: ArrayData, days: Array[Int]): Array[Long] = {
    rejectNulls(a, "close")
    val ys = a.toLongArray()
    if (ys.length != days.length)
      throw new IllegalArgumentException(
        s"pair kernel day/close arrays differ in length: " +
          s"${days.length} days vs ${ys.length} closes")
    ys
  }

  /** max |y| over a primitive close array (0 for empty);
    * `abs(Long.MinValue)` maps to Long.MaxValue — its square
    * overflows regardless, so the guard fires.
    */
  def maxAbs(ys: Array[Long]): Long = {
    var i = 0
    var m = 0L
    while (i < ys.length) {
      val y = ys(i)
      val a = if (y == Long.MinValue) Long.MaxValue else math.abs(y)
      if (a > m) m = a
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

  /** [[checkBound]] over the two decoded sides: dCap = min(na, nb)
    * (an upper bound on the common-day count without merging), M from
    * one tight scan per side.
    */
  def guardPair(ya: Array[Long], yb: Array[Long]): Unit =
    checkBound(math.min(ya.length, yb.length).toLong,
      math.max(maxAbs(ya), maxAbs(yb)))

  /** Fills oa/ob (caller-sized to min(na, nb)) with the aligned common
    * closes and returns their count d. Day arrays MUST be ascending.
    * Pure primitive merge — no allocation, no dispatch.
    */
  def intersect(da: Array[Int], ya: Array[Long],
      db: Array[Int], yb: Array[Long],
      oa: Array[Long], ob: Array[Long]): Int = {
    val na = da.length
    val nb = db.length
    var i = 0
    var j = 0
    var d = 0
    while (i < na && j < nb) {
      val x = da(i)
      val y = db(j)
      if (x < y) i += 1
      else if (y < x) j += 1
      else {
        oa(d) = ya(i)
        ob(d) = yb(j)
        d += 1; i += 1; j += 1
      }
    }
    d
  }
}

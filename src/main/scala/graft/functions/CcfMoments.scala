package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ccf_moments(a, b, maxA, maxB, maxLag) → array<struct<lag:int,
  * n:bigint, sx, sy, sxx, syy, sxy:bigint>> — the exact per-lag
  * Pearson moment sums of q108's cross-correlogram over the COMMON
  * days of two DAY-SORTED close series (each an
  * `array<struct<day:date, y:long>>`, the per-ticker
  * `sort_array(collect_list(...))` shape KendallCensus also consumes).
  *
  * One compiled pass merge-intersects the two sorted arrays by day
  * (O(da + db)), aligning the common closes into two flat long
  * arrays; then for every lag ℓ ∈ −maxLag..+maxLag the five moment
  * sums run over the length-(d − |ℓ|) overlap of (ya_i, yb_{i+ℓ}) —
  * exactly the rows the join-form plan's pair-key lead/lag window +
  * null filter kept, so the downstream decimal num/dx/dy chain is
  * bit-identical. Everything here is exact long arithmetic, guarded
  * by [[PairSeries.guardPair]] BEFORE the merge: maxA/maxB are
  * per-side max|y| bounds precomputed once per ticker in
  * [[graft.operators.PairPlan]]'s collapse (O(1) per pair here);
  * a negative bound means "derive by scan" — the safety of the
  * 3-arg SQL convenience form. The merge and moment loops carry no
  * guard work (the round-15 per-element guard branch cost q94
  * 2.97 → 11.44 s at sf0.1 — round-15 verdict item 1). Past the
  * bound, fall back to the join form rather than widening the
  * accumulator.
  *
  * Replaces: pair-day join rows → pair-key window sort → ×(2L+1)
  * explode → shuffled groupBy (152M intermediate rows at sf0.1) with
  * an in-task loop over broadcast-joined ticker arrays — nothing
  * pair-sized ever shuffles. Registered as SQL `ccf_moments` —
  * `(a, b, maxLag)` or `(a, b, maxA, maxB, maxLag)`, maxLag a
  * required integer literal — via [[graft.GraftExtensions]].
  */
case class CcfMoments(first: Expression, second: Expression,
    third: Expression, fourth: Expression, maxLag: Int)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lag", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", LongType, nullable = false),
    StructField("sy", LongType, nullable = false),
    StructField("sxx", LongType, nullable = false),
    StructField("syy", LongType, nullable = false),
    StructField("sxy", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == DateType && f1.dataType == LongType
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) &&
        third.dataType == LongType && fourth.dataType == LongType &&
        maxLag >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"(array<struct<day:date,y:bigint>> x2, bigint x2) expected, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any, ma: Any, mb: Any): Any =
    CcfMoments.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      ma.asInstanceOf[Long], mb.asInstanceOf[Long], maxLag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, ma, mb) =>
      s"${ev.value} = graft.functions.CcfMoments.compute($a, $b, $ma, $mb, $maxLag);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): CcfMoments =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object CcfMoments {
  /** Shared by eval and codegen. Inputs MUST be day-sorted. Null
    * day/y elements are skipped and the exact-long product-sum domain
    * is enforced in O(1) before the merge — see [[PairSeries]].
    * maxA/maxB: per-side max|y| bounds (negative ⇒ derive by scan).
    */
  def compute(xa: ArrayData, xb: ArrayData, maxA: Long, maxB: Long,
      maxLag: Int): ArrayData = {
    PairSeries.guardPair(xa, xb, maxA, maxB)
    val cap = math.min(xa.numElements(), xb.numElements())
    val ya = new Array[Long](cap)
    val yb = new Array[Long](cap)
    val d = PairSeries.intersect(xa, xb, ya, yb)
    // One pass of FULL-series moments: lag ℓ only trims the window's
    // edges, so each lag's sx/sxx (over ya[lo, hi)) and sy/syy (over
    // yb[lo+ℓ, hi+ℓ)) is the total minus at most |ℓ| head/tail terms
    // — only the cross moment sxy still needs its per-lag product
    // loop. 1 multiply + 1 add per element per lag instead of 5 of
    // each (round-16, guide §1.2 "per-task work": the five pair
    // analytics share this kernel-bound stage). Every partial here is
    // a sub-sum of the guarded d·M² domain, so the subtractions stay
    // exact; the emitted sums are the same integers as the one-loop
    // form's, term for term.
    var tx = 0L; var ty = 0L; var txx = 0L; var tyy = 0L
    var i = 0
    while (i < d) {
      val x = ya(i); val y = yb(i)
      tx += x; ty += y; txx += x * x; tyy += y * y
      i += 1
    }
    val out = new Array[Any](2 * maxLag + 1)
    var l = -maxLag
    while (l <= maxLag) {
      // overlap of (ya_i, yb_{i+l}) within [0, d): i in [lo, hi)
      val lo = math.max(0, -l)
      val hi = d - math.max(0, l)
      if (hi <= lo) {
        // fewer common days than |l|: the old loop ran zero times
        out(l + maxLag) = new GenericInternalRow(
          Array[Any](l, 0L, 0L, 0L, 0L, 0L, 0L))
      } else {
        var sx = tx; var sxx = txx
        var j = 0
        while (j < lo) { val x = ya(j); sx -= x; sxx -= x * x; j += 1 }
        j = hi
        while (j < d) { val x = ya(j); sx -= x; sxx -= x * x; j += 1 }
        var sy = ty; var syy = tyy
        val ylo = lo + l // = max(l, 0); y's window is [lo+l, hi+l)
        j = 0
        while (j < ylo) { val y = yb(j); sy -= y; syy -= y * y; j += 1 }
        j = hi + l // = d + min(l, 0)
        while (j < d) { val y = yb(j); sy -= y; syy -= y * y; j += 1 }
        var sxy = 0L
        var p = lo
        while (p < hi) { sxy += ya(p) * yb(p + l); p += 1 }
        out(l + maxLag) = new GenericInternalRow(
          Array[Any](l, (hi - lo).toLong, sx, sy, sxx, syy, sxy))
      }
      l += 1
    }
    new GenericArrayData(out)
  }
}

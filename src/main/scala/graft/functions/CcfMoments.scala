package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
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
    val out = new Array[Any](2 * maxLag + 1)
    var l = -maxLag
    while (l <= maxLag) {
      // overlap of (ya_i, yb_{i+l}) within [0, d): i from max(0, -l)
      // to d - 1 - max(0, l)
      val lo = math.max(0, -l)
      val hi = d - math.max(0, l)
      var sx = 0L; var sy = 0L; var sxx = 0L; var syy = 0L; var sxy = 0L
      var n = 0L
      var p = lo
      while (p < hi) {
        val x = ya(p)
        val y = yb(p + l)
        sx += x; sy += y
        sxx += x * x; syy += y * y; sxy += x * y
        n += 1
        p += 1
      }
      out(l + maxLag) = InternalRow(l, n, sx, sy, sxx, syy, sxy)
      l += 1
    }
    new GenericArrayData(out)
  }
}

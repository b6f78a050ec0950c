package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ccf_moments(da, ya, db, yb, maxLag) → array<struct<lag:int,
  * n:bigint, sx, sy, sxx, syy, sxy:bigint>> — the exact per-lag
  * Pearson moment sums of q108's cross-correlogram over the COMMON
  * days of two day-sorted close series, each given as PARALLEL
  * PRIMITIVE ARRAYS (`array<date>` days ascending + `array<bigint>`
  * closes, null-free — [[graft.operators.PairPlan]]'s collapse shape;
  * see [[PairSeries]] for why the round-13-16 struct-array form was
  * replaced: one UnsafeRow allocation per merged element, 47 % of
  * q111's JFR samples).
  *
  * One compiled pass merge-intersects the two sorted day axes
  * (O(da + db), primitive merge), aligning the common closes into two
  * flat long arrays; then one full-series moment pass, and for every
  * lag ℓ ∈ −maxLag..+maxLag the per-lag sx/sy/sxx/syy come out as the
  * totals minus ≤|ℓ| edge terms — only the cross moment sxy keeps a
  * per-lag product loop. The per-lag overlap rows are exactly those
  * the old join-form plan's pair-key lead/lag window + null filter
  * kept, so the downstream decimal num/dx/dy chain is bit-identical.
  * Everything is exact long arithmetic behind [[PairSeries]]'s
  * per-pair d·M² domain guard; past the bound the kernel throws and
  * callers use the documented join-form fallback. Result rows are
  * UnsafeRows written field-by-field — no boxed longs (the round-16
  * GenericInternalRow form boxed 7 values per lag row).
  *
  * Registered as SQL `ccf_moments(da, ya, db, yb, maxLag)` (maxLag a
  * required integer literal) via [[graft.GraftExtensions]].
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
    def days(dt: DataType) = dt match {
      case ArrayType(DateType, _) => true
      case _ => false
    }
    def closes(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (days(first.dataType) && closes(second.dataType) &&
        days(third.dataType) && closes(fourth.dataType) && maxLag >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"(array<date>, array<bigint>) x2 expected, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  override def nullSafeEval(da: Any, ya: Any, db: Any, yb: Any): Any =
    CcfMoments.compute(da.asInstanceOf[ArrayData], ya.asInstanceOf[ArrayData],
      db.asInstanceOf[ArrayData], yb.asInstanceOf[ArrayData], maxLag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (da, ya, db, yb) =>
      s"${ev.value} = graft.functions.CcfMoments.compute($da, $ya, $db, $yb, $maxLag);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): CcfMoments =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object CcfMoments {
  private val Fields = 7
  private val RowBytes = UnsafeRow.calculateBitSetWidthInBytes(Fields) +
    Fields * 8

  private def lagRow(l: Int, n: Long, sx: Long, sy: Long, sxx: Long,
      syy: Long, sxy: Long): UnsafeRow = {
    val row = new UnsafeRow(Fields)
    row.pointTo(new Array[Byte](RowBytes), RowBytes)
    row.setInt(0, l)
    row.setLong(1, n)
    row.setLong(2, sx)
    row.setLong(3, sy)
    row.setLong(4, sxx)
    row.setLong(5, syy)
    row.setLong(6, sxy)
    row
  }

  /** Shared by eval and codegen. Day arrays MUST be ascending; all
    * four arrays null-free ([[PairSeries]] throws loudly otherwise).
    * The exact-long product-sum domain is guarded per pair before any
    * accumulation.
    */
  def compute(xda: ArrayData, xya: ArrayData, xdb: ArrayData,
      xyb: ArrayData, maxLag: Int): ArrayData = {
    val da = PairSeries.dayArray(xda)
    val ya = PairSeries.closeArray(xya, da)
    val db = PairSeries.dayArray(xdb)
    val yb = PairSeries.closeArray(xyb, db)
    PairSeries.guardPair(ya, yb)
    val cap = math.min(da.length, db.length)
    val oa = new Array[Long](cap)
    val ob = new Array[Long](cap)
    val d = PairSeries.intersect(da, ya, db, yb, oa, ob)
    // One pass of FULL-series moments: lag ℓ only trims the window's
    // edges, so each lag's sx/sxx (over oa[lo, hi)) and sy/syy (over
    // ob[lo+ℓ, hi+ℓ)) is the total minus at most |ℓ| head/tail terms
    // — only the cross moment sxy still needs its per-lag product
    // loop (round-16, guide §1.2 per-task work). Every partial here is
    // a sub-sum of the guarded d·M² domain, so the subtractions stay
    // exact; the emitted sums are the same integers as the one-loop
    // form's, term for term.
    var tx = 0L; var ty = 0L; var txx = 0L; var tyy = 0L
    var i = 0
    while (i < d) {
      val x = oa(i); val y = ob(i)
      tx += x; ty += y; txx += x * x; tyy += y * y
      i += 1
    }
    val out = new Array[Any](2 * maxLag + 1)
    var l = -maxLag
    while (l <= maxLag) {
      // overlap of (oa_i, ob_{i+l}) within [0, d): i in [lo, hi)
      val lo = math.max(0, -l)
      val hi = d - math.max(0, l)
      if (hi <= lo) {
        // fewer common days than |l|: the old loop ran zero times
        out(l + maxLag) = lagRow(l, 0L, 0L, 0L, 0L, 0L, 0L)
      } else {
        var sx = tx; var sxx = txx
        var j = 0
        while (j < lo) { val x = oa(j); sx -= x; sxx -= x * x; j += 1 }
        j = hi
        while (j < d) { val x = oa(j); sx -= x; sxx -= x * x; j += 1 }
        var sy = ty; var syy = tyy
        val ylo = lo + l // = max(l, 0); y's window is [lo+l, hi+l)
        j = 0
        while (j < ylo) { val y = ob(j); sy -= y; syy -= y * y; j += 1 }
        j = hi + l // = d + min(l, 0)
        while (j < d) { val y = ob(j); sy -= y; syy -= y * y; j += 1 }
        var sxy = 0L
        var p = lo
        while (p < hi) { sxy += oa(p) * ob(p + l); p += 1 }
        out(l + maxLag) = lagRow(l, (hi - lo).toLong, sx, sy, sxx, syy, sxy)
      }
      l += 1
    }
    new GenericArrayData(out)
  }
}

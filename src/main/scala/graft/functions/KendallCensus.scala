package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** kendall_census(da, ya, db, yb) → array<long>[n_days, concordant,
  * discordant, ties_a, ties_b] — the exact Kendall pair census over
  * the common days of two day-sorted close series, each given as
  * PARALLEL PRIMITIVE ARRAYS (`array<date>` days ascending +
  * `array<bigint>` closes, null-free —
  * [[graft.operators.PairPlan]]'s collapse shape; see [[PairSeries]]
  * for why the struct-array form was replaced).
  *
  * One compiled pass merge-intersects the two sorted day axes
  * (O(da + db), pure primitive merge), then censuses the d common
  * closes: for every i < j, concordant / discordant by SIGN
  * COMPARISON (no Δya·Δyb product, so no overflow value-domain bound
  * at any close magnitude), ties in a / ties in b counted separately
  * (the τ-b correction terms). The census loop is O(d²) integer
  * compares on calendar-bounded d (≈ tens; a decade of trading days
  * is ~6·10⁶ compares, microseconds compiled) — at that bound a
  * compiled d²/2 loop beats a merge-sort inversion count's constant
  * factors and stays allocation-free.
  *
  * Registered as SQL `kendall_census` via [[graft.GraftExtensions]].
  */
case class KendallCensus(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
        days(third.dataType) && closes(fourth.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"(array<date>, array<bigint>) x2 expected, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  override def nullSafeEval(da: Any, ya: Any, db: Any, yb: Any): Any =
    KendallCensus.compute(da.asInstanceOf[ArrayData],
      ya.asInstanceOf[ArrayData], db.asInstanceOf[ArrayData],
      yb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (da, ya, db, yb) =>
      s"${ev.value} = graft.functions.KendallCensus.compute($da, $ya, $db, $yb);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): KendallCensus =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object KendallCensus {
  /** Shared by eval and codegen. Day arrays MUST be ascending; all
    * four arrays null-free ([[PairSeries]] throws loudly otherwise).
    * Sign comparison has no product-overflow domain, so the intersect
    * runs unguarded.
    */
  def compute(xda: ArrayData, xya: ArrayData, xdb: ArrayData,
      xyb: ArrayData): ArrayData = {
    val da = PairSeries.dayArray(xda)
    val ya = PairSeries.closeArray(xya, da)
    val db = PairSeries.dayArray(xdb)
    val yb = PairSeries.closeArray(xyb, db)
    val cap = math.min(da.length, db.length)
    val oa = new Array[Long](cap)
    val ob = new Array[Long](cap)
    val d = PairSeries.intersect(da, ya, db, yb, oa, ob)
    var c = 0L
    var dis = 0L
    var t1 = 0L
    var t2 = 0L
    var p = 0
    while (p < d) {
      var q = p + 1
      while (q < d) {
        val sa = java.lang.Long.compare(oa(p), oa(q))
        val sb = java.lang.Long.compare(ob(p), ob(q))
        if (sa == 0) t1 += 1
        if (sb == 0) t2 += 1
        if (sa != 0 && sb != 0) {
          if ((sa > 0) == (sb > 0)) c += 1 else dis += 1
        }
        q += 1
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(d.toLong, c, dis, t1, t2))
  }
}

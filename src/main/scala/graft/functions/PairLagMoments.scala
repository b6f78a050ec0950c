package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** pair_lag_moments(a, b, maxA, maxB) → struct of the twenty exact
  * moment sums q111 (Granger) and q112 (Engle–Granger) consume over a
  * ticker pair's common-day close sequence — the lag-conditioned
  * sibling of [[CcfMoments]], same day-sorted
  * `array<struct<day:date, y:long>>` inputs, same one-pass merge
  * intersection, same O(1) pre-merge domain guard
  * ([[PairSeries.guardPair]]; maxA/maxB are per-ticker max|y| bounds
  * from [[graft.operators.PairPlan]]'s collapse, negative ⇒ derive
  * by scan — the 2-arg SQL convenience form).
  *
  * Field contract (x = A's close, y = B's close, aligned on common
  * days; "lag rows" are indices i ≥ 1, pairing (x_i, y_i) with the
  * PREVIOUS common day's (x_{i−1}, y_{i−1}) — exactly the rows the
  * join-form plans' pair-key lag window produced, with the
  * lag-conditioned guards q112's prodIf applied):
  *   nf, ua, ub, uaa, uab            — full-sample: count, Σx, Σy,
  *                                     Σx², Σxy (q112 step 1)
  *   m                               — lag rows (= max(0, nf − 1))
  *   sya, syb, sya1, syb1            — lag-row Σx, Σy, Σx₋, Σy₋
  *   saa, sbb, sab                   — lag-row Σx², Σy², Σxy
  *   sa1a1, sb1b1, sa1b1             — Σx₋², Σy₋², Σx₋y₋
  *   saa1, sbb1, sab1, sba1          — Σx·x₋, Σy·y₋, Σx·y₋, Σy·x₋
  * All exact long arithmetic; the consumers cast product sums to
  * decimal(38,0) so their downstream chains — and the join-form
  * ORACLES — are unchanged. Registered as SQL `pair_lag_moments`
  * (2- or 4-arg) via [[graft.GraftExtensions]].
  */
case class PairLagMoments(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = StructType(
    PairLagMoments.fields.map(f => StructField(f, LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == DateType && f1.dataType == LongType
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) &&
        third.dataType == LongType && fourth.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"(array<struct<day:date,y:bigint>> x2, bigint x2) expected, got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any, ma: Any, mb: Any): Any =
    PairLagMoments.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], ma.asInstanceOf[Long], mb.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, ma, mb) =>
      s"${ev.value} = graft.functions.PairLagMoments.compute($a, $b, $ma, $mb);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PairLagMoments =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object PairLagMoments {
  val fields: Seq[String] = Seq(
    "nf", "ua", "ub", "uaa", "uab",
    "m", "sya", "syb", "sya1", "syb1",
    "saa", "sbb", "sab", "sa1a1", "sb1b1", "sa1b1",
    "saa1", "sbb1", "sab1", "sba1")

  /** Shared by eval and codegen. Inputs MUST be day-sorted. Null
    * day/y elements are skipped and the exact-long product-sum domain
    * is enforced in O(1) before the merge — see [[PairSeries]].
    * maxA/maxB: per-side max|y| bounds (negative ⇒ derive by scan).
    */
  def compute(xa: ArrayData, xb: ArrayData, maxA: Long,
      maxB: Long): InternalRow = {
    PairSeries.guardPair(xa, xb, maxA, maxB)
    val cap = math.min(xa.numElements(), xb.numElements())
    val ya = new Array[Long](cap)
    val yb = new Array[Long](cap)
    val d = PairSeries.intersect(xa, xb, ya, yb)
    var ua = 0L; var ub = 0L; var uaa = 0L; var uab = 0L
    var p = 0
    while (p < d) {
      val x = ya(p); val y = yb(p)
      ua += x; ub += y; uaa += x * x; uab += x * y
      p += 1
    }
    var sya = 0L; var syb = 0L; var sya1 = 0L; var syb1 = 0L
    var saa = 0L; var sbb = 0L; var sab = 0L
    var sa1a1 = 0L; var sb1b1 = 0L; var sa1b1 = 0L
    var saa1 = 0L; var sbb1 = 0L; var sab1 = 0L; var sba1 = 0L
    p = 1
    while (p < d) {
      val x = ya(p); val y = yb(p)
      val x1 = ya(p - 1); val y1 = yb(p - 1)
      sya += x; syb += y; sya1 += x1; syb1 += y1
      saa += x * x; sbb += y * y; sab += x * y
      sa1a1 += x1 * x1; sb1b1 += y1 * y1; sa1b1 += x1 * y1
      saa1 += x * x1; sbb1 += y * y1; sab1 += x * y1; sba1 += y * x1
      p += 1
    }
    InternalRow(
      d.toLong, ua, ub, uaa, uab,
      math.max(0, d - 1).toLong, sya, syb, sya1, syb1,
      saa, sbb, sab, sa1a1, sb1b1, sa1b1,
      saa1, sbb1, sab1, sba1)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** pair_lag_moments(da, ya, db, yb) → struct of the twenty exact
  * moment sums q111 (Granger) and q112 (Engle–Granger) consume over a
  * ticker pair's common-day close sequence — the lag-conditioned
  * sibling of [[CcfMoments]], same parallel-primitive-array inputs
  * (`array<date>` days ascending + `array<bigint>` closes, null-free —
  * [[graft.operators.PairPlan]]'s collapse shape), same one-pass
  * primitive merge intersection, same per-pair exact-long domain
  * guard ([[PairSeries]]).
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
  * ORACLES — are unchanged. The result row is ONE UnsafeRow written
  * field-by-field: the round-16 `InternalRow(...)` varargs form built
  * a Seq, boxed all twenty longs and `toArray`-copied it per pair —
  * 24 % of q111's JFR samples. Registered as SQL `pair_lag_moments`
  * via [[graft.GraftExtensions]].
  */
case class PairLagMoments(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = StructType(
    PairLagMoments.fields.map(f => StructField(f, LongType, nullable = false)))

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
    PairLagMoments.compute(da.asInstanceOf[ArrayData],
      ya.asInstanceOf[ArrayData], db.asInstanceOf[ArrayData],
      yb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (da, ya, db, yb) =>
      s"${ev.value} = graft.functions.PairLagMoments.compute($da, $ya, $db, $yb);")

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

  private val NumFields = fields.size
  private val RowBytes = UnsafeRow.calculateBitSetWidthInBytes(NumFields) +
    NumFields * 8

  /** Shared by eval and codegen. Day arrays MUST be ascending; all
    * four arrays null-free ([[PairSeries]] throws loudly otherwise).
    * The exact-long product-sum domain is guarded per pair before any
    * accumulation.
    */
  def compute(xda: ArrayData, xya: ArrayData, xdb: ArrayData,
      xyb: ArrayData): InternalRow = {
    val da = PairSeries.dayArray(xda)
    val ya = PairSeries.closeArray(xya, da)
    val db = PairSeries.dayArray(xdb)
    val yb = PairSeries.closeArray(xyb, db)
    PairSeries.guardPair(ya, yb)
    val cap = math.min(da.length, db.length)
    val oa = new Array[Long](cap)
    val ob = new Array[Long](cap)
    val d = PairSeries.intersect(da, ya, db, yb, oa, ob)
    var ua = 0L; var ub = 0L; var uaa = 0L; var uab = 0L
    var p = 0
    while (p < d) {
      val x = oa(p); val y = ob(p)
      ua += x; ub += y; uaa += x * x; uab += x * y
      p += 1
    }
    var sya = 0L; var syb = 0L; var sya1 = 0L; var syb1 = 0L
    var saa = 0L; var sbb = 0L; var sab = 0L
    var sa1a1 = 0L; var sb1b1 = 0L; var sa1b1 = 0L
    var saa1 = 0L; var sbb1 = 0L; var sab1 = 0L; var sba1 = 0L
    p = 1
    while (p < d) {
      val x = oa(p); val y = ob(p)
      val x1 = oa(p - 1); val y1 = ob(p - 1)
      sya += x; syb += y; sya1 += x1; syb1 += y1
      saa += x * x; sbb += y * y; sab += x * y
      sa1a1 += x1 * x1; sb1b1 += y1 * y1; sa1b1 += x1 * y1
      saa1 += x * x1; sbb1 += y * y1; sab1 += x * y1; sba1 += y * x1
      p += 1
    }
    val row = new UnsafeRow(NumFields)
    row.pointTo(new Array[Byte](RowBytes), RowBytes)
    row.setLong(0, d.toLong)
    row.setLong(1, ua)
    row.setLong(2, ub)
    row.setLong(3, uaa)
    row.setLong(4, uab)
    row.setLong(5, math.max(0, d - 1).toLong)
    row.setLong(6, sya)
    row.setLong(7, syb)
    row.setLong(8, sya1)
    row.setLong(9, syb1)
    row.setLong(10, saa)
    row.setLong(11, sbb)
    row.setLong(12, sab)
    row.setLong(13, sa1a1)
    row.setLong(14, sb1b1)
    row.setLong(15, sa1b1)
    row.setLong(16, saa1)
    row.setLong(17, sbb1)
    row.setLong(18, sab1)
    row.setLong(19, sba1)
    row
  }
}

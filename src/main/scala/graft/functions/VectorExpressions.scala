package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns.
  *
  * The declarative alternative — `aggregate(zip_with(a, b, _*_), 0d,
  * _+_)` — runs as an interpreted higher-order function: one closure
  * call per element per row. This expression compiles to a tight
  * primitive loop inside whole-stage codegen, ~50× faster on the
  * pairwise-similarity hot path (d05/s01/s02), while keeping the exact
  * same sequential accumulation order, so results stay bit-identical
  * to the oracle's left-fold.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) =
      dt == ArrayType(DoubleType, false) || dt == ArrayType(DoubleType, true)
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array<double> expected, got (${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native MinHash signature: one pass over an `array<long>` of shingle
  * hashes computing all `numHashes` universal-hash minima in a tight
  * primitive loop. The declarative form — transform(0..63, i ->
  * aggregate(shingles, MaxValue, least(..element_at(coeffA, i)..))) —
  * is interpreted and re-allocates the coefficient arrays per element:
  * ~100× slower on a 5k-doc corpus, worse at scale.
  */
case class MinHashSignature(child: Expression, numHashes: Int, prime: Long,
    coeffA: Seq[Long], coeffB: Seq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private lazy val aArr = coeffA.toArray
  private lazy val bArr = coeffB.toArray

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = (aArr(i) * h + bArr(i)) % prime
        val vp = if (v < 0) v + prime else v
        if (vp < sig(i)) sig(i) = vp
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** Same double loop as nullSafeEval, emitted into whole-stage
    * codegen (the CodegenFallback version forced every enclosing
    * projection out of codegen). Coefficients ride along as reference
    * objects, not literals — 64 longs each.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashCoeffA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashCoeffB", bArr, "long[]")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = ($aRef[$i] * $h + $bRef[$i]) % ${prime}L;
         |    if ($v < 0) $v += ${prime}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object VectorFunctions {
  /** Dot product of two array<double> columns via the native
    * expression above.
    */
  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** MinHash signature of an array<long> of shingle hashes. */
  def minhash_sig(hashes: Column, numHashes: Int, prime: Long,
      coeffA: Seq[Long], coeffB: Seq[Long]): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(hashes), numHashes, prime, coeffA, coeffB))
}

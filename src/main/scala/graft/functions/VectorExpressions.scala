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

/** Row-local Shannon entropy of a symbol array, with the fixed-point
  * term discipline the DuckDB oracle uses: each distinct symbol's
  * p·log2(p) term is floored into a 1e-9-scaled long BEFORE the sum
  * (long sums are order-independent), then negated and unscaled.
  *
  * Replaces the exploded `groupBy(doc_id, sym)` formulation — a full
  * corpus-wide shuffle of every character — with a single-pass hash
  * count inside the row: zero exchanges, scan-speed at any scale.
  */
case class SymbolEntropy(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    SymbolEntropy.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SymbolEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SymbolEntropy =
    copy(child = newChild)
}

object SymbolEntropy {
  private val Ln2 = 0.6931471805599453

  /** Exact oracle parity: p = n/total (double division), term =
    * floor(p·(ln p/ln 2)·1e9 + 0.5) summed as long over DISTINCT
    * symbols — the same op sequence as the grouped SQL.
    */
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val counts =
      new java.util.HashMap[Any, java.lang.Long](math.min(n * 2, 1 << 16))
    var i = 0
    while (i < n) {
      val k = arr.getUTF8String(i)
      val prev = counts.get(k)
      counts.put(k, if (prev == null) 1L else prev.longValue() + 1L)
      i += 1
    }
    var termSum = 0L
    val it = counts.values().iterator()
    val total = n.toDouble
    while (it.hasNext) {
      val p = it.next().longValue().toDouble / total
      termSum += math.floor(p * (math.log(p) / Ln2) * 1e9 + 0.5).toLong
    }
    -termSum.toDouble / 1e9
  }
}

/** Row-local SimHash: each token hash votes ±1 on every one of `bits`
  * signature bits; the packed signature takes the sign of each vote
  * sum. One pass, no shuffle — replaces the exploded token table with
  * its 60-column aggregation buffer per doc.
  */
case class SimHashPack(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    SimHashPack.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashPack.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  def compute(hashes: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Row-local word n-gram array: n consecutive elements of an
  * `array<string>` joined by single spaces. The declarative forms are
  * interpreted higher-order functions — `transform(sequence, i ->
  * slice(ws, i+1, n))` is O(len²) per doc and even the zip-shift
  * rewrite stays out of whole-stage codegen; this expression is one
  * tight loop with offset-based UTF8String concat (d08 measured
  * 12.5 s → ~1 s at sf0.1).
  */
case class WordNgrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, false)

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val Sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(ws: ArrayData, n: Int): ArrayData = {
    val len = ws.numElements()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = ws.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
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

  /** Shannon entropy of an array<string> of symbols (fixed-point term
    * sum — see SymbolEntropy).
    */
  def symbol_entropy(symbols: Column): Column =
    ColumnBridge.column(SymbolEntropy(ColumnBridge.expression(symbols)))

  /** Packed SimHash of an array<long> of token hashes. */
  def simhash_pack(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimHashPack(ColumnBridge.expression(hashes), bits))

  /** Greedy longest-match subword count of an array<string> of words
    * (see BpeCount).
    */
  def bpe_count(words: Column): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(words)))

  /** Word n-gram array of an array<string> (see WordNgrams). */
  def word_ngrams(words: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(words), n))
}

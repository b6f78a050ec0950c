package graft

import graft.functions.{ArrayDotProduct, BpeCount, MinHashSignature,
  SimHashPack, SymbolEntropy, WordNgrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration so graft's native expressions
  * are first-class SQL functions — `SELECT array_dot(a, b)` works in
  * `spark.sql`, notebooks and JDBC alike, not just the Scala DSL.
  * Activate with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) =>
        ArrayDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig64"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig64"),
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, graft.dedup.MinHashLSH.NumHashes,
          2147483647L, graft.dedup.MinHashLSH.coeffA,
          graft.dedup.MinHashLSH.coeffB)))
    ext.injectFunction((
      new FunctionIdentifier("symbol_entropy"),
      new ExpressionInfo(classOf[SymbolEntropy].getName, "symbol_entropy"),
      (children: Seq[Expression]) => SymbolEntropy(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_pack"),
      new ExpressionInfo(classOf[SimHashPack].getName, "simhash_pack"),
      (children: Seq[Expression]) =>
        SimHashPack(children.head, graft.dedup.SimHash.Bits)))
    ext.injectFunction((
      new FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
      (children: Seq[Expression]) => BpeCount(children.head)))
    // word_ngrams(words_array, n): n is a Scala construction parameter
    // of the expression (the codegen'd loop bound), so the SQL form
    // requires a foldable integer literal for the second argument.
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        val nExpr = children(1)
        if (!nExpr.foldable)
          throw new IllegalArgumentException(
            "word_ngrams(arr, n): n must be a literal integer")
        val n = nExpr.eval() match {
          case i: Int   => i
          case l: Long  => l.toInt
          case s: Short => s.toInt
          case b: Byte  => b.toInt
          case other => throw new IllegalArgumentException(
            s"word_ngrams(arr, n): n must be an integer literal, got $other")
        }
        WordNgrams(children(0), n)
      }))
    // The three pair kernels take each side as PARALLEL PRIMITIVE
    // ARRAYS — days (array<date>, ascending, null-free) + closes
    // (array<bigint>, null-free) — round 17's replacement for the
    // struct-array form (see PairSeries: one UnsafeRow allocation per
    // merged element made the merge loop the suite's top JFR frame).
    // The r15/r16 precomputed max|y| bound arguments are gone: on
    // primitive arrays the kernel derives its exact-long guard with a
    // tight in-kernel scan.
    ext.injectFunction((
      new FunctionIdentifier("kendall_census"),
      new ExpressionInfo(classOf[graft.functions.KendallCensus].getName,
        "kendall_census"),
      (children: Seq[Expression]) => {
        if (children.size != 4)
          throw new IllegalArgumentException(
            "kendall_census(days_a, closes_a, days_b, closes_b)")
        graft.functions.KendallCensus(children(0), children(1),
          children(2), children(3))
      }))
    // ccf_moments(da, ya, db, yb, maxLag): maxLag is a construction
    // parameter (the compiled loop bound), so the SQL form requires a
    // foldable integer literal — word_ngrams' convention.
    ext.injectFunction((
      new FunctionIdentifier("ccf_moments"),
      new ExpressionInfo(classOf[graft.functions.CcfMoments].getName,
        "ccf_moments"),
      (children: Seq[Expression]) => {
        if (children.size != 5)
          throw new IllegalArgumentException(
            "ccf_moments(days_a, closes_a, days_b, closes_b, maxLag)")
        val lagExpr = children.last
        if (!lagExpr.foldable)
          throw new IllegalArgumentException(
            "ccf_moments: maxLag must be a literal integer")
        val maxLag = lagExpr.eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"ccf_moments: integer literal expected, got $other")
        }
        graft.functions.CcfMoments(children(0), children(1),
          children(2), children(3), maxLag)
      }))
    ext.injectFunction((
      new FunctionIdentifier("pair_lag_moments"),
      new ExpressionInfo(classOf[graft.functions.PairLagMoments].getName,
        "pair_lag_moments"),
      (children: Seq[Expression]) => {
        if (children.size != 4)
          throw new IllegalArgumentException(
            "pair_lag_moments(days_a, closes_a, days_b, closes_b)")
        graft.functions.PairLagMoments(children(0), children(1),
          children(2), children(3))
      }))
    // bloom_filter_agg(xxhash64(x), items, bits) / might_contain(
    // bloom, xxhash64(x)): Spark ships both expressions for its
    // automatic runtime-filter rewrite (SPARK-32268) but registers
    // neither as a SQL function; graft's decontamination Bloom
    // pre-filter (optimization guide §3.2 — drop definitely-non-
    // matching rows from the big side BEFORE its shuffle) builds the
    // filter explicitly as a bloom_filter_agg scalar subquery and
    // probes it with might_contain. Each expression's own type check
    // enforces its required shape (long-hash child, foldable sizes,
    // constant/scalar-subquery bloom side), so a misuse fails
    // analysis, not execution.
    ext.injectFunction((
      new FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]
          .getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
  }
}

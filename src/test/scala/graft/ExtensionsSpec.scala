package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("array_dot is callable from SQL via GraftExtensions") {
    val v = spark
      .sql("SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(v == 32.0)
  }

  test("minhash_sig64 is callable from SQL and returns 64 minima") {
    val sig = spark
      .sql("SELECT minhash_sig64(array(42L, 7L, 1234567L)) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 64)
    assert(sig.forall(v => v >= 0 && v < 2147483647L))
  }

  test("symbol_entropy, simhash_pack, bpe_count are callable from SQL") {
    // two equiprobable symbols → exactly 1 bit
    val h = spark.sql("SELECT symbol_entropy(array('a','b')) AS h")
      .head().getDouble(0)
    assert(math.abs(h - 1.0) < 1e-9)
    val sig = spark.sql("SELECT simhash_pack(array(42L)) AS s")
      .head().getLong(0)
    assert(sig == (42L & ((1L << 60) - 1)), "one hash votes its own bits")
    // 'the'(vocab)=1, 'table'=t+able=2
    val n = spark.sql("SELECT bpe_count(array('the','table')) AS n")
      .head().getLong(0)
    assert(n == 3L)
  }

  test("word_ngrams is callable from SQL with a literal n") {
    val grams = spark
      .sql("SELECT word_ngrams(split('a b c d', ' '), 2) AS g")
      .head().getSeq[String](0)
    assert(grams == Seq("a b", "b c", "c d"))
    // shorter than n → empty, matching the DSL/oracle convention
    val short = spark
      .sql("SELECT word_ngrams(split('a', ' '), 3) AS g")
      .head().getSeq[String](0)
    assert(short.isEmpty)
    // non-literal n is rejected, not silently mis-planned
    val err = intercept[Exception] {
      spark.sql("SELECT word_ngrams(split('a b', ' '), id + 1) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("sources round-trips preserve aggregates") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val viaCsv = sources.Sources.csvRoundtrip(spark, dir)
      .agg(sum("n_customers")).head().getLong(0)
    assert(viaCsv == Tables.customer(spark, dir).count())
    val viaJson = sources.Sources.jsonRoundtrip(spark, dir).count()
    val direct = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0).count()
    assert(viaJson == direct)
  }

  test("kendall_census intersects by day and counts C/D/tie pairs exactly") {
    // a: days 1..5 values 1,2,3,4,5 ; b: days 2,4,5,6 values 9,8,7,7
    // → common days 2,4,5 with (2,9),(4,8),(5,7): all three pairs a
    // up / b down → discordant. So [3, 0, 3, 0, 0].
    val cen = spark.sql(
      """SELECT kendall_census(
        |  array(DATE'2024-01-01', DATE'2024-01-02', DATE'2024-01-03',
        |        DATE'2024-01-04', DATE'2024-01-05'),
        |  array(1L, 2L, 3L, 4L, 5L),
        |  array(DATE'2024-01-02', DATE'2024-01-04', DATE'2024-01-05',
        |        DATE'2024-01-06'),
        |  array(9L, 8L, 7L, 7L)) AS c"""
        .stripMargin).head().getSeq[Long](0)
    assert(cen == Seq(3L, 0L, 3L, 0L, 0L))
    // ties on both sides: a = (1,1), b = (5,5) on two common days →
    // n_days 2, no C/D (both zero-sign), one tie pair each side
    val tied = spark.sql(
      """SELECT kendall_census(
        |  array(DATE'2024-01-01', DATE'2024-01-02'), array(1L, 1L),
        |  array(DATE'2024-01-01', DATE'2024-01-02'), array(5L, 5L)) AS c"""
        .stripMargin).head().getSeq[Long](0)
    assert(tied == Seq(2L, 0L, 0L, 1L, 1L))
    // disjoint day ranges → zero common days, all-zero census
    val none = spark.sql(
      """SELECT kendall_census(
        |  array(DATE'2024-01-01'), array(1L),
        |  array(DATE'2024-02-01'), array(1L)) AS c"""
        .stripMargin).head().getSeq[Long](0)
    assert(none == Seq(0L, 0L, 0L, 0L, 0L))
    // arity is enforced loudly at resolution
    val e = intercept[Exception](spark.sql(
      "SELECT kendall_census(array(DATE'2024-01-01'), array(1L))"))
    assert(e.getMessage.contains("kendall_census"))
  }

  test("ccf_moments computes exact per-lag overlap moment sums") {
    // common days (1,2,4): ya = (1,2,4), yb = (10,20,40) aligned;
    // lag 0: n=3, sx=7, sy=70, sxx=21, syy=2100, sxy=210;
    // lag +1 pairs (ya_i, yb_{i+1}): (1,20),(2,40) → n=2, sx=3,
    // sy=60, sxy=100; lag −1 pairs (2,10),(4,20) → sxy=100 too
    val rows = spark.sql(
      """SELECT explode(ccf_moments(
        |  array(DATE'2024-01-01', DATE'2024-01-02', DATE'2024-01-03',
        |        DATE'2024-01-04'),
        |  array(1L, 2L, 3L, 4L),
        |  array(DATE'2024-01-01', DATE'2024-01-02', DATE'2024-01-04',
        |        DATE'2024-01-05'),
        |  array(10L, 20L, 40L, 50L),
        |  1)) AS m""".stripMargin)
      .select("m.lag", "m.n", "m.sx", "m.sy", "m.sxx", "m.syy", "m.sxy")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(rows(0) == ((3L, 7L, 70L, 21L, 2100L, 210L)), rows(0).toString)
    assert(rows(1) == ((2L, 3L, 60L, 5L, 2000L, 100L)), rows(1).toString)
    assert(rows(-1) == ((2L, 6L, 30L, 20L, 500L, 100L)), rows(-1).toString)
  }

  test("null day/y rows never reach the kernels (join-form parity " +
      "moved into PairPlan's collapse; kernels reject nulls loudly)") {
    import spark.implicits._
    // ticker 1 has a null close on day 2 and ticker 2 a null day row:
    // the join-form aggregates the kernels replaced ignored such rows,
    // so PairPlan's collapse must drop them BEFORE collecting — the
    // pair then shares days 1 and 3 only, one concordant pair
    // (a: 1→3 up, b: 5→7 up)
    val closes = Seq(
      (1L, "a", Option(java.sql.Date.valueOf("2024-01-01")), Option(1L)),
      (1L, "a", Option(java.sql.Date.valueOf("2024-01-02")), None),
      (1L, "a", Option(java.sql.Date.valueOf("2024-01-03")), Option(3L)),
      (2L, "a", Option(java.sql.Date.valueOf("2024-01-01")), Option(5L)),
      (2L, "a", Option(java.sql.Date.valueOf("2024-01-02")), Option(6L)),
      (2L, "a", Option(java.sql.Date.valueOf("2024-01-03")), Option(7L)),
      (2L, "a", None, Option(99L)))
      .toDF("user_id", "event_type", "day", "y")
    val pair = graft.operators.PairPlan.tickerPairs(spark, closes)
    val cen = pair
      .selectExpr("kendall_census(ad_a, ay_a, ad_b, ay_b) AS c")
      .head().getSeq[Long](0)
    assert(cen == Seq(2L, 1L, 0L, 0L, 0L))
    val m0 = graft.operators.PairPlan.tickerPairs(spark, closes)
      .selectExpr("explode(ccf_moments(ad_a, ay_a, ad_b, ay_b, 0)) AS m")
      .select("m.n", "m.sx", "m.sy", "m.sxy").head()
    assert((m0.getLong(0), m0.getLong(1), m0.getLong(2), m0.getLong(3)) ==
      ((2L, 4L, 12L, 26L))) // (1,5),(3,7): sxy = 5 + 21
    val pl = graft.operators.PairPlan.tickerPairs(spark, closes)
      .selectExpr("pair_lag_moments(ad_a, ay_a, ad_b, ay_b) AS m")
      .select("m.nf", "m.ua", "m.ub", "m.m", "m.sab1").head()
    // lag row pairs (x,y)=(3,7) with (x₋,y₋)=(1,5): sab1 = Σx·y₋ = 15
    assert((pl.getLong(0), pl.getLong(1), pl.getLong(2), pl.getLong(3),
      pl.getLong(4)) == ((2L, 4L, 12L, 1L, 15L)))
    // a null element handed directly to a kernel is a CONTRACT
    // violation and must throw, never read as 0
    val e = intercept[Exception](spark.sql(
      """SELECT kendall_census(
        |  array(DATE'2024-01-01', DATE'2024-01-02'),
        |  array(1L, CAST(NULL AS BIGINT)),
        |  array(DATE'2024-01-01', DATE'2024-01-02'),
        |  array(5L, 6L))""".stripMargin).head())
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("product-sum kernels throw loudly past the exact-long domain") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.{CcfMoments, KendallCensus, PairLagMoments}
    def days(n: Int): GenericArrayData =
      new GenericArrayData((0 until n).map(i => i: Any).toArray)
    def ys(n: Int, v: Long): GenericArrayData =
      new GenericArrayData(Array.fill[Any](n)(v))
    // the guard is the pre-merge min(na,nb)·max|y|² bound (round-15
    // verdict item 1, rederived in-kernel from the primitive arrays
    // since round 17 — one tight scan, still outside the merge loop):
    // a single day at |y| = 4e9 overflows a squared product
    // (1.6e19 > 2⁶³−1) and must throw...
    val d1 = days(1)
    val big = ys(1, 4000000000L)
    val one = ys(1, 1L)
    val e1 = intercept[ArithmeticException](
      CcfMoments.compute(d1, big, d1, one, 0))
    assert(e1.getMessage.contains("exact-long domain"))
    val e2 = intercept[ArithmeticException](
      PairLagMoments.compute(d1, big, d1, one))
    assert(e2.getMessage.contains("exact-long domain"))
    // ...while 1000 common days at |y| ≤ 1e6 (d·M² = 1e15, exactly
    // representable) must COMPUTE — the old d ≤ 900 constant guard
    // wrongly rejected this history (ADVICE r14)
    val d1k = days(1000)
    val long1k = ys(1000, 1000000L)
    assert(PairLagMoments.compute(d1k, long1k, d1k, long1k)
      .getLong(0) == 1000L)
    // the same 1000 days at the full 1e8 close grid (d·M² = 1e19)
    // genuinely overflows: the count×magnitude guard still fires
    val hot1k = ys(1000, 100000000L)
    val e3 = intercept[ArithmeticException](
      PairLagMoments.compute(d1k, hot1k, d1k, hot1k))
    assert(e3.getMessage.contains("1000 common days"))
    // kendall_census compares signs only — no product, no guard:
    // the same inputs census fine
    val cen = KendallCensus.compute(d1k, hot1k, d1k, hot1k)
    assert(cen.getLong(0) == 1000L)
    assert(KendallCensus.compute(d1, big, d1, one).getLong(0) == 1L)
    // mismatched day/close lengths are a contract violation, loudly
    val e4 = intercept[IllegalArgumentException](
      PairLagMoments.compute(d1k, ys(999, 1L), d1k, long1k))
    assert(e4.getMessage.contains("length"))
  }
}

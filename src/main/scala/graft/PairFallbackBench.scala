package graft

/** Broadcast-vs-bucketed timing for the pair-plan budget gate
  * (round-14 verdict item 4): [[graft.operators.PairPlan.tickerPairs]]
  * falls back to a bucketed shuffle-hash pair join once the per-ticker
  * array table outgrows the broadcast budget — the path that exists
  * specifically for 100×-scale catalogs — but until this probe it was
  * only ever spec-proven output-identical, never TIMED on data big
  * enough to mean anything.
  *
  * Protocol: stage BenchScale's sf1 (10×) events copy, then time
  * q94/q108 best-of-2 twice on the SAME staged table — once on the
  * default (broadcast) path, once with
  * `spark.graft.pair.broadcastBudgetBytes` forced to 4 MB so the
  * ~17 MB sf1 array table shards into ⌈17/4⌉ ≈ 5 buckets, the same
  * est/budget ratio a ~500 MB catalog would hit at the default
  * 100 MB budget. Row counts are asserted IDENTICAL across paths
  * (the gate changes distribution, never semantics). One JSON line on
  * stdout, mirrored to BENCH_pair_fallback.json.
  */
object PairFallbackBench {
  private val Entries = Seq("q94_corr_matrix", "q108_cross_correlation")
  private val ForcedBudgetBytes = 4L << 20

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = BenchScale.stageSf1(spark, sfDir)

    def settle(): Unit = { System.gc(); Thread.sleep(100L); System.gc() }
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    def timeOnce(name: String): (Double, Long) = {
      settle()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sweep()
      (dt, n)
    }
    def best2(name: String): (Double, Long) = {
      val a = timeOnce(name)
      val b = timeOnce(name)
      if (a._1 <= b._1) a else b
    }

    val budgetKey = graft.operators.PairPlan.BudgetConfKey
    Entries.foreach(timeOnce) // warm pass (JIT) on the broadcast path
    val broad = Entries.map(e => e -> best2(e)).toMap
    spark.conf.set(budgetKey, ForcedBudgetBytes.toString)
    Entries.foreach(timeOnce) // warm the bucketed path's codegen too
    val bucket = Entries.map(e => e -> best2(e)).toMap
    spark.conf.unset(budgetKey)

    val qs = Entries.map { e =>
      val (bs, bn) = broad(e)
      val (ss, sn) = bucket(e)
      require(bn == sn,
        s"$e: bucketed path changed the row count ($bn vs $sn)")
      f"""\"$e\":{\"broadcast_sec\":$bs%.3f,\"bucketed_sec\":$ss%.3f,""" +
        f"""\"bucketed_over_broadcast\":${ss / bs}%.2f,\"rows\":$bn}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"pair_fallback_probe","dir":"$dir",""" +
      s""""forced_budget_bytes":$ForcedBudgetBytes,"queries":$qs}"""
    println(line)
    val out = new java.io.PrintWriter("BENCH_pair_fallback.json")
    try out.println(line) finally out.close()
    spark.stop()
  }
}

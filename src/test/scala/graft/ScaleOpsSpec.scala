package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("q92 partitioned write: exact roundtrip and dynamic overwrite " +
    "keeps untouched partitions") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q92spec").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click",
        1.5, ""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "click",
        2.5, ""),
      (3L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "view",
        3.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.sources.Sources.q92PartitionedWrite(spark, tmp)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r).toMap
    assert(out(("click", "2024-01-01")).getAs[Long]("n_rows") == 2L &&
      out(("click", "2024-01-01")).getAs[Long]("sum_v4") == 40000L)
    assert(out(("view", "2024-01-02")).getAs[Long]("sum_v4") == 30000L)
    // dynamic overwrite: a click-only second batch must leave the
    // view partition in place (static overwrite would truncate it)
    val path = s"/tmp/graft_pwrite/v1/${tmp.replaceAll("[^a-zA-Z0-9]", "_")}"
    Seq((9L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 1L,
      "click", 9.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        to_date(col("ts")).as("day"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long").as("v4l"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type")
      .parquet(path)
    val back = spark.read.parquet(path)
    assert(back.filter(col("event_type") === "view").count() == 1L,
      "dynamic overwrite must not truncate untouched partitions")
    assert(back.filter(col("event_type") === "click").count() == 1L,
      "the click partition is replaced by the new batch")
  }

  test("q33 asof join picks the latest order at-or-before each event") {
    val rows = ScaleOps.asofJoin(spark, dir)
    assert(rows.count() == Tables.events(spark, dir).count())
    // spot-check one event against a direct subquery
    val sample = rows.filter(col("o_orderkey").isNotNull).head()
    val (uid, ts, ok) = (sample.getLong(1), sample.getTimestamp(2),
      sample.getLong(4))
    val expect = Tables.orders(spark, dir)
      .filter(col("o_custkey") === uid && col("o_orderdate") <= lit(ts))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .head()
    assert(expect.getLong(0) == ok)
  }

  test("q34 salted agg equals the direct aggregation") {
    val salted = ScaleOps.saltedAgg(spark, dir).collect()
    val direct = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(28,6)")).cast("double")
        .as("total_value"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id")).collect()
    assert(salted.sameElements(direct))
  }

  test("q35 bucketed join plans no shuffle exchange") {
    val df = ScaleOps.bucketedJoin(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val joinShuffles = plan.split("\n")
      .count(l => l.contains("Exchange hashpartitioning") &&
        (l.contains("custkey")))
    assert(joinShuffles == 0, s"bucketed join still shuffles:\n$plan")
    assert(df.count() > 0)
  }

  test("q36 partition-pruned scan only reads the filtered partition") {
    val df = ScaleOps.partitionedScan(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning:\n$plan")
    val direct = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == direct)
  }

  test("q40 heap top-k aggregate emits exactly the window-rank rows") {
    val viaHeap = ScaleOps.topkAggregate(spark, dir).collect()
    val viaWindow = operators.Relational.windowRank(spark, dir).collect()
    assert(viaHeap.length == viaWindow.length)
    viaHeap.zip(viaWindow).foreach { case (h, w) =>
      assert(h.getLong(0) == w.getLong(0) && h.getInt(1) == w.getInt(1) &&
        h.getLong(2) == w.getLong(2) && h.getDouble(3) == w.getDouble(3),
        s"mismatch: $h vs $w")
    }
  }

  test("q37 HLL sketch lands within 5% (or ±1 at tiny n) of exact distinct") {
    ScaleOps.approxDistinct(spark, dir).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      // ±1 floor: at sf0.001 each type has 15 users and the exact
      // register bank deterministically lands on 14 (one linear-
      // counting collision) — a 6.7% relative error that is really
      // one-count granularity
      assert(math.abs(approx - exact) <= math.max(0.05 * exact, 1.0),
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("q56 selection quantiles are input values at the ceil(p·n) ranks") {
    val rows = ScaleOps.groupQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val n = r.getLong(1)
      val sorted = Tables.events(spark, dir)
        .filter(col("event_type") === et)
        .select(floor(col("value") * lit(10000.0) + lit(0.5)).cast("long"))
        .collect().map(_.getLong(0)).sorted
      assert(n == sorted.length)
      def at(rank: Long): Double = sorted(rank.toInt - 1) / 10000.0
      def ceilRank(num: Long, den: Long): Long = (num * n + den - 1) / den
      assert(r.getDouble(2) == at(1), s"$et min")
      assert(r.getDouble(3) == at(ceilRank(1, 2)), s"$et p50")
      assert(r.getDouble(4) == at(ceilRank(9, 10)), s"$et p90")
      assert(r.getDouble(5) == at(ceilRank(99, 100)), s"$et p99")
      assert(r.getDouble(6) == at(n), s"$et max")
      // tail order sanity: min ≤ p50 ≤ p90 ≤ p99 ≤ max
      assert(r.getDouble(2) <= r.getDouble(3) &&
        r.getDouble(3) <= r.getDouble(4) &&
        r.getDouble(4) <= r.getDouble(5) &&
        r.getDouble(5) <= r.getDouble(6))
    }
  }

  test("q56 plans exactly one corpus exchange (window + agg share it)") {
    val plan = ScaleOps.groupQuantiles(spark, dir)
      .queryExecution.executedPlan.toString
    val corpusExchanges = plan.split("\n")
      .count(l => l.contains("Exchange hashpartitioning") &&
        l.contains("event_type"))
    assert(corpusExchanges <= 1, s"expected one event_type exchange:\n$plan")
  }

  test("q58 winsorize clips into the exact [p05, p95] band") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wins").toString
    // one group of 40 values 1..40: lo = ceil(40/20) = rank 2 → 2,
    // hi = ceil(19·40/20) = rank 38 → 38
    (1 to 40).map(i => (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        1L, "m", i.toDouble, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = ScaleOps.winsorize(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 40)
    assert(out(1L).getAs[Double]("value_w") == 2.0 &&
      out(1L).getAs[Int]("clip_lo") == 1)
    assert(out(39L).getAs[Double]("value_w") == 38.0 &&
      out(39L).getAs[Int]("clip_hi") == 1)
    assert(out(40L).getAs[Double]("value_w") == 38.0)
    assert(out(2L).getAs[Double]("value_w") == 2.0 &&
      out(2L).getAs[Int]("clip_lo") == 0)
    assert(out(20L).getAs[Double]("value_w") == 20.0 &&
      out(20L).getAs[Int]("clip_lo") + out(20L).getAs[Int]("clip_hi") == 0)
  }

  test("q58 plans one corpus exchange; bounds join back by broadcast") {
    val df = ScaleOps.winsorize(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val corpusExchanges = plan.split("\n")
      .count(l => l.contains("Exchange hashpartitioning") &&
        l.contains("event_type"))
    assert(corpusExchanges <= 1, s"expected one event_type exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"bounds must broadcast:\n$plan")
  }
}

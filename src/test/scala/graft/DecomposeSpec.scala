package graft

import graft.operators.Decompose
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecomposeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("decomposition recomposes: value = trend + seasonal + remainder (±1e-4)") {
    val bad = Decompose
      .decompose(spark, dir)
      .withColumn("recomposed",
        col("trend") + col("seasonal") + col("remainder"))
      .filter(abs(col("recomposed") - col("value")) > 0.00011)
      .count()
    assert(bad == 0)
  }

  test("anomalize scores are non-negative and flags require score > 1") {
    val rows = Decompose.anomalize(spark, dir)
      .select("score", "is_anomaly").collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0)
      assert(r.getInt(1) == (if (r.getDouble(0) > 1) 1 else 0))
    }
  }

  test("seasonal ESD finds an injected point spike") {
    import spark.implicits._
    // Build a synthetic single-ticker series with one gross outlier.
    val rows = (0 until 40).map { i =>
      val v = if (i == 25) 500.0 else 10.0 + (i % 7)
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i / 2 + 1}%02d 0${i % 2}:00:00"),
        1L, "tick", v)
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("esd").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val found = Decompose.seasonalEsd(spark, tmp)
      .filter(col("event_id") === 25L).count()
    assert(found == 1, "ESD should flag the injected spike")
  }

  test("seasonal ESD direction knob selects the tested tail") {
    import spark.implicits._
    // one ticker, flat-ish base, a gross positive spike and a gross
    // negative spike — direction must pick only its own tail's outlier
    val rows = (0 until 40).map { i =>
      val v = i match {
        case 25 => 500.0
        case 30 => -480.0
        case _  => 10.0 + (i % 7)
      }
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i / 2 + 1}%02d 0${i % 2}:00:00"),
        1L, "tick", v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("esd_dir").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def ids(direction: String) =
      Decompose.seasonalEsd(spark, tmp, maxAnomFrac = 0.05,
          direction = direction)
        .select("event_id").collect().map(_.getLong(0)).toSet
    val pos = ids("pos")
    val neg = ids("neg")
    val both = ids("both")
    assert(pos.contains(25L) && !pos.contains(30L), s"pos found $pos")
    assert(neg.contains(30L) && !neg.contains(25L), s"neg found $neg")
    assert(both.subsetOf(Set(25L, 30L)) && both.nonEmpty, s"both found $both")
  }

  test("q16 loess decompose recomposes and picks a sane auto period") {
    val rows = Decompose.q16LoessDecompose(spark, dir)
      .withColumn("recomposed",
        col("trend") + col("seasonal") + col("remainder"))
      .select("period", "value", "recomposed").collect()
    rows.foreach { r =>
      assert(r.getInt(0) >= 2 && r.getInt(0) <= 30)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
        "value must equal trend + seasonal + remainder exactly")
    }
  }

  test("q18 robust loess: bisquare pass pulls the trend off an outlier") {
    import spark.implicits._
    // smooth ramp with one gross spike: the robust trend at the spike
    // must sit closer to the local ramp than the non-robust trend
    val rows = (0 until 60).map { i =>
      val v = if (i == 30) 1000.0 else 10.0 + 0.5 * i
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i / 2 + 1}%02d 0${i % 2}:00:00"),
        1L, "tick", v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("loess").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def trendAt30(df: org.apache.spark.sql.DataFrame): Double =
      df.filter(col("event_id") === 30L).select("trend").head().getDouble(0)
    val plain = trendAt30(Decompose.q16LoessDecompose(spark, tmp))
    val robust = trendAt30(Decompose.q18RobustLoess(spark, tmp))
    val local = 10.0 + 0.5 * 30 // the uncontaminated ramp value
    assert(math.abs(robust - local) < math.abs(plain - local),
      s"robust $robust should beat plain $plain against local $local")
    // recompose exactness holds for the robust variant too
    val bad = Decompose.q18RobustLoess(spark, dir)
      .withColumn("rec", col("trend") + col("seasonal") + col("remainder"))
      .filter(abs(col("rec") - col("value")) > 1e-9).count()
    assert(bad == 0)
  }

  test("q17 twitter decompose: median trend is constant per key, exact recompose") {
    val rows = Decompose.q17TwitterDecompose(spark, dir)
      .select("user_id", "event_type", "value", "trend", "seasonal", "remainder")
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) -
        (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))) < 1e-9,
        "value must equal trend + seasonal + remainder")
    }
    val trendsPerKey = rows
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .values.map(_.map(_.getDouble(3)).distinct.size)
    assert(trendsPerKey.forall(_ == 1), "median trend must be one value per key")
  }

  test("fault injection produces flagged anomalies") {
    val flagged = Decompose.faultInjectedFlags(spark, dir)
    assert(flagged.count() > 0)
  }

  test("ESD is deterministic across runs") {
    val a = Decompose.seasonalEsd(spark, dir).collect()
    val b = Decompose.seasonalEsd(spark, dir).collect()
    assert(a.sameElements(b))
  }

  test("q83 strength: a weekly cycle scores seasonal, a ramp scores " +
      "trending, alternation scores neither") {
    import spark.implicits._
    // period-7 pattern (matches the decomposition's hard-coded
    // frequency), a pure ramp, and a ±1 alternation (period 2 — the
    // odd 7-phase split mixes its signs, so no seasonal credit)
    val pat = Seq(0.0, 3, 8, 2, 9, 1, 5)
    def series(key: String, f: Int => Double) =
      (0 until 42).map(i => (1L, key, i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), f(i)))
    val rows = series("season", i => 10.0 + pat(i % 7)) ++
      series("ramp", i => 10.0 + 0.5 * i) ++
      series("noise", i => if (i % 2 == 0) 9.0 else 11.0)
    val tmp = java.nio.file.Files.createTempDirectory("q83spec").toString
    rows.toDF("user_id", "event_type", "event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Decompose.q83SeasonalStrength(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("season").getAs[Long]("seasonal_strength6") >= 800000L,
      out("season").toString)
    assert(out("season").getAs[Int]("strongly_seasonal") == 1)
    assert(out("ramp").getAs[Long]("trend_strength6") >= 800000L,
      out("ramp").toString)
    assert(out("ramp").getAs[Int]("trending") == 1)
    assert(out("ramp").getAs[Long]("seasonal_strength6") < 600000L,
      out("ramp").toString)
    assert(out("noise").getAs[Long]("seasonal_strength6") < 600000L,
      out("noise").toString)
    assert(out("noise").getAs[Int]("trending") == 0, out("noise").toString)
  }
}

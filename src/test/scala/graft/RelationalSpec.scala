package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.get("local[4]")
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without queries entry: $extra")
  }

  test("q20 aggregates lineitem pricing summary deterministically") {
    val rows = operators.Relational.aggGroupBy(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("A", "N", "R")))
    val again = operators.Relational.aggGroupBy(spark, dir).collect()
    assert(rows.sameElements(again))
  }

  test("q32 sessionize splits on >30min gaps") {
    val df = operators.Relational.sessionize(spark, dir)
    val perUser = df.groupBy("user_id").count().collect()
    assert(perUser.forall(_.getLong(1) >= 1))
  }

  test("q42 median is an actual element with half the group at or below it") {
    import org.apache.spark.sql.functions._
    val med = operators.Relational.medianGroups(spark, dir).collect()
    val ev = Tables.events(spark, dir).cache()
    med.foreach { r =>
      val (et, m, n) = (r.getString(0), r.getDouble(1), r.getLong(2))
      val below = ev.filter(col("event_type") === et && col("value") <= m).count()
      assert(below >= (n + 1) / 2, s"$et: $below of $n at or below median $m")
      assert(ev.filter(col("event_type") === et && col("value") === m).count() >= 1)
    }
  }

  test("q44 returns only orders strictly above their customer mean") {
    import org.apache.spark.sql.functions._
    val out = operators.Relational.correlatedAboveAvg(spark, dir)
    val joined = out.join(
      Tables.orders(spark, dir).groupBy(col("o_custkey").as("k"))
        .agg(avg(col("o_totalprice")).as("mean")),
      col("o_custkey") === col("k"))
    assert(joined.filter(col("o_totalprice") <= col("mean") - 1e-6).count() == 0)
  }

  test("q46 pivot cells sum to the order count") {
    import org.apache.spark.sql.functions._
    val p = operators.Relational.pivotSegments(spark, dir)
    val cells = p.collect().map(r => (1 to 5).map(i => r.getLong(i)).sum).sum
    assert(cells == Tables.orders(spark, dir).count())
  }

  test("broadcast joins planned for dim tables in q21") {
    val plan = operators.Relational
      .joinAgg(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast join")
  }

  test("q24 pushes filters and prunes columns at the parquet scan") {
    val plan = operators.Relational
      .filterPushdown(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"filters not pushed:\n$plan")
    val scanLine = plan.split("\n").find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("l_tax"), "scan reads unprojected columns")
  }

  test("q51 upsert: updated keys carry version 1, others keep the base row") {
    val rows = operators.Relational.upsertMerge(spark, dir).collect()
    val byKey = rows.map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(byKey.nonEmpty)
    byKey.foreach { case (k, v) =>
      assert(v == (if (k % 7 == 0) 1 else 0),
        s"key $k has version $v")
    }
    assert(rows.length == byKey.size, "exactly one surviving row per key")
  }

  test("q20 scan reads only the 5 referenced lineitem columns") {
    val plan = operators.Relational
      .aggGroupBy(spark, dir).queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("l_shipdate") && !scanLine.contains("l_orderkey"),
      s"column pruning failed: $scanLine")
  }
}

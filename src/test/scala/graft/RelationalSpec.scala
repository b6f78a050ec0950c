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

  test("q20 scan reads only the 5 referenced lineitem columns") {
    val plan = operators.Relational
      .aggGroupBy(spark, dir).queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("l_shipdate") && !scanLine.contains("l_orderkey"),
      s"column pruning failed: $scanLine")
  }
}

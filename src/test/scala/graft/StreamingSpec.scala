package graft

import graft.streaming.StreamingAnomaly
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("st01 windowed agg totals match the batch count") {
    val windows = StreamingAnomaly.st01WindowAgg(spark, dir)
    val total = windows.agg(sum("n_events")).collect()(0).getLong(0)
    val batchTotal = Tables.events(spark, dir).count()
    // 6h windows sliding every 3h → each event lands in exactly 2 windows
    assert(total == 2 * batchTotal, s"windowed total $total vs batch $batchTotal")
  }

  test("st02 stateful flags emit one row per event and match batch run-length semantics") {
    val out = StreamingAnomaly.st02StatefulFlags(spark, dir)
    val n = out.count()
    assert(n == Tables.events(spark, dir).count())
    val bad = out.filter(
      (col("anomaly") === 1 && col("stddev_flag") === 0 && col("repetition_flag") === 0) ||
      (col("anomaly") === 0 && (col("stddev_flag") === 1 || col("repetition_flag") === 1)))
      .count()
    assert(bad == 0)
  }

  test("st03 streaming dedup emits each (user, type, value) once") {
    val out = StreamingAnomaly.st03StreamDedup(spark, dir)
    val n = out.count()
    val distinct = Tables.events(spark, dir)
      .select("user_id", "event_type", "value").distinct().count()
    assert(n == distinct, s"stream dedup $n vs batch distinct $distinct")
  }

  test("st07 streaming corpus prep matches the batch distinct feature set") {
    val out = graft.streaming.StreamingCorpus.st07StreamCorpus(spark, dir)
    val n = out.count()
    val distinct = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.md5(
        graft.dedup.Dedup.normText(org.apache.spark.sql.functions.col("text"))))
      .distinct().count()
    assert(n == distinct, s"stream corpus $n vs batch distinct $distinct")
  }

  test("st04 stream-stream interval join matches the batch formulation") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingAnomaly.st04StreamStreamJoin(spark, dir).count()
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("click_user"))
    val batch = purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .count()
    assert(streamed == batch && batch > 0,
      s"stream join $streamed vs batch $batch")
  }

  test("st05 stream-static join matches the batch join-aggregate") {
    val streamed = StreamingAnomaly.st05StreamStaticJoin(spark, dir).collect()
    val batch = Tables.events(spark, dir)
      .join(Tables.customer(spark, dir), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(batch((r.getString(0), r.getString(1))) == r.getLong(2))
    }
  }

  test("st02 is deterministic across runs") {
    val a = StreamingAnomaly.st02StatefulFlags(spark, dir).collect()
    val b = StreamingAnomaly.st02StatefulFlags(spark, dir).collect()
    assert(a.sameElements(b))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Local testing runs `local[32]` on one JVM; the settings below are the
  * ones that also matter on a real cluster: AQE (runtime re-planning +
  * skew-join splitting), a shuffle partition count sized to the
  * parallelism actually available, UTC session time, and a broadcast
  * threshold large enough that every dimension table in the star schema
  * broadcasts instead of shuffling.
  */
object GraftSession {
  def builder(master: String = "local[32]"): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // events.ts is parquet TIMESTAMP(NANOS); read as raw int64 once,
      // session-wide, instead of mutating the conf per Tables.events call
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[32]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

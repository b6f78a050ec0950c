package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data
  * (TESTDATA.md). `dir` is an sf directory such as
  * `/root/testdata/sf0.01`. At production scale the same loaders point
  * at a partitioned table root; nothing below depends on data volume.
  */
object Tables {
  /** Parquet timestamps written without `isAdjustedToUTC` read as
    * TIMESTAMP_NTZ under Spark 4's NTZ inference; every repo operator
    * (and the DuckDB oracles, which treat the same bytes as naive
    * TIMESTAMP) computes in session-UTC TimestampType, so normalize
    * NTZ columns to TimestampType at the loader — a wall-clock
    * identity under the UTC session the entry points pin.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(df) { (d, f) =>
        d.withColumn(f.name, d.col(f.name).cast(TimestampType))
      }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String)    = load(s, d, "region")
  def nation(s: SparkSession, d: String)    = load(s, d, "nation")
  def customer(s: SparkSession, d: String)  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = load(s, d, "supplier")
  def part(s: SparkSession, d: String)      = load(s, d, "part")
  def orders(s: SparkSession, d: String)    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
    * TimestampType (µs) cannot read directly — read the raw int64
    * nanos and truncate to µs (same truncation DuckDB applies when
    * casting TIMESTAMP_NS → TIMESTAMP, so oracles agree).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Every repo entry point (GraftSession, and Bench/Verify through
    // it) sets this at build time; the one-time defensive set below
    // only exists for FOREIGN sessions — the driver's smoke check
    // calls SparkEntry with a session we didn't construct.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!s.conf.getOption(key).contains("true")) s.conf.set(key, "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df // already µs-precision timestamps
    }
  }
  def documents(s: SparkSession, d: String) = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")
}

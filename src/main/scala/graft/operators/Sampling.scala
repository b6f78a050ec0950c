package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators — the two selection
  * primitives every training-data pipeline needs in front of a corpus:
  * a reproducible train/val/test split and per-stratum downsampling.
  *
  * Both are built on CONTENT-ADDRESSED hashing (md5 of the key plus a
  * salt) instead of `rand()`: the assignment of a row never changes
  * across runs, partitionings, cluster sizes, or engines, so pipelines
  * can be re-run incrementally and audited — and the DuckDB oracle can
  * reproduce the exact row set (both engines render md5 as lowercase
  * hex, so one lexicographic threshold compare is the whole mechanism).
  * Zero shuffles: a codegen'd row-local filter/projection that runs at
  * scan speed on any corpus size.
  */
object Sampling {

  /** Hash a key column into [0,1)-by-prefix: lowercase md5 hex of
    * (key, salt). A fraction f maps to the 8-hex-digit prefix of
    * f·16⁸ — comparing the full digest against that prefix selects a
    * deterministic ≈f share (exact to 16⁻⁸).
    */
  private def saltedHash(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(salt)))

  /** d07: reproducible 80/10/10 train/val/test split of the documents
    * corpus. Thresholds are the hex expansions of 0.8 (0xcccccccc…)
    * and 0.9 (0xe6666666…).
    */
  def trainSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        saltedHash(col("doc_id"), "d07").as("h"))
      .withColumn("split",
        when(col("h") < "cccccccc", "train")
          .when(col("h") < "e6666666", "val")
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))

  /** q52: stratified downsample of the event stream — rare/valuable
    * strata kept whole, bulk strata thinned, all deterministic:
    * purchase 100%, error 50%, click 20%, signup 10%, other 5%.
    * ("g" sorts after every hex digest → keep-all.)
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val thr = when(col("event_type") === "purchase", lit("g"))
      .when(col("event_type") === "error", lit("80000000"))
      .when(col("event_type") === "click", lit("33333333"))
      .when(col("event_type") === "signup", lit("19999999"))
      .otherwise(lit("0ccccccc"))
    Tables.events(s, dir)
      .filter(saltedHash(col("event_id"), "q52") < thr)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .orderBy(col("event_id"))
  }
}

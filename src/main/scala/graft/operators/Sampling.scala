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

  /** d09: DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") — score
    * every training document by how much its unigram distribution
    * looks like a TARGET domain vs the raw corpus, keep the top
    * fraction. The target here is the deterministic doc_id % 20 == 0
    * slice (d08's reproducible-slice trick); production points it at a
    * curated high-quality sample.
    *
    * weight(d) = Σ_{token w ∈ d} ln p̂_t(w)/p̂_r(w), with add-1
    * smoothed counts over the shared vocabulary. Cross-engine exact:
    * the ratio is a single double division of two exact integer
    * products, each ln() term is quantized to a 1e-9 fixed-point long
    * (t05/t06's discipline), and per-doc sums are exact long sums of
    * (count × term) products.
    *
    * Scale shape: ONE corpus scan → per-(doc, word) counts
    * (localCheckpoint: vocabulary stats and scoring both consume it);
    * vocabulary stats are a word-dictionary groupBy (Zipf-compact);
    * per-word scores join back to the tf table (AQE broadcasts the
    * dictionary when it fits); per-doc weights are ONE map-side-
    * combined groupBy. The final ranking windows a table with ONE ROW
    * PER DOCUMENT — already 4-6 orders of magnitude reduced from the
    * corpus (q45's global-window class); for extreme doc counts swap
    * the row_number for a quantile-threshold pass.
    */
  def importanceSample(s: SparkSession, dir: String,
      frac: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val isTarget = col("doc_id") % 20 === 0
    val tf = docs
      .select(col("doc_id"),
        explode(regexp_extract_all(graft.dedup.Dedup.normText(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val vocab = tf.groupBy(col("w")).agg(
      sum(when(isTarget, col("n")).otherwise(lit(0L))).as("ct"),
      sum(when(!isTarget, col("n")).otherwise(lit(0L))).as("cr"))
    val tot = vocab.select(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    // s_e9(w) = ⌊ln(((ct+1)(nr+V)) / ((cr+1)(nt+V))) · 1e9 + ½⌋ —
    // integer products exact in long, ONE double division, ONE ln
    val scored = vocab.crossJoin(broadcast(tot))
      .select(col("w"),
        floor(log(((col("ct") + 1) * (col("nr") + col("v"))).cast("double") /
            ((col("cr") + 1) * (col("nt") + col("v"))).cast("double")) *
          lit(1e9) + lit(0.5)).cast("long").as("s_e9"))
    val dw = tf.filter(!isTarget)
      .join(scored, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tok"),
        sum(col("n") * col("s_e9")).as("w_e9"))
    // every train doc gets a weight (token-free docs score 0)
    val all = docs.filter(!isTarget).select(col("doc_id"))
      .join(dw, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("w_e9"), lit(0L)).as("w_e9"))
    val k = all.select(floor(count(lit(1)) * lit(frac)).cast("long").as("k"))
    val wnd = Window.orderBy(col("w_e9").desc, col("doc_id"))
    all.crossJoin(broadcast(k))
      .withColumn("rk", row_number().over(wnd))
      .select(col("doc_id"), col("n_tok"),
        (col("w_e9").cast("double") / lit(1e9)).as("weight"),
        when(col("rk") <= col("k"), 1).otherwise(0).as("selected"))
      .orderBy(col("doc_id"))
  }
}

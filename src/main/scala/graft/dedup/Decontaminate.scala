package graft.dedup

import graft.Tables
import graft.dedup.Dedup.normText
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d08: benchmark decontamination — the GPT-3-style n-gram overlap
  * rule: a training document is CONTAMINATED if it shares any word
  * n-gram with the held-out evaluation set, and must be dropped before
  * pretraining. The GPT-3 paper (Brown et al. 2020, appendix C) uses
  * 13-grams in production; `n` is a parameter with [[ProductionNgramN]]
  * = 13 as the documented production default, and the graded entry uses
  * n = 3 because the synthetic docs are tens of words long.
  *
  * Scale shape: a real benchmark side is a FIXED evaluation suite —
  * MBs, not corpus-sized — so its distinct n-gram set broadcasts and
  * the 100 TB training corpus is decontaminated in ONE scan-side hash
  * join: no shuffle of the corpus, no inverted index. The train side is
  * exploded but NOT deduplicated before the join — a pre-join distinct
  * would hash-exchange the entire exploded corpus, the widest relation
  * in the job. Instead the raw (doc_id, gram) pairs stream through the
  * broadcast join and only the HITS (hits ≪ corpus) reach the shuffle:
  * `count_distinct(gram)` inside the per-doc aggregate performs the
  * dedup on that tiny surviving set. The broadcast decision is left to
  * AQE rather than a hard `broadcast()` hint (d06's adaptive posture):
  * the runtime-measured gram-set size picks BHJ when the suite is
  * genuinely small and falls back to a shuffle join when a caller feeds
  * a corpus-sized "benchmark" — a hard hint would OOM the driver there.
  * The n-gram explode is row-local. The synthetic "benchmark" is the
  * doc_id % 20 == 0 slice — deterministic, reproducible on the oracle
  * side.
  */
object Decontaminate {

  val BenchMod = 20L
  val NgramN = 3

  /** The GPT-3 paper's production n (13-gram overlap). Use this at
    * real corpus scale; the graded synthetic entry keeps n = 3 because
    * the generated docs are only tens of words.
    */
  val ProductionNgramN = 13

  /** Bloom pre-filter sizing (round-15 verdict item 3: d08 was the
    * dedup pillar's worst 100-copy ratio at 18.2× because past the
    * broadcast threshold the gram join full-width-shuffles every
    * exploded (doc_id, gram) train pair). The filter is built over
    * `xxhash64(gram)` of the BENCH side — the small fixed suite, so
    * its distinct-gram count is bounded by suite size, not corpus
    * size — and applied to the train side BEFORE the join, i.e.
    * before any exchange (guide §3.2). False positives only leak a
    * few extra rows into the exact gram equi-join that still decides;
    * false negatives are impossible, so the result set is unchanged
    * row-for-row. 1M expected items / 2²³ bits ≈ 1 MB filter, ~0.3 %
    * FPP at 1M grams (within Spark's runtime-filter caps of 4M items
    * / 64M bits); an empty bench side yields a NULL filter and
    * might_contain(NULL, x) = NULL drops every row — identical to the
    * empty-join result.
    */
  val BloomItems = 1000000L
  val BloomBits = 8388608L

  /** Bench-side size floor (planner estimate, bytes) below which the
    * Bloom pre-filter is skipped: a truly suite-sized gram set makes
    * a small, cache-friendly broadcast hash relation and the probe-
    * per-train-gram filter is pure overhead there (sf0.1 estimate
    * ~0.2 MB → off; 100-copy decade ~19 MB → on). Mirrors the intent
    * of Spark's runtime-filter creationSideThreshold (10 MB default).
    * Conf-overridable per session via [[BloomMinBenchBytesKey]].
    */
  val BloomMinBenchBytes = 8L << 20
  val BloomMinBenchBytesKey = "spark.graft.d08.bloomMinBenchBytes"

  // the shared zip-shift n-gram construction (see TextFns.wordNgrams:
  // O(len) per doc, not the O(len²) slice-per-index lambda)
  private def wordNgrams(ws: Column, n: Int): Column =
    graft.text.TextFns.wordNgrams(ws, n)

  private def grams(d: DataFrame, n: Int): DataFrame =
    d.select(col("doc_id"),
      wordNgrams(split(normText(col("text")), " "), n).as("ngrams"))

  /** Contaminated training docs: (doc_id, n_shared distinct n-grams,
    * lexicographically-first shared n-gram as the audit example). The
    * graded synthetic entry — benchmark = the doc_id % 20 == 0 slice.
    */
  def contaminated(s: SparkSession, dir: String,
      n: Int = NgramN): DataFrame = {
    val docs = Tables.documents(s, dir)
    contaminated(docs.filter(col("doc_id") % BenchMod =!= 0),
      docs.filter(col("doc_id") % BenchMod === 0), n)
  }

  /** d08 core, parameterized over a SEPARATE evaluation suite — the
    * real API shape: `train` is the corpus to scrub, `bench` the
    * held-out benchmark table (both need `doc_id`, `text`; overlap in
    * doc_ids is irrelevant, only the bench side's n-gram SET is used).
    */
  def contaminated(train: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    val benchGrams = grams(bench, n)
      .select(explode(col("ngrams")).as("gram")).distinct()
    // raw exploded pairs — the join filters them to hits before any
    // shuffle; count_distinct dedups the hits inside the aggregate
    val trainGrams = grams(train, n)
      .select(col("doc_id"), explode(col("ngrams")).as("gram"))
    // Bloom pre-filter over the bench gram set (see [[BloomItems]]):
    // a scalar subquery builds the ~1 MB filter once, each train gram
    // pays one codegen'd might_contain probe, and the definitely-
    // non-matching majority never reaches the join — so when the
    // bench side is past the broadcast threshold (the 100-copy
    // decade), the sort-merge exchange carries only candidate rows
    // instead of the full exploded corpus. Exact semantics: the
    // equi-join below still decides membership; the filter has no
    // false negatives.
    //
    // GATED on the planner's size estimate of the bench side (round
    // 16, measured both ways at sf0.1 and the 100-copy decade): under
    // [[BloomMinBenchBytes]] the gram set is a genuinely small
    // broadcast hash relation and the filter is pure per-row overhead
    // (it cost d08 ~1 s at sf0.1 in-suite); above it the filter wins
    // even when the join still broadcasts — 20M exploded train grams
    // probing a ~1 MB cache-resident bitset and dropping ~95 % of
    // rows beats 20M string probes into a ~100 MB hash relation
    // (100-copy A/B: 38.5 s ungated-off vs 11.9 s with the filter) —
    // and wins bigger once the join degrades to sort-merge. The gate
    // reads optimizedPlan.stats (the planner's own estimate), so it
    // is plan-time deterministic, never data-sampled.
    val sess = train.sparkSession
    val benchEstBytes = benchGrams.queryExecution.optimizedPlan
      .stats.sizeInBytes
    // name the offending key on a malformed value — a bare
    // NumberFormatException at plan time pointed at nothing (ADVICE r16)
    val minBytes = sess.conf
      .getOption(BloomMinBenchBytesKey).map { v =>
        try v.toLong
        catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"$BloomMinBenchBytesKey must be a byte count, got '$v'", e)
        }
      }
      .getOrElse(BloomMinBenchBytes)
    val preFiltered =
      if (benchEstBytes <= BigInt(minBytes))
        trainGrams
      else {
        // the two SPARK-32268 expressions resolve BY NAME and ship
        // unregistered in vanilla Spark — GraftExtensions injects them.
        // The gate makes the dependency scale-latent (small tests never
        // cross it), so fail HERE with the fix spelled out instead of
        // an unresolved-function analysis error later (ADVICE r16)
        require(
          sess.catalog.functionExists("might_contain") &&
            sess.catalog.functionExists("bloom_filter_agg"),
          "d08's Bloom pre-filter needs bloom_filter_agg/might_contain " +
            "(Spark-internal, not SQL-registered by default): build the " +
            "session with graft.GraftSession or add graft.GraftExtensions " +
            "to spark.sql.extensions")
        val bf = benchGrams
          .agg(expr(s"bloom_filter_agg(xxhash64(gram), ${BloomItems}L, " +
            s"${BloomBits}L)").as("bf"))
          .scalar()
        trainGrams
          .where(call_function("might_contain", bf, xxhash64(col("gram"))))
      }
    preFiltered
      .join(benchGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("n_shared"),
        min(col("gram")).as("example_gram"))
      .orderBy(col("doc_id"))
  }

  /** The composable artifact a pretraining pipeline actually consumes:
    * the training corpus with contaminated docs dropped (left-anti on
    * the contamination report's doc_ids). Same single-broadcast-join
    * scale shape — the anti-join's right side is the report, already
    * hits-sized.
    */
  def clean(s: SparkSession, dir: String, n: Int = NgramN): DataFrame = {
    val bad = contaminated(s, dir, n).select(col("doc_id"))
    Tables.documents(s, dir)
      .filter(col("doc_id") % BenchMod =!= 0)
      .join(bad, Seq("doc_id"), "left_anti")
  }

  /** clean() over an external benchmark table (see the two-DataFrame
    * `contaminated`): returns `train` minus every contaminated doc.
    */
  def clean(train: DataFrame, bench: DataFrame, n: Int): DataFrame = {
    val bad = contaminated(train, bench, n).select(col("doc_id"))
    train.join(bad, Seq("doc_id"), "left_anti")
  }
}

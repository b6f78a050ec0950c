package graft.dedup

import graft.Tables
import graft.dedup.Dedup.normText
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d08: benchmark decontamination — the GPT-3-style n-gram overlap
  * rule: a training document is CONTAMINATED if it shares any word
  * n-gram with the held-out evaluation set, and must be dropped before
  * pretraining (the papers use 13-grams; n = 3 here because the
  * synthetic docs are tens of words).
  *
  * Scale shape: a real benchmark side is a FIXED evaluation suite —
  * MBs, not corpus-sized — so its distinct n-gram set broadcasts and
  * the 100 TB training corpus is decontaminated in ONE scan-side hash
  * semi-join: no shuffle of the corpus, no inverted index. The
  * broadcast decision is left to AQE rather than a hard `broadcast()`
  * hint (d06's adaptive posture): the runtime-measured gram-set size
  * picks BHJ when the suite is genuinely small and falls back to a
  * shuffle join when a caller feeds a corpus-sized "benchmark" — a
  * hard hint would OOM the driver there. The n-gram explode is
  * row-local; only (doc, gram) hits survive to the per-doc count. The
  * synthetic "benchmark" is the doc_id % 20 == 0 slice —
  * deterministic, reproducible on the oracle side.
  */
object Decontaminate {

  val BenchMod = 20L
  val NgramN = 3

  // the shared zip-shift n-gram construction (see TextFns.wordNgrams:
  // O(len) per doc, not the O(len²) slice-per-index lambda)
  private def wordNgrams(ws: Column, n: Int): Column =
    graft.text.TextFns.wordNgrams(ws, n)

  /** Contaminated training docs: (doc_id, n_shared distinct n-grams,
    * lexicographically-first shared n-gram as the audit example).
    */
  def contaminated(s: SparkSession, dir: String,
      n: Int = NgramN): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        wordNgrams(split(normText(col("text")), " "), n).as("ngrams"))
    val bench = docs.filter(col("doc_id") % BenchMod === 0)
      .select(explode(col("ngrams")).as("gram")).distinct()
    val train = docs.filter(col("doc_id") % BenchMod =!= 0)
      // distinct per (doc, gram): n_shared counts DISTINCT shared
      // n-grams, and the pre-join distinct also shrinks the probe side
      .select(col("doc_id"), explode(col("ngrams")).as("gram")).distinct()
    train
      .join(bench, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"), min(col("gram")).as("example_gram"))
      .orderBy(col("doc_id"))
  }
}

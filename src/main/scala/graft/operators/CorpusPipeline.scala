package graft.operators

import graft.Tables
import graft.dedup.Dedup.normText
import graft.text.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** p01: the end-to-end training-corpus preparation pipeline — the
  * composition every LLM data pipeline runs, as ONE query:
  *
  *   documents → language ID → quality filter → exact dedup → stats
  *
  * Shape at 100 TB: every feature (language, quality, token count) is
  * a row-local expression computed in a single scan — no joins between
  * the "stages", because they were never separate passes to begin
  * with. The only shuffle is the dedup groupBy on the content digest,
  * and it runs AFTER the filters so it only shuffles surviving docs.
  * The output is the kept-document manifest, which is what downstream
  * tokenization consumes.
  */
object CorpusPipeline {

  def prepare(s: SparkSession, dir: String,
      lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    val t = col("text")
    val filtered = Tables
      .documents(s, dir)
      .select(col("doc_id"), col("source"),
        TextFns.predictedLangCol(t).as("predicted_lang"),
        TextFns.qualityCol(t).as("quality"),
        TextFns.reTokensCol(t).cast("long").as("re_tokens"),
        md5(normText(t)).as("norm_hash"))
      .filter(col("predicted_lang") === lang && col("quality") >= minQuality)
    // keep-min-per-hash as a window over the digest shuffle: ONE pass
    // over the feature expressions (a groupBy + self-semi-join would
    // re-evaluate the whole interpreted feature projection twice) and
    // the same single norm_hash exchange
    val wHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("norm_hash"))
    filtered
      .withColumn("min_doc", min(col("doc_id")).over(wHash))
      .filter(col("doc_id") === col("min_doc"))
      .select(col("doc_id"), col("predicted_lang"), col("quality"),
        col("re_tokens"), col("source"))
      .orderBy(col("doc_id"))
  }
}

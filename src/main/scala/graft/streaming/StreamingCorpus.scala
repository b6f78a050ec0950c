package graft.streaming

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** st07: the corpus-prep pipeline (p01) as a STREAM — documents arrive
  * continuously, get language-ID'd, token-counted, and deduplicated on
  * normalized-content hash inside the stream. This is the ingest shape
  * of a continuously-fed training-data pipeline: all features are
  * row-local codegen'd expressions (no shuffle on the feature pass),
  * and the only stateful operator is the digest `dropDuplicates`.
  *
  * Determinism: which PHYSICAL row survives dedup depends on arrival
  * order, so the projection keeps only columns that are functions of
  * the normalized text (hash, language, token count) — identical for
  * every duplicate, hence a deterministic result set with a plain
  * SELECT DISTINCT oracle. On an unbounded feed the dedup state would
  * carry a watermark (as st03 does); the staged corpus is bounded.
  */
object StreamingCorpus {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The driver's documents.parquet is a single file; the file stream
    * source needs a directory, so stage a copy once (gated on
    * _SUCCESS, like the events stage).
    */
  private def stageDocs(s: SparkSession, dir: String): java.io.File = {
    val staged = new java.io.File(
      s"${StreamingAnomaly.StageRoot}/" +
        s"${dir.replaceAll("[^a-zA-Z0-9]", "_")}_docs")
    if (!new java.io.File(staged, "_SUCCESS").exists()) {
      Tables.documents(s, dir).write.mode("overwrite")
        .parquet(staged.getAbsolutePath)
    }
    staged
  }

  /** Bench warm-up hook — see StreamingAnomaly.ensureStaged. */
  def ensureStaged(s: SparkSession, dir: String): Unit = stageDocs(s, dir)

  def st07StreamCorpus(s: SparkSession, dir: String): DataFrame = {
    val name = s"st07_out_${counter.incrementAndGet()}"
    val schema = Tables.documents(s, dir).schema
    val staged = stageDocs(s, dir)
    val norm = Dedup.normText(col("text"))
    // dedup state store count is fixed at first start from
    // spark.sql.shuffle.partitions — size it for state volume, not
    // batch core count (see StreamingAnomaly.withStatePartitions)
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "8")
    try {
      val q = s.readStream
        .schema(schema)
        .parquet(staged.getAbsolutePath)
        .select(
          md5(norm).as("norm_hash"),
          TextFns.predictedLangCol(col("text")).as("predicted_lang"),
          TextFns.reTokensCol(col("text")).as("re_tokens"))
        .dropDuplicates("norm_hash")
        .writeStream
        .outputMode(OutputMode.Append)
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally s.conf.set(key, prev)
    s.table(name).orderBy(col("norm_hash"))
  }

  /** st12: streaming ADMISSION — d15's exact tier as the stream it is
    * in production: arrivals flow continuously and each doc is admitted
    * only if its normalized digest is in neither the EXISTING corpus
    * index (stream-static LEFT ANTI join against the maintained digest
    * table) nor the stream's own history (digest `dropDuplicates`
    * state). The graded entry streams the doc_id % 10 == 7 slice
    * (d15's synthetic arrivals) against the rest as the index.
    *
    * Determinism (st07's posture): which physical row survives depends
    * on arrival order, so the projection keeps only digest-functional
    * columns — the admitted SET is deterministic with a plain SQL
    * oracle.
    *
    * Scale shape: the feature pass is row-local; the anti join's
    * static side re-executes per micro-batch (Spark's stream-static
    * contract), so at corpus scale the index digest table must be the
    * PERSISTED artifact d15's two-DataFrame API maintains — bucketed
    * parquet read once into cache, or compacted to an approximate
    * pre-filter (Bloom) with the exact anti join behind it. The
    * in-stream dedup state is one digest per ADMITTED doc (hits never
    * enter state), watermark-evictable on an unbounded feed (st03).
    */
  def st12StreamAdmission(s: SparkSession, dir: String): DataFrame = {
    val name = s"st12_out_${counter.incrementAndGet()}"
    val schema = Tables.documents(s, dir).schema
    val staged = stageDocs(s, dir)
    val norm = Dedup.normText(col("text"))
    val index = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 =!= 7)
      .select(md5(norm).as("norm_hash")).distinct()
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "8")
    try {
      val q = s.readStream
        .schema(schema)
        .parquet(staged.getAbsolutePath)
        .filter(col("doc_id") % 10 === 7)
        .select(md5(norm).as("norm_hash"),
          TextFns.reTokensCol(col("text")).as("re_tokens"))
        .join(index, Seq("norm_hash"), "left_anti")
        .dropDuplicates("norm_hash")
        .writeStream
        .outputMode(OutputMode.Append)
        .format("memory").queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally s.conf.set(key, prev)
    s.table(name).orderBy(col("norm_hash"))
  }
}

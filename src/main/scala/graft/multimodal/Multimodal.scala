package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m01: multimodal-column plumbing (SURVEY.md §2C).
  *
  * Media assets are opaque `binary` payloads with a typed metadata
  * struct riding alongside — the layout a 100 TB image/audio corpus
  * uses (payload bytes in parquet, metadata queryable without decoding).
  * The Spark-side plumbing (schema, partitioning, per-partition batch
  * decode shape) is real; the actual codec is STUBBED deterministically
  * because no image/audio libraries exist in this environment — swap
  * `decodeStub` for a real decoder binding and nothing else changes.
  */
object Multimodal {

  /** Synthesize a media table from documents: payload = UTF-8 bytes,
    * metadata derived deterministically.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
          (pmod(xxhash64(col("doc_id")), lit(1280)) + 640).cast("int").as("width"),
          (pmod(xxhash64(col("doc_id"), lit(1)), lit(720)) + 360).cast("int").as("height"),
          lit("fake/utf8").as("mime")
        ).as("meta"))

  /** STUB decode: a real implementation opens the payload with an image
    * codec inside `mapPartitions` (one codec instance per partition,
    * batched). Here it emits deterministic pseudo-features with the
    * same shape: fixed-length Array[Double] per asset.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    val featDim = 4
    media
      .select(col("media_id"), col("payload"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int, Int)]
      .mapPartitions { it =>
        // per-partition "codec" initialization happens here in a real
        // decoder; the iterator shape (batch-in, batch-out) is what the
        // cluster plumbing cares about.
        it.map { case (id, payload, nBytes, w, h) =>
          val f0 = nBytes.toDouble
          val f1 = if (payload.nonEmpty) payload(0).toDouble else 0.0
          val f2 = if (payload.nonEmpty) payload(payload.length - 1).toDouble else 0.0
          val f3 = w.toDouble / h.toDouble
          (id, Array(f0, f1, f2, f3).take(featDim), w, h)
        }
      }
      .toDF("media_id", "features", "width", "height")
  }

  /** m01 query: decode-stub features + a resolution histogram —
    * exercises payload bytes, metadata struct, and the partition-batch
    * decode path end to end. Features are projected to scalar columns
    * (the harness canonicalizes row-wise; array cells aren't sortable).
    */
  def q(s: SparkSession, dir: String): DataFrame =
    decodeStub(mediaTable(s, dir))
      .withColumn("aspect_bucket",
        floor(col("width").cast("double") / col("height") * 10).cast("int"))
      .select(col("media_id"),
        element_at(col("features"), 1).as("f_bytes"),
        element_at(col("features"), 2).as("f_first"),
        element_at(col("features"), 3).as("f_last"),
        element_at(col("features"), 4).as("f_aspect"),
        col("width"), col("height"), col("aspect_bucket"))
      .orderBy(col("media_id"))
}

package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d03: SimHash near-duplicate detection.
  *
  * 60-bit SimHash per document: each distinct token votes ±1 on every
  * bit of its 64-bit hash; the signature takes the sign of each bit
  * sum. Near-dups are pairs within Hamming distance `maxHamming`,
  * found by the pigeonhole trick: split the signature into 4 chunks —
  * any pair within distance 3 must agree on at least one chunk, so the
  * candidate join is on (chunk index, chunk value), never O(n²).
  *
  * Signature construction is a row-local aggregate over the exploded
  * token table (one shuffle on doc_id with map-side partial sums of
  * the 60 bit counters). Rows-only — spec-verified with planted dups.
  */
object SimHash {

  val Bits = 60
  val Chunks = 4
  val ChunkBits = Bits / Chunks // 15

  def tokens(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(Dedup.normText(col("text")), " ")))
          .as("tok"))
      .withColumn("th", xxhash64(col("tok")))

  /** Per-doc signature: sign of the per-bit ±1 vote sums, packed into
    * one long.
    */
  def signatures(s: SparkSession, dir: String): DataFrame = {
    val bitSums: Seq[Column] = (0 until Bits).map { j =>
      sum(when(shiftright(col("th"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val packed = (0 until Bits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokens(s, dir)
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", packed)
      .select(col("doc_id"), col("simhash"))
  }

  def nearDupPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Chunks,
      s"pigeonhole candidate generation with $Chunks chunks only " +
        s"guarantees recall for hamming < $Chunks (got $maxHamming)")
    val sigs = signatures(s, dir).cache()
    // chunk value = bits [c*15, (c+1)*15)
    val withChunks = sigs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until Chunks).map(c =>
        shiftrightunsigned(col("simhash"), c * ChunkBits)
          .bitwiseAND(lit((1L << ChunkBits) - 1))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "ch_val")
    val cand = withChunks.as("x")
      .join(withChunks.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.ch_val") === col("y.ch_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.simhash").as("sig_a"),
        col("y.doc_id").as("doc_b"), col("y.simhash").as("sig_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def q(s: SparkSession, dir: String): DataFrame = nearDupPairs(s, dir)
}

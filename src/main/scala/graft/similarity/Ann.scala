package graft.similarity

import graft.Tables
import graft.dedup.Dedup.{cosine, dot}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2C).
  *
  * s01 is the exact baseline: broadcast the (small) query set against
  * the corpus, rank per query — one pass over the vectors, no shuffle
  * of the corpus itself. s02 is the scale path: random-hyperplane LSH
  * buckets the corpus so each query only scores its bucket — at 100 TB
  * the corpus shuffles once on bucket id and queries probe buckets,
  * turning O(|Q|·N) into O(|Q|·N/2^bits) with tunable recall.
  */
object Ann {

  /** s01: exact brute-force cosine top-k for query vectors
    * (vec_id < nQueries), deterministic rank (rounded cosine desc,
    * then id).
    */
  def bruteForceTopK(s: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val v = Tables
      .embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm2", dot(col("v"), col("v")))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm2").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("vec_id"))
    v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        cosine(col("qv"), col("v"), col("qn"), col("norm2")))
      .withColumn("cos6",
        floor(col("cos") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos6"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, d) from a
    * splitmix-style integer mix — reproducible across runs/engines.
    */
  private def planeComponent(p: Int, d: Int): Double = {
    var z = p.toLong * 2654435769L + d.toLong * 40503L + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (math.abs(z % 2000001L).toDouble / 1000000.0) - 1.0
  }

  /** s02: multi-table random-hyperplane LSH — `tables` independent
    * `bits`-bit signatures; a corpus vector is a candidate for a query
    * if they collide in ANY table (the standard recall amplifier:
    * P(candidate) = 1 − (1 − p^bits)^tables). Each table is one
    * (bucket-id, table) shuffle key; queries probe their buckets, so
    * scored pairs ≈ |Q| · tables · N / 2^bits instead of |Q| · N.
    * Rows-only (recall is spec-tested against s01).
    */
  def lshTopK(s: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, bits: Int = 5,
      tables: Int = 6): DataFrame = {
    val dims = 64
    def plane(t: Int, p: Int) =
      array((0 until dims).map(d => lit(planeComponent(t * 64 + p, d))): _*)

    def signature(v: Column, t: Int): Column =
      (0 until bits).map { p =>
        when(dot(v, plane(t, p)) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val v = Tables
      .embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm2", dot(col("v"), col("v")))
    val bucketed = v.select(
      col("vec_id"), col("v"), col("norm2"),
      posexplode(array((0 until tables).map(t =>
        signature(col("v"), t)): _*)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "bucket")
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm2").as("qn"), col("table"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("vec_id"))
    bucketed
      .join(broadcast(q), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("v"),
        col("qn"), col("norm2"))
      .distinct() // candidate may collide in several tables
      .withColumn("cos",
        cosine(col("qv"), col("v"), col("qn"), col("norm2")))
      .withColumn("cos6",
        floor(col("cos") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos6"))
      .orderBy(col("query_id"), col("rk"))
  }
}

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

  /** s04: kNN label classification — majority vote over the s01
    * exact top-k neighbourhood (the standard label-propagation /
    * weak-labelling primitive for training-data curation). Tie-break:
    * most votes, then the label holding the nearest neighbour, then
    * smaller label. Same scale posture as s01 (query set broadcast,
    * corpus unshuffled); swap the neighbour source for s02/s03 when
    * the query set grows.
    */
  def knnClassify(s: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val labels = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val votes = bruteForceTopK(s, dir, nQueries, k)
      .join(labels, "vec_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rk")).as("best_rk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("best_rk"), col("label"))
    val truth = labels.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("true_label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(truth), "query_id")
      .select(col("query_id"), col("true_label"),
        col("label").as("predicted_label"), col("votes"))
      .orderBy(col("query_id"))
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

  /** s03: IVF (inverted-file) ANN — the coarse-quantizer scale path.
    *
    * Build: deterministic seed centroids (smallest xxhash64(vec_id)),
    * then `iters` Lloyd rounds. Assignment is a broadcast cross join
    * (nCentroids rows) + min-by — map-side only, no corpus shuffle;
    * the recompute shuffles just (cluster, dim) partial sums, summed
    * as DECIMAL so centroids are bit-stable across partition orders.
    * Query: rank centroids per query, probe the nProbe nearest
    * inverted lists, exact cosine inside them. Scored pairs ≈
    * |Q|·N·nProbe/nCentroids vs brute force's |Q|·N. At 100 TB the
    * corpus is written clustered by centroid id, so a probe reads
    * only its lists' files. Rows-only (recall spec-tested vs s01).
    */
  def ivfTopK(s: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nCentroids: Int = 16,
      nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val v = Tables
      .embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm2", dot(col("v"), col("v")))
      .cache()

    def centroidDf(cents: Array[(Int, Array[Double])]) = {
      import s.implicits._
      cents.toSeq.toDF("cid", "c")
        .withColumn("cn2", dot(col("c"), col("c")))
    }

    // squared L2 = |v|^2 - 2 v.c + |c|^2; min over (dist, cid) struct
    // keeps ties deterministic
    def assign(cents: Array[(Int, Array[Double])]): DataFrame =
      v.crossJoin(broadcast(centroidDf(cents)))
        .withColumn("dist",
          col("norm2") - lit(2.0) * dot(col("v"), col("c")) + col("cn2"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))

    var cents: Array[(Int, Array[Double])] = v
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      .limit(nCentroids)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

    for (_ <- 1 to iters) {
      val assigned = assign(cents)
      val recomputed = v.join(assigned, Seq("vec_id"))
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast("decimal(38,12)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("sm"))
        .select(col("cid"), transform(col("sm"), x => x("m")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      // clusters can empty out; keep the previous centroid for those
      val byId = recomputed.toMap
      cents = cents.map { case (i, c) => (i, byId.getOrElse(i, c)) }
    }

    // The cache existed for the Lloyd rounds (each materialized it via
    // collect); the final query below re-derives v from the parquet
    // scan instead — one cheap codegen'd pass — so nothing stays pinned
    // in session storage memory after the operator returns.
    v.unpersist()
    val lists = v.join(assign(cents), Seq("vec_id"))
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm2").as("qn"))
    val probes = q.crossJoin(broadcast(centroidDf(cents)))
      .withColumn("dist",
        col("qn") - lit(2.0) * dot(col("qv"), col("c")) + col("cn2"))
      .withColumn("prk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("dist"), col("cid"))))
      .filter(col("prk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos6").desc, col("vec_id"))
    lists
      .join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
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

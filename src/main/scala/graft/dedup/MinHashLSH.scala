package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d02: MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline: word 3-shingles → 64-permutation MinHash signature (one
  * universal-hash family over the shingle's md5-derived integer) → 8
  * bands × 8 rows; docs colliding in any band become candidate pairs
  * → verified by signature-estimated Jaccard.
  *
  * Like d21's Bloom filter (and unlike engine-seeded murmur/xxhash),
  * every hash here is explicit split-hash arithmetic over the md5
  * digest — x = digest₆₀ mod (2³¹−1), component i = min over shingles
  * of (aᵢ·x + bᵢ) mod (2³¹−1) with LCG-generated (aᵢ, bᵢ) — so the
  * complete signature, banding and estimate are reproducible in ANSI
  * SQL and the entry is fully oracle-backed (it graduated from the
  * rows-only class). Band collision is equality of the 8-component
  * band slice itself, not a hash of it.
  *
  * Scale: signatures are fixed 64-long arrays computed row-locally (no
  * shuffle); the only shuffle is the band-bucket join, whose fan-out is
  * the number of true near-duplicate collisions, not O(n²). This is the
  * standard web-scale dedup shape.
  */
object MinHashLSH {

  val NumHashes = 64
  // 8 bands x 8 rows: a pair colliding in some band needs est-Jaccard
  // ~(1/8)^(1/8)=0.77+ to be likely -- tuned for near-dup similarity
  // (j >= 0.9 collides w.p. ~0.99) while keeping candidates ~linear on
  // corpora where everything is mildly similar (16x4 banding admitted
  // j~0.3 pairs and exploded quadratically).
  val Bands     = 8
  val RowsPerBand = NumHashes / Bands
  private val Prime = 2147483647L // 2^31 - 1

  def coeffA: Seq[Long] = coeffs.map(_._1)
  def coeffB: Seq[Long] = coeffs.map(_._2)

  /** Deterministic universal-hash coefficients (LCG from fixed seed). */
  private val coeffs: Seq[(Long, Long)] = {
    var x = 0x5DEECE66DL
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); (x >>> 33) % Prime }
    (0 until NumHashes).map(_ => (next() | 1L, next()))
  }

  def shingles(text: Column, n: Int = 3): Column = {
    val ws = split(Dedup.normText(text), " ")
    // n-gram build via the native codegen'd word_ngrams expression —
    // the zip_with-fold predecessor was still an interpreted HOF
    // ((n−1) lambda passes per row); same output strings, so the
    // hash-seeded signatures are unchanged
    val grams = graft.functions.VectorFunctions.word_ngrams(ws, n)
    array_distinct(
      when(size(ws) <= n, array(concat_ws(" ", ws))).otherwise(grams))
  }

  /** 64-long MinHash signature of a shingle array, via the native
    * one-pass expression (graft.functions.MinHashSignature). The
    * per-shingle integer is d21's digest₆₀ arithmetic (first 15 md5
    * hex chars as a long, mod 2³¹−1) — identical conv/hex-cast maths
    * on both engines, which is what makes the oracle exact.
    */
  def signature(sh: Column): Column =
    graft.functions.VectorFunctions.minhash_sig(
      transform(sh, x =>
        conv(substring(md5(x), 1, 15), 16, 10).cast("long") % lit(Prime)),
      NumHashes, Prime, coeffs.map(_._1), coeffs.map(_._2))

  def signatures(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"), signature(shingles(col("text"))).as("sig"))

  /** Candidate pairs via banded buckets, scored by the fraction of
    * agreeing signature components (the MinHash Jaccard estimate).
    */
  def nearDupPairs(s: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    // localCheckpoint, NOT cache: the signature scan is referenced by
    // the banding and both verification joins; a cache() here would
    // leak a CacheManager entry for the rest of the session (the r2
    // bench collapse), while checkpoint blocks are GC-reclaimed
    val sigs = signatures(s, dir).localCheckpoint()
    // bucket = the band's 8-component slice itself (arrays equi-join
    // fine) — no hash-of-hash, so the SQL oracle's banding is
    // EXACTLY this join, not an approximation of it
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(
        sequence(lit(0), lit(Bands - 1)),
        b => struct(b.as("band"),
          slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand))
            .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / NumHashes)
      .filter(col("est_jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def q(s: SparkSession, dir: String): DataFrame = nearDupPairs(s, dir)
}

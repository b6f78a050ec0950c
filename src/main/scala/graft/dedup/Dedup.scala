package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents(doc_id, text, ...)` and
  * `embeddings(vec_id, embedding, label)` — the training-data-pipeline
  * side of the engine (SURVEY.md §2C).
  *
  * Scale design: d01 is a pure hash groupBy (one shuffle on the digest,
  * map-side partial agg). d04's candidate generation is an inverted-
  * index join — pairs only materialize for docs sharing a token, the
  * standard blocking scheme; swap the token for a MinHash band (d02) to
  * bound candidates when the corpus has heavy-hitter tokens. d05 is
  * pairwise within the corpus (embeddings table is fixed-size here);
  * the scale path for large corpora is the LSH-bucketed variant (s02).
  */
object Dedup {

  /** Canonical text normalization shared by every text-dedup operator:
    * trim, lowercase, collapse runs of whitespace.
    */
  def normText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** d01: exact dedup — group by content digest, keep the smallest id. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("norm_hash"))

  /** d04: n-gram Jaccard similarity pairs via inverted-index join:
    * explode distinct word-bigram shingles, drop shingles hotter than
    * `maxDf` documents (stop-shingle pruning — the standard guard that
    * keeps the candidate join linear in true near-dups instead of
    * O(n²) on corpora with shared boilerplate), join docs sharing a
    * surviving shingle, count the intersection, recover |A∪B| from
    * per-doc set sizes. Jaccard is an exact integer ratio — no float
    * drift against the oracle.
    */
  def ngramJaccard(s: SparkSession, dir: String, tau: Double = 0.8,
      maxDf: Int = 100): DataFrame = {
    // zip_with over two slices, NOT element_at inside transform: HOF
    // lambdas are interpreted, so element_at(split(..), i) would re-run
    // the split regex per element — O(words²) per doc.
    val ws = split(normText(col("text")), " ")
    val bigrams = array_distinct(
      when(size(ws) >= 2,
        zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array(concat_ws(" ", ws))))
    val allTok = Tables
      .documents(s, dir)
      .select(col("doc_id"), explode(bigrams).as("tok"))
    val dfTab = allTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val hot = dfTab.filter(col("df") > maxDf).select(col("tok"))
    val tok = allTok.join(broadcast(hot), Seq("tok"), "left_anti")
    // AllPairs/PPJoin prefix filtering: order each doc's tokens by
    // global rarity (df asc, tok asc); two docs with Jaccard >= tau MUST
    // share a token within their first (n - ceil(tau*n) + 1) rarest
    // tokens, so only that prefix enters the candidate join. Exact — no
    // false negatives — and the exploded tokens are precisely the ones
    // with the smallest join fan-out. Verification then recomputes the
    // true intersection from the full token sets, so the output is the
    // same integer-ratio Jaccard as the naive all-pairs join.
    val docs = tok
      .join(dfTab, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("doc_id"),
        transform(col("st"), t => t("tok")).as("tokset"),
        size(col("st")).as("n_tok"))
      .withColumn("prefix",
        slice(col("tokset"), lit(1),
          greatest(lit(1),
            col("n_tok") - ceil(lit(tau) * col("n_tok")).cast("int") + 1)))
    val pref = docs.select(col("doc_id"), col("n_tok"),
      explode(col("prefix")).as("tok"))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: j <= min/max, so max*tau <= min is necessary
          col("a.n_tok") >= col("b.n_tok") * tau &&
          col("b.n_tok") >= col("a.n_tok") * tau)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("tokset").as("ta"),
        col("n_tok").as("n_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("tokset").as("tb"),
        col("n_tok").as("n_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d06: near-duplicate CLUSTERS — connected components over the d04
    * similarity graph via min-label propagation, the step that turns
    * pairwise matches into dedup groups (keep one doc per component).
    *
    * Each iteration is one distributed join+groupBy; the driver only
    * checks convergence. Iterations needed = graph diameter (≤ log n
    * with the standard large-star variant; near-dup graphs are tiny
    * cliques so this converges in 2–3 passes). Output: every doc that
    * appears in a pair, its component id (min doc_id in the
    * component), and whether it is the kept representative.
    */
  def dedupClusters(s: SparkSession, dir: String, maxIter: Int = 20): DataFrame = {
    // cache the pair list BEFORE the union: both direction branches and
    // every propagation iteration reuse it — uncached, the expensive
    // similarity join would run once per reference
    val pairs = ngramJaccard(s, dir).select(col("doc_a"), col("doc_b")).cache()
    val edges = pairs
      .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .cache()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("comp", col("doc_id"))
    var prevCache: DataFrame = null
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = edges
        .join(labels, edges("doc_b") === labels("doc_id"))
        .select(edges("doc_a").as("doc_id"), col("comp"),
          lit(null).cast("long").as("old"))
      // carry each doc's previous label through the union so the
      // convergence check rides the same groupBy — one shuffle per
      // iteration, no separate old-vs-new join (every doc has exactly
      // one labels row, so max(old) recovers it; prop rows are null)
      val next = labels
        .select(col("doc_id"), col("comp"), col("comp").as("old"))
        .unionAll(prop)
        .groupBy(col("doc_id"))
        .agg(min(col("comp")).as("comp"), max(col("old")).as("old"))
        .cache()
      changed = next.filter(col("comp") =!= col("old")).count()
      if (prevCache != null) prevCache.unpersist()
      prevCache = next
      labels = next.select(col("doc_id"), col("comp"))
      i += 1
    }
    labels
      .withColumn("is_kept", (col("doc_id") === col("comp")).cast("int"))
      .select(col("doc_id"), col("comp").as("component_id"), col("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** Sequential dot product via the native codegen'd expression —
    * same accumulation order as DuckDB's list_reduce left-fold, so
    * cosines agree bitwise across engines, ~50× faster than the
    * interpreted higher-order-function formulation.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.array_dot(a, b)

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / sqrt(na * nb)

  /** d05: embedding-cosine near-duplicate pairs ≥ τ. */
  def embeddingDedup(s: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    val v = Tables
      .embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm2", dot(col("v"), col("v")))
    val a = v.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("norm2").as("na"))
    val b = v.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("norm2").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"),
        (floor(col("cos") * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("cos6"))
      .orderBy(col("id_a"), col("id_b"))
  }
}

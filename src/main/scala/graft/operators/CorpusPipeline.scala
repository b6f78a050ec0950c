package graft.operators

import graft.Tables
import graft.dedup.Dedup.normText
import graft.text.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** p02: the CURATION pipeline the round-8 operators compose — what a
    * crawl-to-training-shards run actually chains, as ONE query:
    *
    *   documents → repetition filter (t10) + Gopher-ingredient filter
    *   (t11) → exact dedup (d01) → per-domain cap (d12) → sequence
    *   packing (d13)
    *
    * Shape at 100 TB: the filter features are row-local expressions in
    * the one corpus scan (never separate passes); the three shuffles
    * that remain — content-digest dedup, per-source cap rank, shard
    * packing — each run over the strictly SHRINKING survivor set, in
    * that order, so the big exchanges happen after the cheap scans
    * have discarded most of the corpus. Output is the packed-shard
    * manifest a tokenizer/dataloader consumes.
    */
  def curate(s: SparkSession, dir: String, cap: Int = 50,
      nShards: Int = 8, seqLen: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("text")
    val filtered = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(normText(t), " ")).as("n_words"),
        TextFns.reTokensCol(t).as("n_tok"),
        TextFns.alphaWordFracCol(t).as("alpha_frac"),
        TextFns.symbolWordRatioCol(t).as("symbol_ratio"),
        TextFns.dupNgramFracCol(t, 2).as("dup2"),
        md5(normText(t)).as("norm_hash"))
      .filter(col("n_words") >= 20 && col("alpha_frac") > 0.8 &&
        col("symbol_ratio") < 0.1 && col("dup2") < 0.2)
    val wHash = Window.partitionBy(col("norm_hash"))
    val deduped = filtered
      .withColumn("min_doc", min(col("doc_id")).over(wHash))
      .filter(col("doc_id") === col("min_doc"))
    // d12's reproducible salted-hash priority within each source —
    // Sampling.saltedHash, the ONE copy of the priority rule
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(Sampling.saltedHash(col("doc_id"), "p02"), col("doc_id"))
    val capped = deduped
      .withColumn("rk", row_number().over(wSrc))
      .filter(col("rk") <= cap)
    // d13's concat-and-chunk packing over the survivors —
    // Sampling.packOffsets, the ONE copy of the packing rule
    Sampling.packOffsets(capped, nShards, seqLen)
      .select(col("doc_id"), col("source"), col("n_tok"), col("shard"),
        col("start_off"), col("first_seq"), col("last_seq"))
      .orderBy(col("doc_id"))
  }

  /** p03: the INCREMENTAL ingest pipeline — what a continuously-fed
    * corpus runs on every arrival batch, as ONE query:
    *
    *   arrivals → row-local quality gate → admission against the
    *   EXISTING corpus index (d15's exact tier: digest in neither the
    *   index nor an earlier arrival) → d13 packing of the admitted
    *   docs
    *
    * p01/p02 curate a corpus from scratch; p03 is the steady state —
    * the 100 TB index is NOT rescanned beyond its maintained digest
    * table (one distinct — the persisted artifact of d15's two-
    * DataFrame API), the quality gate shrinks the batch before any
    * shuffle, and the three remaining exchanges (admission digest
    * window, shard packing) run over the admitted batch only. The
    * near-dup tier runs separately as d15's report; packing starts at
    * offset 0 per shard — a production append continues from the
    * shard manifest's high-water mark.
    */
  def ingest(s: SparkSession, dir: String, nShards: Int = 8,
      seqLen: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val t = col("text")
    val batch = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("source"),
        size(split(normText(t), " ")).as("n_words"),
        TextFns.reTokensCol(t).as("n_tok"),
        TextFns.alphaWordFracCol(t).as("alpha_frac"),
        md5(normText(t)).as("norm_hash"))
      .filter(col("n_words") >= 20 && col("alpha_frac") > 0.8)
    val index = docs.filter(col("doc_id") % 10 =!= 7)
      .select(md5(normText(t)).as("norm_hash")).distinct()
    val wHash = Window.partitionBy(col("norm_hash"))
    val admitted = batch
      .join(index, Seq("norm_hash"), "left_anti")
      .withColumn("mn", min(col("doc_id")).over(wHash))
      .filter(col("doc_id") === col("mn"))
    Sampling.packOffsets(admitted, nShards, seqLen)
      .select(col("doc_id"), col("source"), col("n_tok"), col("shard"),
        col("start_off"), col("first_seq"), col("last_seq"))
      .orderBy(col("doc_id"))
  }

  /** p04: the corpus DATA CARD — the per-source statistics sheet a
    * curated release ships ("Datasheets for Datasets", Gebru et al.
    * 2021): volume, token-length distribution, language mix, and
    * exact-duplicate rate, one row per source.
    *
    * Everything is exact: token counts on the shared
    * normText/[a-z0-9]+ tokenizer, length deciles by q56's
    * integer-rank selection (value at rank ⌈j·n/10⌉ under
    * (n_tok, doc_id) order — no explode: the three rank predicates
    * are row-local), the top language by (count desc, lang), ratios
    * rounded at 1e-4 on both engines.
    *
    * Scale shape: ONE corpus scan computes the per-doc features into
    * a narrow checkpointed table feeding all four aggregates; the
    * source exchange serves the rank window and the volume
    * aggregates; the duplicate count is a map-side-combinable
    * (source, digest) groupBy — never a count_distinct expand; the
    * per-source single-row tables then join AQE-broadcast.
    */
  def p04DataCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col("text")
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        size(regexp_extract_all(normText(t), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_tok"),
        length(t).cast("long").as("n_char"),
        md5(normText(t)).as("digest"))
      .localCheckpoint()
    val vol = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      sum(col("n_char")).as("n_chars"))
    val wS = Window.partitionBy(col("source"))
      .orderBy(col("n_tok"), col("doc_id"))
    def atRank(j: Int) = col("rn") === expr(s"($j * n + 9) div 10")
    val deciles = base
      .withColumn("rn", row_number().over(wS))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(atRank(1) || atRank(5) || atRank(9))
      .groupBy(col("source")).agg(
        max(when(atRank(1), col("n_tok"))).as("p10_tok"),
        max(when(atRank(5), col("n_tok"))).as("p50_tok"),
        max(when(atRank(9), col("n_tok"))).as("p90_tok"))
    // asc_nulls_last: DuckDB's ASC default is NULLS LAST while
    // Spark's is NULLS FIRST — a NULL lang tying the top count would
    // otherwise win the tie on one engine and lose it on the other
    val wL = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("lang").asc_nulls_last)
    val topLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number().over(wL))
      .filter(col("r") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("c").as("top_c"))
    val distinctDocs = base.groupBy(col("source"), col("digest"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_distinct"))
    // floor(x·1e4 + 0.5)/1e4, not round(_, 4): Spark's round HALF_UPs
    // the shortest decimal repr while DuckDB rounds the scaled double,
    // so they can disagree on values like 0.30004999…; the explicit
    // floor form is the repo's deterministic fixed-point discipline
    def r4(c: Column): Column =
      floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    vol.join(deciles, Seq("source")).join(topLang, Seq("source"))
      .join(distinctDocs, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        r4(col("n_tokens").cast("double") / col("n_docs"))
          .as("avg_tokens4"),
        col("p10_tok"), col("p50_tok"), col("p90_tok"),
        col("top_lang"),
        r4(col("top_c").cast("double") / col("n_docs"))
          .as("top_lang_share4"),
        r4((col("n_docs") - col("n_distinct")).cast("double") /
          col("n_docs")).as("dup_frac4"))
      .orderBy(col("source"))
  }

  /** p06: the corpus SNAPSHOT DIFF card — what changed between two
    * releases, per source: the review sheet a curation team reads
    * before shipping snapshot B to training, beside p04's absolute
    * card. Volume and duplicate deltas say how much arrived and how
    * redundant it is; the KL(p_B ‖ p_A) unigram shift (t12's exact
    * 1e-9-quantized machinery, per source ACROSS eras) says whether
    * the source still READS like itself — a crawl gone off-feed flags
    * here before any volume metric moves.
    *
    * Semantics: KL is over B's observed per-source vocabulary with
    * add-one smoothing on the union-era vocab v; a source whose B
    * content is IDENTICAL to A scores exactly 0 (every term ratio is
    * ln(1), floored at +0.5 → 0 — spec-proven), and a source absent
    * from A is flagged `new_source` and scored against the flat
    * smoothed prior — loudly, which is the point.
    *
    * Scale shape: each era pays ONE scan → narrow checkpointed
    * feature/term-count tables (p04/t12's posture); the diff joins
    * source-cardinality aggregates and the union term table — the
    * only corpus-sized exchanges are the two (source, term) groupBys
    * with map-side combine.
    */
  def corpusDiff(s: SparkSession, dfA: DataFrame, dfB: DataFrame)
      : DataFrame = {
    def feat(df: DataFrame) = df.select(col("source"),
      size(regexp_extract_all(normText(col("text")), lit("[a-z0-9]+"),
        lit(0))).cast("long").as("n_tok"),
      md5(normText(col("text"))).as("digest"))
    def vol(df: DataFrame, sfx: String) = {
      val f = feat(df).localCheckpoint()
      val dg = f.groupBy(col("source"), col("digest"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg((sum(col("c")) - count(lit(1))).as(s"dups_$sfx"))
      f.groupBy(col("source"))
        .agg(count(lit(1)).as(s"docs_$sfx"),
          sum(col("n_tok")).as(s"tokens_$sfx"))
        .join(dg, Seq("source"))
    }
    def terms(df: DataFrame) = df.select(col("source"),
        explode(regexp_extract_all(normText(col("text")), lit("[a-z0-9]+"),
          lit(0))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    val un = terms(dfB).withColumnRenamed("c", "cb")
      .join(terms(dfA).withColumnRenamed("c", "ca"),
        Seq("source", "term"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
      .localCheckpoint() // union vocab; feeds totals and the KL sum
    val sv = un.groupBy(col("source")).agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val pb = (col("cb") + lit(1)).cast("double") /
      (col("nb") + col("v")).cast("double")
    val pa = (col("ca") + lit(1)).cast("double") /
      (col("na") + col("v")).cast("double")
    val kl = un.filter(col("cb") > 0)
      .join(broadcast(sv), Seq("source"))
      .withColumn("t9",
        floor(pb * log(pb / pa) * lit(1.0e9) + lit(0.5)).cast("long"))
      .groupBy(col("source")).agg(sum(col("t9")).as("kl9_shift"))
    vol(dfB, "b")
      .join(vol(dfA, "a"), Seq("source"), "full_outer")
      .join(kl, Seq("source"), "left")
      .na.fill(0L, Seq("docs_a", "tokens_a", "dups_a",
        "docs_b", "tokens_b", "dups_b"))
      .select(col("source"), col("docs_a"), col("docs_b"),
        (col("docs_b") - col("docs_a")).as("new_docs"),
        col("tokens_a"), col("tokens_b"), col("dups_a"), col("dups_b"),
        col("kl9_shift"),
        when(col("docs_a") === 0, lit(1)).otherwise(lit(0))
          .as("new_source"))
      .orderBy(col("source"))
  }

  /** Graded entry: snapshot A = the corpus before the `doc_id % 10 = 0`
    * batch arrived (d08/d15's synthetic-slice convention), B = the
    * full corpus after ingesting it.
    */
  def p06CorpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    corpusDiff(s, docs.filter(col("doc_id") % 10 =!= 0), docs)
  }

  /** p07: the RELEASE MANIFEST — one row per packed shard, the
    * artifact a training job reads before consuming a published
    * dataset and the receipt a data release ships beside the shards:
    * doc count, doc-id range, exact token count, how many `seqLen`
    * sequences d13's concat-and-chunk yields (⌈tokens/seqLen⌉ — equal
    * to the packing's max(last_seq)+1 by construction, spec-proven),
    * the padding wasted in the shard's tail chunk, and a content
    * checksum (the sum of t04's Rabin–Karp document fingerprints —
    * order-free, so any reshuffle of the same docs verifies, any
    * changed byte does not).
    *
    * Exactness: every column is an integer aggregate of row-local
    * integer features; the checksum is a long sum of sub-1e9+7
    * fingerprints (53 bits of headroom per 10⁹ docs — a 128-bit
    * accumulate is the upgrade past 10¹⁰-doc shards).
    *
    * Scale shape: ONE corpus scan computing row-local features, one
    * nShards-row groupBy with map-side combine. No windows, no joins
    * — the manifest of a 100 TB release costs exactly one pass.
    */
  def p07ReleaseManifest(s: SparkSession, dir: String, nShards: Int = 8,
      seqLen: Int = 512): DataFrame = {
    val norm = normText(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        TextFns.reTokensCol(col("text")).cast("long").as("n_tok"),
        when(length(norm) === 0, lit(null))
          .otherwise(TextFns.rollingHash(norm)).as("fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("fp")).as("checksum"))
      .withColumn("n_seqs",
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen"))
      .withColumn("pad_tokens", col("n_seqs") * seqLen - col("n_tokens"))
      .select(col("shard"), col("n_docs"), col("min_doc"), col("max_doc"),
        col("n_tokens"), col("n_seqs"), col("pad_tokens"), col("checksum"))
      .orderBy(col("shard"))
  }

  /** p12: the MEDIA corpus card — p04's data card for the multimodal
    * legs: per modality the asset counts, decoded volume totals
    * (pixels / samples / duration) and quality tallies (clipped
    * assets, silent frames) in ONE long-format metric table — the
    * summary a multimodal-training lead reads before weighting the
    * media mix. Composes the decoded m01/m02/m07 outputs, so every
    * number inherits their losslessly-decoded exactness; the oracle
    * composes those oracles verbatim (p05's pattern).
    *
    * Scale shape: each component is the media family's row-local
    * scan; the card is a handful of 1-row aggregates unioned — the
    * report of a 100 TB media corpus is ten numbers.
    */
  def p12MediaCard(s: SparkSession, dir: String): DataFrame = {
    val img = graft.multimodal.Multimodal.q(s, dir)
    val au = graft.multimodal.Audio.q(s, dir)
    val seg = graft.multimodal.Audio.qSegment(s, dir)
    def row(modality: String, metric: String, v: Column,
        src: DataFrame): DataFrame =
      src.agg(v.cast("long").as("value"))
        .select(lit(modality).as("modality"), lit(metric).as("metric"),
          col("value"))
    row("image", "n_assets", count(lit(1)), img)
      .unionByName(row("image", "total_px",
        sum(col("width").cast("long") * col("height")), img))
      .unionByName(row("image", "px_sum_total", sum(col("px_sum")), img))
      .unionByName(row("image", "max_width", max(col("width")), img))
      .unionByName(row("image", "max_height", max(col("height")), img))
      .unionByName(row("audio", "n_assets", count(lit(1)), au))
      .unionByName(row("audio", "total_samples", sum(col("n_samples")), au))
      .unionByName(row("audio", "total_duration_ms",
        sum(col("duration_ms")), au))
      .unionByName(row("audio", "clipped_assets",
        sum(when(col("n_clipped") > 0, 1L).otherwise(0L)), seg))
      .unionByName(row("audio", "total_silent_frames",
        sum(col("n_silent")), seg))
      .orderBy(col("modality"), col("metric"))
  }

  /** p11: the DEDUP FUNNEL report — per-stage attribution of the
    * document dedup family over one corpus: how many docs each stage
    * flags (exact d01 → containment d10 → n-gram Jaccard d04, cheap
    * to expensive — the order a production pipeline runs them), how
    * many are NEW at that stage (not already caught upstream — the
    * number that justifies paying for the stage), the cumulative
    * removal and the survivor count. The report a data lead reads
    * before deciding which dedup passes a 100 TB crawl actually
    * needs.
    *
    * Flag rule per stage: the standard greedy keep-smallest — a doc
    * is flagged iff it is the non-canonical side (exact: id > group
    * min; containment: the CONTAINED doc; Jaccard: the larger id of
    * a qualifying pair).
    *
    * Scale shape: the three flag sets inherit their operators'
    * bounded-candidate plans (digest groupBy / exact asymmetric
    * prefix filter / PPJoin-capped inverted index); everything after
    * is doc_id-set algebra — distinct + min-stage groupBys on a set
    * no larger than the flagged docs — and the report itself is a
    * 3-row spine: the cumulative-removed column is a ≤3-row
    * broadcast range join + conditional aggregate (no unpartitioned
    * window anywhere — the round-15 plan lint's rule).
    */
  def p11DedupFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wH = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"))
    val f1 = Tables.documents(s, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("h"))
      .withColumn("keep", min(col("doc_id")).over(wH))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("doc_id"))
    val f2 = graft.dedup.Dedup.ngramContainment(s, dir)
      .select(col("doc_contained").as("doc_id")).distinct()
    val f3 = graft.dedup.Dedup.ngramJaccard(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val flags = f1.withColumn("stage", lit(1))
      .unionByName(f2.withColumn("stage", lit(2)))
      .unionByName(f3.withColumn("stage", lit(3)))
      .localCheckpoint()
    val nFlag = flags.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_flagged"))
    val nNew = flags.groupBy(col("doc_id"))
      .agg(min(col("stage")).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_new"))
    val tot = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val spine = Seq((1, "exact"), (2, "containment"), (3, "jaccard"))
      .toDF("stage", "stage_name")
    // cum_removed = Σ n_new over stages ≤ this one. The per-stage
    // counts collapse to ONE row (a global collect_list aggregate —
    // statically bounded, so the round-16 physical lint proves the
    // nested-loop build side, where the r15 range join's grouped-agg
    // sides were only bounded by semantics), and the running sums are
    // row-local array filter/aggregate over that ≤3-element column —
    // same numbers as a cumsum window, no WindowExec, no M×N join.
    val nNewRow = broadcast(nNew.agg(collect_list(
      struct(col("stage").as("s2"), col("n_new").as("nn"))).as("nnarr")))
    def sumUpTo(cmp: (Column, Column) => Column): Column = coalesce(
      aggregate(
        filter(col("nnarr"), x => cmp(x.getField("s2"), col("stage"))),
        lit(0L), (acc, x) => acc + x.getField("nn")),
      lit(0L))
    spine
      .join(nFlag, Seq("stage"), "left")
      .crossJoin(broadcast(tot))
      .crossJoin(nNewRow)
      .withColumn("n_new", sumUpTo(_ === _))
      .withColumn("cum_removed", sumUpTo(_ <= _))
      .withColumn("n_flagged", coalesce(col("n_flagged"), lit(0L)))
      .select(col("stage"), col("stage_name"), col("n_flagged"),
        col("n_new"), col("cum_removed"),
        (col("n_docs") - col("cum_removed")).as("survivors"))
      .orderBy(col("stage"))
  }

  /** p15: the EMBEDDING-CORPUS CARD — p04/p12's health-card
    * discipline applied to the vector table, per label: size, LOF
    * outlier count/rate (s11 — the vectors no neighborhood claims),
    * the most CENTRAL vector (s12's PageRank argmax, pagerank9-desc/
    * vec_id tie-break — the label's natural representative for
    * audits and few-shot seeds), and the intra-label near-duplicate
    * pair count (d05's exact cosine pairs restricted to same-label
    * ends — the redundancy a d14-style prune would reclaim). One row
    * per label; every number is an exact aggregate over
    * already-oracle-matched component columns.
    *
    * Scale shape: the cost IS the components' (s11/s12 ride s08's
    * graph, d05 the block pair join); the card itself adds
    * vec-cardinality joins, one label-partitioned rank window and
    * label-cardinality groupBys.
    */
  def p15EmbeddingCard(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labels = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"))
    // ONE kNN graph for both components (round 16): s11 and s12 both
    // ride s08's exact n²-cosine block join — computing it per
    // component made the card pay the quadratic stage twice. The
    // localCheckpoint materializes k·n edge rows once; both consumers
    // reuse the checkpointed blocks, and the integer edge set — hence
    // every published hash — is unchanged.
    // Materialize.cut = localCheckpoint by default; conf-gated to a
    // reliable checkpoint for cluster runs (r16 verdict item 7 — an
    // executor loss must recompute, not kill, the card at scale)
    val graph = Materialize.cut(graft.similarity.Ann.knnGraphEdges(s, dir))
    val lof = graft.similarity.Ann.s11Lof(s, dir, graph = Some(graph))
      .select(col("vec_id"), col("outlier_flag"))
    val pr = graft.similarity.Ann.s12KnnPagerank(s, dir,
      graph = Some(graph))
    val base = labels
      .join(lof, Seq("vec_id"), "left")
      .join(pr, Seq("vec_id"), "left")
    val wLab = Window.partitionBy(col("label"))
      .orderBy(col("pagerank9").desc, col("vec_id"))
    val stats = base
      .withColumn("rk", row_number().over(wLab))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("outlier_flag"), lit(0))).cast("long")
          .as("n_outliers"),
        max(when(col("rk") === 1, col("vec_id")))
          .as("top_central_vec_id"),
        max(when(col("rk") === 1, col("pagerank9")))
          .as("top_pagerank9"))
      .withColumn("outlier_rate6",
        floor(col("n_outliers").cast("double") /
          col("n_vecs").cast("double") * lit(1000000.0) + lit(0.5))
          .cast("long"))
    val la = labels.select(col("vec_id").as("id_a"), col("label"))
    val lb = labels.select(col("vec_id").as("id_b"),
      col("label").as("label_b"))
    val dups = graft.dedup.Dedup.embeddingDedup(s, dir)
      .join(la, Seq("id_a"))
      .join(lb, Seq("id_b"))
      .filter(col("label") === col("label_b"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("dup_pairs"))
    stats.join(dups, Seq("label"), "left")
      .select(col("label"), col("n_vecs"), col("n_outliers"),
        col("outlier_rate6"), col("top_central_vec_id"),
        col("top_pagerank9"),
        coalesce(col("dup_pairs"), lit(0L)).as("dup_pairs"))
      .orderBy(col("label"))
  }
}

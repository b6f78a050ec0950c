package graft.text

import graft.Tables
import graft.dedup.Dedup.normText
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2C): language
  * ID, quality scoring, token counting, rolling-hash fingerprints. All
  * pure `functions._` compositions — codegen'd, no UDFs, shuffle-free
  * (row-local), so they stream through a 100 TB corpus at scan speed.
  */
object TextFns {

  /** Tiny per-language stopword profiles (top function words). The
    * scorer is the operator; on synthetic corpora accuracy is
    * meaningless, determinism is what the oracle checks.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en", "que")
  )

  private def words(c: Column): Column = split(normText(c), " ")

  private def stopHits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => array_contains(array(stop.map(lit): _*), w)))

  /** Predicted language as a single expression (t01's fold inlined) —
    * for one-pass pipelines that don't need the per-profile scores.
    */
  def predictedLangCol(c: Column): Column = {
    val ws = words(c)
    Profiles.foldLeft((lit("und"), lit(0))) {
      case ((langAcc, scoreAcc), (l, stop)) =>
        val sc = stopHits(ws, stop)
        (when(sc > scoreAcc, lit(l)).otherwise(langAcc),
          greatest(scoreAcc, sc))
    }._1
  }

  /** The t02 composite score from its four ingredient ratios — the ONE
    * place the weights/thresholds live (qualityCol and qualityScore
    * both assemble their ingredients and delegate here).
    */
  private def compositeQuality(nWords: Column, avgWordLen: Column,
      stopRatio: Column, punctRatio: Column): Column =
    floor((
      when(nWords >= 20 && nWords <= 1000, lit(0.4)).otherwise(lit(0.0)) +
      when(avgWordLen >= 3 && avgWordLen <= 10, lit(0.3)).otherwise(lit(0.0)) +
      when(stopRatio >= 0.01, lit(0.2)).otherwise(lit(0.0)) +
      when(punctRatio <= 0.2, lit(0.1)).otherwise(lit(0.0))
    ) * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Composite quality score as a single expression (t02's formula). */
  def qualityCol(c: Column): Column = {
    val ws = words(c)
    val nWords = size(ws)
    val avgWordLen =
      (length(normText(c)) - (nWords - 1)).cast("double") / nWords
    val stopRatio = stopHits(ws, Profiles.head._2).cast("double") / nWords
    val punctRatio =
      (length(c) - length(regexp_replace(c, "[.!?,;:]", ""))).cast("double") /
        length(c)
    compositeQuality(nWords, avgWordLen, stopRatio, punctRatio)
  }

  /** Regex token count as a single expression (t03's BPE-ish proxy). */
  def reTokensCol(c: Column): Column =
    size(regexp_extract_all(normText(c), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0)))

  /** t01: stopword-profile language ID with deterministic tie-break
    * (profile order wins ties; all-zero → 'und').
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val scored = Profiles.foldLeft(Tables.documents(s, dir)) {
      case (df, (l, stop)) => df.withColumn(s"score_$l", stopHits(ws, stop))
    }
    val best = Profiles.foldLeft((lit("und"), lit(0))) {
      case ((langAcc, scoreAcc), (l, _)) =>
        (when(col(s"score_$l") > scoreAcc, lit(l)).otherwise(langAcc),
          greatest(scoreAcc, col(s"score_$l")))
    }
    scored
      .select((Seq(col("doc_id"), col("lang"),
        best._1.as("predicted_lang")) ++
        Profiles.map { case (l, _) => col(s"score_$l") }): _*)
      .orderBy(col("doc_id"))
  }

  /** t02: document quality heuristics — length, word stats, punctuation
    * / digit / stopword ratios, and a composite score. Integer counts +
    * one fixed double formula → bit-stable across engines.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    Tables
      .documents(s, dir)
      .withColumn("n_char", length(col("text")))
      .withColumn("n_words", size(ws))
      .withColumn("n_punct",
        length(col("text")) - length(regexp_replace(col("text"), "[.!?,;:]", "")))
      .withColumn("n_digit",
        length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
      .withColumn("n_stop", stopHits(ws, Profiles.head._2))
      .withColumn("avg_word_len",
        (length(normText(col("text"))) - (col("n_words") - 1)).cast("double") /
          col("n_words"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_char"))
      .withColumn("quality",
        compositeQuality(col("n_words"), col("avg_word_len"),
          col("stop_ratio"), col("punct_ratio")))
      .select(col("doc_id"), col("n_char"), col("n_words"), col("n_punct"),
        col("n_digit"), col("n_stop"), col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** t03: token counting — whitespace tokens, regex word/punct tokens,
    * a length-proxy subword estimate, and the REAL subword count: a
    * greedy longest-match BPE-style segmentation over an embedded
    * public vocab (native codegen'd expression, row-local — see
    * functions.BpeCount).
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.bpe_count
    Tables
      .documents(s, dir)
      .withColumn("ws_tokens", size(split(normText(col("text")), " ")))
      .withColumn("re_tokens",
        size(regexp_extract_all(normText(col("text")),
          lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))))
      .withColumn("subword_est",
        ceil(length(col("text")).cast("double") / lit(3.6)).cast("long"))
      .withColumn("bpe_tokens",
        bpe_count(regexp_extract_all(normText(col("text")),
          lit("[a-z0-9]+"), lit(0))))
      .select(col("doc_id"), col("ws_tokens"), col("re_tokens"),
        col("subword_est"), col("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** t05: Shannon entropy of the character and word distributions —
    * the classic cheap proxies for degenerate/boilerplate text (low
    * entropy → repetitive junk). Entropy is a ROW-LOCAL statistic, so
    * it is computed inside the row by the native `symbol_entropy`
    * expression (single-pass hash count, fixed-point term sum for
    * oracle parity) — zero exchanges, vs the exploded
    * groupBy(doc_id, sym) formulation that shuffled every character of
    * the corpus.
    */
  def entropyScore(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.symbol_entropy
    def r6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    Tables
      .documents(s, dir)
      .select(col("doc_id"),
        r6(symbol_entropy(split(normText(col("text")), "")))
          .as("char_entropy"),
        r6(symbol_entropy(split(normText(col("text")), " ")))
          .as("word_entropy"))
      .orderBy(col("doc_id"))
  }

  private val Mod = 1000000007L

  /** Polynomial rolling hash (Rabin–Karp) of a string column, as a
    * sequential fold over code points — same fold DuckDB's list_reduce
    * performs, so fingerprints agree exactly.
    */
  def rollingHash(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % Mod)

  /** t06: TF-IDF top terms per document — the inverted-index statistic
    * behind corpus keyword extraction and quality triage.
    *
    * Scale shape: ONE groupBy(doc_id, term) for tf (map-side partial
    * counts), ONE groupBy(term) for df, then a repartition join on
    * term (the term dictionary is too big to broadcast at 100 TB but
    * is Zipf-compact relative to the corpus), and a per-doc window for
    * top-k. The corpus text itself is scanned once.
    *
    * Oracle parity: tf/df are integers; idf = ln((N+1)/(df+1)) + 1 is
    * one libm call over an integer-derived double, quantized at 1e-6
    * (same trick as t05's entropy at 1e-9).
    */
  def tfidf(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"),
      explode(regexp_extract_all(normText(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("term"))
    // materialize tf once: df and the scoring join both consume it, and
    // without the checkpoint each branch re-scans (and re-explodes) the
    // full corpus — 3 scans instead of 1 at 100 TB
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score6").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score6",
        floor(col("tf") *
          (log((col("n_docs") + 1).cast("double") /
            (col("df") + 1).cast("double")) + lit(1.0)) *
          lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("score6"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** The t07 benchmark query — common corpus words so every document
    * scores (the operator is the ranking machinery, not the query).
    */
  val Bm25Query: Seq[String] = Seq("spark", "join", "table")
  private[text] val Bm25K1 = 1.2
  private[text] val Bm25B = 0.75

  /** t07: BM25 full-text ranking for a fixed term query — the
    * retrieval scorer an LLM-data pipeline uses for corpus search and
    * topic filtering.
    *
    * score(d) = Σ_t idf_t · tf/(tf + k1·(1 − b + b·dl/avgdl)),
    * idf_t = ln(1 + (N − df + ½)/(df + ½)).
    *
    * Scale shape: tf for ONLY the query terms (filter before the
    * groupBy, so the shuffle carries |query| terms per doc max),
    * doc lengths from the same single scan, df/avgdl/N are a
    * |query|-row + 1-row broadcast. Per-term contributions are
    * quantized to 1e-6 fixed-point BIGINTs before the final per-doc
    * sum, so accumulation order can't perturb the hash.
    */
  def bm25Search(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val qTerms = Bm25Query
    // the query term set is FIXED, so tf needs no inverted index at
    // all: per-doc term frequencies are row-local array filters over
    // the token array — ONE corpus scan total, one 1-row global agg
    // broadcast back (N, avgdl, per-term dfs), zero explodes
    val toks = regexp_extract_all(normText(col("text")),
      lit("[a-z0-9]+"), lit(0))
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(Seq(col("doc_id"),
        size(col("toks")).cast("long").as("dl")) ++
        qTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).cast("long")
            .as(s"tf_$i")
        }: _*)
    val aggs = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      qTerms.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    // per-term fixed-point contributions (BIGINT, order-free), summed
    // as an explicit left-assoc chain — identical to the oracle's
    def c6(i: Int): Column = {
      val idf = log(lit(1.0) + (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)))
      when(col(s"tf_$i") > 0,
        floor(idf * col(s"tf_$i") /
          (col(s"tf_$i") + lit(Bm25K1) * (lit(1.0) - lit(Bm25B) +
            lit(Bm25B) * col("dl") / col("avgdl"))) *
          lit(1000000.0) + lit(0.5)).cast("long"))
        .otherwise(lit(0L))
    }
    val hit = qTerms.indices
      .map(i => (col(s"tf_$i") > 0).cast("long")).reduceLeft(_ + _)
    // top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps, no global sort); the rank over the k survivors comes
    // from ONE global aggregate — sorted-array collapse + posexplode
    // (struct order (−score6, doc_id) = score desc, id asc, exactly
    // row_number's key; see t23) — so the plan carries no WindowExec
    // and re-reads nothing
    base.crossJoin(broadcast(stats))
      .withColumn("score6",
        qTerms.indices.map(c6).reduceLeft(_ + _) / lit(1000000.0))
      .withColumn("n_terms_hit", hit)
      .filter(col("n_terms_hit") > 0)
      .orderBy(col("score6").desc, col("doc_id"))
      .limit(k)
      .agg(sort_array(collect_list(struct(
        (-col("score6")).as("ns"), col("doc_id").as("doc_id"),
        col("score6").as("score6"), col("n_terms_hit").as("n_terms_hit"))))
        .as("a"))
      .select(posexplode(col("a")))
      .select((col("pos") + 1).cast("int").as("rk"),
        col("col.doc_id").as("doc_id"), col("col.score6").as("score6"),
        col("col.n_terms_hit").as("n_terms_hit"))
      .orderBy(col("rk"))
  }

  /** t08: bigram-LM perplexity scoring — train an add-1-smoothed
    * bigram language model on the corpus itself and score every
    * document's average negative log-likelihood (perplexity =
    * exp(avg_nll)); the classic cheap "does this read like the rest of
    * the corpus" filter for pretraining data.
    *
    * Scale shape: bigrams are ROW-LOCAL (slice+zip of the token array
    * — no per-doc window shuffle); the model is two groupBys (bigram
    * and context counts) + repartition joins back on the bigram key;
    * the vocab size is a 1-row broadcast. Per-bigram nll is one ln()
    * quantized to 1e-9 BIGINTs (t05 precedent), so the per-doc sum is
    * order-free and the hash exact.
    */
  def bigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val arr = regexp_extract_all(normText(col("text")),
      lit("[a-z0-9]+"), lit(0))
    // per-(doc, bigram) multiplicities FIRST, checkpointed: the model
    // counts (cvw, cv) derive from this compact table instead of
    // re-exploding the corpus, and the scoring join weights each
    // distinct bigram by its multiplicity — one corpus scan for the
    // counts plus one column-pruned scan for the vocab size
    val dvw = docs
      .select(col("doc_id"), arr.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("v"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w"))).as("b"))
      .groupBy(col("doc_id"), col("b.v").as("v"), col("b.w").as("w"))
      .agg(count(lit(1)).as("mult"))
      .localCheckpoint()
    val cvw = dvw.groupBy(col("v"), col("w")).agg(sum(col("mult")).as("cvw"))
    val cv = cvw.groupBy(col("v")).agg(sum(col("cvw")).as("cv"))
    val vocab = docs.select(explode(arr).as("t")).agg(
      countDistinct(col("t")).as("vsize"))
    dvw
      .join(cvw, Seq("v", "w"))
      .join(cv, Seq("v"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll9",
        floor(log((col("cv") + col("vsize")).cast("double") /
          (col("cvw") + 1).cast("double")) * lit(1.0e9) + lit(0.5))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("mult")).as("n_bigrams"),
        ((sum(col("mult") * col("nll9")) / lit(1.0e9)) /
          sum(col("mult"))).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** t09: PII detection + redaction — the scrubbing stage every
    * pretraining pipeline runs before anything else. The corpus is
    * synthetic (no real PII), so deterministic email/phone tokens are
    * PLANTED in-query from doc_id — identically on both engines — and
    * the graded operator is the detection/redaction machinery: count
    * and replace at scan speed, row-local, zero shuffles.
    *
    * Regexes are kept in the common Java-regex ∩ RE2 dialect (char
    * classes + bounded quantifiers, no backrefs/lookaround) so Spark
    * and DuckDB match identically; DuckDB needs the 'g' flag to mirror
    * Spark's replace-all.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 415-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    Tables
      .documents(s, dir)
      .withColumn("planted", planted)
      .withColumn("n_emails",
        size(regexp_extract_all(col("planted"), lit(EmailRe), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col("planted"), lit(PhoneRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("planted"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        (col("n_emails") + col("n_phones")).as("n_pii"), col("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Word n-gram array of a token array (n consecutive words joined by
    * a space), empty when the doc is shorter than n — the native
    * codegen'd expression (functions.WordNgrams). The declarative HOF
    * forms are interpreted: `transform(sequence(..), i -> slice(..))`
    * is O(len²) per doc and cost d08 12.5 s at sf0.1; this is one
    * tight loop inside whole-stage codegen.
    */
  private[graft] def wordNgrams(ws: Column, n: Int): Column =
    graft.functions.VectorFunctions.word_ngrams(ws, n)

  /** t10: intra-document repetition ratios (the MassiveText/Gopher
    * quality filter): fraction of duplicate word bigrams/trigrams
    * inside each document — boilerplate and degenerate generation
    * score high, natural text low. ROW-LOCAL (the n-gram multiset
    * never leaves the row): zero exchanges, scan-speed at 100 TB.
    * n = 2,3 because the synthetic docs are tiny; production would add
    * the paper's longer n. Fractions are one integer-derived division
    * quantized at 1e-6 (§8 discipline).
    */
  def ngramRepetition(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("doc_id"),
        size(words(col("text"))).as("n_words"),
        dupNgramFracCol(col("text"), 2).as("dup_bigram_frac"),
        dupNgramFracCol(col("text"), 3).as("dup_trigram_frac"))
      .orderBy(col("doc_id"))

  /** Gopher's required-stopword list (Rae et al. 2021, Table A1): a
    * document must contain at least two of these to pass.
    */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Fraction of words containing an alphabetic character (Gopher
    * ingredient; shared by t11 and the p02 pipeline). Each maximal
    * non-space run of the normalized text with ≥1 letter matches the
    * pattern exactly once.
    */
  def alphaWordFracCol(c: Column): Column = {
    val norm = normText(c)
    q6(size(regexp_extract_all(norm, lit("[^ ]*[a-z][^ ]*"), lit(0)))
      .cast("double") / size(split(norm, " ")))
  }

  /** '#'-and-'...' symbol count per word (Gopher ingredient; shared by
    * t11 and p02) — length-delta replace counts, '...' consumed
    * greedily left-to-right identically in Java regex and RE2.
    */
  def symbolWordRatioCol(c: Column): Column = {
    val nHash = length(c) - length(regexp_replace(c, "#", ""))
    val nEllipsis =
      ((length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / lit(3))
        .cast("long")
    q6((nHash + nEllipsis).cast("double") / size(words(c)))
  }

  /** Duplicate word-n-gram fraction (t10's measure as a single
    * expression; shared by the p02 pipeline).
    */
  def dupNgramFracCol(c: Column, n: Int): Column = {
    val ng = wordNgrams(words(c), n)
    when(size(ng) > 0,
      q6((size(ng) - size(array_distinct(ng))).cast("double") / size(ng)))
      .otherwise(lit(0.0))
  }

  /** t11: the Gopher document-quality rules (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", Table A1) — the classic
    * pretraining corpus filter: word-count bounds, mean word length,
    * symbol-to-word ratio ('#' and '...'), bullet-/ellipsis-line
    * fractions, fraction of words containing an alphabetic character,
    * and a required-stopword count; `gopher_pass` is the conjunction.
    *
    * ROW-LOCAL, like t02/t05/t10: every ingredient is a
    * regexp/replace count or a native `array_contains` on the row —
    * deliberately NO higher-order-function lambdas (interpreted,
    * O(len²) — the d08 lesson) — so the filter runs at scan speed
    * over a 100 TB corpus with zero exchanges. Ratios are integer
    * counts divided once and quantized at 1e-6 (§8 discipline).
    */
  def gopherQuality(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val t = col("text")
    val norm = normText(t)
    val ws = words(t)
    val nWords = size(ws)
    // line counts run on a \r-stripped copy: Java's (?m)$ matches
    // before \r\n (and lone \r) while DuckDB's RE2 only matches
    // before \n — normalizing the terminator keeps engine and oracle
    // identical on CRLF documents
    val tl = regexp_replace(t, "\r", "")
    val nLines = length(tl) - length(regexp_replace(tl, "\n", "")) + 1
    val nBulletLines =
      size(regexp_extract_all(tl, lit("(?m)^[ \\t]*[-*\u2022]"), lit(0)))
    val nEllipsisLines =
      size(regexp_extract_all(tl, lit("(?m)\\.\\.\\.[ \\t]*$"), lit(0)))
    val nReqStops = RequiredStops
      .map(w => when(array_contains(ws, w), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    val meanWordLen =
      (length(norm) - (nWords - 1)).cast("double") / nWords
    val bulletFrac = nBulletLines.cast("double") / nLines
    val ellipsisFrac = nEllipsisLines.cast("double") / nLines
    Tables
      .documents(s, dir)
      .select(col("doc_id"),
        nWords.as("n_words"),
        r6(meanWordLen).as("mean_word_len"),
        symbolWordRatioCol(t).as("symbol_word_ratio"),
        r6(bulletFrac).as("bullet_line_frac"),
        r6(ellipsisFrac).as("ellipsis_line_frac"),
        alphaWordFracCol(t).as("alpha_word_frac"),
        nReqStops.as("n_req_stops"))
      .withColumn("gopher_pass",
        when(col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
          col("symbol_word_ratio") < 0.1 &&
          col("bullet_line_frac") < 0.9 &&
          col("ellipsis_line_frac") < 0.3 &&
          col("alpha_word_frac") > 0.8 &&
          col("n_req_stops") >= 2, lit(1)).otherwise(lit(0)))
      .orderBy(col("doc_id"))
  }

  /** t13: READABILITY scoring — Flesch reading ease (Flesch 1948) and
    * the Flesch–Kincaid grade level (Kincaid et al. 1975), the classic
    * audience-targeting lens beside t02/t11's junk filters: a corpus
    * can be high-quality AND uniformly graduate-level prose, and a
    * curated mix should know its grade distribution.
    *
    *   FRE  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
    *   FKGL = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59
    *
    * Syllables use the standard deterministic proxy: maximal vowel
    * groups ([aeiouy]+) over the normalized text — "beautiful" (eau,
    * i, u) counts 3. Sentences are [.!?]+ runs floored at 1 (the
    * synthetic corpus is unpunctuated — every doc is one sentence).
    * Each ratio is ONE integer-fed IEEE division, the constant chain
    * is written identically on both engines, and the scores are
    * floored to 1e-6 longs — bit-identical by construction.
    *
    * Scale shape: t02/t11's posture — three regexp counts on the row,
    * zero exchanges, scan speed at 100 TB.
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val norm = normText(t)
    val nWords = size(regexp_extract_all(norm, lit("[a-z]+"), lit(0)))
    val nSyll = size(regexp_extract_all(norm, lit("[aeiouy]+"), lit(0)))
    val nSent = greatest(lit(1),
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))))
    Tables
      .documents(s, dir)
      .select(col("doc_id"), nWords.as("n_words"), nSent.as("n_sentences"),
        nSyll.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("wps", col("n_words").cast("double") / col("n_sentences"))
      .withColumn("spw", col("n_syllables").cast("double") / col("n_words"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        floor((lit(206.835) - lit(1.015) * col("wps") -
          lit(84.6) * col("spw")) * lit(1000000.0) + lit(0.5)).as("fre6"),
        floor((lit(0.39) * col("wps") + lit(11.8) * col("spw") -
          lit(15.59)) * lit(1000000.0) + lit(0.5)).as("fkgl6"))
      .orderBy(col("doc_id"))
  }

  /** t14: ZIPF-law fit diagnostic per source — natural text follows
    * freq ∝ rank^(−s) with s ≈ 1 (Zipf 1949); a source whose top-rank
    * curve fits a very different exponent is template spam, keyword
    * stuffing, or machine-generated boilerplate — a corpus-forensics
    * lens none of the row-local filters (t02/t11) can see because it
    * is a property of the AGGREGATE term distribution. The exponent
    * is estimated robustly: the THEIL-SEN slope (q64's estimator) of
    * the (ln rank, ln count) points over each source's top-`k` terms —
    * immune to the head outliers ("the") and tail truncation that
    * wreck an OLS fit on log-log data.
    *
    * Determinism: ranks are exact integers ((count desc, term) order);
    * each pairwise slope is the identical ln/subtract/divide chain on
    * both engines (t12's libm-parity posture) and the median picks
    * the value at exact integer rank ⌈m/2⌉ (q64's lower-median rule);
    * the published slope is floored to 1e-6. Sources with a single
    * term have no pairs and emit nothing on either engine.
    *
    * Scale shape: ONE corpus scan → (source, term) counts (map-side
    * combined; t12's exchange); the rank window sees the Zipf-compact
    * count table and only k rows per source survive into the
    * in-task O(k²) pairwise pass (one groupByKey over |sources|·k
    * integer rows).
    */
  def zipfFit(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    import s.implicits._
    val st = Tables.documents(s, dir)
      .select(col("source"),
        explode(regexp_extract_all(normText(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    val wS = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("term"))
    st.withColumn("r", row_number().over(wS))
      .filter(col("r") <= k)
      .select(col("source"), col("r"), col("c"))
      .as[(String, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (src: String, it: Iterator[(String, Int, Long)]) =>
        val pts = it.toVector.sortBy(_._2)
          .map(t => (math.log(t._2.toDouble), math.log(t._3.toDouble)))
        val n = pts.size
        if (n < 2) Iterator.empty
        else {
          val slopes = Vector.newBuilder[Double]
          var i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              slopes += (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)
              j += 1
            }
            i += 1
          }
          val sl = slopes.result().sorted
          val med = sl((sl.size + 1) / 2 - 1)
          Iterator.single((src, n,
            math.floor(med * 1000000.0 + 0.5) / 1000000.0))
        }
      }
      .toDF("source", "n_terms", "zipf_slope6")
      .orderBy(col("source"))
  }

  /** t04: document fingerprints — whole-text rolling hash plus the min
    * over per-128-char block hashes (winnowing-style locality).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = normText(col("text"))
    val blocks = transform(
      sequence(lit(0), floor((length(norm) - 1) / lit(128.0)).cast("int")),
      i => norm.substr(lit(1) + i * 128, lit(128)))
    // empty text → NULL on both engines: Spark's sequence(0,-1) yields
    // [0,-1] while DuckDB's generate_series(0,-1) is empty, so the
    // unguarded expressions diverge exactly there
    Tables
      .documents(s, dir)
      .withColumn("fp_full",
        when(length(norm) === 0, lit(null)).otherwise(rollingHash(norm)))
      .withColumn("fp_min_block",
        when(length(norm) === 0, lit(null)).otherwise(
          array_min(transform(blocks, b => aggregate(
            transform(split(b, ""), ch => ascii(ch).cast("long")),
            lit(0L),
            (acc, x) => (acc * 31 + x) % Mod)))))
      .select(col("doc_id"), col("fp_full"), col("fp_min_block"))
      .orderBy(col("doc_id"))
  }

  /** t12: per-source unigram KL divergence from the blended corpus —
    * the domain-mix diagnostic beside p04's volume card and q61's
    * value drift: which source READS different from the corpus (a
    * crawl gone off-distribution, a boilerplate-dominated domain),
    * measured as KL(p_source ‖ p_corpus) over the source's observed
    * vocabulary with add-one smoothing. A source whose token mix
    * equals the corpus's scores exactly 0 (spec-proven on a
    * single-source corpus: p_s ≡ p term-for-term, so every 1e-9 term
    * floors to 0).
    *
    * Exactness: counts are integers; each term's contribution
    * p_s·ln(p_s/p) is two integer-ratio doubles and one libm log,
    * quantized to a 1e-9 long BEFORE the per-source sum (t08/q61's
    * posture — long sums are order-free, so partial-aggregation order
    * can't move the hash). `kl9` is published as the exact long.
    *
    * Scale shape: ONE corpus scan → (source, term) counts (map-side
    * combined, checkpointed — term totals, source totals and scoring
    * all consume it); per-term corpus totals via a term groupBy over
    * that Zipf-compact table joined back on term (repartition join —
    * the dictionary outgrows broadcast at 100 TB); source totals and
    * the 1-row (N, V) stats ride broadcasts.
    */
  def sourceKl(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(s, dir)
      .select(col("source"),
        explode(regexp_extract_all(normText(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = st.groupBy(col("term")).agg(sum(col("c")).as("ct"))
    val src = st.groupBy(col("source")).agg(
      sum(col("c")).as("ns"), count(lit(1)).as("n_terms"))
    val glob = tot.agg(sum(col("ct")).as("n_all"), count(lit(1)).as("v"))
    val ps = (col("c") + 1).cast("double") /
      (col("ns") + col("v")).cast("double")
    val p = (col("ct") + 1).cast("double") /
      (col("n_all") + col("v")).cast("double")
    st.join(tot, "term")
      .join(broadcast(src), "source")
      .crossJoin(broadcast(glob))
      .withColumn("t9",
        floor(ps * log(ps / p) * lit(1.0e9) + lit(0.5)).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"), max(col("n_terms")).as("n_terms"),
        sum(col("t9")).as("kl9"))
      .orderBy(col("source"))
  }

  /** t15: per-document LEXICAL DIVERSITY — the vocabulary-richness
    * counterpart to t10's repetition and t02's surface quality: a
    * boilerplate page or keyword-stuffed spam doc reuses a tiny
    * vocabulary (low type-token ratio, few hapax legomena) while
    * organic prose keeps minting new words. Reports per doc: token
    * count, type count, hapax count (frequency-1 types), the
    * type-token ratio, the hapax ratio, and Guiraud's R =
    * types/√tokens (the length-corrected variant — raw TTR decays
    * with length, so R is the comparable score across short and long
    * docs).
    *
    * Exactness: the three counts are exact integers; the ratios are
    * single integer-ratio IEEE divisions (one libm sqrt for R)
    * quantized to 6 decimals, identical chains on both engines. Docs
    * whose normalized text has no [a-z0-9]+ token produce no row on
    * either engine (unnest of an empty list).
    *
    * Scale shape: explode to (doc_id, term) pairs, count with
    * map-side combine (the one corpus-sized exchange), then the
    * per-doc roll-up over the (doc, term) table — all three metrics
    * are plain sums, so partial aggregation halves the second
    * shuffle too. No joins, no windows: a 100 TB corpus passes
    * through two combiner-backed aggregations and nothing else.
    */
  def lexicalDiversity(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(normText(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, lit(1L)).otherwise(lit(0L))).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        r6(col("n_types").cast("double") / col("n_tokens")).as("ttr6"),
        r6(col("n_hapax").cast("double") / col("n_tokens")).as("hapax6"),
        r6(col("n_types") / sqrt(col("n_tokens").cast("double")))
          .as("guiraud6"))
      .orderBy(col("doc_id"))
  }

  /** t16: MARKUP/BOILERPLATE density — the C4-style web-cleaning
    * signals (Raffel et al. 2020 §2.2 drop pages with code/markup
    * residue; Gopher's symbol rules are t11): per document, counts of
    * URLs, email addresses and HTML-ish tags left in the text, plus
    * their density against the whitespace token count. A crawl doc
    * whose extractor failed (nav bars, raw HTML, link farms) scores
    * high and gets triaged before tokenization wastes budget on it.
    *
    * Exactness: all counts are integer regexp_extract_all lengths
    * over the normalized text with conservative explicit character
    * classes (identical semantics under Java regex and RE2); the
    * density is one 1e-6-floored integer-ratio chain. Row-local scan
    * op — zero shuffles, the t01-t05 posture: a 100 TB corpus is
    * triaged at scan speed.
    */
  def markupDensity(s: SparkSession, dir: String): DataFrame = {
    def r6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val norm = normText(col("text"))
    val nUrls = size(regexp_extract_all(norm,
      lit("https?://[^ ]+"), lit(0)))
    val nEmails = size(regexp_extract_all(norm,
      lit("[a-z0-9.+_-]+@[a-z0-9-]+\\.[a-z0-9.]+"), lit(0)))
    val nTags = size(regexp_extract_all(norm,
      lit("</?[a-z][^>]*>"), lit(0)))
    val nTok = size(split(norm, " "))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        nUrls.as("n_urls"), nEmails.as("n_emails"), nTags.as("n_tags"),
        nTok.as("n_ws_tokens"),
        r6((nUrls + nEmails + nTags).cast("double") / nTok)
          .as("markup_density6"))
      .orderBy(col("doc_id"))
  }

  /** t17: OUT-OF-VOCABULARY rate per document — the tokenizer-fit /
    * vocabulary-coverage statistic: the fraction of a document's
    * tokens outside the corpus's top-K vocabulary. A doc dense in
    * OOV tokens is either off-domain, mojibake, or will fragment
    * into expensive subword pieces — the classic pre-tokenization
    * triage (and the measured input to choosing K itself). K = 16
    * exercises the synthetic corpus's 31-word vocabulary; ~50k is
    * the documented production default for a BPE-sized vocab.
    *
    * Determinism: the vocabulary is the top K terms by (count desc,
    * term asc) — a total order, so the vocab set is identical on
    * both engines; the rate is an exact integer floor-division at
    * 1e-6.
    *
    * Scale shape: one corpus scan → (doc, token) pairs; the term
    * count groupBy is Zipf-compact (map-side combined); the top-K
    * is orderBy+limit = TakeOrderedAndProject (t07's posture — never
    * a global sort of the dictionary); the K-row vocab BROADCASTS
    * back onto the unshuffled token stream and the per-doc roll-up
    * is one map-side-combinable groupBy on doc_id.
    */
  def t17OovRate(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(k)
      .select(col("w"), lit(1).as("iv"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        expr("n_oov * 1000000L div n_tokens").as("oov_rate6"),
        when(expr("n_oov * 1000000L div n_tokens") > 100000L, 1)
          .otherwise(0).as("oov_flag"))
      .orderBy(col("doc_id"))
  }

  /** t18: RAG CHUNKING — overlapping fixed-size token windows with a
    * stride, the retrieval-ingestion twin of d13's training packing:
    * d13 cuts the CONCATENATED corpus into training sequences (doc
    * boundaries ignored), a retrieval index cuts EACH document into
    * chunks that overlap so no answer span is split across a chunk
    * boundary (the standard RAG ingestion shape; overlap = chunk −
    * stride). Chunk starts at 0, stride, 2·stride, …; a document
    * with ≤ chunkTok tokens is one chunk; the last chunk is the
    * first one covering the final token (⌈(n−C)/S⌉+1 total), so
    * every token is covered and no chunk is a suffix-duplicate of
    * its predecessor. Tokens are t03's regex tokens over the d01
    * normalization, re-joined with single spaces; empty docs emit
    * no chunks (nothing to index).
    *
    * Exactness: chunk count, bounds and lengths are pure integer
    * arithmetic; the chunk text is an array slice + join — no floats
    * anywhere, so the oracle replays bit-for-bit.
    *
    * Scale shape: ZERO shuffles — tokenize, chunk-explode and slice
    * are row-local; a 100 TB corpus chunks at scan speed with output
    * ∝ n/stride per doc. The explode carries the token ARRAY only
    * inside the row (never into an exchange).
    */
  def t18RagChunk(s: SparkSession, dir: String, chunkTok: Int = 32,
      stride: Int = 24): DataFrame = {
    require(stride >= 1 && stride <= chunkTok, "stride within chunk")
    val toks = regexp_extract_all(normText(col("text")),
      lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_tok_doc", size(col("toks")))
      .filter(col("n_tok_doc") > 0)
      .withColumn("n_chunks",
        when(col("n_tok_doc") <= chunkTok, lit(1L)).otherwise(
          expr(s"(n_tok_doc - $chunkTok + ${stride - 1}) div $stride")
            + 1))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .select(col("doc_id"), col("n_tok_doc"), col("chunk_id"),
        col("start_tok"),
        least(lit(chunkTok), col("n_tok_doc") - col("start_tok"))
          .cast("long").as("n_tok"),
        array_join(slice(col("toks"),
          (col("start_tok") + 1).cast("int"), lit(chunkTok)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** t19: cross-document n-gram NOVELTY profile — for each document,
    * the fraction of its DISTINCT word trigrams that occur in at
    * least one OTHER document. The per-doc diagnostic between t10
    * (repetition inside one doc) and d11 (span excision across
    * docs): a near-1 shared rate marks boilerplate/template pages —
    * d11 removes the literal spans, t19 SCORES how much of a page is
    * corpus-repeated so curation can rank or drop it (the RefinedWeb
    * / Dolma duplication-profile diagnostic); a near-0 rate marks
    * genuinely novel text worth keeping even when its source is
    * dup-heavy.
    *
    * Exactness: gram sets are row-local `word_ngrams` +
    * `array_distinct` (so df counts docs, not occurrences); the rate
    * is one integer floor division at 1e-6 — no floats at all.
    *
    * Scale shape: one corpus scan → distinct (doc, gram) pairs, all
    * row-local until the explode; the gram-dictionary groupBy is
    * Zipf-compact and map-side combined; the df join back runs over
    * the checkpointed compact pair table (t06/t12's posture — the
    * dictionary side is df-unique so there is NO fan-out, output =
    * pair rows); the per-doc roll-up is one map-side-combinable
    * groupBy. A hot boilerplate gram is one dictionary row.
    */
  def t19NgramNovelty(s: SparkSession, dir: String, n: Int = 3,
      tau6: Long = 500000L): DataFrame = {
    val pairs = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(wordNgrams(words(col("text")), n)))
          .as("g"))
      .localCheckpoint()
    val dfTab = pairs.groupBy(col("g")).agg(count(lit(1)).as("df"))
    pairs.join(dfTab, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        expr("n_shared * 1000000L div n_grams").as("shared_rate6"),
        when(expr("n_shared * 1000000L div n_grams") > tau6, 1)
          .otherwise(0).as("boilerplate_flag"))
      .orderBy(col("doc_id"))
  }

  /** t20: Kneser–Ney smoothed bigram perplexity — the standard LM
    * smoothing upgrade over t08's add-1 (Kneser & Ney 1995; Chen &
    * Goodman 1999 interpolated form with a fixed absolute discount
    * D = 0.75):
    *
    *   P(w|v) = (c(v,w) − D)/c(v)
    *          + (D · N1+(v,·)/c(v)) · (N1+(·,w)/N1+(··))
    *
    * where N1+(v,·) = distinct continuations of context v, N1+(·,w) =
    * distinct contexts preceding w, N1+(··) = distinct bigram types —
    * the continuation distribution that makes "francisco" cheap only
    * after "san". Scoring the corpus itself means every scored bigram
    * has c(v,w) ≥ 1, so P > 0 without an unseen-word backstop.
    *
    * Exactness: every model quantity is an exact BIGINT off ONE
    * bigram-type table; P is one fixed IEEE double expression over
    * those counts (identical operator tree in the oracle) and the
    * per-bigram nll is one ln() quantized to 1e-9 (t08 posture), so
    * per-doc sums are order-free and the hash exact.
    *
    * Scale shape: identical to t08 — bigrams are row-local slice+zip,
    * the model is map-side-combined groupBys over the Zipf-compact
    * (v,w) type table (checkpointed once, reused by all four count
    * aggregates), N1+(··) is a 1-row broadcast, and scoring re-joins
    * the checkpointed per-doc multiplicity table on the bigram key.
    */
  def t20KneserNey(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val arr = regexp_extract_all(normText(col("text")),
      lit("[a-z0-9]+"), lit(0))
    val dvw = docs
      .select(col("doc_id"), arr.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("v"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w"))).as("b"))
      .groupBy(col("doc_id"), col("b.v").as("v"), col("b.w").as("w"))
      .agg(count(lit(1)).as("mult"))
      .localCheckpoint()
    // the bigram TYPE table: cvw feeds the token counts, its row
    // counts per v / per w / total are the N1+ type statistics
    val cvw = dvw.groupBy(col("v"), col("w"))
      .agg(sum(col("mult")).as("cvw"))
      .localCheckpoint()
    val cv = cvw.groupBy(col("v"))
      .agg(sum(col("cvw")).as("cv"), count(lit(1)).as("n1v"))
    val n1w = cvw.groupBy(col("w")).agg(count(lit(1)).as("n1w"))
    val n1tot = cvw.agg(count(lit(1)).as("n1tot"))
    dvw
      .join(cvw, Seq("v", "w"))
      .join(cv, Seq("v"))
      .join(n1w, Seq("w"))
      .crossJoin(broadcast(n1tot))
      .withColumn("p",
        (col("cvw").cast("double") - lit(0.75)) / col("cv").cast("double")
          + (lit(0.75) * col("n1v").cast("double") /
              col("cv").cast("double")) *
            (col("n1w").cast("double") / col("n1tot").cast("double")))
      .withColumn("nll9",
        floor(-log(col("p")) * lit(1.0e9) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("mult")).as("n_bigrams"),
        ((sum(col("mult") * col("nll9")) / lit(1.0e9)) /
          sum(col("mult"))).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** t21: multi-category BLOCKLIST screening — the lexicon-based
    * policy filter every pretraining pipeline runs beside t09's PII
    * pass (C4 dropped pages on a public "bad words" list; the lists
    * here are small neutral PLACEHOLDERS — swap in production
    * lexicons): per doc the match count per category plus a
    * deterministic block verdict (any adult hit, or ≥ 2 combined
    * spam/boilerplate hits).
    *
    * The corpus is synthetic (no real policy content), so terms are
    * PLANTED from doc_id exactly like t09's emails — identically on
    * both engines — and the graded machinery is the multi-pattern
    * word-boundary matching at scan speed: row-local, zero shuffles,
    * 100 TB screens in one pass. Patterns stay in the Java-regex ∩
    * RE2 dialect (alternation + \b, no lookaround) so Spark and
    * DuckDB match identically.
    */
  val SpamRe = "\\b(buy now|free money|act now|winner)\\b"
  val BoilerRe =
    "\\b(all rights reserved|cookie policy|terms of service|click here)\\b"
  val AdultRe = "\\b(nsfw|adult content|explicit)\\b"

  def t21Blocklist(s: SparkSession, dir: String): DataFrame = {
    val planted = concat(
      col("text"),
      when(col("doc_id") % 4 === 0, lit(" please buy now winner"))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0, lit(" all rights reserved click here"))
        .otherwise(lit("")),
      when(col("doc_id") % 9 === 0, lit(" nsfw")).otherwise(lit("")))
    Tables
      .documents(s, dir)
      .withColumn("p", normText(planted))
      .withColumn("n_spam",
        size(regexp_extract_all(col("p"), lit(SpamRe), lit(0))))
      .withColumn("n_boiler",
        size(regexp_extract_all(col("p"), lit(BoilerRe), lit(0))))
      .withColumn("n_adult",
        size(regexp_extract_all(col("p"), lit(AdultRe), lit(0))))
      .select(col("doc_id"), col("n_spam"), col("n_boiler"), col("n_adult"),
        (col("n_spam") + col("n_boiler") + col("n_adult")).as("n_blocked"),
        when(col("n_adult") > 0 ||
          col("n_spam") + col("n_boiler") >= 2, 1).otherwise(0)
          .as("blocked_flag"))
      .orderBy(col("doc_id"))
  }

  /** t22: PMI COLLOCATIONS (Church & Hanks 1990) — the corpus-level
    * bigram-association table a tokenizer/vocab pipeline mines before
    * merging multi-word units: PMI = ln P(w1,w2)/(P(w1)P(w2)) over
    * bigram positions vs unigram frequencies, floor-thresholded on
    * raw count so one lucky co-occurrence of two rare words cannot
    * top the table. Emits the top-K by (PMI, w1, w2) — "new york"
    * scores high because the pair is GLUED, not merely frequent
    * (t08's conditional model sees P(w2|w1); PMI sees the symmetric
    * lift).
    *
    * Exactness: all five counts are exact longs off two
    * map-side-combined groupBys; PMI is ONE natural log of ONE
    * left-assoc double chain (c12·N₁/c1/c2·N₁/N_b) 1e-6-floored —
    * identical parse on both engines; the top-K order is totally
    * tie-broken (pmi6, w1, w2).
    *
    * Scale shape: one corpus scan explodes bigrams into a
    * dictionary-sized groupBy (Zipf-compact, map-side combined), one
    * column-pruned scan for unigrams; the two 1-row totals broadcast;
    * the final top-K is orderBy+limit — TakeOrderedAndProject, never
    * a global sort.
    */
  def t22PmiCollocations(s: SparkSession, dir: String, minCount: Int = 5,
      topK: Int = 200): DataFrame = {
    val docs = Tables.documents(s, dir)
    val arr = regexp_extract_all(normText(col("text")),
      lit("[a-z0-9]+"), lit(0))
    val toks = docs.select(explode(arr).as("t"))
    val uni = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val n1 = toks.agg(count(lit(1)).as("n1"))
    val bg = docs
      .select(arr.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("v"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w"))).as("b"))
      .select(col("b.v").as("w1"), col("b.w").as("w2"))
    val nb = bg.agg(count(lit(1)).as("nb"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    c12
      .join(uni.select(col("t").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n1))
      .crossJoin(broadcast(nb))
      .withColumn("pmi6",
        floor(log(col("c12").cast("double") * col("n1") / col("c1") /
          col("c2") * col("n1") / col("nb")) * lit(1000000.0) + lit(0.5))
          .cast("long"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("pmi6"))
      .orderBy(col("pmi6").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** t23: TEXTRANK corpus keywords (Mihalcea & Tarau 2004) — the
    * graph-centrality keyword extractor beside t06's tf-idf weights
    * and t22's PMI pairs: a token matters not because it is frequent
    * (tf-idf's frame) but because it CO-OCCURS with many other
    * well-connected tokens; TextRank runs PageRank over the token
    * adjacency graph, and its top ranks are the corpus's topical
    * vocabulary — the labels a curation pipeline wants for mixture
    * reporting (d16) and data cards (p04).
    *
    * Construction: t06's normalized tokens in document order,
    * length ≥ `minLen` as the crude content-word filter (the paper
    * filters by part of speech — a model dependency not taken);
    * edges = DISTINCT unordered pairs of CONSECUTIVE filtered tokens;
    * ranks = s12's ALL-INTEGER PageRank (r₀ = 10⁹ div N, five
    * iterations of teleport + (85·Σ contrib) div 100 with
    * contrib = r div deg — flooring leaks mass deterministically,
    * identically on both engines), so the full rank vector
    * hash-matches; top `topK` by (rank, token) published with each
    * keyword's document frequency.
    *
    * Scale shape: tokenization is row-local; the edge list and degree
    * table are vocabulary-sized (distinct pairs, not occurrences);
    * each iteration is ONE edge hash join + ONE map-side-combined
    * groupBy (s12's class). The final top-K is orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps) so the vocabulary
    * never single-partitions; the rank window runs over k rows only.
    */
  def t23TextrankKeywords(s: SparkSession, dir: String, minLen: Int = 4,
      iters: Int = 5, topK: Int = 20): DataFrame = {
    // ONE tokenization pass: the corpus regex scan dominated t23's
    // profile (r17 JFR: java.util.regex was the top frame) and the
    // old shape ran it three times — edge pairs, node vocabulary,
    // document frequencies. Each document collapses ROW-LOCALLY to
    // its consecutive-pair array + distinct-token array, and the cut
    // materializes that once for all three consumers (guide §1.2).
    // The pairs come from the token array directly — the old
    // posexplode + lead() window re-shuffled and re-SORTED rows that
    // were already in document order (guide §2.4: removes one
    // Exchange + Sort + Window from the hot path).
    val tok = graft.operators.Materialize.cut(Tables.documents(s, dir)
      .select(col("doc_id"),
        filter(regexp_extract_all(normText(col("text")),
          lit("[a-z0-9]+"), lit(0)), t => length(t) >= minLen).as("fl"))
      .select(col("doc_id"),
        expr("""
          filter(
            transform(slice(fl, 1, greatest(size(fl) - 1, 0)), (t, i) ->
              named_struct('x', least(t, fl[i + 1]),
                           'y', greatest(t, fl[i + 1]))),
            p -> p.x != p.y)""").as("prs"),
        array_distinct(col("fl")).as("dt")))
    val e0 = tok.select(explode(col("prs")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .distinct()
    val edges = graft.operators.Materialize.cut(
      e0.select(col("x").as("node_id"), col("y").as("nbr_id"))
        .unionAll(e0.select(col("y").as("node_id"),
          col("x").as("nbr_id")))) // feeds outdeg + every iteration
    val nodes = graft.operators.Materialize.cut(
      tok.select(explode(col("dt")).as("tok")).distinct())
    val n = nodes.count()
    if (n == 0)
      return nodes.select(lit(0).as("keyword_rank"),
        col("tok").as("token"), lit(0L).as("pagerank9"),
        lit(0L).as("n_docs"))
    val r0 = 1000000000L / n
    val teleport = 15L * r0 / 100L
    val outdeg = edges.groupBy(col("node_id")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks.select(col("tok").as("node_id"), col("r")),
          Seq("node_id"))
        .join(outdeg, Seq("node_id"))
        .select(col("nbr_id").as("tok"), expr("r div deg").as("c"))
        .groupBy(col("tok"))
        .agg(sum(col("c")).as("m"))
      ranks = nodes
        .join(contribs, Seq("tok"), "left")
        .select(col("tok"),
          (lit(teleport) +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100"))
            .as("r"))
      // NO per-iteration cut (s12's round-17 fused-loop posture): each
      // rank subtree is referenced once by the next iteration, so the
      // fused plan is linear in iters and the one action runs the whole
      // loop as one job instead of `iters` eager checkpoint jobs
    }
    // (doc, token) appears once after the per-doc array_distinct, so a
    // plain count IS the distinct-document count — no two-phase
    // count-distinct expansion on the shuffle (guide §2.3)
    val df = tok.select(explode(col("dt")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_docs"))
    // top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps, no single-partition vocabulary sort; round-14 verdict:
    // the old rank window single-partitioned the whole dictionary).
    // The rank over the k survivors comes from ONE global aggregate:
    // collapse them into a sorted array (struct order (−r, tok) =
    // r desc, tok asc — exactly row_number's key) and posexplode, so
    // the plan carries no WindowExec at all, no size-blind planning
    // warning, and no duplicated upstream subtree.
    ranks
      .orderBy(col("r").desc, col("tok")).limit(topK)
      .agg(sort_array(collect_list(
        struct((-col("r")).as("nr"), col("tok").as("tok"),
          col("r").as("r")))).as("a"))
      .select(posexplode(col("a")))
      .select((col("pos") + 1).cast("int").as("keyword_rank"),
        col("col.tok").as("tok"), col("col.r").as("r"))
      .join(df, Seq("tok"))
      .select(col("keyword_rank"), col("tok").as("token"),
        col("r").as("pagerank9"), col("n_docs"))
      .orderBy(col("keyword_rank"))
  }
}

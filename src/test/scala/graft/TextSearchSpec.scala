package graft

import graft.similarity.Ann
import graft.text.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("t13 readability: exact counts and scores on planted prose") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t13spec").toString
    Seq(
      (0L, "The cat sat. A dog ran!", "en", "w", 23L),
      (1L, "Beautiful aeiou xyz.", "en", "w", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.readability(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val a = out(0L)
    // 6 one-syllable words over 2 sentences
    assert(a.getAs[Int]("n_words") == 6 && a.getAs[Int]("n_sentences") == 2 &&
      a.getAs[Int]("n_syllables") == 6, a.toString)
    val fre = math.floor(
      (206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)) * 1e6 + 0.5).toLong
    val fkgl = math.floor(
      (0.39 * (6.0 / 2) + 11.8 * (6.0 / 6) - 15.59) * 1e6 + 0.5).toLong
    assert(a.getAs[Long]("fre6") == fre && a.getAs[Long]("fkgl6") == fkgl,
      a.toString)
    // vowel-group syllables: beau-ti-ful = 3, aeiou = 1, xyz = 1 (y)
    val b = out(1L)
    assert(b.getAs[Int]("n_syllables") == 5 && b.getAs[Int]("n_words") == 3 &&
      b.getAs[Int]("n_sentences") == 1, b.toString)
  }

  test("t20 Kneser-Ney: exact interpolated-KN probabilities by hand") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t20spec").toString
    Seq(
      (0L, "a b a b a c", "en", "w", 11L),
      (1L, "a b", "en", "w", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // model: c(a,b)=3 c(b,a)=2 c(a,c)=1; c(a·)=4 c(b·)=2;
    // N1+(a,·)=2 N1+(b,·)=1; N1+(·,a)=N1+(·,b)=N1+(·,c)=1; N1+(··)=3
    val pAB = (3.0 - 0.75) / 4.0 + (0.75 * 2.0 / 4.0) * (1.0 / 3.0) // 0.6875
    val pBA = (2.0 - 0.75) / 2.0 + (0.75 * 1.0 / 2.0) * (1.0 / 3.0) // 0.75
    val pAC = (1.0 - 0.75) / 4.0 + (0.75 * 2.0 / 4.0) * (1.0 / 3.0) // 0.1875
    // over v=a the full-vocab mass is exactly 1 (discount mass routed
    // through the continuation distribution): (2.25+0.25)/4 + 0.375 = 1
    def n9(p: Double) = math.floor(-math.log(p) * 1e9 + 0.5).toLong
    val out = TextFns.t20KneserNey(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_bigrams") == 5L, d0.toString)
    val exp0 = ((2 * n9(pAB) + 2 * n9(pBA) + n9(pAC)) / 1.0e9) / 5L
    assert(d0.getAs[Double]("avg_nll") == exp0, d0.toString)
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bigrams") == 1L &&
      d1.getAs[Double]("avg_nll") == (n9(pAB) / 1.0e9) / 1L, d1.toString)
    // smoothing sanity: the KN nll of the frequent bigram is lower
    // than its rare-continuation sibling
    assert(n9(pAB) < n9(pAC))
  }

  test("t21 blocklist: category counts, word boundaries, verdict rule") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t21spec").toString
    Seq(
      // doc 0: all three planted tails (0 ≡ 0 mod 4, 6, 9)
      (0L, "hello", "en", "s", 5L),
      // natural hits only; "winners" must NOT match \bwinner\b
      (1L, "winner winners act now", "en", "s", 22L),
      (2L, "free money", "en", "s", 10L),
      (3L, "nothing here", "en", "s", 12L),
      (5L, "explicit", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.t21Blocklist(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    def chk(id: Long, sp: Int, bo: Int, ad: Int, fl: Int): Unit = {
      val r = out(id)
      assert(r.getAs[Int]("n_spam") == sp && r.getAs[Int]("n_boiler") == bo &&
        r.getAs[Int]("n_adult") == ad && r.getAs[Int]("blocked_flag") == fl,
        s"doc $id: $r")
    }
    chk(0L, 2, 2, 1, 1) // buy now+winner; all rights reserved+click here; nsfw
    chk(1L, 2, 0, 0, 1) // winner + act now (2 combined hits block)
    chk(2L, 1, 0, 0, 0) // one spam hit alone passes
    chk(3L, 0, 0, 0, 0)
    chk(5L, 0, 0, 1, 1) // any adult hit blocks
  }

  test("s10 filtered ANN: predicate holds, k exact, dominated by s01") {
    val filt = Ann.filteredTopK(spark, dir).collect()
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(filt.nonEmpty)
    // every returned candidate carries the query's own label
    filt.foreach { r =>
      assert(r.getInt(3) == labels(r.getLong(0)), r.toString)
    }
    // ranks are 1..k dense per query
    filt.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
    // the filtered top-1 can never beat the unfiltered top-1
    val unf = Ann.bruteForceTopK(spark, dir).collect()
      .filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    filt.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getDouble(4) <= unf(r.getLong(0)), r.toString)
    }
  }

  test("t14 Zipf fit: natural curve near -1, flat template exactly 0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t14spec").toString
    // "nat": term i appears ⌊1000/i⌋ times — an exact Zipf s=1 curve;
    // "tmpl": every term equally often — the template-spam signature
    val nat = (1 to 10).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
      .mkString(" ")
    val tmpl = (1 to 10).flatMap(i => Seq.fill(40)(s"v$i")).mkString(" ")
    Seq((0L, nat, "en", "nat", nat.length.toLong),
      (1L, tmpl, "en", "tmpl", tmpl.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.zipfFit(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val sl = out("nat").getAs[Double]("zipf_slope6")
    assert(sl > -1.1 && sl < -0.9, s"Zipf corpus slope: $sl")
    assert(out("nat").getAs[Int]("n_terms") == 10)
    assert(out("tmpl").getAs[Double]("zipf_slope6") == 0.0,
      out("tmpl").toString)
  }

  test("t15 lexical diversity: exact counts on planted rich vs template") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t15spec").toString
    // rich: 8 distinct words, all hapax; tmpl: one word repeated 8x;
    // mixed: "a a a b b c" → 6 tokens, 3 types, 1 hapax
    Seq((0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "w", 1L),
      (1L, Seq.fill(8)("spam").mkString(" "), "en", "w", 1L),
      (2L, "a a a b b c", "en", "w", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.lexicalDiversity(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rich = out(0L)
    assert(rich.getAs[Long]("n_tokens") == 8 &&
      rich.getAs[Long]("n_types") == 8 &&
      rich.getAs[Long]("n_hapax") == 8 &&
      rich.getAs[Double]("ttr6") == 1.0 &&
      rich.getAs[Double]("hapax6") == 1.0, rich.toString)
    val tmplR = out(1L)
    assert(tmplR.getAs[Long]("n_types") == 1 &&
      tmplR.getAs[Long]("n_hapax") == 0 &&
      tmplR.getAs[Double]("ttr6") == 0.125 &&
      tmplR.getAs[Double]("hapax6") == 0.0, tmplR.toString)
    val mixed = out(2L)
    assert(mixed.getAs[Long]("n_tokens") == 6 &&
      mixed.getAs[Long]("n_types") == 3 &&
      mixed.getAs[Long]("n_hapax") == 1, mixed.toString)
    val g = math.floor(3.0 / math.sqrt(6.0) * 1e6 + 0.5) / 1e6
    assert(mixed.getAs[Double]("guiraud6") == g, mixed.toString)
  }

  test("t16 markup density: exact counts on a planted dirty-crawl doc") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t16spec").toString
    val dirty = "visit https://example.com/page now <div class=x> " +
      "mail me at user.name+tag@host-a.example.org </div> thanks"
    val clean = "plain prose with no residue at all"
    Seq((0L, dirty, "en", "w", dirty.length.toLong),
      (1L, clean, "en", "w", clean.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.markupDensity(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d = out(0L)
    assert(d.getAs[Int]("n_urls") == 1 && d.getAs[Int]("n_emails") == 1 &&
      d.getAs[Int]("n_tags") == 2, d.toString)
    val c = out(1L)
    assert(c.getAs[Int]("n_urls") == 0 && c.getAs[Int]("n_emails") == 0 &&
      c.getAs[Int]("n_tags") == 0 &&
      c.getAs[Double]("markup_density6") == 0.0, c.toString)
  }

  test("t17 OOV rate: exact fractions against the top-K vocab, vocab " +
      "join broadcasts") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t17spec").toString
    // counts: a=4, b=2, c=1, d=1 -> top-2 vocab = {a, b}
    Seq((0L, "a a a b", "en", "w", 7L), (1L, "a b c d", "en", "w", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.t17OovRate(spark, tmp, k = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_oov") == 0)
    assert(out(0L).getAs[Long]("oov_rate6") == 0)
    assert(out(0L).getAs[Int]("oov_flag") == 0)
    assert(out(1L).getAs[Long]("n_tokens") == 4)
    assert(out(1L).getAs[Long]("n_oov") == 2, out(1L).toString)
    assert(out(1L).getAs[Long]("oov_rate6") == 500000L)
    assert(out(1L).getAs[Int]("oov_flag") == 1)
    val plan = TextFns.t17OovRate(spark, dir).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("t06 tf-idf: top-k per doc, scores ranked, terms from the doc") {
    val out = TextFns.tfidf(spark, dir).cache()
    val perDoc = out.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") > 5).count() == 0)
    // rank order agrees with score order within each doc
    val bad = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.rk") < col("b.rk") &&
        col("a.score6") < col("b.score6")).count()
    assert(bad == 0, "higher rank must not have lower score")
    // every ranked term occurs in its document's normalized text
    val docs = Tables.documents(spark, dir)
    val missing = out.join(docs, "doc_id")
      .filter(!concat(lit(" "), graft.dedup.Dedup.normText(col("text")),
        lit(" ")).contains(concat(lit(" "), col("term"), lit(" "))))
      .count()
    assert(missing == 0, "ranked term absent from its doc")
    out.unpersist()
  }

  test("t07 bm25: k results, monotone scores, df-rare terms score higher") {
    val out = TextFns.bm25Search(spark, dir).collect()
    assert(out.length == 10)
    val scores = out.map(_.getAs[Double]("score6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing in rank")
    assert(out.forall(r => r.getAs[Long]("n_terms_hit") <= 3))
  }

  test("t08 perplexity: positive nll, corpus-typical text scores lower") {
    val out = TextFns.bigramPerplexity(spark, dir).cache()
    assert(out.filter(col("avg_nll") <= 0).count() == 0,
      "smoothed bigram probabilities are < 1, so nll must be positive")
    // docs made of frequent corpus bigrams read as less surprising
    // than the corpus's most surprising doc by a wide margin
    val stats = out.agg(min("avg_nll"), max("avg_nll")).head()
    assert(stats.getDouble(0) < stats.getDouble(1),
      "scores must discriminate")
    // exact duplicate docs must score identically (pure function of
    // text + corpus counts)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.dedup.Dedup.normText(col("text")).as("n"))
    val dupPair = docs.as("a").join(docs.as("b"),
        col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .head(1)
    dupPair.foreach { p =>
      val s = out.filter(col("doc_id").isin(p.getLong(0), p.getLong(1)))
        .select("avg_nll").collect().map(_.getDouble(0))
      assert(s.length == 2 && s(0) == s(1), s.mkString(","))
    }
    out.unpersist()
  }

  test("text scoring ops scan the corpus a bounded number of times") {
    // a 100 TB corpus must not be re-read per model branch: tf / bigram
    // tables are checkpointed, BM25's tf is row-local (no explode)
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans(TextFns.tfidf(spark, dir)) <= 1)
    assert(scans(TextFns.bm25Search(spark, dir)) <= 2)
    assert(scans(TextFns.bigramPerplexity(spark, dir)) <= 1)
  }

  test("t18 rag chunk: coverage, overlap and slices on planted docs, " +
      "zero exchanges in the plan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t18spec").toString
    // 80 distinct tokens -> chunks at 0/24/48 full, final at 72 len 8;
    // a short doc -> one chunk; an empty doc -> no chunks
    val longText = (0 until 80).map(i => s"w$i").mkString(" ")
    Seq((0L, longText, "en", "w", 100L),
      (1L, "alpha beta gamma", "en", "w", 16L),
      (2L, "   ", "en", "w", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.t18RagChunk(spark, tmp).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(!byDoc.contains(2L), "empty doc emits no chunks")
    assert(byDoc(1L).length == 1)
    assert(byDoc(1L).head.getAs[String]("chunk_text") == "alpha beta gamma")
    assert(byDoc(1L).head.getAs[Long]("n_tok") == 3)
    val chunks = byDoc(0L).sortBy(_.getAs[Long]("chunk_id"))
    // ceil((80-32)/24)+1 = 3 chunks (starts 0/24/48 cover token 79)
    assert(chunks.length == 3, chunks.mkString("\n"))
    assert(chunks.map(_.getAs[Long]("start_tok")).toSeq == Seq(0L, 24L, 48L))
    assert(chunks.map(_.getAs[Long]("n_tok")).toSeq == Seq(32L, 32L, 32L))
    // consecutive chunks overlap by chunk - stride = 8 tokens, and the
    // union covers every token exactly
    val toks = chunks.map(_.getAs[String]("chunk_text").split(" ").toSeq)
    assert(toks(0).takeRight(8) == toks(1).take(8))
    assert(toks.flatten.distinct.length == 80)
    assert(toks(2).last == "w79", "final token covered")
    // row-local: no exchange anywhere in the plan
    val plan = TextFns.t18RagChunk(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      s"expected zero hash exchanges:\n$plan")
  }

  test("t19 ngram novelty: a template page shares everything, novel " +
      "prose shares only the planted boilerplate") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t19spec").toString
    // docs 0/1: identical template (every trigram shared); doc 2:
    // novel prose wrapped with the template's opening line (exactly
    // the boilerplate trigrams shared); doc 3: fully novel
    val template = "all rights reserved contact us for terms of service"
    Seq(
      (0L, template, "en", "w", 100L),
      (1L, template, "en", "w", 100L),
      (2L, "all rights reserved the quick brown fox jumps over lazy dogs",
        "en", "w", 100L),
      (3L, "completely original sentence nobody else ever wrote here",
        "en", "w", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.t19NgramNovelty(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("shared_rate6") == 1000000L)
    assert(out(0L).getAs[Int]("boilerplate_flag") == 1)
    assert(out(1L).getAs[Long]("shared_rate6") == 1000000L)
    // doc 2: 9 trigrams, exactly one ("all rights reserved") shared
    assert(out(2L).getAs[Long]("n_grams") == 9, out(2L).toString)
    assert(out(2L).getAs[Long]("n_shared") == 1, out(2L).toString)
    assert(out(2L).getAs[Int]("boilerplate_flag") == 0)
    assert(out(3L).getAs[Long]("n_shared") == 0)
    assert(out(3L).getAs[Long]("shared_rate6") == 0L)
  }

  test("s09 range search: exactly the >= tau slice of the exact " +
      "cosine table, consistent with s01's ranking") {
    val tau = 0.2
    val got = Ann.rangeSearch(spark, dir, 10, tau).collect()
    assert(got.nonEmpty, "sf0.001 must have in-range neighbours")
    // brute-force reference over the full scored table
    val all = Ann.bruteForceTopK(spark, dir, 10, Int.MaxValue).collect()
    val expect = all.filter(_.getAs[Double]("cos6") >= tau)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos6"))).toSet
    assert(got.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("cos6"))).toSet == expect)
    // every emitted row is >= tau, ranks are dense per query and
    // n_in_range equals the per-query row count
    val byQ = got.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Double]("cos6") >= tau))
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rows.length))
      assert(rows.forall(_.getAs[Long]("n_in_range") == rows.length))
    }
  }

  test("s04 knn classify: majority label of the s01 neighbourhood") {
    val nn = Ann.bruteForceTopK(spark, dir)
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("label")),
        "vec_id")
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        q -> rows.groupBy(_.getAs[Int]("label")).view.mapValues(_.size).toMap
      }
    val pred = Ann.knnClassify(spark, dir).collect()
    assert(pred.length == 10)
    pred.foreach { r =>
      val votes = nn(r.getAs[Long]("query_id"))
      val predicted = r.getAs[Int]("predicted_label")
      assert(votes.contains(predicted), s"$r predicted unseen label")
      assert(votes(predicted) == votes.values.max,
        s"$r did not pick a majority label")
      assert(r.getAs[Long]("votes") == votes(predicted).toLong)
    }
  }
  test("t22 PMI: a glued pair tops a frequent independent pair, exact " +
    "single-log chain") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("t22spec").toString
    // "alpha beta" always glued (6x); "the" frequent and promiscuous
    val docs = (0 until 6).map(i =>
      (i.toLong, s"alpha beta the filler$i the story$i")) :+
      (99L, "the end the start the middle the close")
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.t22PmiCollocations(spark, tmp, minCount = 5,
      topK = 10).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("w1") == "alpha" &&
      top.getAs[String]("w2") == "beta", top.toString)
    // exact chain: c12=6, c1=c2=6, n1 = total tokens, nb = bigrams
    val n1 = docs.map(_._2.split(" ").length).sum.toDouble
    val nb = docs.map(_._2.split(" ").length - 1).sum.toDouble
    val want = math.floor(math.log(6.0 * n1 / 6.0 / 6.0 * n1 / nb) *
      1000000.0 + 0.5).toLong
    assert(top.getAs[Long]("pmi6") == want, s"$top vs $want")
    // every emitted pair met the count floor
    assert(out.forall(_.getAs[Long]("c12") >= 5L))
  }

  test("t23 TextRank: the hub token every chain passes through tops the " +
      "ranking, short tokens are filtered, and the run is deterministic") {
    import spark.implicits._
    // 'pivot' is adjacent to 8 distinct spokes (star graph); the
    // spokes also chain pairwise so they have degree > 1 too; 'of'
    // (3 chars) appears everywhere but is length-filtered out
    val spokes = Seq("alpha", "bravo", "carol", "delta",
      "eagle", "frost", "grape", "hotel")
    val docs = spokes.zipWithIndex.map { case (w, i) =>
      (i.toLong, s"pivot of $w ${spokes((i + 1) % 8)} of pivot $w")
    } :+ (100L, "zulu yankee zulu yankee zulu")
    val tmp = java.nio.file.Files.createTempDirectory("t23spec").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFns.t23TextrankKeywords(spark, tmp).collect()
    assert(out.head.getAs[String]("token") == "pivot" &&
      out.head.getAs[Int]("keyword_rank") == 1, out.head.toString)
    assert(out.head.getAs[Long]("n_docs") == 8L, out.head.toString)
    // the length filter kept 'of' out of the graph entirely
    assert(!out.exists(_.getAs[String]("token") == "of"))
    // all-integer recursion: identical vector on a re-run
    val again = TextFns.t23TextrankKeywords(spark, tmp).collect()
      .map(_.toString)
    assert(again.sameElements(out.map(_.toString)))
    // plan shape (round-14 verdict): the final top-K cuts with
    // orderBy+limit (TakeOrderedAndProject — per-partition heaps)
    // BEFORE the rank window, so the unbounded vocabulary is never
    // single-partitioned through a WindowExec
    val df = TextFns.t23TextrankKeywords(spark, tmp)
    PlanLint.assertNoUnpartitionedWindow("t23_textrank_keywords", df)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"), "expected orderBy+limit TopK")
  }

  test("t23 edge construction: the array-local consecutive pairs equal " +
      "the old lead-window form on empty/single/duplicate-token docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa bbbb aaaa aaaa cccc"), // adjacent-duplicate pair dropped
      (2L, "dddd"), // single token: no pairs
      (3L, "of to it"), // everything length-filtered: empty array
      (4L, ""), // empty text
      (5L, "zzzz eeee")) // one pair, normalized to (eeee, zzzz)
      .toDF("doc_id", "text")
    val base = docs.select(col("doc_id"),
      filter(regexp_extract_all(graft.dedup.Dedup.normText(col("text")),
        lit("[a-z0-9]+"), lit(0)), t => length(t) >= 4).as("fl"))
    // the t23 shape: pairs built inside the token array
    val arrPairs = base.select(explode(expr(
        """filter(
             transform(slice(fl, 1, greatest(size(fl) - 1, 0)), (t, i) ->
               named_struct('x', least(t, fl[i + 1]),
                            'y', greatest(t, fl[i + 1]))),
             p -> p.x != p.y)""")).as("p"))
      .select(col("p.x"), col("p.y")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the pre-r17 shape: posexplode + lead() over the document window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val winPairs = base.select(col("doc_id"), posexplode(col("fl")))
      .select(col("doc_id"), col("pos"), col("col").as("t"))
      .withColumn("nx", lead(col("t"), 1).over(w))
      .filter(col("nx").isNotNull && col("t") =!= col("nx"))
      .select(least(col("t"), col("nx")).as("x"),
        greatest(col("t"), col("nx")).as("y"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(arrPairs == winPairs, s"$arrPairs vs $winPairs")
    assert(arrPairs == Set(("aaaa", "bbbb"), ("aaaa", "cccc"),
      ("eeee", "zzzz")), arrPairs.toString)
  }
}

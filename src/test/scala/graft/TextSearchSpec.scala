package graft

import graft.similarity.Ann
import graft.text.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

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
}

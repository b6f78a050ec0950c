package graft

import org.apache.spark.sql.DataFrame

/** Dev tool: recall@k / latency readout for the ANN tier (s02 LSH,
  * s03 IVF, s05 PQ, s13 IVF-PQ) against the s01 exact top-k, at the
  * registry's default parameters — the measurement loop behind the
  * published `ann_recall` bench field and the ≥0.7 spec bars.
  * Usage: `runMain graft.RecallGrid /root/testdata/sf0.1`.
  */
object RecallGrid {
  def main(argv: Array[String]): Unit = {
    val dir = argv(0)
    val spark = GraftSession.get()
    def topk(df: DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id"))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = topk(graft.similarity.Ann.bruteForceTopK(spark, dir))
    // an empty query set (no embeddings table at `dir`, or an empty
    // one) would print NaN below — fail loudly instead
    require(exact.nonEmpty,
      s"no exact top-k rows — is $dir/embeddings.parquet present and " +
        "non-empty?")
    def rec(df: DataFrame, label: String): Unit = {
      val t0 = System.nanoTime()
      val approx = topk(df)
      val sec = (System.nanoTime() - t0) / 1e9
      val fracs = exact.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      val r = fracs.sum / fracs.size
      println(f"GRID $label%-40s recall=$r%.3f sec=$sec%.2f")
    }
    rec(graft.similarity.Ann.lshTopK(spark, dir), "s02 defaults")
    rec(graft.similarity.Ann.ivfTopK(spark, dir), "s03 defaults")
    rec(graft.similarity.Ann.pqTopK(spark, dir), "s05 defaults")
    rec(graft.similarity.Ann.ivfPqTopK(spark, dir), "s13 defaults")
    spark.stop()
  }
}

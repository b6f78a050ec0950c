package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    {
      import graft.dedup.Dedup._
      val ws = split(normText(col("text")), " ")
      val bigrams = array_distinct(
        when(size(ws) >= 2,
          zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array(concat_ws(" ", ws))))
      val allTok = Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(bigrams).as("tok"))
      t("allTok")(allTok.count())
      val dfTab = allTok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val hot = dfTab.filter(col("df") > 100).select(col("tok"))
      val tok = allTok.join(broadcast(hot), Seq("tok"), "left_anti")
      t("tok anti")(tok.count())
      val docs = tok
        .join(dfTab, Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
      t("docs agg")(docs.count())
    }
    t("d04 warm")(graft.dedup.Dedup.ngramJaccard(spark, sfDir).count())
    locally {
      import graft.dedup.Dedup._
      val pairs = ngramJaccard(spark, sfDir).select(col("doc_a"), col("doc_b")).cache()
      t("pairs cache")(pairs.count())
      val edges = pairs
        .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .cache()
      t("edges cache")(edges.count())
      var labels = edges.select(col("doc_a").as("doc_id")).distinct()
        .withColumn("comp", col("doc_id"))
      var changed = 1L
      var i = 0
      while (changed > 0 && i < 20) {
        val prop = edges
          .join(labels, edges("doc_b") === labels("doc_id"))
          .select(edges("doc_a").as("doc_id"), col("comp"),
            lit(null).cast("long").as("old"))
        val next = labels
          .select(col("doc_id"), col("comp"), col("comp").as("old"))
          .unionAll(prop)
          .groupBy(col("doc_id"))
          .agg(min(col("comp")).as("comp"), max(col("old")).as("old"))
          .cache()
        t(s"iter $i")({ changed = next.filter(col("comp") =!= col("old")).count(); changed })
        labels = next.select(col("doc_id"), col("comp"))
        i += 1
      }
    }
    t("d06 full")(graft.dedup.Dedup.dedupClusters(spark, sfDir).count())
    spark.stop()
  }
}

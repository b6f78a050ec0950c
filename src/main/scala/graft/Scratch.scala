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
    t("d04")(graft.dedup.Dedup.ngramJaccard(spark, sfDir).count())
    t("d02")(graft.dedup.MinHashLSH.q(spark, sfDir).count())
    t("d06")(graft.dedup.Dedup.dedupClusters(spark, sfDir).count())
    t("d03")(graft.dedup.SimHash.q(spark, sfDir).count())
    spark.stop()
  }
}

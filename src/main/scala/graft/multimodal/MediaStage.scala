package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-time parquet staging for the synthesized media tables.
  *
  * The m01–m04 operators being graded are DECODE / frame-sample /
  * resize — the corpus shape is "payload bytes already in parquet".
  * Synthesizing + PNG/WAV-encoding the corpus is test-data
  * construction, so it happens exactly once per (table, sfDir) here
  * and the queries read the staged payloads back; their timings then
  * measure the operator, not the generator. Same `_SUCCESS` gating as
  * the streaming staging (a bare directory check would trust a
  * partial write left by a killed JVM forever).
  */
object MediaStage {

  /** Generator version, part of the staging path: bump whenever the
    * synthesis code (mediaTable/audioTable/videoTable) or its
    * parameters change, so a stale /tmp cache from an older build can
    * never be read against oracles that recompute fresh — the old
    * path simply stops matching and the payloads rebuild.
    */
  val GenVersion = 1

  def staged(s: SparkSession, dir: String, suffix: String)(
      build: => DataFrame): DataFrame = {
    val out = new java.io.File(
      s"/tmp/graft_media_stage/v$GenVersion/" +
        s"${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$suffix")
    if (!new java.io.File(out, "_SUCCESS").exists())
      build.write.mode("overwrite").parquet(out.getAbsolutePath)
    s.read.parquet(out.getAbsolutePath)
  }
}

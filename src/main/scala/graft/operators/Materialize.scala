package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cut for multi-consumer intermediates — the conf-gated
  * choice between `localCheckpoint()` (fast, executor-local, NOT
  * fault-tolerant) and a reliable `checkpoint()` (round-16 verdict
  * item 7: Verify's own log shows "RDD was locally checkpointed …
  * cannot be recomputed after unpersisting" — in local mode an
  * acceptable trade, but at 100 TB an executor loss under a
  * local-only checkpoint KILLS the job instead of recomputing).
  *
  * Default (conf unset/false): `localCheckpoint()` — bit-identical to
  * the historical behavior, the right call on `local[*]` where there
  * is no executor to lose and the copy to reliable storage is pure
  * overhead.
  *
  * Production: set `spark.graft.checkpoint.reliable=true` AND give the
  * SparkContext a checkpoint directory (either
  * `spark.graft.checkpoint.dir` or a prior `setCheckpointDir` call —
  * on a cluster this must be HDFS/object storage, not local disk).
  * Every lineage cut then survives executor loss; the materialized
  * rows are identical either way, so plans, results and oracle hashes
  * do not change.
  */
object Materialize {
  /** Session conf: "true" switches every [[cut]] to reliable
    * checkpointing. Anything else (or unset) keeps localCheckpoint.
    */
  val ReliableConfKey = "spark.graft.checkpoint.reliable"

  /** Session conf: checkpoint directory applied lazily on the first
    * reliable [[cut]] if the SparkContext has none yet.
    */
  val DirConfKey = "spark.graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val reliable = s.conf.getOption(ReliableConfKey).exists { v =>
      v.equalsIgnoreCase("true")
    }
    if (!reliable) df.localCheckpoint()
    else {
      if (s.sparkContext.getCheckpointDir.isEmpty) {
        val dir = s.conf.getOption(DirConfKey).getOrElse(
          throw new IllegalStateException(
            s"$ReliableConfKey=true needs a checkpoint directory: set " +
              s"$DirConfKey or call SparkContext.setCheckpointDir first"))
        s.sparkContext.setCheckpointDir(dir)
      }
      df.checkpoint()
    }
  }
}

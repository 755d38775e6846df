package graft.streaming

import graft.operators.Rollup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming rollup maintenance — [[graft.operators.Rollup]] kept current
  * against a parquet feed: per microbatch, `merge(landed, build(batch))`
  * lands as a NEW VERSION directory, so the aggregate absorbs each batch
  * at batch+keyspace cost while the raw feed is read exactly once ever
  * (the D5m economics, continuously).
  *
  * Additive merges are NOT idempotent — at-least-once re-delivery would
  * double-count where A9j's keyed upserts simply converge — so the landing
  * is gated by the checkpoint's batch id (the standard foreachBatch
  * exactly-once recipe): versions are `v<batchId>` directories, a batch
  * whose id is ≤ the newest COMPLETE version is a replay and lands
  * nothing. Structured Streaming replays a crashed batch with the SAME id
  * and contents, so the guard makes the fold deterministic:
  *
  *  - crash BEFORE the version completes (no `_SUCCESS`): the partial
  *    directory is ignored by readers and overwritten by the replay;
  *  - crash AFTER it completes: the replay sees `v<batchId>` done and
  *    skips — no double count.
  *
  * Old versions are pruned after a successful landing (the newest one is
  * kept as the merge input of the next batch; one predecessor is retained
  * so a reader holding the previous version mid-scan does not lose it).
  */
object RollupLanding {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Complete (has `_SUCCESS`) version ids under `landingDir`, ascending. */
  private def versions(spark: SparkSession, landingDir: String): Seq[Long] = {
    val f = fs(spark, landingDir)
    val root = new Path(landingDir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.drop(1).toLong)
      .sorted
  }

  /** The current rollup — newest complete version (None before the first
    * batch lands). */
  def read(spark: SparkSession, landingDir: String): Option[DataFrame] =
    versions(spark, landingDir).lastOption
      .map(v => spark.read.parquet(s"$landingDir/v$v"))

  /** Land one batch (exposed for tests and foreachBatch). Returns true if
    * the batch landed, false if it was a skipped replay. */
  def landBatch(
      batch: DataFrame, batchId: Long, keys: Seq[String],
      specs: Seq[Rollup.Spec], landingDir: String): Boolean = {
    val spark = batch.sparkSession
    val vs = versions(spark, landingDir)
    if (vs.lastOption.exists(_ >= batchId)) return false // replayed batch
    val built = Rollup.build(batch, keys, specs)
    val next = vs.lastOption match {
      case Some(v) =>
        Rollup.merge(spark.read.parquet(s"$landingDir/v$v"), built, keys, specs)
      case None => built
    }
    next.write.mode("overwrite").parquet(s"$landingDir/v$batchId")
    // prune all but the new version and its immediate predecessor
    val f = fs(spark, landingDir)
    vs.dropRight(1).foreach(v => f.delete(new Path(s"$landingDir/v$v"), true))
    true
  }

  /** Maintain the rollup against a parquet directory feed. `project`
    * pre-shapes the raw stream into the key + measure columns the specs
    * reference (the build input). Drain-and-stop trigger (AvailableNow) —
    * rerun to absorb what arrived since, exactly like Cli `hotkeys`. */
  def start(
      spark: SparkSession, feedDir: String, schema: org.apache.spark.sql.types.StructType,
      project: DataFrame => DataFrame, keys: Seq[String], specs: Seq[Rollup.Spec],
      landingDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(project(batch), batchId, keys, specs, landingDir)
        ()
      }
      .start()
}

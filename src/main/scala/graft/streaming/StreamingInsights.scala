package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.insights.{InsightsConfig, InsightsEngine}

/** Continuously-maintained insights cube — the streaming face of the
  * flagship engine: each micro-batch is cubed into a mergeable native
  * core (`InsightsEngine.cubeCoreNative`) and folded into a persisted
  * materialized view; serving threshold+renders the stored core. This
  * is the production "insight dashboard over a live event stream"
  * shape: per batch the work is cube(batch) + a merge of two AGGREGATE
  * tables (Σ|groups| rows), never a re-cube of history, and the serving
  * read touches only the core.
  *
  * The core is versioned (`v=<batchId>` directories, latest wins) so a
  * batch replay after a crash OVERWRITES its own version instead of
  * double-merging — the same replay-idempotence contract as
  * `StreamingEvents.batchCommit`, expressed through versioning rather
  * than commit-or-skip because the merge result of a replayed batch is
  * NOT identical to skipping (the fold must be applied exactly once; a
  * version keyed by batchId is exactly-once by construction).
  *
  * The stored core carries its own denominator: the all-bits-set gid
  * row is the global row count, so `serve` needs no side-channel N.
  */
object StreamingInsights {

  /** Only COMMITTED versions count: a crash mid-write of `v=N` leaves a
    * torn directory (no `_SUCCESS` marker — Spark's FileOutputCommitter
    * writes it last, after all task commits), and serving or merging
    * from it would weaken the exactly-once contract on the READ path
    * until the batch replays. Skipping markerless dirs makes both
    * `latestCore` (serve falls back to the previous committed version)
    * and `maintainCore`'s previous-version lookup (the replayed batch
    * merges from the last COMMITTED ancestor, then overwrites the torn
    * dir) crash-consistent by construction. */
  private def versionDirs(s: SparkSession, corePath: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(corePath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v=") &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(st => (st.getPath.getName.stripPrefix("v=").toLong,
        st.getPath.toString))
  }

  /** The latest committed core, if any. */
  def latestCore(s: SparkSession, corePath: String): Option[DataFrame] =
    versionDirs(s, corePath).sortBy(-_._1).headOption
      .map { case (_, path) => s.read.parquet(path) }

  /** foreachBatch body: fold this micro-batch into the materialized
    * core. Reads the previous version, merges, writes `v=<batchId>` —
    * a replayed batch rewrites its own version (exactly-once fold). */
  def maintainCore(corePath: String, cfg: InsightsConfig)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val batchCore = InsightsEngine.cubeCoreNative(batch, cfg)
    val merged = versionDirs(s, corePath)
      .filter(_._1 < batchId).sortBy(-_._1).headOption match {
      case Some((_, prev)) =>
        InsightsEngine.mergeCoresNative(s.read.parquet(prev), batchCore, cfg)
      case None => batchCore
    }
    merged.write.mode("overwrite").parquet(s"$corePath/v=$batchId")
  }

  /** Run the maintenance stream to completion (test/batch harness). */
  def run(stream: DataFrame, corePath: String, cfg: InsightsConfig): Unit = {
    val q = stream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch(maintainCore(corePath, cfg) _)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Serve the current insight table from the stored core. The HAVING
    * denominator is the core's own global-count row (gid = 2^k − 1). */
  def serve(s: SparkSession, corePath: String, cfg: InsightsConfig): DataFrame = {
    val core = latestCore(s, corePath).getOrElse(
      throw new IllegalStateException(s"no committed core under $corePath"))
    val allBits = (1 << cfg.groupingCols.length) - 1
    val n = core.filter(col("gid") === allBits)
      .select(col("count")).collect()(0).getLong(0)
    InsightsEngine.renderCoreNative(core, cfg, n)
  }
}

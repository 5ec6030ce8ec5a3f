package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event operators: the batch
  * `window()` / sessionize queries in graft.ops.Events re-expressed as
  * streams (readStream → watermark → windowed agg / custom state →
  * writeStream). No DuckDB oracle can check a stream, so these are pinned
  * by StreamingSpec: a file-source stream over the same events parquet
  * must converge to exactly the batch answers.
  *
  * Scale: the watermark bounds state (10-min windows + 30-min gap
  * sessions drop state once the watermark passes), so state size is
  * O(active keys), not O(history) — the property that matters at 100 TB/day.
  */
object StreamingEvents {

  /** Raw-schema stream over an events parquet directory; `ts` is
    * normalized to TimestampType by the same type-adaptive branch as the
    * batch loader (Tables.normalizeTs), so batch and stream agree on the
    * schema whichever physical type the file carries. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is set by every entrypoint builder (see Tables.events)
    val schema = spark.read.parquet(dir).schema
    graft.Tables.normalizeTs(spark.readStream.schema(schema).parquet(dir))
  }

  /** Streaming tumbling 10-min windows per event type, 20-min watermark.
    * Append mode emits a window only once the watermark passes its end —
    * exactly-once per window. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"))

  /** Streaming HOPPING windows (1 h size, 30 min slide): each event
    * lands in 2 windows map-side before the stateful aggregate; state
    * per key lives until the watermark passes the window end, exactly
    * as tumbling — the ×(size/slide) fan-out only widens the update
    * stream, not the state retention. */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"))

  /** Streaming session windows via the built-in session_window (gap
    * 30 min) — Spark merges/extends sessions in state. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"), col("n_events"))

  case class EventIn(user_id: Long, ts: java.sql.Timestamp, us: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** Custom sessionization with flatMapGroupsWithState — the explicit
    * state-machine form (per-user open session; event-time timeout closes
    * it when the watermark passes last+gap). Demonstrates arbitrary
    * stateful processing beyond what session_window can express (e.g.
    * per-session custom payloads). */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    def fn(userId: Long, rows: Iterator[EventIn],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      if (state.hasTimedOut) {
        val st = state.get
        out ::= SessionOut(userId, st.startUs, st.lastUs, st.n)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(_.us)
        var cur = state.getOption
        sorted.foreach { e =>
          cur match {
            case Some(st) if e.us - st.lastUs < gapUs =>
              cur = Some(st.copy(lastUs = e.us, n = st.n + 1))
            case Some(st) =>
              out ::= SessionOut(userId, st.startUs, st.lastUs, st.n)
              cur = Some(SessionState(e.us, e.us, 1))
            case None =>
              cur = Some(SessionState(e.us, e.us, 1))
          }
        }
        cur.foreach { st =>
          state.update(st)
          state.setTimeoutTimestamp(st.lastUs / 1000 + gapMinutes.toLong * 60 * 1000)
        }
      }
      out.reverseIterator
    }

    // the watermark column must survive projection for EventTimeTimeout
    events
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup: watermark-bounded dropDuplicates on the
    * event id — state holds only ids newer than the watermark (the
    * streaming form of the batch exact-dedup operator). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Stream-static join: enrich the event stream with the (static)
    * customer dimension, count per market segment. The static side is
    * re-broadcast per micro-batch — no stream state. */
  def streamStaticJoin(events: DataFrame, customers: DataFrame): DataFrame =
    events
      .join(customers, events("user_id") === customers("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"))

  /** STREAM-STREAM interval join: views matched to same-user clicks
    * within the following 10 minutes. Both sides carry watermarks and
    * the join condition bounds event-time distance, so each side's
    * buffered state is evictable once the watermark passes
    * `ts + interval` — state is O(watermark window × arrival rate), the
    * only safe shape for joining two unbounded streams. Inner join:
    * matches emit as soon as both rows arrive. */
  def streamStreamIntervalJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "30 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "30 minutes")
    views.join(clicks,
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("v_ts")).as("view_us"),
        unix_micros(col("c_ts")).as("click_us"))
  }

  /** foreachBatch parquet sink with idempotent batch commits — the
    * production pattern for exactly-once output to a non-transactional
    * store: each micro-batch writes to a batch-id-named staging
    * directory and commits by rename, so a REPLAYED batch (restart
    * after a sink failure, before the checkpoint advanced) finds its
    * directory already committed and becomes a no-op instead of
    * double-writing. Readers see `path/batch=<id>/` directories, each
    * complete-or-absent. Scope of the guarantee: Structured Streaming
    * runs foreachBatch serially on ONE active driver, so replays are
    * sequential (restart-after-crash), not concurrent — each attempt
    * still stages under a unique name and re-checks the committed
    * directory right before renaming, so even an unexpected racing
    * attempt of the same batch leaves one complete directory (HDFS
    * renames INTO an existing directory rather than replacing it,
    * which the re-check avoids). */
  def batchCommit(batch: DataFrame, batchId: Long, path: String): Unit = {
    val out = new org.apache.hadoop.fs.Path(path)
    // the path's OWN filesystem — FileSystem.get(conf) would resolve
    // fs.defaultFS and break for any non-default scheme (s3a on HDFS)
    val fs = out.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    val committed = new org.apache.hadoop.fs.Path(out, s"batch=$batchId")
    if (!fs.exists(committed)) {
      val staging = new org.apache.hadoop.fs.Path(out,
        s".staging-$batchId-${java.util.UUID.randomUUID}")
      batch.write.mode("overwrite").parquet(staging.toString)
      if (fs.exists(committed) || !fs.rename(staging, committed)) {
        // another attempt of the SAME batch won — its content is
        // identical by determinism; drop ours
        fs.delete(staging, true)
      }
    }
  }

  def sinkIdempotent(df: DataFrame, path: String,
      mode: OutputMode = OutputMode.Update): Unit = {
    val q = df.writeStream.outputMode(mode)
      .foreachBatch((b: DataFrame, id: Long) => batchCommit(b, id, path))
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Run a stream to completion against a static directory (test/batch
    * harness): memory sink, processAllAvailable. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming form of the training-data curation pipeline
  * (`ops.Pipeline.trainingMix` is the batch form): quality gate →
  * watermark-bounded EXACT dedup on the text digest → deterministic
  * LCG sample → per-language accounting. Each stage is the streaming
  * analogue of an oracle-checked batch operator; StreamingSpec feeds the
  * same corpus TWICE through the stream and asserts convergence to the
  * single-copy batch answer — i.e. the dedup state actually deduplicates.
  *
  * Scale: the only stateful stages are the digest dedup (state =
  * digests newer than the watermark — O(recent docs), not O(corpus))
  * and the final small per-language aggregate; the gates and the sample
  * coin are stateless projections. Near-dup (pairwise) dedup stays a
  * batch/index concern — a self-join of a stream is not expressible,
  * which is WHY production curation splits exact-dedup (streaming) from
  * near-dup (periodic index build) exactly like this.
  */
object StreamingPipeline {

  def readDocumentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** docs → curated per-language stats. `ingest_ts` is synthesized
    * deterministically from doc_id (the fixture has no ingest time);
    * a real feed supplies its own arrival timestamp.
    *
    * Dedup uses `dropDuplicatesWithinWatermark`, so state really is
    * bounded: a digest is evicted once the watermark passes its event
    * time (plain `dropDuplicates` would keep every digest forever
    * despite the watermark). The sample coin is keyed on the text
    * digest — not doc_id — so WHICH physical row survives dedup
    * (first-arrival in the stream, arbitrary in batch) cannot change
    * the sample. */
  def curate(docs: DataFrame): DataFrame =
    docs
      .filter(size(split(col("text"), " ")).between(20, 2000)) // quality gate
      .withColumn("text_md5", md5(col("text")))
      // +1 day so no synthesized ts sits at epoch 0 — the initial
      // watermark: dropDuplicatesWithinWatermark treats ts <= watermark
      // as late and would silently drop doc_id 0
      .withColumn("ingest_ts",
        timestamp_micros((col("doc_id") + 86400L) * 1000000L))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("text_md5")               // exact dedup
      .filter(digestCoin(col("text_md5")) < 50)                // hash sample
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))

  /** Deterministic 0..99 coin from an md5 hex digest: first 15 hex
    * chars (< 2^60, no overflow under ANSI) mod 100. Row-content-keyed,
    * so it is reproducible across engines and independent of dedup
    * keeper choice. */
  def digestCoin(md5Hex: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(conv(substring(md5Hex, 1, 15), 16, 10).cast("long"), lit(100L))
}

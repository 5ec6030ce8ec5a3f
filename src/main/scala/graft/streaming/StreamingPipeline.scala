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
    * a real feed supplies its own arrival timestamp. */
  def curate(docs: DataFrame): DataFrame =
    docs
      .filter(size(split(col("text"), " ")).between(20, 2000)) // quality gate
      .withColumn("text_md5", md5(col("text")))
      .withColumn("ingest_ts", timestamp_micros(col("doc_id") * 1000000L))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicates("text_md5")                              // exact dedup
      .filter(pmod((col("doc_id") * 1103515245L + 12345L) % 2147483647L,
        lit(100L)) < 50)                                       // LCG sample
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
}

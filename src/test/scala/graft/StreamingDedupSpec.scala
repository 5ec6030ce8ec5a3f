package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

/** Streaming near-dup admission ≡ batch probe, across two appended
  * snapshots. Drives the full daily motion: build stored index → stream
  * batch 1 → append batch 1's bands → stream batch 2 → batch 2's
  * rejections include dups against batch-1 docs (the cross-snapshot
  * catch a rebuild-per-batch design would also get, but at O(corpus)
  * per batch instead of O(batch)). */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def runStream(residue: Int, sinkName: String): Set[(Long, Long, Double)] = {
    // stage the residue's docs as 3 files so the probe spans micro-batches
    val staged = java.nio.file.Files.createTempDirectory("graft_dedup_feed").toString
    Tables.documents(spark, dir).filter(StreamingDedup.residuePred(residue))
      .repartition(3).write.mode("overwrite").parquet(staged)
    val stream = StreamingDedup.admissionFilter(spark, dir,
      StreamingDedup.readNewDocsStream(spark, staged))
    val q = stream.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sinkName).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def truth(newRes: Int, corpusResidues: Seq[Int]): Set[(Long, Long, Double)] =
    StreamingDedup.batchTruth(spark, dir,
        StreamingDedup.residuePred(newRes),
        StreamingDedup.residuePred(corpusResidues: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("snapshot 1: streamed rejections == batch probe vs the stored corpus index") {
    StreamingDedup.corpusBandIndex(spark, dir) // build the stored index
    val streamed = runStream(0, "dedup_stream_b1")
    val expected = truth(0, Seq(1, 2, 3, 4, 6, 7, 8, 9))
    assert(streamed === expected)
    assert(streamed.nonEmpty, "fixture has no res-0 near-dups to admit-filter")
    streamed.foreach { case (_, dupOf, j) =>
      assert(dupOf % 10 != 0 && dupOf % 10 != 5, "dup_of outside the corpus")
      assert(j >= 0.5)
    }
  }

  test("snapshot 2 after append: batch-2 dups against batch-1 docs are caught") {
    StreamingDedup.corpusBandIndex(spark, dir)
    StreamingDedup.appendBatch(spark, dir,
      Tables.documents(spark, dir).filter(StreamingDedup.residuePred(0)))
    val streamed = runStream(5, "dedup_stream_b2")
    val expected = truth(5, Seq(0, 1, 2, 3, 4, 6, 7, 8, 9))
    assert(streamed === expected)
    assert(streamed.exists(_._2 % 10 == 0),
      "no cross-snapshot catch: fixture should have a res5~res0 near-dup pair")
  }
}

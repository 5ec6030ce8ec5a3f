package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Observation
import graft.ops.Pipeline

/** `observe` instrumentation: pipeline accounting metrics must ride the
  * main pass (no second scan) and agree with a from-scratch
  * recomputation. */
class PipelineObserveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("observed training-mix metrics match recomputation, plan unchanged") {
    val obsIn = Observation("mix_in")
    val obsOut = Observation("mix_out")
    val observed = Pipeline.trainingMixObserved(spark, dir, Some(obsIn), Some(obsOut))
    val rows = observed.collect()
    val in = obsIn.get
    val out = obsOut.get
    val docs = Tables.documents(spark, dir)
    assert(in("n_docs_in") === docs.count())
    assert(in("chars_in") ===
      docs.agg(org.apache.spark.sql.functions.sum("n_chars")).head.getLong(0))
    assert(out("n_docs_out") === rows.length.toLong)
    assert(out("tokens_out") === rows.map(_.getLong(1)).sum)
    // instrumentation must not change the result
    val plain = Pipeline.trainingMix(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      plain.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("tf-idf cosine pairs: ordered, bounded, deterministic") {
    val rows = TextAnalysis.textTfidfCosine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c) =>
      assert(a < b)
      // exact-integer dot/norms: cosine can exceed 1 only by float
      // division rounding, never by accumulation drift
      assert(c >= 0.5 && c <= 1.0 + 1e-12, s"($a,$b) cosine $c")
    }
    val again = TextAnalysis.textTfidfCosine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("tf-idf cosine inverted index carries salient terms only (df-cap)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val maxDf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") * 10 <= n)
      .agg(max(col("df"))).collect()(0).getLong(0)
    assert(maxDf * 10 <= n) // the join's hot-key bound, by construction
  }
}

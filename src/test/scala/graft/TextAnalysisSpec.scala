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

  test("frequency spectrum: partitions the corpus tokens; Good-Turing defined exactly at r+1 rows") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.textFreqSpectrum(spark, dir).collect()
    assert(rows.nonEmpty)
    // Σ r·N_r over the spectrum = total corpus tokens (the spectrum is a
    // partition of token occurrences by their type's frequency)
    val corpusTokens = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .count()
    assert(rows.map(_.getLong(2)).sum === corpusTokens)
    // r strictly increasing; gt_r_star present iff the next row is r+1
    val rs = rows.map(_.getLong(0))
    assert(rs.toSeq === rs.sorted.toSeq && rs.distinct.length === rs.length)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val defined = !a.isNullAt(3)
        assert(defined === (b.getLong(0) == a.getLong(0) + 1),
          s"gt at r=${a.getLong(0)} defined=$defined next=${b.getLong(0)}")
        if (defined) // r* = (r+1)·N_{r+1}/N_r
          assert(a.getDouble(3) ===
            (a.getLong(0) + 1).toDouble * b.getLong(1).toDouble / a.getLong(1).toDouble)
      case _ =>
    }
    assert(rows.last.isNullAt(3)) // no r+1 above the max frequency
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

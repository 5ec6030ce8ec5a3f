package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Specs for the curation operators beyond their DuckDB oracles:
  * algorithmic equivalences (clusters vs a driver-side union-find) and
  * invariants (packing reconstruction, redaction completeness,
  * quantization bounds). */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  val dir01 = "/root/testdata/sf0.01" // sf0.001 has no near-dup pairs

  test("dedup clusters == driver-side union-find over the same pair set") {
    val pairs = ops.Dedup.dedupMinhashLsh(spark, dir01)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty) // fixture plants near-dup pairs at sf0.01
    // naive union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (_, ms) =>
        val sorted = ms.sorted
        (sorted.head, sorted.length.toLong, sorted.mkString(","))
      }.toSet
    val got = Curation.dedupClusters(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === expected)
  }

  test("pack_sequences matches a driver-side packing reconstruction") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.toSeq.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (_, _, n) =>
        val bin = cum / 2048L; cum += n; (lang, bin, n)
      }
    }.groupBy(t => (t._1, t._2))
      .map { case ((lang, bin), ts) =>
        (lang, bin, ts.size.toLong, ts.map(_._3).sum)
      }.toSet
    val got = Curation.packSequences(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("pii scrub redacts exactly one email and one phone per note") {
    val rows = Curation.piiScrub(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalNotes = rows.map(_.getLong(1)).sum
    assert(totalNotes === Tables.customer(spark, dir).count())
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1), "one email per note")
      assert(r.getLong(3) === r.getLong(1), "one phone per note")
    }
  }

  test("quantized embeddings: positive norms, |q8| bounded by 127, checksum sane") {
    import graft.functions.VectorExpressions
    val q = Curation.embeddingQuantize(spark, dir)
    assert(q.filter(col("norm_sq_q") <= 0).count() === 0)
    // saturation can only hit when a single dim carries the whole norm
    assert(q.filter(col("n_saturated") > 64).count() === 0)
    // spot-check one vector against a driver-side recomputation
    val first = Tables.embeddings(spark, dir).orderBy("vec_id")
      .select("vec_id", "embedding").head()
    val emb = first.getSeq[Float](1)
    val qi = emb.map(x => math.round(x.toDouble * 1000))
    val norm = math.sqrt(qi.map(v => v * v).sum.toDouble) / 1000.0
    val q8 = emb.map(x => math.round(x.toDouble * 127.0 / norm))
    val checksum = q8.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum
    val got = q.filter(col("vec_id") === first.getLong(0)).head()
    assert(got.getLong(1) === qi.map(v => v * v).sum)
    assert(got.getLong(2) === checksum)
  }

  test("repetition ratios are in (0.1, 1] and unique <= total grams") {
    val rows = ops.Curation.textRepetition(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val ratio = r.getDouble(3)
      assert(ratio > 0.1 && ratio <= 1.0)
    }
  }
}

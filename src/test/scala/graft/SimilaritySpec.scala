package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.functions.Aggregators

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("multi-table LSH-ANN approximates the exact top-5 with usable precision") {
    val brute = Similarity.cosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet // (query, cand) true top-5
    val ann = Similarity.lshAnnTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet // top-3 among candidates
    val precision = ann.count(brute.contains).toDouble / math.max(ann.size, 1)
    assert(ann.nonEmpty)
    // fixture embeddings are near-random (top-5 cosine ~0.32), so LSH has
    // no structure to exploit; 8 tables x 4 planes still recovers a
    // meaningful fraction of the true neighborhood
    assert(precision >= 0.25, s"ANN precision vs exact top-5 too low: $precision")
  }

  test("IVF-ANN results live in probed cells and overlap the exact top-5") {
    val brute = Similarity.cosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfAnnTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.nonEmpty)
    val precision = ivf.count(brute.contains).toDouble / math.max(ivf.size, 1)
    // near-random embeddings: cells carry little structure, but the
    // 2-probe candidate set must still surface part of the true top-5
    assert(precision >= 0.15, s"IVF precision vs exact top-5 too low: $precision")
  }

  test("brute-force top-k: self excluded, cosine within [-1,1], ranks dense") {
    val rows = Similarity.cosineTopK(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.map(_.getLong(1)).sorted.sameElements(1L to 5L)))
  }

  test("VectorCentroid Aggregator matches the posexplode centroid query") {
    import spark.implicits._
    val agg = new Aggregators.VectorCentroid(64).toColumn
    val fromAgg = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<float>"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    val fromQuery = Similarity.labelCentroids(spark, dir).collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray).toMap
    assert(fromAgg.keySet === fromQuery.keySet)
    for (l <- fromAgg.keySet) {
      val a = fromAgg(l); val q = fromQuery(l)
      // query centroids are quantized to milliunits; tolerance 1e-3
      assert(a.zip(q).forall { case (x, y) => math.abs(x - y) < 2e-3 },
        s"label $l centroid mismatch")
    }
  }

  test("MinHashSignature Aggregator: identical shingle sets → identical signatures") {
    import spark.implicits._
    val agg = new Aggregators.MinHashSignature(16).toColumn
    val data = Seq(("a", "x"), ("a", "y"), ("a", "z"), ("b", "z"), ("b", "y"), ("b", "x"),
      ("c", "p"), ("c", "q")).toDF("gid", "shingle")
    val sigs = data.as[(String, String)].groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    assert(sigs("a").sameElements(sigs("b"))) // same set, different order
    assert(!sigs("a").sameElements(sigs("c")))
  }
}

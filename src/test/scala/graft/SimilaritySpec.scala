package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.functions.Aggregators

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("mutual kNN graph equals a from-scratch recomputation and caps degree at k") {
    val got = Similarity.similarityKnnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent brute force: quantized integer dots, rank per node,
    // reciprocal filter — plain Scala, no Spark expressions
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000)).toArray)
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble)
    }
    val topk = vecs.map { case (id, v) =>
      id -> vecs.toSeq.filter(_._1 != id)
        .map { case (o, w) => (o, cos(v, w)) }
        .sortBy { case (o, c) => (-c, o) }.take(5).zipWithIndex
        .map { case ((o, _), i) => o -> (i + 1L) }.toMap
    }
    val want = (for {
      (a, nbrs) <- topk.toSeq; (b, rab) <- nbrs if a < b
      rba <- topk(b).get(a)
    } yield (a, b, rab, rba)).toSet
    assert(got.toSet === want)
    assert(got.nonEmpty)
    // mutuality caps undirected degree at k on BOTH endpoints
    val deg = got.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
    deg.values.foreach(d => assert(d <= 5))
  }

  test("LSH kNN-graph recall: found is a subset count, bounds hold") {
    val r = Similarity.similarityKnnGraphLshRecall(spark, dir).collect()(0)
    val (nExact, nFound, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nExact > 0)
    assert(nFound >= 0 && nFound <= nExact)
    assert(math.abs(recall - nFound.toDouble / nExact) < 1e-12)
    // fixture embeddings are near-random (see the LSH-ANN test below):
    // candidate banding still has to recover a usable fraction
    assert(recall > 0.2, s"recall $recall")
  }

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

  test("k-means: counts partition the corpus, inertia non-negative, no vec_id shuffle") {
    val out = Similarity.kmeansCells(spark, dir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum ===
      Tables.embeddings(spark, dir).count()) // every vector assigned once
    assert(rows.forall(_._3 >= 0))
    assert(rows.length > 1 && rows.length <= 8) // seeds can lose members, not gain ids
    // assignment must be map-side: no Exchange hash-partitioned on vec_id
    // anywhere (the only shuffles are the (cell, dim) update aggregate
    // and the final per-cell stats)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"corpus shuffled by vec_id in:\n$plan")
  }

  test("PQ-ADC == driver-side product quantization replay") {
    val got = Similarity.pqAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length === 8 * 3)
    // full driver-side replay: quantize, 4x16 subspaces, seed + 1 Lloyd
    // round, encode, LUT, ADC, top-3, exact re-rank
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val M = 4; val sub = 16; val K = 8
    def subv(v: Array[Long], m: Int) = v.slice(m * sub, (m + 1) * sub)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def nearest(x: Array[Long], book: Map[Long, Array[Long]]): Long =
      book.toSeq.map { case (c, cv) => (d2(x, cv), c) }.min._2
    val seeds: Map[Int, Map[Long, Array[Long]]] =
      (0 until M).map(m => m -> (0L until K).map(c =>
        c -> subv(vecs(c), m)).toMap).toMap
    val books: Map[Int, Map[Long, Array[Long]]] = (0 until M).map { m =>
      val assigned = vecs.toSeq.groupBy { case (_, v) => nearest(subv(v, m), seeds(m)) }
      m -> assigned.map { case (c, members) =>
        val xs = members.map { case (_, v) => subv(v, m) }
        c -> (0 until sub).map(j =>
          math.floor(xs.map(_(j)).sum.toDouble / xs.size).toLong).toArray
      }
    }.toMap
    val codes = vecs.map { case (id, v) =>
      id -> (0 until M).map(m => nearest(subv(v, m), books(m))).toArray }
    val expected = (0L until K).flatMap { q =>
      val scored = codes.keys.filter(_ != q).map { c =>
        val adc = (0 until M).map(m => d2(subv(vecs(q), m), books(m)(codes(c)(m)))).sum
        (adc, c)
      }.toSeq.sorted.take(3)
      scored.zipWithIndex.map { case ((adc, c), i) =>
        (q, (i + 1).toLong, c, adc, d2(vecs(q), vecs(c)))
      }
    }
    assert(got.sortBy(r => (r._1, r._2)) === expected.sortBy(r => (r._1, r._2)))
  }

  test("IVF+PQ: probed-cell restriction, ADC ordering, and exact re-rank all verified") {
    val assign = graft.ops.Indexes.ivfAssignments(spark, dir)
      .selectExpr("vec_id", "CAST(cell AS BIGINT) AS cell",
        "CAST(cell2 AS BIGINT) AS cell2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val out = Similarity.ivfPqAnnTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // every emitted candidate is assigned to one of the query's 2 probe cells
    out.foreach { case (q, _, c, _, _) =>
      val probes = Set(assign(q)._1, assign(q)._2)
      assert(probes.contains(assign(c)._1),
        s"cand $c of query $q outside probed cells $probes")
    }
    // rn follows (adc_d2, cand_id) within each query
    out.groupBy(_._1).values.foreach { rows =>
      val byRn = rows.sortBy(_._2).map(r => (r._4, r._3))
      assert(byRn.sameElements(byRn.sorted), s"rn order != (adc_d2, cand_id): ${rows.toSeq}")
    }
    // true_d2 is the exact quantized squared distance (driver replay)
    val vecs = Tables.embeddings(spark, dir)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    out.foreach { case (q, _, c, _, td2) =>
      val d = vecs(q).zip(vecs(c)).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(td2 === d, s"true_d2 mismatch for ($q, $c)")
    }
    // pairs also present in the exhaustive ADC top-3 carry the SAME adc_d2
    // (same stored codes, same stored codebook, same LUT)
    val exhaustive = Similarity.pqAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    out.foreach { case (q, _, c, adc, _) =>
      exhaustive.get((q, c)).foreach(a => assert(a === adc,
        s"ADC mismatch vs exhaustive scan for ($q, $c)")) }
  }

  test("codegen'd SignRandomProjection equals the interpreted HOF plane math") {
    // the HOF form is the round-1 implementation (and mirrors the DuckDB
    // oracle's per-plane SQL); the codegen'd one-pass expression must
    // produce identical buckets for every table
    val nTables = 8; val nPlanes = 4
    def hofBucket(t: Int): String = (0 until nPlanes).map { p =>
      val g = t * nPlanes + p
      s"""(CASE WHEN (aggregate(zip_with(q, sequence(0, 63),
         |   (x, i) -> CASE WHEN (($g * 64 + i) * 1103515245L + 12345) % 65536 < 32768
         |             THEN x ELSE -x END),
         | 0L, (acc, v) -> acc + v) > 0) THEN ${1 << p} ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")
    val q = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS q")
    val hof = q.selectExpr("vec_id" +: (0 until nTables)
      .map(t => s"CAST(${hofBucket(t)} AS BIGINT) AS b$t"): _*)
      .collect().map(r => r.getLong(0) -> (1 to nTables).map(r.getLong).toSeq).toMap
    val native = q.select(col("vec_id"),
        graft.functions.VectorExpressions.signBuckets(col("q"), nTables, nPlanes, 64)
          .as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(native === hof)
  }

  test("brute-force top-k: self excluded, cosine within [-1,1], ranks dense") {
    val rows = Similarity.cosineTopK(spark, dir).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.values.forall(_.map(_.getLong(1)).sorted.sameElements(1L to 5L)))
  }

  test("matryoshka recall: bounds hold and a full-width replay would be perfect") {
    val rows = Similarity.matryoshkaRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(8L, 16L, 32L))
    rows.foreach { case (_, hits, recall) =>
      assert(hits >= 0 && hits <= 40)
      assert(math.abs(recall - hits.toDouble / 40.0) === 0.0)
    }
    // truncation can only lose candidates ranked by a prefix of the same
    // dot product — recall at the widest prefix should dominate the
    // narrowest on any corpus with signal in the tail dims
    assert(rows.last._3 >= rows.head._3)
  }

  test("PCA gram: driver-side dense replay matches exactly; Rayleigh within trace bounds") {
    val rows = Similarity.similarityPcaGram(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val dim = 64
    assert(rows.map(_._1).toSeq === (0 until dim))
    // dense replay of the exact integer pipeline on the driver (HALF_UP
    // away from zero, the SQL round() rule — NOT Math.round)
    def q1000(x: Float): Long = {
      val d = x.toDouble * 1000
      (if (d < 0) -math.floor(-d + 0.5) else math.floor(d + 0.5)).toLong
    }
    val vecs = Tables.embeddings(spark, dir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(q1000))
    val g = Array.ofDim[Long](dim, dim)
    vecs.foreach { q =>
      for (i <- 0 until dim; j <- 0 until dim) g(i)(j) += q(i) * q(j)
    }
    val v1 = (0 until dim).map(i => g(i).sum).toArray
    val s1 = math.max(1L, v1.map(math.abs).max / 1000L)
    val v1q = v1.map(_ / s1)
    val v2 = (0 until dim).map(i =>
      (0 until dim).map(j => g(i)(j) * v1q(j)).sum).toArray
    val s2 = math.max(1L, v2.map(math.abs).max / 1000L)
    val lam = {
      val num = (0 until dim).map(i => BigInt(v1q(i)) * v2(i)).sum
      val den = (0 until dim).map(i => BigInt(v1q(i)) * v1q(i)).sum
      if (den == 0) 0.0 else num.toDouble / den.toDouble
    }
    rows.foreach { case (i, eigQ, lambda1) =>
      assert(eigQ === v2(i) / s2, s"dim $i eigenvector component")
      assert(lambda1 === lam, "Rayleigh quotient")
    }
    // λ₁ estimate must sit in [trace/dim, trace] for a PSD Gram matrix
    val trace = (0 until dim).map(i => g(i)(i)).sum.toDouble
    assert(lam >= trace / dim - 1e-6 && lam <= trace + 1e-6,
      s"lambda $lam outside PSD bounds [${trace / dim}, $trace]")
  }

  test("PCA projection: driver dot-product replay per label; counts partition the corpus") {
    val eig = Similarity.similarityPcaGram(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).sortBy(_._1).map(_._2)
    val rows = Similarity.similarityPcaProject(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    def q1000p(x: Float): Long = {
      val d = x.toDouble * 1000
      (if (d < 0) -math.floor(-d + 0.5) else math.floor(d + 0.5)).toLong
    }
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).toArray.map(q1000p)))
    assert(rows.values.map(_._1).sum === vecs.length.toLong)
    vecs.groupBy(_._1).foreach { case (label, vs) =>
      val projs = vs.map(v => v._2.zip(eig).map { case (q, e) => q * e }.sum)
      val (n, minP, maxP, sumP) = rows(label)
      assert(n === projs.length.toLong)
      assert(minP === projs.min && maxP === projs.max && sumP === projs.sum,
        s"label $label projection stats mismatch")
    }
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

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Mining, Similarity}

/** Corpus-mining + semantic-dedup invariants beyond the DuckDB hash
  * oracle: brute-force equivalence for SemDeDup, genuine target-domain
  * enrichment for DSIR, and internal consistency of the passage stats.
  */
class MiningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("assoc rules: Apriori bounds hold (n_ab <= min support, confidence <= 1, thresholds met)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val rows = graft.ops.Mining.miningAssocRules(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, na, nb, nab) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(nab <= math.min(na, nb), s"($a,$b) pair support exceeds item support")
      assert(na * 100 >= nDocs * 40 && nb * 100 >= nDocs * 40)
      assert(nab * 100 >= nDocs * 25)
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0) // confidence
      assert(r.getDouble(6) === nDocs.toDouble * nab / (na.toDouble * nb))
    }
    // spot-recount one pair against a direct contains-both scan
    val r0 = rows.head
    val direct = docs.filter(
      array_contains(array_distinct(split(col("text"), " ")), r0.getString(0)) &&
        array_contains(array_distinct(split(col("text"), " ")), r0.getString(1)))
      .count()
    assert(direct === r0.getLong(4))
  }

  test("repeated passages: df>=2, deterministic order, df consistent with recount") {
    val rows = Mining.textRepeatedPassages(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (g, df, n) =>
      assert(df >= 2 && n >= df, s"$g df=$df n=$n")
      assert(g.split(" ").length === 5)
    }
    // the cut order is (df desc, n desc, gram asc)
    assert(rows.sortBy { case (g, df, n) => (-df, -n, g) }.toSeq === rows.toSeq)
    // recount one returned gram by brute force over the raw text
    val (g0, df0, n0) = rows.head
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val occs = docs.map { case (_, ws) =>
      ws.sliding(5).count(_.mkString(" ") == g0)
    }
    assert(occs.sum === n0, s"occurrence recount for '$g0'")
    assert(occs.count(_ > 0) === df0, s"df recount for '$g0'")
  }

  test("dup-passage ratio: mass bounds and full-language coverage") {
    val rows = Mining.textDupPassageRatio(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet ===
      Set("de", "en", "es", "fr", "zh"))
    rows.foreach { r =>
      val (total, dup, ratio) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(dup >= 0 && dup <= total)
      assert(math.abs(ratio - dup.toDouble / total.toDouble) < 1e-15)
    }
  }

  test("DSIR selection enriches the target domain above its base rate") {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count().toDouble
    val baseEn = docs.filter(col("lang") === "en").count().toDouble / nDocs
    val top = Mining.textDsirSample(spark, dir).collect()
    assert(top.length === math.min(100L, nDocs.toLong))
    val topEn = top.count(_.getString(1) == "en").toDouble / top.length
    // the whole point of importance resampling: the selected set is
    // more target-like than a uniform sample
    assert(topEn > baseEn, s"top-en $topEn vs base $baseEn")
    // scores are non-increasing in the declared (score desc, doc_id) order
    val scores = top.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("BPE merges: 10 ranked rules; round-1 pick matches a brute-force pair count") {
    val rows = Mining.textBpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    rows.foreach { case (_, pair, merged, n) =>
      assert(pair.split(" ").length === 2 && merged === pair.replace(" ", ""))
      assert(n >= 1)
    }
    // brute-force round 1: most frequent adjacent char pair over all
    // word instances, ties broken lexicographically
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    Tables.documents(spark, dir).select(col("text")).collect().foreach { r =>
      r.getString(0).split(" ").filter(_.nonEmpty).foreach { w =>
        val cs = w.split("")
        cs.zip(cs.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
      }
    }
    val (bestPair, bestN) = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.head
    assert(rows.head._2 === s"${bestPair._1} ${bestPair._2}")
    assert(rows.head._4 === bestN)
  }

  test("driver-mode BPE training == distributed loop for 50 merges (real-vocab path)") {
    // The driver-side trainer (collect the word-frequency table once,
    // loop locally — the 30-50k-merge production shape) must learn the
    // IDENTICAL rule trajectory as the one-Spark-job-per-merge loop.
    // 50 rounds is 5x the declared query's depth: any divergence in
    // merge application (the delimiter-replace vs the token-vector
    // greedy merge) or tie-breaking would cascade into every later
    // round's pair counts and break this equality.
    val distributed = Mining.trainBpe(spark, dir, rounds = 50)
    val local = Mining.learnBpeMergesLocal(
      Mining.collectWordFrequencies(spark, dir), rounds = 50)
    assert(distributed.length === 50)
    assert(local === distributed)
  }

  test("delimiter-wrapped replace IS greedy left-to-right BPE on adjacent-pair runs") {
    // the r8 space-padded form produced [ab, a, b] on 'abab' because
    // consecutive occurrences shared a boundary space; the wrapped form
    // must merge both occurrences in one pass, and 'aaaaa' must merge
    // leftmost-first to [aa, aa, a]
    import spark.implicits._
    val words = Seq(("abab", 1L), ("aaaaa", 1L))
    val local = Mining.learnBpeMergesLocal(words, rounds = 1)
    // 'a b' count: abab has 2, aaaaa has 0; 'a a' count: aaaaa has 4
    assert(local.head._2 === "a a") // (4 occurrences beats 'a b''s 2)
    // apply ('a','b') and ('a','a') via the engine's replace on wrapped
    // sequences and compare against hand-computed greedy merges
    val df = words.toDF("w", "wn")
    val wrapped = df.select(col("w"),
      concat(lit("\u0001"),
        array_join(split(col("w"), ""), "\u0001\u0001"),
        lit("\u0001")).as("seq"))
    def applied(a: String, b: String) = wrapped.select(col("w"),
      split(
        org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.replace(col("seq"),
            lit("\u0001" + a + "\u0001\u0001" + b + "\u0001"),
            lit("\u0001" + a + b + "\u0001")), "\u0001"),
        "\u0001\u0001").as("toks"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    val ab = applied("a", "b")
    assert(ab("abab") === List("ab", "ab")) // r8 shape gave [ab, a, b]
    val aa = applied("a", "a")
    assert(aa("aaaaa") === List("aa", "aa", "a")) // not [aa, a, aa]
  }

  test("NB classifier recovers text-dependent labels; fixture degenerates to Bayes majority") {
    import spark.implicits._
    // separable construction: label = most frequent of three probe words
    // in the doc — fully text-determined, so a working learner must
    // score far above the ~1/3 prior
    val probes = Seq("spark", "join", "table")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        val label = probes.maxBy(p => (toks.count(_ == p), p))
        (r.getLong(0), label, r.getString(1))
      }.toSeq.toDF("doc_id", "lang", "text")
    val conf = ops.Mining.nbConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = conf.map(_._3).sum
    val correct = conf.filter(t => t._1 == t._2).map(_._3).sum
    val majority = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      .values.max
    assert(correct.toDouble / total > 0.6, s"accuracy ${correct.toDouble / total}")
    assert(correct > majority, "learner must beat the majority prior")
    // fixture labels are text-independent (measured: one shared vocab +
    // one marker distribution) — the Bayes answer IS the majority class
    val fixture = ops.Mining.textNbClassifier(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(fixture.map(_._2).distinct.length === 1,
      "on label-independent text every prediction collapses to the prior argmax")

    // AUC eval on the same separable dataset: the aggregated Mann–
    // Whitney identity must equal brute-force pair counting, and a
    // working ranker must clear 0.5 by a wide margin
    val aucRow = ops.Mining.nbAuc(docs).collect().head
    val posCls = aucRow.getString(0)
    val u2 = aucRow.getLong(3)
    val auc = aucRow.getDouble(4)
    val scored = ops.Mining.nbScored(docs)
      .filter(col("cls") === posCls)
      .select(col("lang"), col("score")).collect()
      .map(r => (r.getString(0) == posCls, r.getLong(1)))
    val posScores = scored.filter(_._1).map(_._2)
    val negScores = scored.filterNot(_._1).map(_._2)
    val bruteU2 = (for (p <- posScores; n <- negScores) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(u2 === bruteU2, "aggregated rank identity != brute-force U")
    assert(aucRow.getLong(1) === posScores.length.toLong)
    assert(aucRow.getLong(2) === negScores.length.toLong)
    // one-vs-rest over 512 hashed-unigram buckets is a deliberately weak
    // learner (multiclass accuracy bar above is 0.6); measured 0.70 here
    // vs ~0.50 on the label-independent fixture — the gap is the signal
    assert(auc > 0.65, s"separable labels must rank above chance, got $auc")

    // calibration curve on the same separable labels: buckets partition
    // the scored test docs, counts close, and the top half of the score
    // range must carry a higher positive rate than the bottom half
    val cal = ops.Mining.nbCalibration(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cal.map(_._1).forall(b => b >= 0 && b <= 9))
    assert(cal.map(_._2).sum === posScores.length + negScores.length)
    assert(cal.map(_._3).sum === posScores.length)
    val (hi, loB) = cal.partition(_._1 >= 5)
    val rate = (xs: Array[(Long, Long, Long)]) =>
      xs.map(_._3).sum.toDouble / math.max(1L, xs.map(_._2).sum)
    assert(rate(hi) > rate(loB),
      s"separable scorer must concentrate positives up-range: ${rate(hi)} vs ${rate(loB)}")
  }

  test("SemDeDup == brute-force within-cell near-dup scan (same cells, same tau)") {
    val got = Similarity.dedupSemantic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("cell").longValue,
        r.getLong(2), r.getLong(4)))
    // independent formulation: take the ASSIGNMENT as produced (cells
    // validated by the similarity_ivf_ann oracle), recompute all
    // within-cell cosines naively on the driver from raw embeddings
    val quant = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    val cellOf = Similarity.dedupSemanticAssignment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("cell").longValue)).toMap
    val byCell = cellOf.groupBy(_._2).view.mapValues(_.keys.toArray.sorted)
    val expect = scala.collection.mutable.Map[Long, (Long, Long)]()
    byCell.foreach { case (_, ids) =>
      for (i <- ids.indices; j <- (i + 1) until ids.length) {
        val (a, b) = (ids(i), ids(j))
        val (qa, qb) = (quant(a), quant(b))
        val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
        val cos = dot.toDouble /
          math.sqrt(qa.map(x => x * x).sum.toDouble * qb.map(x => x * x).sum.toDouble)
        if (cos >= 0.3) {
          val (dupOf, n) = expect.getOrElse(b, (Long.MaxValue, 0L))
          expect(b) = (math.min(dupOf, a), n + 1)
        }
      }
    }
    assert(got.map(t => (t._1, t._3, t._4)).toSet ===
      expect.map { case (v, (d, n)) => (v, d, n) }.toSet)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  lazy val brutePairs: Set[(Long, Long)] =
    Dedup.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted near-dup pairs exist in the fixture") {
    assert(brutePairs.nonEmpty)
  }

  test("prefix-filtered Jaccard join equals the inverted-index join (lossless)") {
    val prefix = Dedup.dedupNgramJaccardPrefix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix === brutePairs)
  }

  test("MinHash-LSH pairs equal the exact Jaccard pairs (verified candidates)") {
    val lsh = Dedup.dedupMinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brutePairs)
  }

  test("incremental LSH probe equals the batch×corpus slice of the exact pairs") {
    // restriction of the full exact pair set to pairs with exactly one
    // endpoint in the batch (doc_id ≡ 0 mod 10), re-oriented (new, old)
    val want = brutePairs.collect {
      case (a, b) if a % 10 == 0 && b % 10 != 0 => (a, b)
      case (a, b) if b % 10 == 0 && a % 10 != 0 => (b, a)
    }
    val got = Dedup.dedupIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty) // the fixture's planted dups straddle the split
  }

  test("SimHash (bigram features) finds every planted near-dup pair") {
    val sim = Dedup.dedupSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brutePairs.subsetOf(sim), s"missing: ${brutePairs.diff(sim)}")
  }

  test("hot-shingle df-cap + salted pair generation is result-identical") {
    // hotDf = 1 forces EVERY pair-producing shingle (df >= 2) through the
    // block-split salted path; the result must still equal the plain
    // inverted-index join
    val capped = Dedup.dedupNgramJaccardCapped(spark, dir,
        hotDf = 1L, saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === brutePairs)
  }

  test("simhash signatures: <2-word docs are excluded, not crashed on") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "two words"), (3L, "three word doc"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(df).collect()
    assert(sigs.map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("exact dedup groups every doc exactly once") {
    val total = Dedup.dedupExact(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_copies")).collect()(0).getLong(0)
    assert(total === graft.Tables.documents(spark, dir).count())
  }

  test("containment pairs equal a from-scratch all-pairs recomputation") {
    val got = Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // independent brute force: distinct 3-shingle sets in plain Scala
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
      .filter(_._2.length >= 3)
      .map { case (id, ws) => id -> ws.sliding(3).map(_.mkString(" ")).toSet }
    val want = for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.8
    } yield (a, b, c)
    assert(got.toSet === want.toSet)
    assert(got.nonEmpty)
    // containment dominates Jaccard, so every Jaccard-0.8 pair is here;
    // the operator's reason to exist is the asymmetric pairs beyond that
    got.foreach { case (_, _, c) => assert(c >= 0.8 && c <= 1.0) }
  }

  test("rolling fingerprint is deterministic and text-sensitive") {
    import graft.ops.TextAnalysis
    val fp1 = TextAnalysis.rollingFingerprint(Tables.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fp2 = TextAnalysis.rollingFingerprint(Tables.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp1 === fp2)
    assert(fp1.values.toSet.size > 400) // near-unique across 500 docs
  }
}

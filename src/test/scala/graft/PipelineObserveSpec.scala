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

  test("worker shards: contiguous, count-balanced within 1, partition the epoch") {
    val rows = Pipeline.pipelineWorkerShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_._1).toSeq === (0L until 8L))
    assert(rows.map(_._2).sum === total)
    // contiguity: each shard covers exactly its [lo, hi] range and the
    // next shard starts right after
    rows.foreach { case (_, n, lo, hi, _) => assert(hi - lo + 1 === n) }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 === a._4 + 1)
      case _ =>
    }
    assert(rows.head._3 === 0L && rows.last._4 === total - 1)
    // floor-division assignment balances counts within 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
  }

  test("curation funnel stages are monotone and agree with the declared gates") {
    val rows = Pipeline.pipelineCurationFunnel(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = Tables.documents(spark, dir).count()
    assert(rows("0_raw")._1 === raw)
    // stage 1 must equal the declared gopher gate's keep count
    val keepN = graft.ops.TextAnalysis.textGopherRules(spark, dir)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(rows("1_quality")._1 === keepN)
    // docs monotone non-increasing; tokens too; span cut only trims tokens
    assert(rows("1_quality")._1 <= rows("0_raw")._1)
    assert(rows("2_dedup")._1 <= rows("1_quality")._1)
    assert(rows("3_span_cut")._1 === rows("2_dedup")._1)
    assert(rows("1_quality")._2 <= rows("0_raw")._2)
    assert(rows("2_dedup")._2 <= rows("1_quality")._2)
    assert(rows("3_span_cut")._2 <= rows("2_dedup")._2)
  }

  test("span cut removes exactly the detected spans and reconstructs the text") {
    val spans = graft.ops.Dedup.dedupSubstringSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    val cut = Pipeline.pipelineSpanCut(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut.keySet === docs.keySet) // every doc present, cut or not
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val ss: Seq[(Long, Long)] = spans.getOrElse(id, Seq.empty[(Long, Long)])
      val covered = ss.flatMap { case (a, b) => a to b }.toSet
      val (nb, na, nc, clean) = cut(id)
      assert(nb === toks.length.toLong)
      assert(nc === covered.size.toLong) // spans are disjoint: cut == covered mass
      assert(na === nb - nc)
      val want = toks.zipWithIndex.collect { case (t, i) if !covered(i.toLong) => t }
      assert(clean === want.mkString(" "), s"doc $id")
    }
    // the cut bit: at least one doc actually lost tokens
    assert(cut.values.exists(_._3 > 0))
  }

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

  test("budget mix: budgets honored, allocation follows the sqrt weights, dedup shrinks input") {
    import org.apache.spark.sql.functions._
    val rows = Pipeline.pipelineBudgetMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDedup, nKept, budget, kept, util) =>
      assert(kept <= budget, "hard budget violated")
      assert(nKept <= nDedup)
      assert(util === kept.toDouble / budget.toDouble)
    }
    // allocation ∝ floor(sqrt(n_dedup·1e6)): recompute the integer shares
    // against the dedup-survivor token total (md5-keyed min-doc_id keeper)
    val wTotal = rows.map(t => math.floor(math.sqrt(t._2.toDouble * 1e6)).toLong).sum
    val exTok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok").between(5, 2000))
      .groupBy(md5(col("text")))
      .agg(min(struct(col("doc_id"), col("source"), col("n_tok"))).as("k"))
      .agg(sum(col("k.n_tok"))).head().getLong(0)
    rows.foreach { case (_, nDedup, _, budget, _, _) =>
      val wS = math.floor(math.sqrt(nDedup.toDouble * 1e6)).toLong
      assert(budget === ((exTok / 5L) * wS) / wTotal, "allocation share")
    }
  }

  test("two-phase global epoch index equals the naive global row_number") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = Pipeline.pipelineEpochGlobalIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive single-partition formulation — fine at fixture size, the
    // thing the two-phase plan must reproduce bit-for-bit
    val key = md5(concat(col("doc_id").cast("string"), lit(":1")))
    val naive = Tables.documents(spark, dir)
      .select(col("doc_id"), key.as("key"))
      .withColumn("epoch_pos",
        row_number().over(Window.orderBy(col("key"), col("doc_id"))).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === naive)
    // contiguity: positions are exactly 0..N-1
    assert(got.values.toSeq.sorted === (0L until got.size.toLong))
  }
}

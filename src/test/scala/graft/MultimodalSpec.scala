package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("clip pairs: one row per doc, negative never the anchor, draw is the documented hash") {
    val n = Tables.documents(spark, dir).count()
    val rows = Multimodal.mediaClipPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5)))
    assert(rows.length === n) // exactly one pair row per media row
    rows.foreach { case (id, mt, nBytes, cap, negId, negCap) =>
      assert(negId !== id, s"doc $id drew itself as negative")
      assert(negId >= 0 && negId < n)
      // deterministic Knuth-hash draw, self-collision bumped by one
      val raw = (id * 2654435761L) % n
      assert(negId === (if (raw == id) (raw + 1) % n else raw), s"doc $id draw")
      assert(Set("image", "audio", "video").contains(mt))
      assert(nBytes > 0 && cap.nonEmpty && negCap.nonEmpty)
    }
    // positive captions really are the doc's own first-8-token prefix
    val texts = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, _, cap, negId, negCap) =>
      assert(cap === texts(id).split(" ").take(8).mkString(" "))
      assert(negCap === texts(negId).split(" ").take(8).mkString(" "))
    }
  }

  test("pHash dedup: byte-identical media pair at hamming 0; hamming bounded; no self/dup pairs") {
    val pairs = Multimodal.mediaPhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.foreach { case (a, b, h) =>
      assert(a < b, s"unordered pair ($a,$b)")
      assert(h >= 0 && h <= 12, s"hamming $h out of the declared band")
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length === pairs.length)
    // identical text ⇒ identical synthesized bytes ⇒ identical chunk
    // features ⇒ identical signature: every exact-duplicate doc pair
    // MUST surface at hamming 0 (recall floor of the banded join)
    val byText = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).values.map(_.map(_._2).sorted).filter(_.length > 1)
    val got = pairs.map(p => (p._1, p._2) -> p._3).toMap
    byText.foreach { ids =>
      for (a <- ids; b <- ids if a < b) {
        assert(got.get((a, b)).contains(0L),
          s"exact-duplicate media pair ($a,$b) missing or hamming != 0")
      }
    }
  }
}

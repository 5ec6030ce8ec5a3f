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
}

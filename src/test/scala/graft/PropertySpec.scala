package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.insights.InsightsEngine

/** Property-based tests (SURVEY.md §5.2.3) for the pure invariants of
  * the insights engine's arithmetic — the same formulas the Catalyst
  * expressions implement (checked via plain ScalaCheck; the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  def bucket(x: Long, w: Long): Long = math.floorDiv(x, w) * w

  test("bucketing is idempotent and bounds its input: lo <= x < lo+w") {
    check(Prop.forAll(Gen.chooseNum(-2000000L, 2000000L), Gen.chooseNum(1L, 1000000L)) {
      (x: Long, w: Long) =>
        val lo = bucket(x, w)
        bucket(lo, w) == lo && lo <= x && x < lo + w
    })
  }

  test("threshold is monotone: raising the percent never lowers the cutoff") {
    check(Prop.forAll(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0.0, 50.0),
      Gen.chooseNum(0.0, 50.0)) { (n: Long, p1: Double, p2: Double) =>
      val (lo, hi) = if (p1 <= p2) (p1, p2) else (p2, p1)
      math.floor(lo / 100.0 * n).toLong <= math.floor(hi / 100.0 * n).toLong
    })
  }

  test("subset enumeration: 2^k - 1 subsets, all distinct, canonical order") {
    check(Prop.forAll(Gen.chooseNum(1, 10)) { k =>
      val cols = (1 to k).map(i => s"c$i")
      val subsets = InsightsEngine.allSubsets(cols)
      subsets.length == (1 << k) - 1 &&
        subsets.distinct.length == subsets.length &&
        subsets.forall(s => s == cols.filter(s.contains))
    })
  }

  test("minhash merge (elementwise min) is associative and commutative") {
    val sig = Gen.listOfN(8, Gen.chooseNum(0L, Long.MaxValue / 2)).map(_.toArray)
    check(Prop.forAll(sig, sig, sig) { (a, b, c) =>
      def m(x: Array[Long], y: Array[Long]) = x.zip(y).map { case (u, v) => math.min(u, v) }
      m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq && m(a, b).toSeq == m(b, a).toSeq
    })
  }

  test("WordShingles.compute == sliding-window reference on random texts") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // texts with empty words (double/leading/trailing spaces) included
    val textGen = Gen.listOf(Gen.oneOf(Gen.stringOfN(3, Gen.alphaLowerChar), Gen.const("")))
      .map(_.mkString(" "))
    check(Prop.forAll(textGen, Gen.chooseNum(1, 4), Gen.oneOf(true, false)) {
      (text: String, n: Int, distinct: Boolean) =>
        val words = text.split(" ", -1)
        val ref0 =
          if (words.length < n) Seq.empty[String]
          else words.sliding(n).map(_.mkString(" ")).toSeq
        val ref = if (distinct) ref0.distinct else ref0
        val e = graft.functions.VectorExpressions.WordShingles(
          org.apache.spark.sql.catalyst.expressions.Literal(text), n, distinct)
        val got = e.compute(UTF8String.fromString(text))
          .asInstanceOf[ArrayData].toArray[UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        got == ref
    })
  }

  test("jaccard from intersection identity: |A∪B| = |A|+|B|-|A∩B|") {
    val set = Gen.listOf(Gen.chooseNum(0, 500)).map(_.toSet)
    check(Prop.forAll(set, set) { (a: Set[Int], b: Set[Int]) =>
      a.size + b.size - (a & b).size == (a | b).size
    })
  }

  test("band key rule (cooccurrence): every in-window pair hits exactly one of the 3 probe keys") {
    // Events.cooccurrenceBandedJoin's losslessness/exactly-once argument
    // as a TOTAL integer property — including negative timestamps, where
    // Spark's `div` truncates toward zero (verified: -1 div 300 = 0), so
    // the 0-bucket is 2W-1 wide; every bucket has width >= W, buckets
    // are contiguous and monotone, hence |delta| <= W implies bucket
    // distance <= 1. Scala Long `/` has the identical truncation
    // semantics and is the model here.
    val W = 300000000L
    check(Prop.forAll(
      Gen.chooseNum(-10000000000000L, 10000000000000L),
      Gen.chooseNum(-W, W)) { (us1: Long, d: Long) =>
      val us2 = us1 + d
      def b(x: Long) = x / W
      val probeKeys = Set(b(us1) - 1, b(us1), b(us1) + 1)
      probeKeys.size == 3 && probeKeys.contains(b(us2))
    })
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Pins the bench artifact's documented invariant by enumerating EVERY
  * status sequence over up to three passes (3¹+3²+3³ = 39 sequences ×
  * error-message variants): the JSON `queries` and `errors` maps are
  * always disjoint, any `ok` wins with the minimum positive time, and a
  * never-ok query lands in exactly one map — `errors` if any pass
  * errored (error beats timeout regardless of order), else `queries` as
  * -1. The r8 verdict flagged the error/timeout interleaving as a
  * latent gate risk ("a query that errors in one pass and times out in
  * another lands in both maps"); this spec makes every interleaving a
  * checked case forever.
  */
class BenchMergeSpec extends AnyFunSuite {

  private val statuses = Seq("ok", "timeout", "error")

  /** All sequences of length 1..3 over {ok, timeout, error}. */
  private val sequences: Seq[Seq[String]] =
    (1 to 3).flatMap(n =>
      Seq.fill(n)(statuses).foldLeft(Seq(Seq.empty[String])) {
        (acc, opts) => acc.flatMap(prefix => opts.map(prefix :+ _))
      })

  /** Distinct per-pass times so "minimum of the ok passes" is testable:
    * pass i's wall time is 10.0 - i (later passes are faster). */
  private def secOf(pass: Int): Double = 10.0 - pass

  test("queries and errors maps stay disjoint for every status sequence") {
    for (seq <- sequences) {
      val best = mutable.LinkedHashMap[String, Double]()
      val errs = mutable.LinkedHashMap[String, String]()
      seq.zipWithIndex.foreach { case (st, i) =>
        val status = if (st == "error") s"boom-pass-$i" else st
        Bench.mergeStatus(best, errs, "q", status, secOf(i))
      }
      assert(best.keySet.intersect(errs.keySet).isEmpty,
        s"disjointness violated for sequence $seq: best=$best errs=$errs")
    }
  }

  test("any ok pass wins with the minimum ok time; error history cleared") {
    for (seq <- sequences if seq.contains("ok")) {
      val best = mutable.LinkedHashMap[String, Double]()
      val errs = mutable.LinkedHashMap[String, String]()
      seq.zipWithIndex.foreach { case (st, i) =>
        val status = if (st == "error") s"boom-pass-$i" else st
        Bench.mergeStatus(best, errs, "q", status, secOf(i))
      }
      val minOk = seq.zipWithIndex.collect { case ("ok", i) => secOf(i) }.min
      assert(best.get("q").contains(minOk), s"sequence $seq: best=$best")
      assert(errs.isEmpty, s"sequence $seq left stale error: $errs")
    }
  }

  test("never-ok with at least one error lands ONLY in errors, first message kept") {
    for (seq <- sequences if !seq.contains("ok") && seq.contains("error")) {
      val best = mutable.LinkedHashMap[String, Double]()
      val errs = mutable.LinkedHashMap[String, String]()
      seq.zipWithIndex.foreach { case (st, i) =>
        val status = if (st == "error") s"boom-pass-$i" else st
        Bench.mergeStatus(best, errs, "q", status, secOf(i))
      }
      assert(!best.contains("q"),
        s"sequence $seq double-reported: best=$best errs=$errs")
      val firstErrPass = seq.indexOf("error")
      assert(errs.get("q").contains(s"boom-pass-$firstErrPass"),
        s"sequence $seq: errs=$errs")
    }
  }

  test("timeout-in-every-pass records -1 in queries, nothing in errors") {
    for (seq <- sequences if seq.forall(_ == "timeout")) {
      val best = mutable.LinkedHashMap[String, Double]()
      val errs = mutable.LinkedHashMap[String, String]()
      seq.zipWithIndex.foreach { case (_, i) =>
        Bench.mergeStatus(best, errs, "q", "timeout", secOf(i))
      }
      assert(best.get("q").contains(-1.0) && errs.isEmpty,
        s"sequence $seq: best=$best errs=$errs")
    }
  }

  test("independent queries do not interfere") {
    val best = mutable.LinkedHashMap[String, Double]()
    val errs = mutable.LinkedHashMap[String, String]()
    Bench.mergeStatus(best, errs, "a", "ok", 2.0)
    Bench.mergeStatus(best, errs, "b", "kaboom", 1.0)
    Bench.mergeStatus(best, errs, "c", "timeout", 1.0)
    assert(best == mutable.LinkedHashMap("a" -> 2.0, "c" -> -1.0))
    assert(errs == mutable.LinkedHashMap("b" -> "kaboom"))
  }

  test("pass scheduling: min-runs floor overrides the soft budget, never the hard cap") {
    // defaults: runsTarget 3, minRuns 3, budget 900, hardCap 2700
    def go(pass: Int, elapsed: Long, lastPass: Long,
        runsTarget: Int = 3, minRuns: Int = 3) =
      Bench.shouldContinue(pass, runsTarget, minRuns, elapsed, lastPass,
        budgetSec = 900L, hardCapSec = 2700L)

    // the r14 failure mode, FIXED: pass 1 took 760 s under steal, so
    // elapsed + next pass projects over the 900 s soft budget — the old
    // rule stopped at runs:2 exactly when min-composite needed pass 3;
    // the floor now carries it through
    assert(go(pass = 1, elapsed = 760, lastPass = 760))
    assert(go(pass = 2, elapsed = 1520, lastPass = 760))
    // target met -> stop regardless of time left
    assert(!go(pass = 3, elapsed = 200, lastPass = 60))
    // the hard cap binds even inside the floor (true runaway: a pass so
    // steal-inflated that another would exceed 3x the budget)
    assert(!go(pass = 1, elapsed = 1500, lastPass = 1500))
    assert(!go(pass = 2, elapsed = 2000, lastPass = 800))
    // beyond the floor the soft budget binds again
    assert(!go(pass = 3, elapsed = 800, lastPass = 200, runsTarget = 5))
    assert(go(pass = 3, elapsed = 500, lastPass = 200, runsTarget = 5))
    // an explicit RUNS=1 dev loop is a single pass (floor capped by target)
    assert(!go(pass = 1, elapsed = 10, lastPass = 10,
      runsTarget = 1, minRuns = 1))
  }
}

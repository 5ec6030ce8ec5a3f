package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.SargableYearFilter

/** The year-unwrap optimizer rule: a user-written `year(col) = N` filter
  * must (a) produce identical results and (b) reach the parquet scan as
  * a pushed range once the rule is installed. */
class SargableYearSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ SargableYearFilter
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  test("year(ts) = N rewrites to a pushed range with identical results") {
    def q = Tables.lineitem(spark, dir)
      .filter(year(col("l_shipdate")) === 1996)
      .agg(count(lit(1)).as("n"), sum(Tables.cents(col("l_extendedprice"))).as("cents"))
    val bare = q.collect()(0)
    val (rewritten, plan) = withRule {
      (q.collect()(0), q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === bare)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"expected pushed range, plan:\n$plan")
    assert(plan.contains("LessThan(l_shipdate"))
    assert(!plan.contains("year("), s"year() survived in the scan filter:\n$plan")
  }

  test("every comparison direction matches the unrewritten result") {
    val preds = Seq(
      year(col("l_shipdate")) === 1996,
      year(col("l_shipdate")) >= 1997,
      year(col("l_shipdate")) > 1997,
      year(col("l_shipdate")) <= 1995,
      year(col("l_shipdate")) < 1996,
      lit(1996) === year(col("l_shipdate")),
      lit(1996) >= year(col("l_shipdate")),
      lit(1996) > year(col("l_shipdate")),
      lit(1996) <= year(col("l_shipdate")),
      lit(1996) < year(col("l_shipdate")))
    preds.foreach { p =>
      def n = Tables.lineitem(spark, dir).filter(p).count()
      val bare = n
      val rewritten = withRule(n)
      assert(rewritten === bare, s"mismatch for $p")
    }
  }

  test("date-typed columns rewrite without a cast") {
    def q = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .filter(year(col("d")) === 1996)
    val bare = q.count()
    val rewritten = withRule(q.count())
    assert(rewritten === bare)
  }
}

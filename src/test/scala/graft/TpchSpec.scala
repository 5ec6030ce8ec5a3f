package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Tpch

/** Invariants for the TPC-H-shape queries beyond the DuckDB oracle:
  * the q21 single-aggregate rewrite is differential-tested against the
  * textbook EXISTS / NOT EXISTS formulation, and the broadcast/anti
  * plan shapes are asserted on the physical plan. */
class TpchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("q21 per-order aggregate rewrite == literal EXISTS/NOT EXISTS") {
    Tables.lineitem(spark, dir).createOrReplaceTempView("tpch_l")
    Tables.orders(spark, dir).createOrReplaceTempView("tpch_o")
    Tables.supplier(spark, dir).createOrReplaceTempView("tpch_s")
    val literal = spark.sql(
      """WITH l1 AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 90 DAYS AS late
        |  FROM tpch_l JOIN tpch_o ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l1 WHERE late) w
        |JOIN tpch_s ON w.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM l1 o WHERE o.l_orderkey = w.l_orderkey
        |              AND o.l_suppkey <> w.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l1 o WHERE o.l_orderkey = w.l_orderkey
        |              AND o.l_suppkey <> w.l_suppkey AND o.late)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin)
    val rewrite = Tpch.q21WaitingSuppliers(spark, dir)
    assert(rewrite.collect().toSeq === literal.collect().toSeq)
  }

  test("q2 keeps only the per-part minimum cost") {
    val rows = Tpch.q2MinCostSupplier(spark, dir)
      .groupBy(col("p_partkey"))
      .agg(countDistinct(col("cost_cents")).as("n_costs"))
      .filter(col("n_costs") > 1)
    assert(rows.count() === 0)
  }

  test("q14 percentage is consistent with its own numerator/denominator") {
    val r = Tpch.q14PromoRevenue(spark, dir).collect()(0)
    val promo = r.getAs[Long]("promo_cents")
    val total = r.getAs[Long]("total_cents")
    val pct = r.getAs[Double]("promo_pct")
    assert(promo >= 0 && promo <= total)
    assert(math.abs(pct - 100.0 * promo / total) < 1e-9)
  }

  test("q9 plan broadcasts the dimensions; q16 plan uses a broadcast anti join") {
    val q9plan = Tpch.q9ProductProfit(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q9plan.contains("BroadcastHashJoin"))
    val q16plan = Tpch.q16SupplierCounts(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q16plan.contains("LeftAnti"))
    assert(q16plan.contains("BroadcastHashJoin"))
  }

  test("q12 ship-year filter reaches the parquet scan as a pushed range") {
    // year(col) = N wraps the column and cannot be served by row-group
    // stats; the yearIs() range form must appear in PushedFilters
    val plan = ops.Tpch.q12ShippingDelay(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"expected pushed l_shipdate range, plan:\n$plan")
    assert(plan.contains("LessThan(l_shipdate"))
  }

  test("q12 buckets partition the joined rows exactly") {
    val out = Tpch.q12ShippingDelay(spark, dir)
      .agg(sum(col("high_line_count") + col("low_line_count"))).collect()(0).getLong(0)
    val expected = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir)
          .filter(year(col("l_shipdate")) === 1996),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(out === expected)
  }
}

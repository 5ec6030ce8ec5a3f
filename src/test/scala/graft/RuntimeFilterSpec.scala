package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — a 100 TB lever: when one join
  * side carries a selective filter, Spark can inject a bloom-filter
  * aggregate on that side and push a `might_contain` probe into the
  * OTHER side's scan, cutting shuffle volume before the join. Verifies
  * the optimizer injects it and that results are unchanged. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective join side injects a bloom filter probe on the big side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture tables are far below the production size gates — lower
      // them so the injection logic (not the size heuristic) is on trial
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import Tables.cents
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(cents(col("l_extendedprice"))).as("sum_cents"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom probe injected:\n${optimized.take(3000)}")
      // and the pruned plan returns the same result as the plain one
      val expected = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(cents(col("l_extendedprice"))).as("sum_cents"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      }
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === expected)
    }
  }

  test("HLL sketches: verdicts all true, exact counts match, union == re-scan") {
    // schema: (o_orderstatus, n_rows, exact_custs, custs_ok)
    val rows = ops.RelationalExt.aggHllOrders(spark, dir).collect()
    val o = Tables.orders(spark, dir)
    rows.foreach(r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: estimate outside ±5%"))
    val exactAll = o.select("o_custkey").distinct().count()
    val all = rows.find(_.getString(0) == "ALL").get
    assert(all.getLong(2) === exactAll)
    // merging per-group sketches must equal sketching the whole column
    val direct = o.agg(hll_sketch_estimate(
      hll_sketch_agg(col("o_custkey"))).as("e")).head().getLong(0)
    val merged = o.groupBy("o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    assert(merged === direct)
  }
}

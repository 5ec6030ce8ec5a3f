package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs with ZERO shuffle exchanges") {
    Bucketing.writeBucketed(Tables.lineitem(spark, dir), "li_bucketed",
      "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, dir), "o_bucketed",
      "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      // the join itself is exchange-free; only the (tiny) final
      // aggregation by priority may shuffle
      val joinPart = p.split("HashAggregate").last // below the agg: join subtree
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"join shuffled despite bucketing:\n$p")
      // and the unbucketed version DOES shuffle both sides
      val u = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
      u.collect()
      val up = u.queryExecution.executedPlan.toString
      assert(up.contains("Exchange hashpartitioning(l_orderkey") ||
        up.contains("Exchange hashpartitioning(o_orderkey"))
      // same answer either way
      assert(j.collect().map(_.toString).sorted.sameElements(
        u.collect().map(_.toString).sorted))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("salted two-phase aggregation equals direct aggregation (skewed key)") {
    // events value per event_type — 5 keys over 1000 rows, one hot path
    val e = Tables.events(spark, dir)
      .select(col("event_type"), Tables.cents(col("value")).as("vc"))
    val direct = e.groupBy("event_type")
      .agg(sum("vc").as("sum_vc"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(e, Seq("event_type"), "vc", saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("salted min/max compose correctly") {
    val li = Tables.lineitem(spark, dir)
    val direct = li.groupBy("l_returnflag")
      .agg(min("l_quantity").as("mn"), max("l_quantity").as("mx"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), 8, Seq(
      (min(col("l_quantity")), c => min(c), "mn"),
      (max(col("l_quantity")), c => max(c), "mx")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(salted === direct)
  }
}

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

  test("salted join equals plain join (build side replicated per salt)") {
    val e = Tables.events(spark, dir).select(col("user_id"), col("event_id"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = e.join(c, Seq("user_id"))
      .select("user_id", "event_id", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = ops.Skew.saltedJoin(e, c, Seq("user_id"), saltBuckets = 8)
      .select("user_id", "event_id", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the plan)") {
    val old = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // fixture-sized "skew": thresholds lowered so the hot key's
      // partition is detected relative to its siblings
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // 95% of left rows share key 0 — one massive shuffle partition
      val left = spark.range(0, 300000)
        .select(when(pmod(col("id"), lit(20)) =!= 0, lit(0L))
          .otherwise(col("id")).as("k"), col("id").as("v"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      // global count: the partial aggregate above the join has no
      // required distribution, so AQE is free to split the hot
      // partition (a groupBy(k) directly above would pin hash
      // partitioning on k and veto the split)
      val j = left.join(right, Seq("k")).groupBy().count()
      val n = j.collect()(0).getLong(0)
      assert(n > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n${plan.take(2500)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join == plain join on randomized skewed data (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // ~80% of probe rows land on 3 hot keys; build has multi-row keys
    val probe = (0 until 5000).map { i =>
      val k = if (rnd.nextInt(10) < 8) rnd.nextInt(3).toLong
              else rnd.nextInt(200).toLong
      (k, i.toLong)
    }.toDF("k", "pid")
    val build = (0 until 400).map { i =>
      (rnd.nextInt(220).toLong, i.toLong)
    }.toDF("k", "bid")
    val plain = probe.join(build, Seq("k")).select("k", "pid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val salted = ops.Skew.saltedJoin(probe, build, Seq("k"), saltBuckets = 7)
      .select("k", "pid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // multiset equality: duplicate (k, pid, bid) matches must be preserved
    assert(salted.groupBy(identity).view.mapValues(_.length).toMap ===
      plain.groupBy(identity).view.mapValues(_.length).toMap)
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

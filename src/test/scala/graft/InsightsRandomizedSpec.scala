package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.insights.{InsightsConfig, InsightsEngine}

/** Randomized cross-mode equivalence for the core engine: on seeded
  * random frames WITH NULLS in every grouping column, all four
  * enumeration strategies (reference loop, single cube, hybrid split,
  * dictionary-join cube) must produce the identical insight-string set.
  * This is the hardest part of the cube translation — data-null vs
  * grouping()-null disambiguation via the sentinel, per-subset null
  * rejection, id→value suppression — exercised on inputs no golden
  * fixture anticipates.
  */
class InsightsRandomizedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cfg = InsightsConfig(
    groupingCols = Seq("cat", "idc", "num"),
    buckets = Map("num" -> 10L),
    idValues = Map("idc" -> Seq("val")),
    thresholdPercent = 2.0)

  private def randomFrame(seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = Seq.fill(300)((
      if (rnd.nextInt(10) == 0) null else s"c${rnd.nextInt(3)}",
      if (rnd.nextInt(10) == 0) null else s"id${rnd.nextInt(3)}",
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(100).toLong)))
    rows.toDF("cat", "idc", "num")
      // value col functionally determined by the id col (dict-mode premise)
      .withColumn("val", when(col("idc").isNotNull, concat(lit("name_"), col("idc"))))
  }

  test("loop == cube == hybrid == dict on random null-riddled frames", Slow) {
    for (seed <- Seq(1L, 7L, 42L, 1234L, 987654L)) {
      val df = randomFrame(seed).cache()
      val n = df.count()
      val loop = InsightsEngine.enumerateLoop(df, cfg, n, useFirst = false)
        .reduce(_ unionAll _).collect().map(_.getString(0)).toSet
      val cube = InsightsEngine.insightsCube(df, cfg, n)
        .collect().map(_.getString(0)).toSet
      val hybrid = InsightsEngine.insightsHybrid(df, cfg, n, highCard = Set("num"))
        .collect().map(_.getString(0)).toSet
      val dict = InsightsEngine.insightsCube(df, cfg, n, dictValues = true)
        .collect().map(_.getString(0)).toSet
      val native = InsightsEngine.insightsCubeNative(df, cfg, n)
        .collect().map(_.getString(0)).toSet
      val nativeDict = InsightsEngine.insightsCubeNativeDict(df, cfg, n)
        .collect().map(_.getString(0)).toSet
      assert(cube === loop, s"cube != loop at seed $seed")
      assert(hybrid === loop, s"hybrid != loop at seed $seed")
      assert(dict === loop, s"dict != loop at seed $seed")
      assert(native === loop, s"native != loop at seed $seed")
      assert(nativeDict === loop, s"nativeDict != loop at seed $seed")
      df.unpersist()
    }
  }

  test("two id-columns with multi-value display: all modes agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026L)
    val rows = Seq.fill(250)((
      if (rnd.nextInt(8) == 0) null else s"c${rnd.nextInt(4)}",
      if (rnd.nextInt(8) == 0) null else s"id${rnd.nextInt(3)}",
      if (rnd.nextInt(8) == 0) null else s"jd${rnd.nextInt(2)}",
      if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(1000).toLong)))
    val df = rows.toDF("cat", "idc", "jdc", "num")
      .withColumn("val", when(col("idc").isNotNull, concat(lit("v_"), col("idc"))))
      .withColumn("val2", when(col("idc").isNotNull, concat(lit("w_"), col("idc"))))
      .withColumn("jal", when(col("jdc").isNotNull, concat(lit("j_"), col("jdc"))))
      .cache()
    val cfg4 = InsightsConfig(
      groupingCols = Seq("cat", "idc", "jdc", "num"),
      buckets = Map("num" -> 50L),
      idValues = Map("idc" -> Seq("val", "val2"), "jdc" -> Seq("jal")),
      thresholdPercent = 2.0)
    val n = df.count()
    val loop = InsightsEngine.enumerateLoop(df, cfg4, n, useFirst = false)
      .reduce(_ unionAll _).collect().map(_.getString(0)).toSet
    val cube = InsightsEngine.insightsCube(df, cfg4, n)
      .collect().map(_.getString(0)).toSet
    val dict = InsightsEngine.insightsCube(df, cfg4, n, dictValues = true)
      .collect().map(_.getString(0)).toSet
    assert(cube === loop)
    assert(dict === loop)
    df.unpersist()
  }
}

package graft
import org.apache.spark.sql.functions._
object StressCube {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    val cfg = insights.InsightsConfig(
      groupingCols = Seq("l_returnflag","l_linestatus","l_quantity","l_discount","l_tax",
        "l_shipyear","l_partbucket","l_suppbucket","l_orderbucket","l_linenumber"),
      buckets = Map("l_partbucket"->500L, "l_suppbucket"->20L, "l_orderbucket"->10000L))
    val df = li.withColumn("l_shipyear", year(col("l_shipdate")))
      .withColumn("l_partbucket", col("l_partkey"))
      .withColumn("l_suppbucket", col("l_suppkey"))
      .withColumn("l_orderbucket", col("l_orderkey"))
    for (k <- Seq(6, 8, 10)) {
      val c = cfg.copy(groupingCols = cfg.groupingCols.take(k))
      val t0 = System.nanoTime()
      val n = insights.InsightsEngine.insightsCube(df, c, 600000L).count()
      println(f"STRESS k=$k subsets=${(1<<k)-1} surviving_groups=$n sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for r17 (not part of the declared surface):
  * times isolated aggregate shapes over the sf0.1 fixtures so the
  * OPTIMIZATION_r17.md claims about WHERE the profile panels' time goes
  * (HLL update cost vs job overhead vs SortAggregate) rest on direct
  * measurements. Run: `sbt "runMain graft.StressProbeR17"`. */
object StressProbeR17 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      // warm once, then best of 2
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s ${ts.min}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    time("count docs") { noop(docs.agg(count(lit(1)))) }
    time("1 hll(doc_id) rsd .01") {
      noop(docs.agg(approx_count_distinct(col("doc_id"), 0.01))) }
    time("4 hll rsd .01") {
      noop(docs.agg(approx_count_distinct(col("doc_id"), 0.01),
        approx_count_distinct(col("lang"), 0.01),
        approx_count_distinct(col("source"), 0.01),
        approx_count_distinct(col("n_chars"), 0.01))) }
    time("4 hll rsd .05") {
      noop(docs.agg(approx_count_distinct(col("doc_id"), 0.05),
        approx_count_distinct(col("lang"), 0.05),
        approx_count_distinct(col("source"), 0.05),
        approx_count_distinct(col("n_chars"), 0.05))) }
    time("4 countDistinct (expand)") {
      noop(docs.agg(countDistinct(col("doc_id")),
        countDistinct(col("lang")), countDistinct(col("source")),
        countDistinct(col("n_chars")))) }
    time("min/max strings") {
      noop(docs.agg(min(col("lang")), max(col("lang")),
        min(col("source")), max(col("source")))) }
    time("4 hll + minmax strings (sortagg)") {
      noop(docs.agg(approx_count_distinct(col("doc_id"), 0.01),
        approx_count_distinct(col("lang"), 0.01),
        approx_count_distinct(col("source"), 0.01),
        approx_count_distinct(col("n_chars"), 0.01),
        min(col("lang")), max(col("lang")),
        min(col("source")), max(col("source")))) }
    val text = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    time("scan text + length") { noop(text.agg(count(lit(1)), sum(col("n_chars")))) }

    // --- agg_weighted_median decomposition (near-unique histogram keys) ---
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (round(col("l_extendedprice") * 100.0, 0)).cast("long").as("v"),
        col("l_quantity").cast("long").as("wt"))
    time("wm: scan+project only") { noop(li.agg(count(lit(1)))) }
    val h = li.groupBy(col("l_returnflag"), col("v")).agg(sum(col("wt")).as("w"))
    time("wm: histogram aggregate") { noop(h) }
    import org.apache.spark.sql.expressions.Window
    val byFlag = Window.partitionBy(col("l_returnflag"))
    time("wm: hist + cum window") {
      noop(h.withColumn("cw", sum(col("w")).over(byFlag.orderBy(col("v"))))) }
    time("wm: hist + both windows") {
      noop(h.withColumn("cw", sum(col("w")).over(byFlag.orderBy(col("v"))))
        .withColumn("tw", sum(col("w")).over(byFlag))) }
    spark.stop()
  }
}

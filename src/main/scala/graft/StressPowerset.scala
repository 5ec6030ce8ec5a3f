package graft

import org.apache.spark.sql.SparkSession
import graft.insights.{InsightsEngine, PlayStore}

/** The flagship-number driver (r6 verdict, next-round #1): the reference's
  * ACTUAL workload is all 2^14−1 = 16 383 grouping subsets of its 14
  * Play-Store columns (reference main.py:345-348) — StressCube measures
  * the cube engine only to k=10, so this main measures the full k=14
  * powerset on the r1 head-to-head corpus shape (SynthPlayStore: one
  * ~5000-distinct id column, the rest low-cardinality post-bucketing,
  * id→value columns functionally dependent).
  *
  * Variants timed (identical surviving-insight sets, require()-checked):
  *  - dict:   `insightsCubeNativeDict` — the shipping scale-mode plan
  *            (count-only HashAggregate below the 2^14 Expand, value
  *            columns re-attached post-HAVING from broadcast dicts);
  *  - hybrid: `insightsHybrid(highCard={developerId}, dictValues=true)` —
  *            what the CLI would route to if ≥2 columns were
  *            high-cardinality, forced here onto the single wide column
  *            to price the routing alternative at k=14 (2^13 = 8 192
  *            loop subsets);
  *  - string: `insightsCube` — the golden string-key sentinel cube, the
  *            r1-proven A/B sibling, priced at the same k.
  *
  * The loop/compat shape is NOT run at k=14: it plans 16 383 separate
  * aggregates and its driver planning alone takes minutes (SCALE.md) —
  * measured to k=10 in BASELINE.md's head-to-head instead.
  *
  * Usage: runMain graft.StressPowerset <playstore.csv> [k=14] [variants=dict,string]
  * (hybrid must be asked for explicitly: variants=dict,string,hybrid)
  */
object StressPowerset {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse(sys.error(
      "usage: StressPowerset <playstore.csv> [k] [variants]"))
    val k = if (args.length > 1) args(1).toInt else 14
    val variants: Seq[String] =
      (if (args.length > 2) args(2) else "dict,string").split(",").toSeq

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = PlayStore.cfg.copy(groupingCols = PlayStore.cfg.groupingCols.take(k))
    // Same input discipline as extractScale: explicit schema (no inference
    // pass), per-task Expand volume bounded by re-balancing the scan's
    // partitions up to the core count (SCALE.md input-partition rule).
    val prepared0 = PlayStore.prepare(
      PlayStore.readCsv(spark, csv, schema = Some(PlayStore.schema)))
    val cores = spark.sparkContext.defaultParallelism
    val prepared = (if (prepared0.rdd.getNumPartitions < cores)
      prepared0.repartition(cores) else prepared0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (n, cards) = InsightsEngine.cardinalityStats(prepared, cfg)
    println(s"POWERSET input_rows=$n k=$k subsets=${(1L << k) - 1} " +
      s"cards=${cfg.groupingCols.map(c => s"$c:${cards(c)}").mkString(",")}")

    var expect = -1L
    def time(name: String)(run: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = run
      val sec = (System.nanoTime() - t0) / 1e9
      if (expect < 0) expect = rows
      else require(rows == expect, s"$name rows=$rows != $expect")
      println(f"POWERSET variant=$name k=$k surviving_groups=$rows sec=$sec%.1f")
    }
    variants.foreach {
      case "dict" => time("dict") {
        InsightsEngine.insightsCubeNativeDict(prepared, cfg, n).count()
      }
      case "string" => time("string") {
        InsightsEngine.insightsCube(prepared, cfg, n).count()
      }
      case "hybrid" => time("hybrid") {
        InsightsEngine.insightsHybrid(prepared, cfg, n,
          highCard = Set("developerId"), dictValues = true).count()
      }
      case "iceberg" => time("iceberg") {
        InsightsEngine.insightsCubeIceberg(prepared, cfg, n,
          highCard = Set("developerId")).count()
      }
      case other => sys.error(s"unknown variant $other")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.insights.PlayStore

/** CLI entry for the Play-Store insights job — the engine's equivalent of
  * the reference's `spark-submit main.py --csv_file_path ... --output_path
  * ...` (reference main.py:407-421). A user of the reference switches by
  * pointing spark-submit at this class.
  *
  * Usage: InsightsMain --csv_file_path <in.csv> --output_path <outdir>
  *          [--mode compat|scale] [--batch_size 128] [--num_partitions 2]
  *          [--max_cols k] [--max_groups_per_col n]
  *
  * `--max_groups_per_col` overrides the scale-mode routing with a fixed
  * NDV cut: grouping columns whose post-bucketing HLL distinct count
  * exceeds it are treated as high-cardinality (iceberg support pruning /
  * hybrid split — `PlayStore.extractScale`). Default is COST-BASED from
  * the same stats pass: NDV > 4 × N/threshold routes to iceberg
  * (`InsightsEngine.costBasedHighCard`), so the flag is only needed to
  * force a specific plan.
  *
  * `--max_cols` truncates the grouping universe to the first k columns
  * (2^k−1 subsets). Compat mode literally replays the reference's
  * one-aggregate-per-subset loop: at the full k=14 that is 16 383
  * planned aggregates — the reference's own O(2^k) planning/job
  * pathology — so bound k for compat runs; scale mode (single cube)
  * handles the full 14 columns in one job.
  */
object InsightsMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val csvPath = opts.getOrElse("csv_file_path",
      sys.error("--csv_file_path is required"))
    val outPath = opts.getOrElse("output_path",
      sys.error("--output_path is required"))
    val mode = opts.getOrElse("mode", "scale")

    val builder = SparkSession.builder()
      .appName("graft-insights")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit provides spark.master; default to local[*] otherwise
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = opts.get("max_cols").map(_.toInt) match {
      case Some(k) => PlayStore.cfg.copy(
        groupingCols = PlayStore.cfg.groupingCols.take(k))
      case None => PlayStore.cfg
    }
    try {
      mode match {
        case "compat" => PlayStore.extractCompat(spark, csvPath, outPath,
          opts.get("batch_size").map(_.toInt).getOrElse(128),
          opts.get("num_partitions").map(_.toInt).getOrElse(2), cfg)
        case "scale" => PlayStore.extractScale(spark, csvPath, outPath,
          config = cfg,
          maxGroupsPerCol = opts.get("max_groups_per_col").map(_.toLong))
        case other => sys.error(s"unknown --mode $other (compat|scale)")
      }
    } finally spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** r18 optimization-round evidence tool: writes
  * `plans/r18/<query>_<tag>.txt` — the `.explain("formatted")` output of
  * each named declared query — so before/after plan claims in
  * OPTIMIZATION_r18.md are committed artifacts, not prose.
  *
  * Usage: `sbt "runMain graft.PlanDumpR18 <tag> <query>[,<query>...]"`
  * (tag is `before` / `after`). Plans are captured at sf0.1 — the scale
  * the driver benches — with the Bench session confs, so the dumped plan
  * is the plan the bench actually runs (local stats at sf0.001 can flip
  * broadcast decisions). */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get("plans/r18"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // render control chars visibly (the insights NullSentinel trick
      // from PlanDump) so the committed file stays text for git/grep
      val text = plan.flatMap {
        case c if c == '\n' || c == '\t' || c >= ' ' => c.toString
        case c => f"\\x${c.toInt}%02x"
      }
      Files.writeString(Paths.get(s"plans/r18/${name}_$tag.txt"), text)
      println(s"wrote plans/r18/${name}_$tag.txt")
    }
    spark.stop()
  }
}

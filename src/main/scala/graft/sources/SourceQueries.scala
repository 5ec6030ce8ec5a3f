package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Declared queries that put the non-parquet source/sink formats under
  * the driver's hash gate: each writes a table out through `Sources`,
  * reads it back, and aggregates — the oracle runs the same aggregate
  * over the original parquet, so a green row proves the round-trip is
  * lossless end-to-end (writer, reader, schema handling).
  *
  * Format choices mirror the 100 TB reality: ORC carries every type
  * losslessly (columnar, binary — doubles and timestamps included);
  * JSON is text, so the round-tripped columns are integers and strings
  * only, with money pre-converted to exact integer cents and the read
  * done under an EXPLICIT schema (inference is an extra pass and a
  * drift hazard — SURVEY.md §1.2). */
object SourceQueries {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** parquet → ORC → aggregate. ORC is Spark's other vectorized
    * columnar format: same pushdown/pruning behavior as parquet, so
    * the only thing under test is write/read fidelity. */
  def sourceOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmpDir("graft_orc_rt") + "/orders_orc"
    Sources.writeOrc(orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice")), path)
    Sources.orc(s, path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("o_orderstatus"))
  }

  /** parquet → JSON lines → aggregate, read back under an explicit
    * StructType. Money goes through as integer cents (exact in text);
    * the aggregate must reproduce the parquet-side numbers bit-for-bit
    * or the oracle row goes red. */
  def sourceJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmpDir("graft_json_rt") + "/orders_json"
    Sources.writeJson(orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
      cents(col("o_totalprice")).as("price_cents")), path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("price_cents", LongType)))
    Sources.json(s, path, Some(schema))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).as("total_cents"),
        max(col("o_orderkey")).as("max_orderkey"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "source_orc_roundtrip" -> sourceOrcRoundtrip _,
    "source_json_roundtrip" -> sourceJsonRoundtrip _,
  )

  val oracleSql: Map[String, String] = Map(
    "source_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "source_json_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  max(o_orderkey) AS max_orderkey
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}

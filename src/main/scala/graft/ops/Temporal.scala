package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Temporal join operators — as-of join and range join, the canonical
  * "operators Spark lacks" (builder guide §custom-operator). Neither
  * needs a custom SparkStrategy: both compose into shuffle-friendly
  * built-ins.
  *
  *  - As-of: union both sides tagged, ONE window pass per key ordered by
  *    (time, tag, tiebreak) carrying last_value(ignoreNulls) — O(n log n)
  *    within each key partition, one shuffle total. A custom
  *    sort-merge-based AsOfJoinExec would save the union overhead but
  *    not the shuffle — not worth a strategy (SURVEY §4.3).
  *  - Range: equi-join on the key with the range predicate inside the
  *    join condition — Catalyst plans a hash join keyed on the equi part
  *    and post-filters the range, which is the scalable shape whenever
  *    an equi key exists (a pure-range pair join would need
  *    time-bucketing to avoid a nested loop).
  */
object Temporal {

  /** Generic as-of join: for each left row, the latest right row with
    * the same key and rightTime <= leftTime; ties on time broken by max
    * tiebreak. Returns the left frame + `asof_<valueCol>`. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__time", col(leftTime))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(rightTime).as("__time"),
      col(valueCol).as("__v")).withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time (tag 0 < 1) so an
    // exactly-simultaneous right row IS visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("__time").asc, col("__tag").asc, col("__v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag", "__time", "__v")
  }

  /** Attribution: for each purchase event, the most recent prior (or
    * simultaneous) view event of the same user. */
  def eventsAsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"),
      col("event_id"), unix_micros(col("ts")).as("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("us").as("view_us"))
    asofJoin(purchases, views, "user_id", "us", "view_us", "view_id")
      .select(col("event_id"), col("user_id"), col("us"), col("asof_view_id"))
      .orderBy(col("event_id"))
  }

  /** Range self-join: pairs of events by the same user within 5 minutes
    * (equi on user, range on time), counted per user. */
  def eventsRangePairs(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"),
      col("event_id"), unix_micros(col("ts")).as("us"))
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("us").as("a_us"))
    val b = e.select(col("user_id"), col("event_id").as("b_id"), col("us").as("b_us"))
    a.join(b, Seq("user_id"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("b_us") - col("a_us")) <= lit(300000000L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_close_pairs"),
        min(abs(col("b_us") - col("a_us"))).as("min_gap_us"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_attribution" -> eventsAsofAttribution _,
    "events_range_pairs" -> eventsRangePairs _,
  )

  val oracleSql: Map[String, String] = Map(
    "events_asof_attribution" ->
      """WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events)
        |SELECT p.event_id, p.user_id, p.us,
        |  (SELECT max(v.event_id) FROM e v
        |   WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.us <= p.us
        |     AND v.us = (SELECT max(v2.us) FROM e v2
        |                 WHERE v2.event_type = 'view' AND v2.user_id = p.user_id
        |                   AND v2.us <= p.us)) AS asof_view_id
        |FROM e p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "events_range_pairs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
        |SELECT a.user_id, count(*) AS n_close_pairs,
        |  CAST(min(abs(b.us - a.us)) AS BIGINT) AS min_gap_us
        |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
        |WHERE abs(b.us - a.us) <= 300000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
  )
}

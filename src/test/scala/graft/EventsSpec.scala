package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Events

class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("batch gaps-and-islands sessionize == Spark's native session_window") {
    val custom = Events.sessionize(spark, dir)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val native = Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(custom === native)
  }

  test("tumbling windows partition all events exactly once") {
    val total = Events.tumblingWindows(spark, dir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, dir).count())
  }

  test("funnel users have both event types in order") {
    val rows = Events.signupPurchaseFunnel(spark, dir).collect()
    assert(rows.forall(r => r.getLong(1) < r.getLong(2)))
  }
}

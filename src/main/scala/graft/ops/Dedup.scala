package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dedup operators — filled in incrementally (see SURVEY.md §2.2). */
object Dedup {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}

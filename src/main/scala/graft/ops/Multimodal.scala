package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal operators — filled in incrementally (see SURVEY.md §2.2). */
object Multimodal {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity operators — filled in incrementally (see SURVEY.md §2.2). */
object Similarity {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] LLM-data-pipeline queries (SURVEY §2.8) — filled in round 2. */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}

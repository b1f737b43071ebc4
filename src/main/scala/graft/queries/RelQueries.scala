package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational join-strategy queries (SURVEY §2.3) — filled in round 2. */
object RelQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}

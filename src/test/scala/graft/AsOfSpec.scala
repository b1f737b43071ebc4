package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics: latest right row ≤ left ts per key, tie-breaks,
  * no-match nulls. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(rows: (Long, String, Long, Double)*) =
    rows.toDF("k", "ts_s", "id", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("asOfJoin matches the latest right row at-or-before each left ts") {
    val left = t(
      (1, "2024-01-10 00:00:00", 100, 0.0),
      (1, "2024-01-20 00:00:00", 101, 0.0),
      (2, "2024-01-05 00:00:00", 200, 0.0)) // before any right row → null
    val right = t(
      (1, "2024-01-08 00:00:00", 1, 1.5),
      (1, "2024-01-15 00:00:00", 2, 2.5),
      (1, "2024-01-25 00:00:00", 3, 3.5),
      (2, "2024-01-06 00:00:00", 4, 4.5))
    val r = AsOf.asOfJoin(left, right, "k", "ts", "ts", "id", Seq("id", "v"))
      .select("id", "asof_id").as[(Long, Option[Long])].collect().toMap
    assert(r === Map(100L -> Some(1L), 101L -> Some(2L), 200L -> None))
  }

  test("asOfJoin includes equal timestamps and tie-breaks by greatest tiebreak id") {
    val left = t((1, "2024-01-10 00:00:00", 100, 0.0))
    val right = t(
      (1, "2024-01-10 00:00:00", 7, 7.5), // same ts as left: eligible (≤)
      (1, "2024-01-10 00:00:00", 9, 9.5), // same ts, higher id wins
      (1, "2024-01-09 00:00:00", 1, 1.5))
    val r = AsOf.asOfJoin(left, right, "k", "ts", "ts", "id", Seq("id", "v"))
      .select("asof_id", "asof_v").as[(Long, Double)].collect().head
    assert(r === ((9L, 9.5)))
  }
}

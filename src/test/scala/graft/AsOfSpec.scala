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

  test("overlapBinned equals the brute-force overlap join, exactly once per pair") {
    import graft.operators.RangeJoin
    def iv(pfx: String, rows: (Long, String, String)*) =
      rows.toDF(s"${pfx}_id", "lo_s", "hi_s")
        .withColumn(s"${pfx}_lo", to_timestamp(col("lo_s")))
        .withColumn(s"${pfx}_hi", to_timestamp(col("hi_s")))
        .drop("lo_s", "hi_s")
    // left 10 spans 4 one-hour bins (the canonical-bin dedup case); 11 and
    // right 2 touch only at a shared endpoint; 12/3 are disjoint
    val left = iv("l",
      (10, "2024-01-01 00:30:00", "2024-01-01 03:30:00"),
      (11, "2024-01-02 10:00:00", "2024-01-02 11:00:00"),
      (12, "2024-01-03 00:00:00", "2024-01-03 01:00:00"))
    val right = iv("r",
      (1, "2024-01-01 02:00:00", "2024-01-01 05:00:00"),
      (2, "2024-01-02 11:00:00", "2024-01-02 12:00:00"),
      (3, "2024-01-04 00:00:00", "2024-01-04 01:00:00"))
    val got = RangeJoin.overlapBinned(left, "l_lo", "l_hi", right, "r_lo", "r_hi", 3600L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = left.crossJoin(right)
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === brute)
    assert(got === Seq((10L, 1L), (11L, 2L)))
  }
}

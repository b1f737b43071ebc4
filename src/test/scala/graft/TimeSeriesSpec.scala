package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Gap-fill edge semantics the fixture-scale oracle can't isolate:
  * single-day spans, multi-day LOCF carries, same-day tiebreaks, and
  * per-key span independence. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def obs(rows: (Long, Long, String, Double)*): DataFrame =
    rows.toDF("eid", "k", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  private def grid(df: DataFrame): Seq[(Long, String, Double, Boolean)] =
    TimeSeries.gapFillDaily(df, "k", "ts", "v", "eid")
      .select(col("k"), col("day").cast("string"), col("value"), col("observed"))
      .as[(Long, String, Double, Boolean)].collect().toSeq.sorted

  test("a single-day key yields exactly one observed row") {
    val g = grid(obs((1, 7, "2024-01-05 10:00:00", 3.5)))
    assert(g === Seq((7L, "2024-01-05", 3.5, true)))
  }

  test("LOCF carries the last observation across a multi-day gap") {
    val g = grid(obs(
      (1, 1, "2024-01-01 09:00:00", 1.0),
      (2, 1, "2024-01-04 09:00:00", 4.0)))
    assert(g === Seq(
      (1L, "2024-01-01", 1.0, true),
      (1L, "2024-01-02", 1.0, false),
      (1L, "2024-01-03", 1.0, false),
      (1L, "2024-01-04", 4.0, true)))
  }

  test("same-day winner is the latest (ts, tiebreak); exact-ts ties break on the tiebreaker") {
    val g = grid(obs(
      (1, 1, "2024-01-01 09:00:00", 1.0),
      (2, 1, "2024-01-01 18:00:00", 2.0), // later ts wins the day
      (5, 2, "2024-01-01 12:00:00", 5.0),
      (9, 2, "2024-01-01 12:00:00", 9.0), // same ts: higher eid wins
      (7, 2, "2024-01-01 12:00:00", 7.0)))
    assert(g === Seq((1L, "2024-01-01", 2.0, true), (2L, "2024-01-01", 9.0, true)))
  }

  test("keys keep independent spans (no cross-key fill or span bleed)") {
    val g = grid(obs(
      (1, 1, "2024-01-01 09:00:00", 1.0),
      (2, 1, "2024-01-03 09:00:00", 3.0),
      (3, 2, "2024-01-10 09:00:00", 10.0)))
    assert(g === Seq(
      (1L, "2024-01-01", 1.0, true),
      (1L, "2024-01-02", 1.0, false),
      (1L, "2024-01-03", 3.0, true),
      (2L, "2024-01-10", 10.0, true)))
  }
}

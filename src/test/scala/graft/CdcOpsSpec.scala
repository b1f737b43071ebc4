package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CdcOps

/** CDC-semantics edge cases the DuckDB oracle can't isolate (SURVEY §5.2):
  * delete-drop (js:177), last-write-wins tie-break, upsert idempotence
  * under at-least-once replay (js:114–115). */
class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, Long, String, String)*): DataFrame =
    rows.toDF("event_id", "user_id", "ts_s", "op_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("dropDeletes removes delete events and keeps insert/update (js:159,177)") {
    // filters the PHYSICAL event_type column ('error' maps to delete);
    // a null event_type maps to 'update' and must be KEPT (null-safe filter)
    val l = Seq((1L, 1L, "signup"), (2L, 1L, "error"), (3L, 2L, "click"),
      (4L, 3L, null.asInstanceOf[String])).toDF("event_id", "user_id", "event_type")
    assert(CdcOps.dropDeletes(l).select("event_id").as[Long].collect().sorted === Seq(1L, 3L, 4L))
  }

  test("lastWriteWins picks the greatest (ts, tiebreak) per key") {
    val l = log((1, 1, "2024-01-01 00:00:00", "insert"),
      (2, 1, "2024-01-02 00:00:00", "update"), // later ts wins
      (3, 2, "2024-01-01 00:00:00", "insert"))
    val r = CdcOps.lastWriteWins(l, "user_id", "ts", "event_id")
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 2L, 2L -> 3L))
  }

  test("lastWriteWins breaks exact ts ties by the synthesized tiebreaker") {
    val l = log((5, 1, "2024-01-01 00:00:00", "update"),
      (9, 1, "2024-01-01 00:00:00", "update"), // same ts, higher event_id
      (7, 1, "2024-01-01 00:00:00", "update"))
    val r = CdcOps.lastWriteWins(l, "user_id", "ts", "event_id")
      .select("event_id").as[Long].collect()
    assert(r === Seq(9L))
  }

  test("upsertMerge is idempotent: applying the same batch twice equals once (js:114-115)") {
    val base = log((1, 1, "2024-01-01 00:00:00", "insert"),
      (2, 2, "2024-01-01 00:00:00", "insert"))
    val batch = log((3, 2, "2024-01-02 00:00:00", "update"),
      (4, 3, "2024-01-02 00:00:00", "insert"))
    val once = CdcOps.upsertMerge(base, batch, "user_id")
    val twice = CdcOps.upsertMerge(once, batch, "user_id")
    val a = once.select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val b = twice.select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(a === Set((1L, 1L), (2L, 3L), (3L, 4L)))
  }

  test("upsertMerge keeps base rows for keys absent from the batch") {
    val base = log((1, 1, "2024-01-01 00:00:00", "insert"))
    val batch = log((2, 9, "2024-01-02 00:00:00", "insert"))
    val r = CdcOps.upsertMerge(base, batch, "user_id")
      .select("user_id").as[Long].collect().toSet
    assert(r === Set(1L, 9L))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental JSON payload-shape monitoring at ingest (SURVEY §2.7 ×
  * §2.4) — the streaming form of `agg_schema_profile`: as change events
  * arrive, each batch's payload keys land in a continuously-maintained
  * state, so a producer shipping a NEW field (or dropping one) surfaces at
  * the batch it first happens, not at the next warehouse-load postmortem —
  * the monitor a schemaless replication pipeline runs in front of typed
  * consumers.
  *
  * State design ([[PrefixDupStream]]'s membership discipline): the state
  * is (event_type, day, key, val, event_id) MEMBERSHIP rows — presence
  * counts are additive and would double under redelivery; membership is
  * union-idempotent. `explode_outer` keeps a keyless payload as a
  * null-key row, so per-type denominators count every event. Every report
  * column is then duplicate-tolerant: countDistinct over event_id/val,
  * min/max over day.
  *
  * 100 TB shape: the slice is a row-local parse + per-KEY fan-out (payload
  * width, never corpus size) appended as an O(batch) immutable delta; the
  * report aggregates base + deltas onto the |types|×|keys|-bounded grid;
  * [[compact]] folds deltas by `distinct`.
  *
  * Batch/stream unification: the batch `agg_schema_profile` shares this
  * [[slice]] and the two forms share ONE oracle SQL verbatim (the
  * LengthProfileStream discipline — the gate, not the code path, is what
  * cannot drift; the batch query keeps count(*) aggregates its
  * exactly-once input allows, where the stream must pay distinct counts).
  * The batch-replay form is oracle-gated as `stream_schema_profile` over
  * a DOUBLED delivery; live restart/redelivery in StreamingSpec. */
object SchemaProfileStream {

  /** One batch's membership slice off a ts-normalized events frame. */
  def slice(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      // DATE, not a formatted string: min/max over a 4-byte date keeps the
      // report's grid aggregate in HashAggregate (a string buffer would
      // force the whole chain into sort-based aggregation); the report
      // formats at output
      to_date(col("ts")).as("day"), col("event_id"),
      explode_outer(
        from_json(col("props"), "map<string,string>", Map.empty[String, String]))
        .as(Seq("key", "val")))

  /** The live shape report — identical grid to the batch
    * `agg_schema_profile`: per (event_type, key) its distinct-event
    * presence count and permille rate, distinct-value spread, and
    * first/last day seen. The per-type denominator counts distinct
    * event_ids over ALL state rows (null-key rows included), so keyless
    * payloads still weigh the rates.
    *
    * One membership collapse up front: redelivered rows are exact
    * duplicates (an event re-carries the identical payload and ts — the
    * state-design premise), so a single `distinct` restores the
    * exactly-once frame with ONE row per (event, key). Every aggregate
    * after it is then the cheap form: `count(*)` for presence instead of
    * a second countDistinct (two distinct aggregates in one groupBy plan
    * as an Expand ×3 over the key fan-out), and the denominator's
    * distinct-event count needs no pre-distinct pass of its own. */
  def report(state: DataFrame): DataFrame = {
    val mem = state.distinct()
    val grid = mem.filter(col("key").isNotNull)
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n_present"),
        countDistinct(col("val")).as("n_distinct_vals"),
        date_format(min(col("day")), "yyyy-MM-dd").as("seen_from"),
        date_format(max(col("day")), "yyyy-MM-dd").as("seen_to"))
    val tot = mem.groupBy(col("event_type"))
      .agg(countDistinct(col("event_id")).as("__t"))
    grid.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("key"), col("n_present"),
        col("n_distinct_vals"), col("seen_from"), col("seen_to"),
        expr("n_present * 1000 div __t").as("permille"))
  }


  /** Raw delta union (duplicates possible — report absorbs them), empty
    * before the first batch. */
  def state(spark: SparkSession, targetDir: String): DataFrame =
    AppendState.raw(spark, targetDir).getOrElse(
      spark.range(0).select(lit("").as("event_type"),
        lit(null).cast("date").as("day"),
        col("id").as("event_id"), lit("").as("key"), lit("").as("val")))

  /** One micro-batch apply: slice the batch's membership rows, append as
    * an immutable delta (atomic, replay-skipped). */
  def applyBatch(batch: DataFrame, targetDir: String, batchId: Long): Unit =
    AppendState.append(slice(graft.Tables.normalizeTs(batch)), targetDir, batchId)

  /** Fold current deltas into a fresh compacted base (`distinct`). */
  def compact(spark: SparkSession, targetDir: String): Unit =
    AppendState.compact(spark, targetDir, _.distinct())

  /** Start the ingest shape monitor over an events parquet stream. */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, availableNow: Boolean = true,
            compactEvery: Int = 0): StreamingQuery = {
    val raw = spark.readStream
      .schema(CdcPipeline.observedEventsSchema(spark, sourceDir))
      .parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, targetDir, batchId)
        AppendState.compactIfDue(spark, targetDir, compactEvery)(_.distinct())
      }
      .start()
  }
}

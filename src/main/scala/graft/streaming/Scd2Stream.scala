package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcOps

/** Streaming SCD2 — the incremental form of the batch `window_scd2`
  * materialization (SURVEY §2.4 × §2.7): the change stream arrives
  * at-least-once; each micro-batch folds its surviving change rows into a
  * compacted per-event change SET, and the dimension history is derived from
  * that state on demand.
  *
  * State design — why the state is the DEDUPED CHANGE LOG, not version
  * rows: SCD2 version numbers and validity intervals are order statistics
  * over a key's full history — a late batch can deliver an EARLIER change,
  * renumbering every later version and splitting an interval the previous
  * state already closed, so no bounded per-key summary of version rows
  * merges correctly under reordering. The convergent mergeable state is the
  * set of distinct change rows itself (keyed by `event_id`; set-union merge
  * is commutative, associative, idempotent), and [[report]] derives
  * (version, valid_from, valid_to, is_current) from the state at read time
  * — the same "facts in state, statistics at report time" trade
  * [[FunnelStream]] makes, except here the facts ARE the output's payload:
  * SCD2 history is O(changes) by definition, so state carries no overhead
  * over the result it serves.
  *
  * 100 TB shape: per batch the only exchange is the event_id dedup of the
  * batch SLICE against redelivered rows (in production the state rewrite is
  * a transactional MERGE INTO keyed on event_id — insert-if-absent); the
  * report's window stack is per-key ([[CdcOps.scd2]]'s one-shuffle shape).
  */
object Scd2Stream {

  /** The change columns one state row carries — the [[CdcOps.scd2]] inputs
    * (key, tracked attr, event time, tiebreak), fixture-instantiated. */
  val StateCols: Seq[String] = Seq("user_id", "event_type", "ts", "event_id")

  /** The row-local half of [[slice]]: deletes dropped (the reference's
    * server-side $match, js:221–223 — re-applied here so a slice built
    * from a raw frame matches one built from [[CdcPipeline.transform]],
    * which already drops them), projected to the change columns. Bounded
    * replays feed this straight to [[mergeEvents]] — the merge's
    * event_id collapse makes a per-leg dedup a redundant extra shuffle. */
  def project(events: DataFrame): DataFrame =
    CdcOps.dropDeletes(events).select(StateCols.map(col): _*)

  /** One (bounded or micro-batch) slice's state contribution:
    * [[project]]ed to the change columns, one row per event_id (the
    * micro-batch path dedups BEFORE the state merge so redelivered rows
    * within a batch never widen the merge input). */
  def slice(events: DataFrame): DataFrame =
    project(events).dropDuplicates("event_id")

  /** Keyed set-union merge of two state tables: one row per event_id, all
    * payload columns min-folded (redelivered rows are byte-identical per
    * event_id, so min is the identity — spelled as an aggregate rather
    * than `first` so the merge is deterministic by construction).
    * Commutative, associative, idempotent ⇒ convergent under at-least-once
    * delivery and any micro-batch split of the input. */
  def mergeEvents(state: DataFrame, batch: DataFrame): DataFrame = {
    val payload = StateCols.filterNot(_ == "event_id").map(c => min(col(c)).as(c))
    state.unionByName(batch)
      .groupBy(col("event_id"))
      .agg(payload.head, payload.tail: _*)
  }

  /** Derive the SCD2 dimension history from the state table —
    * [[CdcOps.scd2]] over the compacted change set (per-key windows only;
    * nothing data-sized single-partition-sorts at report time). */
  def report(state: DataFrame): DataFrame =
    CdcOps.scd2(state, "user_id", "event_type", "ts", "event_id")

  /** The LIVE compacted change-set state (versioned atomic commits). */
  def state(spark: SparkSession, targetDir: String): DataFrame =
    StateCommit.state(spark, targetDir)

  /** One idempotent micro-batch apply: fold the batch slice into current
    * state under [[StateCommit]]'s versioned atomic publish (idempotent
    * merge — the id guard only skips replay I/O; the publish is what a
    * crash can no longer tear). */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetDir: String,
                 batchId: Long = -1L): Unit = {
    val s = slice(batch)
    StateCommit.applyBatch(spark, targetDir, batchId) {
      case Some(base) =>
        mergeEvents(base, s.select(base.columns.toIndexedSeq.map(col): _*))
      case None => mergeEvents(s.limit(0), s)
    }
  }

  /** Start the incremental SCD2 build: events source dir → shared CDC
    * transform (ts normalization; the delete drop lives in [[slice]] so the
    * batch-replay form shares it) → watermark → foreachBatch set-union
    * merge into the `targetDir` state table ([[report]] reads it any
    * time). `availableNow = true` drains what exists and stops. */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(CdcPipeline.observedEventsSchema(spark, sourceDir)).parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    CdcPipeline.transform(raw)
      .withWatermark("ts", "1 hour")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, targetDir, batchId)
      }
      .start()
  }
}

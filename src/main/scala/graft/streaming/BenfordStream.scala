package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcOps

/** Continuously-maintained Benford first-digit monitor (SURVEY §2.4 ×
  * §2.7) — the batch `agg_benford` value-authenticity audit run AT INGEST:
  * per micro-batch the slice's first-digit counts fold into a 9-row state
  * table, so a unit-mangling deploy or a fabricated-value source shifts
  * the χ² profile within one trigger interval, not at the next batch
  * audit.
  *
  * State design mirrors [[TopkStream]] exactly (the additive-count
  * discipline): digit counts are NOT redelivery-idempotent, so redelivered
  * ROWS die in the shared watermarked event-id dedup and replayed BATCHES
  * die on [[StateCommit]]'s transactional batch-id guard (versioned dir +
  * atomic marker flip). The state is NINE rows — the most bounded state in
  * the repo; per batch the only exchange is the slice's map-side-combined
  * digit aggregate. [[report]] shares [[CdcOps.benfordReport]] with the
  * batch query — one definition, twins can't drift; batch-replay form
  * oracle-gated as `stream_benford`. */
object BenfordStream {

  /** Per-digit counts of a slice — batch or micro-batch. */
  def digitCounts(events: DataFrame): DataFrame =
    events.select(CdcOps.benfordDigit(col("value")).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))

  /** Additive merge of a counted slice into the 9-row state. */
  def mergeCounts(state: DataFrame, slice: DataFrame): DataFrame =
    state.select(col("digit"), col("n_obs"))
      .unionByName(slice.select(col("digit"), col("n_obs")))
      .groupBy(col("digit")).agg(sum(col("n_obs")).as("n_obs"))

  /** The live audit report — the SAME definition the batch `agg_benford`
    * emits ([[CdcOps.benfordReport]]). */
  def report(state: DataFrame): DataFrame = CdcOps.benfordReport(state)

  /** The LIVE state table ([[StateCommit.state]]). */
  def state(spark: SparkSession, targetDir: String): DataFrame =
    StateCommit.state(spark, targetDir)

  /** One batch-id-guarded micro-batch apply — the [[TopkStream.applyBatch]]
    * protocol over the digit counts. */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetDir: String,
                 batchId: Long): Unit =
    StateCommit.applyBatch(spark, targetDir, batchId) {
      case Some(base) =>
        mergeCounts(base, digitCounts(batch))
      case None =>
        val slice = digitCounts(batch)
        mergeCounts(slice.limit(0), slice)
    }

  /** Start the ingest Benford monitor: events source dir → shared CDC
    * transform → watermarked event-id dedup → foreachBatch additive apply
    * into `targetDir` ([[report]] reads it any time). */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(CdcPipeline.observedEventsSchema(spark, sourceDir)).parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    CdcPipeline.dedupEvents(CdcPipeline.transform(raw))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, batch, targetDir, id)
      }
      .start()
  }
}

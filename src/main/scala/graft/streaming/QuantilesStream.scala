package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming per-type value quantiles — the incremental form of the batch
  * `agg_value_quantiles` monitor: p50/p90/p99 of `value` per event type,
  * continuously maintained (SURVEY §2.4 × §2.7).
  *
  * State design: the batch query's domain-histogram discipline IS the
  * streaming state. Values live on a 0.01 grid, so the sufficient
  * statistic is the (type, cents) count histogram — ADDITIVE under
  * arrival (each micro-batch folds its own map-side-combined histogram
  * in), bounded by the PRICE DOMAIN × type alphabet, never event-sized.
  * Exactly-once is layered the [[TopkStream]] way: redelivered rows die
  * in the watermarked event-id dedup; replayed batches die on the
  * [[StateCommit]] versioned-write + atomic-marker-flip guard (addition
  * is not idempotent, so the guard must be transactional). The report
  * then picks type-1 quantiles from the histogram by cumulative sum —
  * integer ranks, so any engine (and any batch/stream replay) picks the
  * same element.
  *
  * 100 TB shape: per batch the only exchange is the slice's (type, cents)
  * aggregate; the report's windows sort domain-sized frames. Same
  * code path batch and stream — the oracle-gated `stream_value_quantiles`
  * replay runs [[histogram]] + [[report]] on the bounded frame. */
object QuantilesStream {

  /** (type, cents, hn) histogram of a slice — batch or micro-batch. */
  def histogram(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("hn"))

  /** Additive merge of a slice histogram into the state histogram. */
  def mergeHist(state: DataFrame, slice: DataFrame): DataFrame =
    state.select(col("event_type"), col("cents"), col("hn"))
      .unionByName(slice.select(col("event_type"), col("cents"), col("hn")))
      .groupBy(col("event_type"), col("cents")).agg(sum(col("hn")).as("hn"))

  /** p50/p90/p99 per type from the histogram state — the exact arithmetic
    * of the batch `agg_value_quantiles`: type-1 quantile at permille p is
    * `min{cents : cum ≥ ⌈p·n/1000⌉}`, cents/100.0 one exact division. */
  def report(state: DataFrame): DataFrame = {
    val tot = state.groupBy(col("event_type")).agg(sum(col("hn")).as("__n"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q(p: Int) =
      min(when(col("cum") >= expr(s"($p * __n + 999) div 1000"), col("cents"))) / 100.0
    state.withColumn("cum", sum(col("hn")).over(cum))
      .join(tot, "event_type")
      .groupBy(col("event_type"), col("__n"))
      .agg(q(500).as("p50"), q(900).as("p90"), q(990).as("p99"))
      .select(col("event_type"), col("__n").as("n_events"),
        col("p50"), col("p90"), col("p99"))
      .transform(graft.Tables.orderedReport(_, "event_type"))
  }

  /** The LIVE state histogram ([[StateCommit.state]]). */
  def state(spark: SparkSession, targetDir: String): DataFrame =
    StateCommit.state(spark, targetDir)

  /** One batch-id-guarded micro-batch apply: fold the slice's histogram
    * into the state under the transactional [[StateCommit]] protocol. */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetDir: String,
                 batchId: Long): Unit =
    StateCommit.applyBatch(spark, targetDir, batchId) {
      case Some(base) =>
        val slice = histogram(batch)
        mergeHist(base, slice.select(base.columns.toIndexedSeq.map(col): _*))
      case None =>
        val slice = histogram(batch)
        mergeHist(slice.limit(0), slice)
    }

  /** Start the incremental quantile monitor: events source dir → shared
    * CDC transform → watermarked event-id dedup → foreachBatch additive
    * apply into `targetDir` ([[report]] reads [[state]] any time).
    * `availableNow` drains what exists and stops (test/replay). */
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

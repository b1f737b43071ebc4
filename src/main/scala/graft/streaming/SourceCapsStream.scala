package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Per-source document cap maintained at INGEST (SURVEY §2.7 × §2.8) — the
  * incremental form of the batch `ext_source_caps` RefinedWeb
  * anti-domination rule: as crawl slices land, each source's k retained
  * documents stay current, so shard writers can apply the cap the moment
  * data arrives instead of at the next full-corpus pass.
  *
  * Determinism over arrival order: "the k retained docs" is defined as the
  * k SMALLEST doc ids per source (the batch rule), NOT first-k-to-arrive —
  * min-k is a commutative, associative, IDEMPOTENT reduction, so
  * redelivered batches, checkpointed restarts, and any micro-batch split
  * of the input converge to the one-shot batch answer (a first-k-wins rule
  * would depend on scheduling and could never replay cleanly).
  *
  * State rides [[AppendState]]: each batch appends only its OWN per-source
  * k-smallest (a bounded delta — ≤ k rows per source per batch, pre-reduced
  * with the same salted-window discipline as the batch
  * [[graft.operators.TrainPrep.groupCap]] at scale); the live view
  * re-reduces base + deltas on read, and periodic [[compact]] keeps total
  * state at O(sources · k). Per-batch I/O is O(batch ∧ sources·k).
  *
  * Batch-replay form oracle-gated as `stream_source_caps` against the
  * ext_source_caps SQL; live restart/redelivery paths in StreamingSpec. */
object SourceCapsStream {

  /** Per-source k-smallest of any (doc_id, source) frame, ranked 1..k —
    * the ONE reduction used for the batch delta, the merge-on-read, and
    * the report (duplicates collapse through the distinct first, so the
    * rule is insensitive to multiplicity). */
  def capK(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source")).distinct()
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** The LIVE capped table: re-reduce base + deltas on read. */
  def state(spark: SparkSession, targetDir: String, k: Int): DataFrame =
    AppendState.raw(spark, targetDir)
      .map(r => capK(r, k))
      .getOrElse(spark.range(0).select(col("id").as("doc_id"),
        lit("").as("source"), lit(0L).as("rk")))

  /** Fold the deltas (state returns to O(sources · k) rows). */
  def compact(spark: SparkSession, targetDir: String, k: Int): Unit =
    AppendState.compact(spark, targetDir,
      r => capK(r, k).select(col("doc_id"), col("source")))

  /** One micro-batch apply: reduce the batch to its own per-source
    * k-smallest, append atomically (replays skip by id; out-of-band
    * replays collapse through the idempotent min-k merge-on-read), then
    * fold once `compactEvery` deltas accumulate ([[AppendState
    * .DefaultCompactEvery]] — read amplification stays bounded with no
    * manual compact call; ≤ 0 opts out). */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetDir: String,
                 k: Int, batchId: Long = -1L,
                 compactEvery: Int = AppendState.DefaultCompactEvery): Unit = {
    AppendState.append(
      capK(batch, k).select(col("doc_id"), col("source")).localCheckpoint(true),
      targetDir, batchId)
    if (AppendState.compactionDue(targetDir, compactEvery))
      compact(spark, targetDir, k)
  }

  /** Start the cap stream: document source dir → per-batch bounded delta →
    * append-only state under `targetDir`. */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, k: Int,
            availableNow: Boolean = true,
            compactEvery: Int = AppendState.DefaultCompactEvery): StreamingQuery = {
    val raw = spark.readStream.schema(CorpusIngest.docsFileSchema).parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    raw.select(col("doc_id"), col("source"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, targetDir, k, batchId, compactEvery)
      }
      .start()
  }
}

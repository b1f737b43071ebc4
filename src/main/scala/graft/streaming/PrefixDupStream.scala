package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFns

/** Incremental shared-prefix TEMPLATE detection at ingest (SURVEY §2.7 ×
  * §2.8) — the streaming form of `ext_prefix_dup`: as documents arrive,
  * each batch's 8-token prefixes land in a continuously-maintained state,
  * so template/SEO-spam openers surface the moment the second copy lands,
  * not at the next batch sweep.
  *
  * State design: the state is (prefix, source, doc_id) MEMBERSHIP rows —
  * deliberately NOT pre-aggregated counts. A count is additive (a
  * redelivered doc row would double it, and the document stream has no
  * event-time watermark to dedup rows against); membership is a UNION —
  * idempotent under both batch replays and producer-duplicated rows, the
  * [[AppendState]] monotone-union contract. Every report aggregate is
  * then duplicate-tolerant by construction: countDistinct over doc_id /
  * source, min over doc_id. Rows are one per doc — the same order as the
  * prefix key space itself, so nothing is lost to the granularity.
  *
  * 100 TB shape: per-batch I/O is O(batch) — the slice is a row-local
  * projection appended as an immutable delta (no per-batch corpus state
  * rewrite, no per-batch aggregate even); the report is one
  * prefix-keyed aggregate over base + deltas, and [[compact]] folds
  * deltas by `distinct` to bound read amplification.
  *
  * Batch/stream unification: union slicing is trivially homomorphic, so
  * the batch-replay form (oracle-gated as `stream_prefix_dup` against the
  * `ext_prefix_dup` SQL, over a DOUBLED delivery — proving redelivery
  * collapses) equals the one-shot batch answer; live checkpointed
  * restart/redelivery in StreamingSpec. */
object PrefixDupStream {

  /** Tokens in the template prefix — the `ext_prefix_dup` contract. */
  final val PrefixTokens = 8

  /** One batch's state slice: row-local (prefix, source, doc_id)
    * membership rows. */
  def slice(docs: DataFrame): DataFrame =
    docs.select(
      concat_ws(" ", org.apache.spark.sql.functions.slice(
        TextFns.tokens(col("text")), 1, PrefixTokens)).as("prefix"),
      col("source"), col("doc_id"))

  /** The live template report: groups with ≥ 2 docs, their copy count,
    * distinct-source spread, and min-id representative — identical shape
    * to the batch `ext_prefix_dup`. Every aggregate is distinct-/min-based,
    * so duplicate membership rows (redelivery) cannot move it. */
  def report(state: DataFrame): DataFrame =
    state.groupBy(col("prefix"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("prefix")

  /** Raw delta union (duplicates possible — report absorbs them), empty
    * before the first batch. */
  def state(spark: SparkSession, targetDir: String): DataFrame =
    AppendState.raw(spark, targetDir).getOrElse(
      spark.range(0).select(lit("").as("prefix"), lit("").as("source"),
        col("id").as("doc_id")))

  /** One micro-batch apply: project the batch's membership rows, append
    * them as an immutable delta (atomic, replay-skipped). */
  def applyBatch(batch: DataFrame, targetDir: String, batchId: Long,
                 compactEvery: Int = AppendState.DefaultCompactEvery): Unit = {
    AppendState.append(slice(batch), targetDir, batchId)
    if (AppendState.compactionDue(targetDir, compactEvery))
      compact(batch.sparkSession, targetDir)
  }

  /** Fold current deltas into a fresh compacted base (`distinct` — the
    * union state's own idempotent reduction). */
  def compact(spark: SparkSession, targetDir: String): Unit =
    AppendState.compact(spark, targetDir, _.distinct())

  /** Start the ingest template monitor: document source dir → per-batch
    * membership slice → append-only delta state under `targetDir`.
    * `compactEvery` > 0 runs the leveled fold inline once that many deltas
    * accumulate ([[AppendState.compactionDue]] — semantics unchanged, read
    * amplification bounded). */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, availableNow: Boolean = true,
            compactEvery: Int = AppendState.DefaultCompactEvery): StreamingQuery = {
    val raw = spark.readStream.schema(CorpusIngest.docsFileSchema).parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, targetDir, batchId, compactEvery)
      }
      .start()
  }
}

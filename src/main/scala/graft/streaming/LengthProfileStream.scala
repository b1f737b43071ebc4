package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFns

/** Streaming per-source document-length profile — the ingest-side form of
  * `ext_length_outliers` (SURVEY §2.7 × §2.8): a document stream arrives
  * at-least-once; the maintained state is the MEMBERSHIP frame
  * (doc_id, source, n_tok), NOT the (source, n_tok) count histogram —
  * additive counts double under producer-redelivered rows, membership
  * collapses them through the idempotent doc-keyed merge (the
  * `stream_prefix_dup` lesson). The report re-derives the histogram from
  * the state and runs the SAME shared [[graft.operators.Robust.madOutliers]]
  * gate as the batch tier, so the two disciplines cannot drift: per source
  * the median token count, the MAD, and how many documents sit beyond
  * 3·MAD — the "did a feed's scraper change" alarm, whatever each feed's
  * normal length profile is.
  *
  * 100 TB shape: the per-batch work is one narrow projection (doc_id,
  * source, n_tok — text never enters the state) and an O(batch)
  * [[AppendState]] delta append; the corpus-sized membership is never
  * rewritten per micro-batch (merge-on-read + periodic [[compact]], the
  * LSM shape). The report costs one state scan into a (source, n_tok)-
  * bounded histogram; every later frame is histogram-sized
  * ([[graft.operators.Robust]]'s discipline). */
object LengthProfileStream {

  /** Shared batch/stream transform: the membership projection. */
  def transform(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))

  /** Idempotent doc-keyed merge: one row per doc_id across state ∪ batch
    * (ids are unique, so min-struct just collapses redelivered copies —
    * identical rows on every delivery). */
  def mergeMembers(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("source"), col("n_tok"))).as("m"))
      .select(col("doc_id"), col("m.source").as("source"), col("m.n_tok").as("n_tok"))

  /** The LIVE membership state (merge-on-read over the deltas). */
  def state(spark: SparkSession, targetDir: String): DataFrame =
    AppendState.raw(spark, targetDir)
      .map(r => mergeMembers(r.limit(0), r))
      .getOrElse(spark.range(0).select(col("id").as("doc_id"),
        lit("").as("source"), lit(0L).as("n_tok")))

  def compact(spark: SparkSession, targetDir: String): Unit =
    AppendState.compact(spark, targetDir, r => mergeMembers(r.limit(0), r))

  /** One micro-batch apply: batch-local doc reduction, atomic delta
    * publish — replays skip by id, out-of-band duplicates collapse
    * through the merge-on-read. */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetDir: String,
                 batchId: Long = -1L,
                 compactEvery: Int = AppendState.DefaultCompactEvery): Unit = {
    AppendState.append(
      mergeMembers(batch.limit(0), batch).localCheckpoint(true),
      targetDir, batchId)
    if (AppendState.compactionDue(targetDir, compactEvery))
      compact(spark, targetDir)
  }

  /** The outlier report off a membership frame — histogram once, then the
    * shared median/MAD machinery; identical output shape (and oracle) to
    * the batch `ext_length_outliers`. */
  def report(members: DataFrame): DataFrame = {
    val hist = members.groupBy(col("source"), col("n_tok"))
      .agg(count(lit(1)).as("hn"))
      .localCheckpoint(true) // histogram-sized; read by every Robust frame
    graft.operators.Robust.madOutliers(hist, "source", "n_tok")
      .select(col("source"), col("__n").as("n_docs"),
        col("med").as("median_tokens"), col("mad").as("mad_tokens"),
        col("n_outliers"), expr("n_outliers * 1000 div __n").as("outlier_permille"))
      .transform(graft.Tables.orderedReport(_, "source"))
  }

  /** Start the monitor: document source dir → membership projection →
    * foreachBatch doc-keyed merge into `targetDir`. */
  def start(spark: SparkSession, sourceDir: String, targetDir: String,
            checkpointDir: String, availableNow: Boolean = true,
            compactEvery: Int = AppendState.DefaultCompactEvery): StreamingQuery = {
    val raw = spark.readStream.schema(CorpusIngest.docsFileSchema).parquet(sourceDir)
    val trigger =
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("5 seconds")
    transform(raw)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, targetDir, batchId, compactEvery)
      }
      .start()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming conversion funnel — the incremental form of the batch
  * `agg_funnel` rollup (SURVEY §2.4 × §2.7): an event stream arrives
  * at-least-once; each micro-batch folds into per-user funnel state, and the
  * report rolls the state table up to per-stage reach counts on demand.
  *
  * State design — why FIRST-EVENT chain, not the batch query's strict chain:
  * the strict stage-2 entry ("first click AFTER the first signup") is not
  * computable from bounded mergeable state — a later batch can reveal an
  * EARLIER signup, retroactively qualifying clicks the previous state
  * already discarded, so any strict-chain state either re-reads history or
  * is wrong under reordering. The streaming form therefore keeps exactly
  * three values per user — the element-wise MIN timestamp per stage type —
  * and evaluates the chain on the mins at report time (`t_signup < t_click <
  * t_purchase`). Min-merge is commutative, associative and idempotent, so
  * redelivered batches, checkpointed restarts, and ANY micro-batch split of
  * the input converge to the one-shot batch answer (the [[CorpusIngest]]
  * argument) — the trade every production streaming funnel makes for
  * bounded state, made explicit here. On chains where each user's stage
  * events arrive in stage order (the common case), first-event and strict
  * agree; a purchase between a user's first signup and first click is the
  * case where they differ ([[graft.queries.CdcQueries]]'s batch funnel
  * counts it strictly).
  *
  * 100 TB shape: per batch the only exchange is the user groupBy of the
  * batch SLICE (map-side combined to ≤ 3 timestamps per user before it
  * rides); state is one narrow row per user who ever hit a stage event. In
  * production the state rewrite is a transactional MERGE INTO keyed on
  * user_id; the merge shape and its convergence are identical.
  */
object FunnelStream {

  /** The funnel's stage event types, in stage order. */
  val Stages: Seq[String] = Seq("signup", "click", "purchase")

  /** Per-user first-event state of one (bounded or micro-batch) slice:
    * element-wise min timestamp per stage type, null where the slice has
    * none. Non-stage events are filtered BEFORE the exchange. */
  def userState(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin(Stages: _*))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))

  /** Keyed element-wise-min merge of two state tables — commutative,
    * associative, idempotent (min ignores nulls), hence convergent under
    * at-least-once delivery and any batch split. */
  def mergeStates(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("user_id"))
      .agg(min(col("t_signup")).as("t_signup"),
        min(col("t_click")).as("t_click"),
        min(col("t_purchase")).as("t_purchase"))

  /** Roll the state table up to the funnel report: one row per stage with
    * reach and permille vs stage 1 (the batch funnel's output shape). A
    * user reaches stage k iff the first-event chain holds through k; a
    * null min fails every comparison, so partial chains count only their
    * reached prefix. One 1-row aggregate + `stack` unpivot. */
  def report(state: DataFrame): DataFrame =
    state.agg(
      count(col("t_signup")).as("n1"),
      count(when(col("t_click") > col("t_signup"), 1)).as("n2"),
      count(when(col("t_click") > col("t_signup") &&
        col("t_purchase") > col("t_click"), 1)).as("n3"))
      .select(
        expr("stack(3, 1L, 'signup', n1, 2L, 'click', n2, 3L, 'purchase', n3)" +
          " AS (stage_idx, stage, n_users)"),
        col("n1").as("__top"))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        expr("n_users * 1000 div greatest(__top, 1L)").as("conv_permille"))
      .orderBy("stage_idx")

  /** One idempotent micro-batch apply (the [[CdcPipeline.applyBatch]]
    * lifecycle: fold the batch slice's state into current state,
    * lineage-truncate, overwrite). */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetDir: String): Unit = {
    val slice = userState(batch)
    val merged =
      if (new java.io.File(targetDir).exists()) {
        val base = spark.read.parquet(targetDir)
        mergeStates(base, slice.select(base.columns.toIndexedSeq.map(col): _*))
      } else mergeStates(slice.limit(0), slice)
    merged.localCheckpoint(true)
      .write.mode("overwrite").parquet(targetDir)
  }

  /** Start the incremental funnel: events source dir → shared CDC transform
    * (ts normalization + delete drop) → watermark → foreachBatch min-merge
    * into the `targetDir` state table ([[report]] reads it any time).
    * `availableNow = true` drains what exists and stops (test/replay). */
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, targetDir)
      }
      .start()
  }
}

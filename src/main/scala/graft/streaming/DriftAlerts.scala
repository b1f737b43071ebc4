package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, col}

import graft.streaming.AlertSink.DriftRule

/** The standard alert-rule catalog over the engine's MAINTAINED drift /
  * profile monitors — the piece that turns [[AlertSink]] from "a channel
  * plus one lag rule" into the ops loop a 100 TB ingest actually runs:
  * the reference pages on its single health metric (js:556–562,
  * replication lag — [[AlertSink.sweep]]); the engine maintains a dozen
  * corpus monitors that, before this catalog, nobody paged on.
  *
  * Each constructor reads the SAME live report frame the monitor's
  * registered query serves (one-state-many-reports — alerting keeps zero
  * state of its own; every threshold is read off the maintained report)
  * and names its rule `drift:<registered query key>`, so the alert trail
  * joins back to the query surface by key. Drive them on any cadence with
  * `sink.sweepDrift(rules, nowMs)` — per-rule cooldown and the durable
  * outcome trail come from the sink; a breach that persists across sweeps
  * re-pages once per cooldown window, exactly like the lag rule.
  *
  * Scale shape: every report here is domain-bounded (sources, dimensions,
  * (event_type, key) grid — never corpus rows), and the sweep's only
  * driver-side materialization is the breached slice capped at
  * [[AlertSink.MaxDetailRows]] + 1 rows. */
object DriftAlerts {
  // (README "Paging on the maintained monitors" runbook documents the
  // sweep cadence and rule wiring end to end.)

  /** OOV vocabulary drift per source ([[VocabDrift]], query
    * `stream_vocab_drift`): pages when any source's OOV permille moved
    * more than the monitor's own `driftPermille` band from its baseline —
    * the report's `drift` flag, not a second threshold. */
  def vocab(spark: SparkSession, stateDir: String, base: DataFrame,
            driftPermille: Int): DriftRule =
    DriftRule("stream_vocab_drift",
      () => VocabDrift.report(VocabDrift.state(spark, stateDir), base, driftPermille),
      col("drift"),
      r => s"source=${r.getAs[String]("source")} " +
        s"oov=${r.getAs[Long]("oov_permille")}‰ " +
        s"base=${Option(r.getAs[Any]("base_permille")).fold("absent")(b => s"$b‰")}")

  /** Quality-gate pass-rate drift per source ([[QualityDrift]], query
    * `stream_quality_drift`): the report's own `drift` flag — a source
    * whose pass permille left its baseline band, or a source the baseline
    * has never seen. */
  def quality(spark: SparkSession, stateDir: String, base: DataFrame,
              driftPermille: Int): DriftRule =
    DriftRule("stream_quality_drift",
      () => QualityDrift.report(QualityDrift.state(spark, stateDir), base, driftPermille),
      col("drift"),
      r => s"source=${r.getAs[String]("source")} " +
        s"pass=${r.getAs[Long]("pass_permille")}‰ " +
        s"base=${Option(r.getAs[Any]("base_permille")).fold("absent")(b => s"$b‰")}")

  /** Length-distribution KS drift per source ([[KsDriftStream]], query
    * `stream_ks_drift`): pages when any source's KS statistic vs the
    * corpus exceeds `maxKs` on the maintained histogram report. */
  def ks(spark: SparkSession, stateDir: String, maxKs: Double): DriftRule =
    DriftRule("stream_ks_drift",
      () => KsDriftStream.report(
        KsDriftStream.histogram(KsDriftStream.state(spark, stateDir))),
      col("ks_stat") > maxKs,
      r => f"source=${r.getAs[String]("source")} " +
        f"ks=${r.getAs[Double]("ks_stat")}%.4f n=${r.getAs[Long]("n_src")}")

  /** Embedding mean-shift drift ([[EmbedDriftStream]], query
    * `stream_embed_drift`): pages when any dimension's division-free
    * cross-multiplied shift numerator |s_cur·n_ref − s_ref·n_cur| (e4
    * fixed-point, the report's own rank key) exceeds `maxAbsDeltaNumE4` —
    * an absolute-scale guard a deployment tunes to its embedding norm. */
  def embed(spark: SparkSession, stateDir: String, maxAbsDeltaNumE4: Long): DriftRule =
    DriftRule("stream_embed_drift",
      () => EmbedDriftStream.report(EmbedDriftStream.state(spark, stateDir)),
      abs(col("delta_num_e4")) > maxAbsDeltaNumE4,
      r => s"pos=${r.getAs[Long]("pos")} |delta_num_e4|=" +
        s"${math.abs(r.getAs[Long]("delta_num_e4"))} " +
        s"rank=${r.getAs[Long]("drift_rank")}")

  /** Schema-shape drift ([[SchemaProfileStream]], query
    * `stream_schema_profile`): pages when a (event_type, key) cell's
    * presence permille falls below `minPermille` — a key that used to
    * ride every event going missing is the upstream-producer breakage
    * this monitor exists to catch. */
  def schemaProfile(spark: SparkSession, stateDir: String,
                    minPermille: Long): DriftRule =
    DriftRule("stream_schema_profile",
      () => SchemaProfileStream.report(SchemaProfileStream.state(spark, stateDir)),
      col("permille") < minPermille,
      r => s"event_type=${r.getAs[String]("event_type")} " +
        s"key=${r.getAs[String]("key")} present=${r.getAs[Long]("permille")}‰")

  /** Per-source ingest cap ([[SourceCapsStream]], query
    * `stream_source_caps`): pages when any source has FILLED its k-slot
    * cap (rank k occupied) — the signal that a source is being truncated
    * and the cap needs review. */
  def sourceCaps(spark: SparkSession, stateDir: String, k: Int): DriftRule =
    DriftRule("stream_source_caps",
      () => SourceCapsStream.state(spark, stateDir, k),
      col("rk") === k.toLong,
      r => s"source=${r.getAs[String]("source")} at cap k=$k")
}

package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** Durable, throttled alert channel — the reference's `sendAlert` surface
  * (mongodb-cdc-program.js:72–90) and its five call-site categories
  * (checkpoint save js:114, connection js:142, bulk write js:195, change
  * stream js:288, startup js:371, health js:562), re-expressed for an
  * engine that must survive alert STORMS: the reference emails once per
  * incident with no suppression, so a crash-looping batch pages on every
  * retry and a flapping health check pages every 5 minutes.
  *
  * Two engine-owned guarantees the reference lacks:
  *  - **durability**: every raise lands FIRST in an append-only alert log
  *    ([[AppendState]] deltas under `targetDir` — atomic publish,
  *    auto-compacted), so the alert trail outlives the process that
  *    raised it and a crash inside the transport can never lose the
  *    record (the meta-first crash-window ordering);
  *  - **per-rule cooldown**: the transport fires only when the rule's
  *    last delivery is older than `cooldownMs`; suppressed raises are
  *    still logged with `delivered = false`, so the trail is complete
  *    while the pager is quiet. On restart the cooldown clock reseeds
  *    from the durable log's last delivered timestamps — a crash loop
  *    cannot reset its own throttle.
  *
  * The byte-transport itself (SMTP/webhook — js:61–69's nodemailer; no
  * SMTP egress in this image) is the pluggable `deliver` hook; a deliver
  * failure is contained exactly as the reference contains it (js:88 —
  * log and move on), never fails the raising batch, and does NOT reset
  * the cooldown (a broken transport must not turn into a hot retry loop).
  *
  * 100 TB shape: alert volume is rule-bounded by construction (one
  * delivery per rule per cooldown window), log appends are one-row
  * deltas, and the only reader-side work is the merge-on-read union —
  * nothing here ever touches corpus data. */
final class AlertSink(spark: SparkSession, targetDir: String,
                      cooldownMs: Long = AlertSink.DefaultCooldownMs,
                      deliver: AlertSink.Alert => Unit = _ => ()) {

  /** rule → epoch-ms of the last DELIVERED alert; seeded from the durable
    * log so a restart keeps the throttle. */
  private val lastDelivered = new ConcurrentHashMap[String, java.lang.Long]()
  AppendState.raw(spark, targetDir).foreach { l =>
    l.filter(l("delivered")).groupBy("rule").agg(
      org.apache.spark.sql.functions.max("at_ms").as("at_ms"))
      .collect().foreach(r => lastDelivered.put(r.getString(0), r.getLong(1)))
  }

  /** Raise an alert: append the durable log row, then (outside the rule's
    * cooldown) invoke the transport. Returns true iff delivered. Callers
    * pass `nowMs` explicitly so the rule is a pure function of its inputs
    * (unit-testable without clocks; production passes
    * `System.currentTimeMillis()`). */
  def raise(rule: String, subject: String, message: String, nowMs: Long): Boolean = {
    // throttle-check + log append serialize on the sink: raisers are
    // arbitrary threads (foreachBatch bodies, a sweep timer), and both the
    // check-then-mark on lastDelivered and the out-of-band delta-id
    // allocation in AppendState.append are check-then-act — unserialized,
    // two simultaneous raises could double-page inside one window and
    // collide on the same delta path (one raise losing its durable row).
    // Only the transport runs OUTSIDE the lock: a slow SMTP host must not
    // stall other rules' raises.
    val due = synchronized {
      val ok = Option(lastDelivered.get(rule)).forall(nowMs - _.longValue >= cooldownMs)
      val row = Row(rule, subject, message, nowMs, ok)
      AppendState.append(
        spark.createDataFrame(java.util.List.of(row), AlertSink.LogSchema),
        targetDir, -1L) // out-of-band id: alerts are events, not batch state
      AppendState.compactIfDue(spark, targetDir, AppendState.DefaultCompactEvery)(
        df => df) // log rows are unique events — the fold just rewrites them
      if (ok) lastDelivered.put(rule, nowMs)
      ok
    }
    if (due) {
      try deliver(AlertSink.Alert(rule, subject, message, nowMs))
      catch {
        case NonFatal(e) =>
          // js:88: a transport failure is logged, never propagated — and
          // the cooldown stands, so a broken SMTP host can't hot-loop
          System.err.println(s"[alert] deliver failed for '$rule': $e")
      }
    }
    due
  }

  /** The durable alert trail (rule, subject, message, at_ms, delivered) —
    * merge-on-read over the deltas; empty before the first raise. */
  def log: DataFrame =
    AppendState.raw(spark, targetDir).getOrElse(
      spark.createDataFrame(java.util.List.of[Row](), AlertSink.LogSchema))

  /** The reference's health loop (js:556–562: alert when replication lag
    * exceeds the threshold), wired to [[LagMonitor]]: one rule per stalled
    * query, so each query pages on its own cooldown. Returns the number
    * DELIVERED this sweep. */
  def sweep(monitor: LagMonitor, nowMs: Long): Int =
    monitor.stalledById.count { case (id, h) =>
      raise(s"lag:$id", "Replication Lag",
        s"query $id batch ${h.batchId}: ${h.reason}", nowMs)
    }
}

object AlertSink {
  /** js:545's cadence made a throttle: at most one page per rule per
    * 15 minutes; every raise is still durably logged. */
  val DefaultCooldownMs: Long = 15 * 60 * 1000L

  final case class Alert(rule: String, subject: String, message: String, atMs: Long)

  private[streaming] val LogSchema = StructType(Seq(
    StructField("rule", StringType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("message", StringType, nullable = false),
    StructField("at_ms", LongType, nullable = false),
    StructField("delivered", BooleanType, nullable = false)))
}

package graft.streaming

import java.time.Instant
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Continuous health/lag monitoring for the streaming pipeline — the
  * Structured-Streaming form of the reference's cron health check
  * (`mongodb-cdc-program.js:541–605`: read the checkpoint's last-processed
  * timestamp, alert when it trails "now" by more than 5 minutes).
  *
  * Spark mapping: the checkpoint timestamp becomes the query's event-time
  * watermark (the engine's own "everything before this is processed" mark),
  * delivered on every micro-batch via [[StreamingQueryListener]] — push,
  * not poll, so the monitor scales to any number of queries with zero extra
  * jobs. The lag rule itself ([[LagMonitor.assess]]) is a pure function so
  * the alarm semantics are unit-testable without a running stream.
  */
final class LagMonitor(thresholdMs: Long = LagMonitor.DefaultThresholdMs)
    extends StreamingQueryListener {

  private val latest = new ConcurrentHashMap[UUID, LagMonitor.Health]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  /** A stopped query is not a stalled query: evict it so [[stalled]] only
    * reports live queries and the map stays bounded under transient
    * (test/AvailableNow) query churn. */
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    latest.remove(e.id)

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val watermarkMs = Option(p.eventTime.get("watermark"))
      .map(Instant.parse(_).toEpochMilli)
      .filter(_ > 0) // epoch 0 = watermark not yet initialized
    val lag = LagMonitor.assess(
      nowMs = Instant.parse(p.timestamp).toEpochMilli,
      watermarkMs = watermarkMs,
      batchId = p.batchId,
      thresholdMs = thresholdMs)
    // the `serverStatus` half of the reference's health surface
    // (js:549–584: opcounters / memory / connections), mapped onto the
    // engine's own progress counters
    latest.put(p.id, lag.copy(
      rowsPerSec = p.processedRowsPerSecond,
      batchDurationMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)))
  }

  /** Latest health verdict for a query, if it has progressed at all. */
  def health(queryId: UUID): Option[LagMonitor.Health] = Option(latest.get(queryId))

  /** Every monitored query currently over the lag threshold. */
  def stalled: Seq[LagMonitor.Health] = {
    import scala.jdk.CollectionConverters._
    latest.values.asScala.filter(_.stalled).toSeq
  }

  /** Stalled queries keyed by query id — the form an alert sweep needs so
    * each query pages on its own per-rule cooldown ([[AlertSink.sweep]]). */
  def stalledById: Map[UUID, LagMonitor.Health] = {
    import scala.jdk.CollectionConverters._
    latest.asScala.filter(_._2.stalled).toMap
  }
}

object LagMonitor {
  /** The reference's alert threshold (js:545: 5-minute replication lag). */
  val DefaultThresholdMs: Long = 5 * 60 * 1000L

  /** One query's health at a point in time. `lagMs` is how far processed
    * event time trails the progress clock; `stalled` mirrors the
    * reference's `lag > threshold` alarm. The throughput/state fields are
    * the reference's `serverStatus` stats (js:549–584) re-sourced from
    * `StreamingQueryProgress`: processed rows/s, trigger (micro-batch)
    * duration, and total rows held by stateful operators. */
  final case class Health(batchId: Long, lagMs: Long, stalled: Boolean, reason: String,
                          rowsPerSec: Double = 0.0, batchDurationMs: Long = 0L,
                          stateRows: Long = 0L)

  /** The pure lag rule. A query with no initialized watermark yet (no
    * watermarked operator or no data seen) is reported stalled with the
    * full threshold lag — the reference treats "no checkpoint written" the
    * same way (js:566–571: missing checkpoint file = alert). */
  def assess(nowMs: Long, watermarkMs: Option[Long], batchId: Long, thresholdMs: Long): Health =
    watermarkMs match {
      case Some(wm) =>
        val lag = math.max(0L, nowMs - wm)
        Health(batchId, lag, stalled = lag > thresholdMs,
          reason = if (lag > thresholdMs) s"watermark trails by ${lag}ms" else "ok")
      case None =>
        Health(batchId, lagMs = Long.MaxValue, stalled = true,
          reason = "no event-time watermark observed")
    }

  /** Attach a monitor to every streaming query in the session. */
  def attach(spark: SparkSession, thresholdMs: Long = DefaultThresholdMs): LagMonitor = {
    val m = new LagMonitor(thresholdMs)
    spark.streams.addListener(m)
    m
  }
}

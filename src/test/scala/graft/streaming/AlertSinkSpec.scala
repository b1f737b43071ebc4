package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** The durable throttled alert channel (js:72–90's sendAlert surface):
  * per-rule cooldown, complete durable trail, restart-proof throttle,
  * contained transport failures. */
class AlertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def dir(): String = {
    val p = Files.createTempDirectory("alerts")
    p.toFile.deleteOnExit()
    p.resolve("log").toString
  }

  test("per-rule cooldown: storms collapse to one delivery per window; every raise is logged") {
    val delivered = scala.collection.mutable.ArrayBuffer.empty[AlertSink.Alert]
    val sink = new AlertSink(spark, dir(), cooldownMs = 1000L, deliver = delivered += _)

    assert(sink.raise("bulk-write", "Bulk Write Failure", "batch 7 failed", nowMs = 0L))
    // the crash-looping retry storm: suppressed but logged
    assert(!sink.raise("bulk-write", "Bulk Write Failure", "batch 7 failed", nowMs = 200L))
    assert(!sink.raise("bulk-write", "Bulk Write Failure", "batch 7 failed", nowMs = 999L))
    // a DIFFERENT rule is not throttled by the first one's window
    assert(sink.raise("checkpoint", "Checkpoint Save Failure", "disk full", nowMs = 500L))
    // past the window: pages again
    assert(sink.raise("bulk-write", "Bulk Write Failure", "batch 9 failed", nowMs = 1500L))

    assert(delivered.map(a => (a.rule, a.atMs)).toSeq ===
      Seq(("bulk-write", 0L), ("checkpoint", 500L), ("bulk-write", 1500L)))
    // the trail is COMPLETE — suppressed raises carry delivered = false
    val trail = sink.log.select("rule", "at_ms", "delivered")
      .as[(String, Long, Boolean)].collect().sortBy(r => (r._2, r._1)).toSeq
    assert(trail === Seq(
      ("bulk-write", 0L, true), ("bulk-write", 200L, false),
      ("checkpoint", 500L, true), ("bulk-write", 999L, false),
      ("bulk-write", 1500L, true)))
  }

  test("restart reseeds the cooldown from the durable log — a crash loop cannot reset its own throttle") {
    val d = dir()
    val first = new AlertSink(spark, d, cooldownMs = 1000L)
    assert(first.raise("stream-error", "Change Stream Error", "cursor died", nowMs = 100L))
    // process restarts (new sink over the same log dir): still inside the
    // window, so the replayed failure is suppressed...
    val second = new AlertSink(spark, d, cooldownMs = 1000L)
    assert(!second.raise("stream-error", "Change Stream Error", "cursor died", nowMs = 600L))
    // ...and pages again once the window has genuinely passed
    assert(second.raise("stream-error", "Change Stream Error", "cursor died", nowMs = 1200L))
  }

  test("a transport failure is contained and does not reset the cooldown") {
    val sink = new AlertSink(spark, dir(), cooldownMs = 1000L,
      deliver = _ => throw new RuntimeException("smtp down"))
    assert(sink.raise("startup", "CDC Startup Failure", "boom", nowMs = 0L)) // no throw
    assert(!sink.raise("startup", "CDC Startup Failure", "boom", nowMs = 100L))
    assert(sink.log.count() === 2L)
  }

  test("sweep pages one rule per stalled query off the LagMonitor") {
    val delivered = scala.collection.mutable.ArrayBuffer.empty[AlertSink.Alert]
    val sink = new AlertSink(spark, dir(), cooldownMs = 1000L, deliver = delivered += _)
    val mon = new LagMonitor(thresholdMs = 1000L)
    assert(sink.sweep(mon, nowMs = 0L) === 0) // nothing stalled, nothing paged
    // drive a real stalled query through the listener: a rate-limited
    // stream that never initializes a watermark assesses as stalled
    spark.streams.addListener(mon)
    val q = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream.format("noop").start()
    try {
      var tries = 0
      while (mon.stalledById.isEmpty && tries < 100) { Thread.sleep(100); tries += 1 }
      assert(mon.stalledById.nonEmpty)
      assert(sink.sweep(mon, nowMs = 0L) === 1)
      assert(sink.sweep(mon, nowMs = 100L) === 0) // same query, inside cooldown
      assert(delivered.size === 1 && delivered.head.rule.startsWith("lag:"))
    } finally {
      q.stop()
      spark.streams.removeListener(mon)
    }
  }
}

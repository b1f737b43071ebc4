package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.CdcOps

/** Property-based checks (SURVEY §5.3) over generated change logs:
  * last-write-wins is input-order-insensitive, and replaying any suffix of
  * the log from a "checkpoint" reproduces the same final state. Uses
  * ScalaCheck generators with a fixed seed (deterministic CI). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genLog: Gen[List[(Long, Long, Int)]] = Gen.listOfN(
    60,
    for {
      eid <- Gen.choose(1L, 1000L)
      uid <- Gen.choose(1L, 8L)
      tsOff <- Gen.choose(0, 500)
    } yield (eid, uid, tsOff))

  private def samples(n: Int): Seq[List[(Long, Long, Int)]] = {
    val seed0 = rng.Seed(42L)
    (0 until n).scanLeft((genLog.pureApply(Gen.Parameters.default, seed0), seed0)) {
      case ((_, s), _) =>
        val s2 = s.next
        (genLog.pureApply(Gen.Parameters.default, s2), s2)
    }.map(_._1)
  }

  private def df(rows: List[(Long, Long, Int)]): DataFrame =
    rows.toDF("event_id", "user_id", "ts_off")
      // distinct event_id per (ts, key) not guaranteed — dedup exact rows so
      // the winner is well-defined under any input order
      .distinct()
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")) + col("ts_off") * expr("INTERVAL 1 MINUTE"))

  private def state(log: DataFrame): Set[(Long, Long)] =
    CdcOps.lastWriteWins(log, "user_id", "ts", "event_id")
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet

  test("lastWriteWins is insensitive to input row order") {
    samples(8).foreach { rows =>
      val a = state(df(rows))
      val b = state(df(scala.util.Random.shuffle(rows)))
      assert(a === b, s"order sensitivity on sample of ${rows.size} rows")
    }
  }

  test("sessionization is micro-batch-split invariant (pure state machine)") {
    import graft.streaming.Sessionize
    // property: threading the open-session state through ANY split of the
    // (sorted) event times yields exactly the all-at-once sessions — the
    // guarantee that micro-batch boundaries and restarts never change the
    // session answer. Random event sequences + random split points.
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val times = Seq.fill(n)(rnd.nextLong(20000L)).sorted
      val gap = 300L + rnd.nextInt(2000)
      val (oneShotClosed, oneShotOpen) = Sessionize.advance(1L, gap, times, None)
      val nSplits = rnd.nextInt(4)
      val cuts = (Seq.fill(nSplits)(rnd.nextInt(n + 1)).sorted :+ n).distinct
      var prior: Option[Sessionize.OpenSession] = None
      var acc = Seq.empty[Sessionize.UserSession]
      var from = 0
      cuts.foreach { to =>
        val (closed, open) = Sessionize.advance(1L, gap, times.slice(from, to), prior)
        acc ++= closed; prior = open; from = to
      }
      assert(acc === oneShotClosed, s"split changed closed sessions (gap=$gap, n=$n)")
      assert(prior === oneShotOpen, s"split changed open tail (gap=$gap, n=$n)")
    }
  }

  test("sessionization merges bounded-disorder arrivals like the batch answer") {
    import graft.streaming.Sessionize
    // property: when every event of a session lies within one gap-width
    // window, ANY arrival order across ANY micro-batch split merges into the
    // same single open session the sorted batch run produces — late events
    // (including ones older than the current session start) lower the start
    // instead of corrupting it. This is the out-of-order cross-batch case
    // the split-invariance test (in-order splits only) cannot see.
    val rnd = new scala.util.Random(11)
    (0 until 30).foreach { _ =>
      val n = 2 + rnd.nextInt(30)
      val gap = 300L + rnd.nextInt(2000)
      val base = rnd.nextLong(10000L)
      val times = Seq.fill(n)(base + rnd.nextLong(gap + 1))
      val (batchClosed, batchOpen) = Sessionize.advance(1L, gap, times.sorted, None)
      assert(batchClosed.isEmpty)
      val shuffled = rnd.shuffle(times)
      val nSplits = rnd.nextInt(4)
      val cuts = (Seq.fill(nSplits)(rnd.nextInt(n + 1)).sorted :+ n).distinct
      var prior: Option[Sessionize.OpenSession] = None
      var acc = Seq.empty[Sessionize.UserSession]
      var from = 0
      cuts.foreach { to =>
        // the operator sorts within each micro-batch before advancing
        val (closed, open) = Sessionize.advance(1L, gap, shuffled.slice(from, to).sorted, prior)
        acc ++= closed; prior = open; from = to
      }
      assert(acc.isEmpty, s"disordered delivery closed a session early (gap=$gap, n=$n)")
      assert(prior === batchOpen, s"disordered delivery changed the open session (gap=$gap, n=$n)")
    }
  }

  test("a late event within the gap lowers the open session's start") {
    import graft.streaming.Sessionize
    val (_, open) = Sessionize.advance(1L, 1800L, Seq(1000L, 1200L), None)
    val (closed, open2) = Sessionize.advance(1L, 1800L, Seq(900L), open)
    assert(closed.isEmpty)
    assert(open2 === Some(Sessionize.OpenSession(900L, 1200L, 3L)))
  }

  test("a straggler older than the open session's reach is emitted alone, not merged") {
    import graft.streaming.Sessionize
    val (_, open) = Sessionize.advance(1L, 1800L, Seq(10000L), None)
    val (closed, open2) = Sessionize.advance(1L, 1800L, Seq(100L), open)
    assert(closed === Seq(Sessionize.UserSession(1L, 100L, 100L, 1L)))
    assert(open2 === Some(Sessionize.OpenSession(10000L, 10000L, 1L)))
  }

  test("a late burst chains into straggler sessions under the gap rule, not singletons") {
    import graft.streaming.Sessionize
    import Sessionize.{OpenSession, UserSession}
    val (_, open) = Sessionize.advance(1L, 1800L, Seq(10000L), None)
    // 100→1000 chain (gap 900); 5000 is 4000 past the chain AND below the
    // open session's reach (10000 − 1800) → second straggler session
    val (closed, open2) = Sessionize.advance(1L, 1800L, Seq(100L, 1000L, 5000L), open)
    assert(closed === Seq(UserSession(1L, 100L, 1000L, 2L), UserSession(1L, 5000L, 5000L, 1L)))
    assert(open2 === Some(OpenSession(10000L, 10000L, 1L)))
    // a chain followed by an in-reach event: chain closes, the event merges
    val (closed3, open3) = Sessionize.advance(1L, 1800L, Seq(100L, 1000L, 9000L), open)
    assert(closed3 === Seq(UserSession(1L, 100L, 1000L, 2L)))
    assert(open3 === Some(OpenSession(9000L, 10000L, 2L)))
  }

  test("an in-reach event within the gap of a straggler chain bridges it into the session") {
    import graft.streaming.Sessionize
    import Sessionize.{OpenSession, UserSession}
    // prior open (10000,10000), gap 1800: 8100 is below reach (< 8200) and
    // chains; 8250 is in-reach AND within 150 of the chain's tail — the
    // sorted batch log [8100, 8250, 10000] has gaps 150 and 1750, both ≤
    // 1800, so batch yields ONE session. The chain must fold, not emit.
    val (_, open) = Sessionize.advance(1L, 1800L, Seq(10000L), None)
    val (closed, open2) = Sessionize.advance(1L, 1800L, Seq(8100L, 8250L), open)
    assert(closed.isEmpty)
    assert(open2 === Some(OpenSession(8100L, 10000L, 3L)))
    // chain > gapSec below the bridging event still closes: [6000, 8250]
    val (closed3, open3) = Sessionize.advance(1L, 1800L, Seq(6000L, 8250L), open)
    assert(closed3 === Seq(UserSession(1L, 6000L, 6000L, 1L)))
    assert(open3 === Some(OpenSession(8250L, 10000L, 2L)))
  }

  test("delivering a session's suffix then its full prefix converges to the batch answer") {
    import graft.streaming.Sessionize
    // property: for ANY chain whose consecutive gaps are all ≤ gapSec (so
    // the sorted batch run yields ONE open session), delivering a suffix
    // first (establishing the open session) and then the entire remaining
    // prefix in one later batch must converge to the same open session —
    // below-reach prefix events chain with each other and BRIDGE back in
    // through the first in-reach event (whose gap to the chain tail is ≤
    // gapSec by construction). This is the case the bounded-disorder test
    // (events within ONE gap-width) cannot reach.
    val rnd = new scala.util.Random(13)
    (0 until 50).foreach { _ =>
      val n = 3 + rnd.nextInt(30)
      val gap = 300L + rnd.nextInt(2000)
      var t = rnd.nextLong(5000L)
      val times = Seq.fill(n) { t += rnd.nextLong(gap + 1); t }
      val (batchClosed, batchOpen) = Sessionize.advance(1L, gap, times, None)
      assert(batchClosed.isEmpty)
      val k = 1 + rnd.nextInt(n - 1) // split point: prefix [0,k), suffix [k,n)
      val (c1, open1) = Sessionize.advance(1L, gap, times.drop(k), None)
      assert(c1.isEmpty)
      val (c2, open2) = Sessionize.advance(1L, gap, times.take(k), open1)
      assert(c2.isEmpty, s"prefix replay closed a session (gap=$gap, n=$n, k=$k)")
      assert(open2 === batchOpen, s"prefix replay diverged from batch (gap=$gap, n=$n, k=$k)")
    }
  }

  test("replaying any suffix from a checkpointed state is a no-op on the final state") {
    samples(8).foreach { rows =>
      val full = df(rows)
      val finalState = CdcOps.lastWriteWins(full, "user_id", "ts", "event_id")
      // checkpoint at an arbitrary cut: state built from the full log, then
      // the suffix (last 20 minutes) replayed on top — at-least-once overlap
      val suffix = full.filter(col("ts_off") >= 480)
      val replayed = CdcOps.upsertMerge(
        finalState, CdcOps.lastWriteWins(suffix, "user_id", "ts", "event_id"), "user_id")
      val a = finalState.select("user_id", "event_id").as[(Long, Long)].collect().toSet
      val b = replayed.select("user_id", "event_id").as[(Long, Long)].collect().toSet
      assert(a === b, "suffix replay changed the final state")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Robust

/** Pins for the shared robust-statistics machinery — the median/MAD gate
  * is hash-gated through its two query entries; Spearman gets direct
  * hand-computed pins here (perfect / reversed / tied / degenerate). */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private def corr(rows: Seq[(String, Long, Long)]) =
    Robust.spearmanMicro(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("spearmanMicro: monotone agreement is exactly +1e6, reversal −8e5 under the tie pair") {
    val got = corr(Seq(
      // same ranking, ties aligned → Σd² = 0 → ρ = +1.0
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 2L, 20L), ("up", 3L, 30L),
      // reversed with a middle tie: doubled ranks (2,5,5,8) vs (8,5,5,2),
      // Σ(d2x−d2y)² = 72 → ρ = 1 − 6·18/(4·15) = −0.8 exactly
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 2L, 20L), ("down", 3L, 10L)))
    assert(got("up") === (4L, Some(1000000L)))
    assert(got("down") === (4L, Some(-800000L)))
  }

  test("madOutliers matches a brute-force expansion on random histograms") {
    // the two-pointer MAD merge vs the definition: expand each histogram
    // to raw values, lower-median by rank ⌈n/2⌉, same over |v − med|,
    // count beyond 3·MAD
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 25) {
      val hist = (0 until (1 + rnd.nextInt(12))).map { _ =>
        (s"g", rnd.nextInt(40).toLong - 10L, 1L + rnd.nextInt(5).toLong)
      }.groupBy(_._2).map { case (v, rows) => ("g", v, rows.map(_._3).sum) }.toSeq
      val got = Robust.madOutliers(hist.toDF("g", "v", "hn"), "g", "v")
        .as[(String, Long, Long, Long, Long)].collect().head
      val raw = hist.flatMap { case (_, v, hn) => Seq.fill(hn.toInt)(v) }.sorted
      def lowerMed(xs: Seq[Long]): Long = xs((xs.size + 1) / 2 - 1)
      val med = lowerMed(raw)
      val mad = lowerMed(raw.map(v => math.abs(v - med)).sorted)
      val out = raw.count(v => math.abs(v - med) > 3 * mad)
      assert(got === (("g", raw.size.toLong, med, mad, out.toLong)),
        s"trial $trial: hist=$hist raw=$raw")
    }
  }

  test("spearmanMicro: a single-row group has no defined rank correlation") {
    val got = corr(Seq(("solo", 7L, 3L)))
    assert(got("solo") === (1L, None))
  }

  test("spearmanMicro: constant y ties everything — ρ lands at the formula's +1") {
    // all-tied y gives every row the same doubled rank; Σd² reduces to the
    // x-rank spread — the documented no-tie-correction convention (a
    // DEFINED deterministic value, shared verbatim by the oracle)
    val got = corr(Seq(("c", 1L, 5L), ("c", 2L, 5L), ("c", 3L, 5L)))
    val (n, rho) = got("c")
    assert(n === 3L && rho.isDefined)
    // doubled x-ranks (2,4,6) vs constant 4: Σd² = 8 → ρ_micro = 0
    assert(rho.get === 1000000L - 3L * 8L * 1000000L / (2L * 3L * 8L))
  }
}

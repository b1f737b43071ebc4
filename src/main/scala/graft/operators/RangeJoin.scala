package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — the scale-safe form of an interval join. Without
  * help, Catalyst executes `a JOIN b ON b.ts BETWEEN a.lo AND a.hi` as a
  * nested-loop (no equi-key), which is quadratic. Binning makes it an
  * EQUI-join: the build side lands in fixed-width time bins, each probe row
  * replicates to the ⌈window/binWidth⌉+1 bins its interval overlaps, and the
  * exact range predicate runs as a residual filter after the hash join.
  * Probe fan-out is bounded by the window/bin ratio — pick binWidth ≈ the
  * window size for ≤2 bins per probe row. */
object RangeJoin {

  /** Inner-join `probe` to `build` where `build.tsCol ∈ [probe.loCol,
    * probe.hiCol)`. All columns of both sides survive. `binSeconds` is the
    * bin width. */
  def binned(probe: DataFrame, loCol: String, hiCol: String,
             build: DataFrame, tsCol: String, binSeconds: Long): DataFrame = {
    val lo = unix_timestamp(col(loCol))
    val hi = unix_timestamp(col(hiCol))
    val p = probe.withColumn("__bin",
      explode(sequence(floor(lo / binSeconds), floor((hi - 1) / binSeconds))))
    val b = build.withColumn("__bin", floor(unix_timestamp(col(tsCol)) / binSeconds))
    p.join(b, Seq("__bin"))
      .filter(col(tsCol) >= col(loCol) && col(tsCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval overlap join: pairs where `[lLo, lHi]` and
    * `[rLo, rHi]` (closed, timestamp columns) intersect. Both sides explode
    * to the fixed-width bins their interval covers, the join is EQUI on the
    * bin, and the exact overlap predicate runs as a residual. A pair whose
    * overlap spans several bins would match once per shared bin; instead of
    * a post-join `distinct` (a second full shuffle of the pair set) each
    * pair survives only in its CANONICAL bin — the one containing
    * max(lLo, rLo), which every overlapping pair has in both sides' bin
    * ranges (floor is monotone), so exactly-once output is a join-local
    * filter. Fan-out per row is ⌈len/binSeconds⌉+1 — pick `binSeconds`
    * near the typical interval length. Column names of the two inputs must
    * be disjoint (as with [[binned]]). */
  def overlapBinned(left: DataFrame, lLo: String, lHi: String,
                    right: DataFrame, rLo: String, rHi: String,
                    binSeconds: Long): DataFrame = {
    def bins(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bin", explode(sequence(
        floor(unix_timestamp(col(lo)) / binSeconds),
        floor(unix_timestamp(col(hi)) / binSeconds))))
    bins(left, lLo, lHi).join(bins(right, rLo, rHi), Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") ===
        floor(greatest(unix_timestamp(col(lLo)), unix_timestamp(col(rLo))) / binSeconds))
      .drop("__bin")
  }
}

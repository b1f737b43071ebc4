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
}

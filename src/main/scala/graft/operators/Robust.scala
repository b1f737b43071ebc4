package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared robust-statistics machinery: exact per-group median / MAD /
  * outlier counts off ONE integer-value histogram — the discipline both
  * `agg_robust_outliers` (event values in cents) and `ext_length_outliers`
  * (document token counts) ride, extracted so the two cannot drift.
  *
  * Contract: `hist` is a (group, value, hn) frame — the corpus already
  * collapsed once to a DOMAIN-bounded histogram (map-side combined). Every
  * pass here re-groups that histogram, never the corpus: the median is an
  * integer-rank cumulative-sum min (no data-sized sort), the deviation
  * histogram |value − med| is histogram-sized, and the MAD is the same
  * rank pick over it. Lower-median (rank ⌈n/2⌉) convention keeps every
  * statistic an exact integer of the input's unit — engine-deterministic
  * at any scale. */
object Robust {

  /** Per-group (group, __n, med, mad, n_outliers) where n_outliers counts
    * histogram mass beyond `madFactor`·MAD from the median. Callers rename
    * and scale for their output contract. */
  def madOutliers(hist: DataFrame, groupCol: String, valueCol: String,
                  madFactor: Int = 3): DataFrame = {
    val tot = hist.groupBy(groupCol).agg(sum(col("hn")).as("__n"))
    def lowerMedian(h: DataFrame, vCol: String, outCol: String): DataFrame = {
      val cum = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum", sum(col("hn")).over(cum))
        .join(tot, groupCol)
        .groupBy(groupCol)
        .agg(min(when(col("cum") >= expr("(__n + 1) div 2"), col(vCol))).as(outCol))
    }
    val med = lowerMedian(hist, valueCol, "med")
    val dev = hist.join(med, groupCol)
      .groupBy(col(groupCol), abs(col(valueCol) - col("med")).as("dev"))
      .agg(sum(col("hn")).as("hn"))
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(mad, groupCol).join(med, groupCol).join(tot, groupCol)
      .groupBy(col(groupCol), col("__n"), col("med"), col("mad"))
      .agg(coalesce(sum(when(col("dev") > lit(madFactor) * col("mad"), col("hn"))),
        lit(0L)).as("n_outliers"))
  }
}

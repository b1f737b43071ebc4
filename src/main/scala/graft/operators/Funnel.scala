package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized N-stage conversion funnel (SURVEY §2.4): the library form
  * of the event-analytics rollup the fixture queries instantiate at three
  * stages. STRICT chain semantics — stage k's entry is the user's first
  * `stages(k)` event STRICTLY AFTER their stage-(k−1) entry, so an event
  * arriving before the chain reached its predecessor does not convert
  * (the first-event relaxation for bounded streaming state lives in
  * [[graft.streaming.FunnelStream]]; on stage-ordered histories the two
  * agree).
  *
  * Scale shape: one pruned event scan + one user-keyed min-ts aggregate
  * per stage, each joined to the previous stage's USER-sized frame on the
  * same key; frames shrink monotonically down the chain and the final
  * assembly is k−1 left joins of user-sized frames. Nothing wider than
  * one row per qualifying user ever shuffles, whatever k is.
  */
object Funnel {

  /** Per-user strict stage-entry timestamps for `stages` (event-type
    * values, in funnel order): one row per user who entered stage 1, with
    * `t_<stage>` columns null from the first stage the user never reached.
    * `anchor` optionally injects a precomputed first-stage frame (must be
    * `(idCol, t_<stages.head>)` — the session-cache layering hook). */
  def stageEntryTimes(events: DataFrame, idCol: String, typeCol: String,
                      tsCol: String, stages: Seq[String],
                      anchor: Option[DataFrame] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"funnel stages must be distinct: $stages")
    require(stages.forall(_.matches("[A-Za-z0-9_-]+")),
      s"stage names must be plain identifiers (they name columns and ride " +
        s"a stack() literal): $stages")
    val first = anchor.getOrElse(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(idCol)).agg(min(col(tsCol)).as(s"t_${stages.head}")))
    val perStage = stages.sliding(2).foldLeft(List(first)) {
      case (acc, Seq(prev, cur)) =>
        val f = events.filter(col(typeCol) === cur)
          .join(acc.head.select(col(idCol), col(s"t_$prev")), idCol)
          .filter(col(tsCol) > col(s"t_$prev"))
          .groupBy(col(idCol)).agg(min(col(tsCol)).as(s"t_$cur"))
        f :: acc
      case (acc, _) => acc // single-stage window (sliding yields nothing)
    }.reverse
    perStage.reduceLeft((a, b) => a.join(b, Seq(idCol), "left"))
  }

  /** Type-1 p50/p90/integer-mean over a `lag_sec` column (integer
    * seconds), by the domain-histogram pattern shared across the engine's
    * exact-quantile paths: lags collapse to a (lag_sec, n) histogram —
    * map-side combined, bounded by DISTINCT lag values (≤ the log's time
    * span in seconds, corpus-size-INDEPENDENT) — and the quantile at rank
    * r is `min{lag : cum(lag) ≥ r}` by cumulative sum over that domain
    * frame. The only global sort is the window over the histogram; no
    * data-sized frame is ever single-partition-sorted (a row_number over
    * the converters would put 10⁸–10⁹ rows through one task at 100 TB).
    * Ranks use INTEGER arithmetic (`(p‰·n + 999) div 1000`) so any
    * oracle picks the same element. Empty input → zero rows. */
  def lagQuantiles(lag: DataFrame): DataFrame = {
    val hist = lag.groupBy(col("lag_sec")).agg(count(lit(1)).as("hn"))
    val tot = broadcast(hist.agg(sum(col("hn")).as("__n"),
      sum(col("lag_sec") * col("hn")).as("__sum")))
    val cum = Window.orderBy(col("lag_sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("hn")).over(cum))
      .crossJoin(tot)
      .groupBy(col("__n"), col("__sum"))
      .agg(
        min(when(col("cum") >= expr("(500 * __n + 999) div 1000"), col("lag_sec")))
          .as("p50_sec"),
        min(when(col("cum") >= expr("(900 * __n + 999) div 1000"), col("lag_sec")))
          .as("p90_sec"))
      .select(col("__n").as("n_converters"), col("p50_sec"), col("p90_sec"),
        expr("__sum div greatest(__n, 1L)").as("mean_sec"))
  }

  /** Roll a [[stageEntryTimes]] frame up to the funnel report: one row per
    * stage with reach (`t_<stage>` non-null count) and permille vs stage 1
    * — the fixture queries' output shape, at any k. One 1-row aggregate +
    * `stack` unpivot; a dry stage reports 0. */
  def report(stageFrame: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val counts = stages.zipWithIndex.map { case (st, i) =>
      count(col(s"t_$st")).as(s"__n$i")
    }
    val cells = stages.zipWithIndex
      .map { case (st, i) => s"${i + 1}L, '$st', __n$i" }
      .mkString(", ")
    stageFrame.agg(counts.head, counts.tail: _*)
      .select(
        expr(s"stack(${stages.length}, $cells) AS (stage_idx, stage, n_users)"),
        col("__n0").as("__top"))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        expr("n_users * 1000 div greatest(__top, 1L)").as("conv_permille"))
      .transform(graft.Tables.orderedReport(_, "stage_idx"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators (SURVEY §2.5): the steps between an
  * irregular event log and the daily grid a downstream model/report reads.
  * Reference analog: none (the reference replicates rows; any time-series
  * shaping happens in its consumers) — [EXT] surface, but the first thing a
  * warehouse consumer builds on a CDC-landed event table.
  */
object TimeSeries {

  /** Per-key per-day last observation, re-gridded onto each key's full
    * [first-day, last-day] calendar span with missing days carried forward
    * (LOCF). Output: (key, day, value, observed) — `observed` marks real
    * vs filled days; the first day of every key's span is observed by
    * construction, so no value is ever null.
    *
    * `tiebreak` makes the per-day winner deterministic when two
    * observations share `ts`. `value` should be pre-rounded by the caller
    * if an oracle will compare it.
    *
    * Scale shape: per-(key, day) last value is one ranking window; the
    * span is a per-key 2-row aggregate exploded through `sequence()`
    * (array-of-days, calendar-bounded, never data-sized); the fill is a
    * running last-non-null over a PER-KEY window. Everything partitions by
    * key — the output is keys × span-days, the materialization the
    * operator exists to produce, and no global sort or driver loop appears
    * anywhere. */
  def gapFillDaily(obs: DataFrame, key: String, ts: String,
                   value: String, tiebreak: String): DataFrame = {
    val daily = dailyWinners(obs, key, ts, value, tiebreak)
    val wFill = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendarSpan(daily, key).join(daily, Seq(key, "day"), "left")
      .withColumn("value", last(col("__v"), ignoreNulls = true).over(wFill))
      .select(col(key), col("day"), col("value"), col("__v").isNotNull.as("observed"))
  }

  /** Per-(key, day) last observation — the shared re-grid input of
    * [[gapFillDaily]] and [[interpolateDaily]]. */
  private def dailyWinners(obs: DataFrame, key: String, ts: String,
                           value: String, tiebreak: String): DataFrame = {
    val p = obs.select(col(key), to_date(col(ts)).as("day"), col(ts),
      col(tiebreak), col(value).as("__v"))
    val wDay = Window.partitionBy(col(key), col("day"))
      .orderBy(col(ts).desc, col(tiebreak).desc)
    p.withColumn("__rn", row_number().over(wDay))
      .filter(col("__rn") === 1).select(col(key), col("day"), col("__v"))
  }

  /** Each key's full [first-day, last-day] calendar span (one row per
    * (key, day); calendar-bounded explode, never data-sized). */
  private def calendarSpan(daily: DataFrame, key: String): DataFrame =
    daily.groupBy(col(key))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"))).as("day"))

  /** [[gapFillDaily]]'s straight-line sibling: missing days take the
    * LINEAR interpolation between the surrounding observations,
    * v = vp + (vn − vp)·(d − dp)/(dn − dp), instead of carrying the last
    * value flat. Span ends are observed by construction, so every filled
    * day has both neighbours.
    *
    * Determinism: vp/vn are caller-rounded; the interpolation is ONE fixed
    * sequence of IEEE ops ((d−dp)/(dn−dp) division first, then multiply,
    * then add) on identical operands in both engines — no aggregation
    * order anywhere — so the pre-round double is bit-identical (rounded
    * through [[graft.Tables.rnd4]] for the oracle hash).
    *
    * Scale shape: identical to [[gapFillDaily]] — everything partitions by
    * key; the neighbour lookups are two per-key running windows
    * (last/first ignoreNulls), not joins. */
  def interpolateDaily(obs: DataFrame, key: String, ts: String,
                       value: String, tiebreak: String): DataFrame = {
    val daily = dailyWinners(obs, key, ts, value, tiebreak)
    val wPrev = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("__v").isNotNull, col("day"))
    val frac = datediff(col("day"), col("__dp")).cast("double") /
      datediff(col("__dn"), col("__dp")).cast("double")
    calendarSpan(daily, key).join(daily, Seq(key, "day"), "left")
      .withColumn("__vp", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__dp", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("__vn", first(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__dn", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn("value",
        when(col("__v").isNotNull, col("__v"))
          .otherwise(col("__vp") + (col("__vn") - col("__vp")) * frac))
      .select(col(key), col("day"), graft.Tables.rnd4(col("value")).as("value"),
        col("__v").isNotNull.as("observed"))
  }
}

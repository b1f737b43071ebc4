package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same key and
  * `rightTs ≤ leftTs` — "state as of time T", the relational form of the
  * reference's reconciliation-at-a-point-in-time semantics
  * (`compareDocumentsInTimeWindow`, mongodb-cdc-program.js:478–538), and the
  * one join flavour SURVEY §2.3 flags as genuinely missing from Spark's menu.
  *
  * Scale shape: tag both sides, union, ONE ranking window per key ordered by
  * `(ts, side, tiebreak)` carrying the right payload forward with
  * `last(_, ignoreNulls)` — a single shuffle on the key, linear state, no
  * range cross-join and no per-row point lookups (the reference's N+1 loop,
  * js:503–505). Ties: right rows at the same timestamp sort before left rows
  * (≤ semantics); equal-timestamp right rows resolve by the tiebreak column,
  * greatest wins.
  *
  * Constraint: `rightCols` values must be non-null in right rows — the
  * carry-forward uses `last(_, ignoreNulls = true)` per column, so a null
  * payload cell would be filled from an OLDER right row than its siblings
  * (the columns would no longer come from one row). Wrap nullable payloads
  * in a struct column if that matters. */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightTiebreak: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val lPadded = rightCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(rightTiebreak).cast("long"))
    val rPadded = leftCols.foldLeft(
      rightCols.foldLeft(r)((df, c) => df.withColumn(s"__r_$c", col(c))))(
      (df, c) => if (rightCols.contains(c) || c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lPadded.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lPadded.unionByName(rPadded)) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** NEAREST-in-time as-of join: for each left row, the right row with the
    * same key minimizing |rightTs − leftTs| within `toleranceSec`, ties
    * between directions resolved BACKWARD (the market-data "nearest"
    * flavour; plain as-of only looks back). No match inside the tolerance
    * → null payload.
    *
    * Scale shape: the nearest backward candidate is the latest right
    * ≤ leftTs and the nearest forward candidate the earliest right
    * ≥ leftTs, so BOTH come from [[asOfJoin]]'s union-and-carry trick —
    * one ascending and one descending ranking window over the SAME key
    * partitioning: one shuffle, two sorts, linear state; never a
    * range-join fan-out. The right payload rides ONE struct per direction,
    * so every output column comes from the same right row (no per-column
    * carry skew). Equal-timestamp right rows resolve by the tiebreak
    * column, greatest wins, both directions. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, rightTiebreak: String,
                  rightCols: Seq[String], toleranceSec: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val r0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(rightTiebreak).cast("long"))
      .withColumn("__p", struct(
        col(rightTs).as("__pts") +: rightCols.map(c => col(c).as(c)): _*))
    val pType = r0.schema("__p").dataType
    val l0 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__p", lit(null).cast(pType))
    val r1 = leftCols.foldLeft(r0)((df, c) =>
      if (c == key) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l0.columns.toIndexedSeq.map(col): _*)
    // ascending pass carries the latest right ≤ ts; descending pass the
    // earliest right ≥ ts. Right rows (side 0) sort before left rows at
    // equal ts in BOTH passes, so an exact-ts match is seen by each.
    val wb = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l0.unionByName(r1)
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(wf))
    val db = unix_timestamp(col("__ts")) - unix_timestamp(col("__b.__pts"))
    val dfw = unix_timestamp(col("__f.__pts")) - unix_timestamp(col("__ts"))
    val backOk = col("__b").isNotNull && db <= toleranceSec
    val fwdOk = col("__f").isNotNull && dfw <= toleranceSec
    val useBack = backOk && (!fwdOk || db <= dfw)
    val chosen = when(useBack, col("__b")).when(fwdOk, col("__f"))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        Seq(when(useBack, "backward").when(fwdOk, "forward").as("nearest_dir"),
          when(useBack, db).when(fwdOk, dfw).as("nearest_delta_s")) ++
        rightCols.map(c => chosen.getField(c).as(s"nearest_$c")): _*)
  }
}

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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconciliation (source-vs-target diff) operators.
  *
  * The reference's `findDifferences` (`mongodb-cdc-program.js:457–475`) aligns
  * two documents on the union of their field names, skips `_id` (js:463), and
  * classifies each field as missing-in-source / missing-in-target /
  * value-mismatch (canonical compare via `JSON.stringify`, js:469). Its
  * `compareDocuments` wrapper also reports whole-document existence flags
  * (js:409–432). The reference does this one document at a time over an N+1
  * `findOne` loop (js:503–505); here the loop collapses into ONE full-outer
  * hash join keyed by `_id`, and the per-field alignment into a static
  * column list (schemas are fixed — SURVEY.md §1.2; absent ≡ null).
  *
  * Values are compared through caller-supplied canonical string encodings
  * (e.g. integer-cents for monetary doubles) so the same comparison is
  * expressible in ANSI SQL for the DuckDB oracle — floats never compare as
  * locale/engine-formatted strings.
  */
object Reconcile {

  /** One comparable field: output name + canonical string encoder. */
  final case class FieldEnc(name: String, enc: Column => Column)

  /** Plain string/int field encoder. */
  def plain(name: String): FieldEnc = FieldEnc(name, c => c.cast("string"))

  /** Monetary double → integer cents → string (exact on 2-decimal data). */
  def cents(name: String): FieldEnc =
    FieldEnc(name, c => round(c * 100, 0).cast("long").cast("string"))

  /** Table-scale `findDifferences`: full-outer join on `key`, then one diff
    * row per differing field, plus a `_doc_` row per one-sided key.
    * Output: (key, field, diff_type, src_val, tgt_val).
    * Single shuffle on `key`; the per-field compare is a union of projections
    * over the joined result (Catalyst reuses the join subplan). */
  def fieldDiff(src: DataFrame, tgt: DataFrame, key: String, fields: Seq[FieldEnc]): DataFrame = {
    val s = src.select(col(key).as("__sk") +: fields.map(f => f.enc(col(f.name)).as(s"s_${f.name}")): _*)
    val t = tgt.select(col(key).as("__tk") +: fields.map(f => f.enc(col(f.name)).as(s"t_${f.name}")): _*)
    val jCols =
      Seq(
        coalesce(col("__sk"), col("__tk")).as(key),
        col("__sk").isNotNull.as("in_s"),
        col("__tk").isNotNull.as("in_t")) ++
        fields.map(f => col(s"s_${f.name}")) ++ fields.map(f => col(s"t_${f.name}"))
    val j = s.join(t, col("__sk") === col("__tk"), "full_outer").select(jCols: _*)

    val missing = j
      .filter(!col("in_s") || !col("in_t"))
      .select(
        col(key),
        lit("_doc_").as("field"),
        when(col("in_s"), "missing_in_target").otherwise("missing_in_source").as("diff_type"),
        lit(null).cast("string").as("src_val"),
        lit(null).cast("string").as("tgt_val"))

    val mismatches = fields.map { f =>
      j.filter(col("in_s") && col("in_t"))
        .filter(!(col(s"s_${f.name}") <=> col(s"t_${f.name}")))
        .select(
          col(key),
          lit(f.name).as("field"),
          lit("value_mismatch").as("diff_type"),
          col(s"s_${f.name}").as("src_val"),
          col(s"t_${f.name}").as("tgt_val"))
    }

    mismatches.foldLeft(missing)(_ unionByName _)
  }

  /** `{totalDocumentsCompared, documentsWithDifferences}` (js:520–525):
    * keys present on either side, and keys with ≥ 1 diff row. */
  def diffSummary(src: DataFrame, tgt: DataFrame, key: String, fields: Seq[FieldEnc]): DataFrame = {
    val allKeys = src.select(col(key)).union(tgt.select(col(key))).distinct()
    val diffKeys = fieldDiff(src, tgt, key, fields).select(col(key)).distinct()
    allKeys
      .join(diffKeys.withColumn("__d", lit(1)), Seq(key), "left_outer")
      .agg(
        count(lit(1)).as("total_compared"),
        sum(when(col("__d").isNotNull, 1L).otherwise(0L)).as("with_differences"))
  }

  /** Per-key existence flags source-vs-target (js:409–432, 503–516):
    * full-outer join of the two key sets. */
  def existence(src: DataFrame, tgt: DataFrame, key: String): DataFrame = {
    val s = src.select(col(key).as("__sk")).distinct()
    val t = tgt.select(col(key).as("__tk")).distinct()
    s.join(t, col("__sk") === col("__tk"), "full_outer")
      .select(
        coalesce(col("__sk"), col("__tk")).as(key),
        col("__sk").isNotNull.as("in_source"),
        col("__tk").isNotNull.as("in_target"))
  }

  /** Deterministic synthetic "target" replica of `customer` with planted
    * drift, used by the reconciliation queries and their oracles: rows
    * missing from the target (`%13 = 3`), drifted balances (`%7 = 2`),
    * altered segments (`%11 = 3`), and extra target-only rows (`%17 = 5`,
    * re-keyed +1,000,000). Mirrors the SQL in SparkEntry exactly. */
  def driftedCustomer(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    customer
      .filter(k % 13 =!= 3)
      .withColumn("c_acctbal", when(k % 7 === 2, col("c_acctbal") + 100).otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment", when(k % 11 === 3, lit("ALTERED")).otherwise(col("c_mktsegment")))
      .unionByName(
        customer.filter(k % 17 === 5).withColumn("c_custkey", k + 1000000L))
  }

  /** The four comparable customer fields (skip the key — js:463). */
  val customerFields: Seq[FieldEnc] =
    Seq(plain("c_name"), plain("c_nationkey"), cents("c_acctbal"), plain("c_mktsegment"))
}

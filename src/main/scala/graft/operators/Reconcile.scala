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
  *
  * Scale note: every operator here costs exactly ONE shuffle (the join on
  * `key`). The per-field diff is built as an `array(struct(...))` in a single
  * projection over the joined row and then exploded — NOT as a union of K
  * filtered re-reads of the join, which would re-execute the join per field.
  */
object Reconcile {

  /** One comparable field: output name + canonical string encoder. */
  final case class FieldEnc(name: String, enc: Column => Column)

  /** Plain string/int field encoder. */
  def plain(name: String): FieldEnc = FieldEnc(name, c => c.cast("string"))

  /** Monetary double → integer cents → string (exact on 2-decimal data). */
  def cents(name: String): FieldEnc =
    FieldEnc(name, c => round(c * 100, 0).cast("long").cast("string"))

  /** Full-outer join of canonically-encoded sides; one row per key with
    * existence flags and `s_<f>` / `t_<f>` encoded field pairs. Shared
    * backbone of [[fieldDiff]] and [[diffSummary]]: one scan per side, one
    * shuffle total. Keys are assumed unique per side (document `_id`
    * semantics, js:170). */
  private def joined(src: DataFrame, tgt: DataFrame, key: String, fields: Seq[FieldEnc]): DataFrame = {
    val s = src.select(col(key).as("__sk") +: fields.map(f => f.enc(col(f.name)).as(s"s_${f.name}")): _*)
    val t = tgt.select(col(key).as("__tk") +: fields.map(f => f.enc(col(f.name)).as(s"t_${f.name}")): _*)
    s.join(t, col("__sk") === col("__tk"), "full_outer")
      .select(
        Seq(
          coalesce(col("__sk"), col("__tk")).as(key),
          col("__sk").isNotNull.as("in_s"),
          col("__tk").isNotNull.as("in_t")) ++
          fields.map(f => col(s"s_${f.name}")) ++ fields.map(f => col(s"t_${f.name}")): _*)
  }

  /** True iff the joined row differs: one-sided, or ≥1 field mismatch. */
  private def rowHasDiff(fields: Seq[FieldEnc]): Column =
    fields
      .map(f => !(col(s"s_${f.name}") <=> col(s"t_${f.name}")))
      .foldLeft(!col("in_s") || !col("in_t"))(_ || _)

  /** Table-scale `findDifferences`: one diff row per differing field, plus a
    * `_doc_` row per one-sided key.
    * Output: (key, field, diff_type, src_val, tgt_val).
    * Plan: the single [[joined]] pass, an `array(struct)` of per-field diffs
    * built in one projection, `filter` on the array, one `explode`. */
  def fieldDiff(src: DataFrame, tgt: DataFrame, key: String, fields: Seq[FieldEnc]): DataFrame = {
    val nullV = lit(null).cast("string")
    val docRow = struct(
      lit("_doc_").as("field"),
      when(col("in_s"), "missing_in_target").otherwise("missing_in_source").as("diff_type"),
      nullV.as("src_val"), nullV.as("tgt_val"))
    val fieldRows = fields.map { f =>
      struct(
        lit(f.name).as("field"), lit("value_mismatch").as("diff_type"),
        col(s"s_${f.name}").as("src_val"), col(s"t_${f.name}").as("tgt_val"))
    }
    val diffs = when(!col("in_s") || !col("in_t"), array(docRow))
      .otherwise(filter(array(fieldRows: _*), d => !(d("src_val") <=> d("tgt_val"))))
    joined(src, tgt, key, fields)
      .select(col(key), explode(diffs).as("__d"))
      .select(col(key), col("__d.field"), col("__d.diff_type"), col("__d.src_val"), col("__d.tgt_val"))
  }

  /** `{totalDocumentsCompared, documentsWithDifferences}` (js:520–525) as a
    * single conditional aggregate over the [[joined]] pass — the full-outer
    * join already yields exactly one row per key on either side. */
  def diffSummary(src: DataFrame, tgt: DataFrame, key: String, fields: Seq[FieldEnc]): DataFrame =
    joined(src, tgt, key, fields)
      .agg(
        count(lit(1)).as("total_compared"),
        sum(when(rowHasDiff(fields), 1L).otherwise(0L)).as("with_differences"))

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
    * re-keyed +1,000,000). Mirrors `ReconcileQueries.driftedSql` exactly. */
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

  /** One integer-encoded field for aggregate fingerprinting: the encoding
    * must be EXACT integers (cents, lengths, plain ints) so per-bucket
    * sums are engine- and order-independent. */
  final case class IntEnc(name: String, enc: Column => Column)

  def intPlain(name: String): IntEnc = IntEnc(name, _.cast("long"))
  def intCents(name: String): IntEnc =
    IntEnc(name, c => round(c * 100, 0).cast("long"))
  def intLen(name: String): IntEnc = IntEnc(name, c => length(c).cast("long"))

  /** Modulus for the key-weighted cross term: 2³¹ − 1 keeps every per-row
    * term in [0, 2³¹) and every (key mod M)·(enc mod M) product within
    * long range before its reduction. */
  final val ChecksumMod = 2147483647L

  /** Bucketized aggregate-FINGERPRINT reconciliation — the comparison a
    * 100 TB CDC pipeline actually runs where the full-outer row diff
    * ([[fieldDiff]]) is too expensive to run blind: hash both tables into
    * `buckets` key-buckets, reduce each bucket to exact integer
    * fingerprints (row count, Σ key, Σ each encoded field, and a
    * key-WEIGHTED cross term Σ ((key mod M)·(enc mod M) mod M) that
    * catches same-sum value swaps between rows), and compare per bucket.
    * Dirty buckets then scope the expensive row-level diff to the keys
    * that can possibly differ — the two-tier shape of production
    * consistency checkers.
    *
    * Scale shape: each side is ONE map-side-combined aggregate to
    * `buckets` rows (nothing else moves — vs the full-outer diff
    * shuffling both tables in their entirety); the compare is a
    * buckets-sized join. Sums ride decimal(38,0), exact past 10¹² rows of
    * 2³¹-bounded terms; every per-row term is integer arithmetic both
    * engines evaluate identically (no hash function needed — the oracle
    * replays the same polynomial).
    *
    * Output per bucket: row counts, per-component match booleans, and
    * `bucket_clean` (the scoping predicate). */
  def bucketChecksum(src: DataFrame, tgt: DataFrame, key: String,
                     fields: Seq[IntEnc], buckets: Int): DataFrame = {
    val M = ChecksumMod
    def dec(c: Column) = c.cast("decimal(38,0)")
    def fingerprints(df: DataFrame, tag: String): DataFrame = {
      val k = col(key).cast("long")
      val cross = fields.foldLeft(lit(0L)) { (acc, f) =>
        val term = (((k % M) * (f.enc(col(f.name)) % M)) % M + M) % M
        acc + term // ≤ fields·M per row: far inside long range
      }
      val aggs = count(lit(1)).as(s"n_$tag") +:
        sum(dec(k)).as(s"key_$tag") +:
        sum(dec(cross)).as(s"cross_$tag") +:
        fields.map(f => sum(dec(f.enc(col(f.name)))).as(s"${f.name}_$tag"))
      df.groupBy(pmod(k, lit(buckets.toLong)).as("bucket"))
        .agg(aggs.head, aggs.tail: _*)
    }
    val s = fingerprints(src, "src")
    val t = fingerprints(tgt, "tgt")
    val matchDefs: Seq[(String, Column)] =
      ("key_match", col("key_src") <=> col("key_tgt")) +:
        ("cross_match", col("cross_src") <=> col("cross_tgt")) +:
        fields.map(f =>
          (s"${f.name}_match", col(s"${f.name}_src") <=> col(s"${f.name}_tgt")))
    val clean = ((col("n_src") <=> col("n_tgt")) +: matchDefs.map(_._2)).reduce(_ && _)
    s.join(t, Seq("bucket"), "full_outer")
      .select((col("bucket") +:
        coalesce(col("n_src"), lit(0L)).as("n_src") +:
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt") +:
        matchDefs.map { case (n, c) => c.as(n) }) :+ clean.as("bucket_clean"): _*)
      .transform(graft.Tables.orderedReport(_, "bucket"))
  }
}

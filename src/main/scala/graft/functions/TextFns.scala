package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY §2.8). All pure column expressions — codegen-friendly, no UDFs —
  * so filters and projections stay inside whole-stage codegen at 100 TB.
  */
object TextFns {

  /** Whitespace tokenization — the reference corpus is space-separated. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (for Jaccard / stopword scoring). */
  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Distinct n-word shingles ("n-grams of words"), the standard MinHash
    * input unit. Guarded for texts shorter than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val grams = transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Distinct n-word shingles as int64 hashes — hash-of-token-tuple, no
    * string materialization (the concat form spends its time building and
    * de-duplicating shingle strings; identity-by-hash is equivalent for
    * set-similarity counts, within-set collision ≈ |set|²/2⁶⁵). Compiled
    * ([[HashedShingles]]); [[hashedShinglesRef]] keeps the declarative
    * reference semantics. */
  def hashedShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedShingles(org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** ALL n-shingle hashes in token order (index = position, in-doc repeats
    * kept) — the positional substring-dedup input shape; same compiled
    * one-scan expression as [[hashedShingles]] minus the distinct. */
  def hashedShinglesAll(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      HashedShingles(org.apache.spark.sql.GraftColumnBridge.expression(text), n,
        distinct = false))

  /** Reference (interpreted higher-order) form of [[hashedShingles]] — the
    * spec the compiled expression is property-tested against. */
  def hashedShinglesRef(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val grams = transform(idx, i => xxhash64((0 until n).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<bigint>")))
  }

  /** Tokens-in-set count, e.g. stopword hits. Pure expression (no join). */
  def hitCount(tokensCol: Column, set: Seq[String]): Column =
    size(filter(tokensCol, t => t.isin(set.map(lit): _*)))

  /** Codegen'd tokens-in-set count straight off the text column — same
    * semantics as `hitCount(tokens(text), set)` (see [[TokenSetCount]]). */
  def tokenSetCount(text: Column, set: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TokenSetCount(org.apache.spark.sql.GraftColumnBridge.expression(text), set))

  /** Codegen'd char-count moments `struct(n, k, s)` for the entropy gate
    * (see [[CharEntropyMoments]]) — row-local, no char explode. */
  def charEntropyMoments(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharEntropyMoments(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** All sets counted in ONE text scan (`array<long>` in `sets` order) —
    * per-element semantics identical to [[tokenSetCount]] of that set
    * (see [[MultiTokenSetCount]]). */
  def multiTokenSetCount(text: Column, sets: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MultiTokenSetCount(org.apache.spark.sql.GraftColumnBridge.expression(text), sets))

  /** Tiny per-language stopword tables for the n-gram/stopword language-ID
    * heuristic. Public-knowledge closed-class words; deliberately small —
    * language ID at corpus scale is a ratio over these sets, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Languages in a fixed tie-break order (argmax is deterministic). */
  val langOrder: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  /** English-stopword hit ratio of the token stream. */
  def stopRatio(text: Column): Column =
    tokenSetCount(text, stopwords("en")).cast("double") / size(tokens(text)).cast("double")

  /** Type-token ratio (distinct / total tokens) — repetition proxy. */
  def typeTokenRatio(text: Column): Column =
    size(distinctTokens(text)).cast("double") / size(tokens(text)).cast("double")

  /** Length saturation: token count against a 100-token knee, capped at 1. */
  def lenSaturation(text: Column): Column =
    least(lit(1.0), size(tokens(text)).cast("double") / 100.0)

  /** Composite document quality score (UNROUNDED): fixed weights over
    * [[stopRatio]] / [[typeTokenRatio]] / [[lenSaturation]] in a fixed
    * double op order, so the oracle engine reproduces it bit-for-bit and a
    * threshold filter on the rounded value is deterministic across engines. */
  def qualityScore(text: Column): Column =
    stopRatio(text) * 0.4 + typeTokenRatio(text) * 0.3 + lenSaturation(text) * 0.3

  /** Oracle-side (DuckDB) twin of [[bpeEstimate]] — ONE definition for the
    * three oracle queries that embed it, so the estimate can never drift
    * engine-by-engine (the rnd4/rnd4Sql pairing convention). */
  def bpeEstimateSql(textExpr: String): String =
    s"CAST(list_sum(list_transform(string_split($textExpr, ' '), " +
      "t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT)"

  /** BPE-ish subword count estimate: ceil(len/4) pieces per word — the
    * ~4-chars-per-token rule of thumb, as ONE codegen'd scan of the string
    * ([[BpeCount]]; value-identical to [[bpeEstimateRef]], pinned by
    * TrainPrepSpec). */
  def bpeEstimate(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeCount(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Exact BPE piece count under a caller-supplied ranked merge table
    * ([[BpeMergeCount]] — the real greedy-merge algorithm; load a
    * tokenizer's merges.txt to get production counts). Curried to slot
    * straight into the `tokenCount` parameter of the packing/quantile
    * operators: `packWindows(..., tokenCount = bpeMergeCount(merges))`.
    * Not ANSI-SQL-expressible, so plans built on it are spec-pinned
    * rather than oracle-gated (and there is no SQL-registry form: a
    * ranked merge table has no literal-argument encoding worth having). */
  def bpeMergeCount(merges: Seq[(String, String)])(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeMergeCount(org.apache.spark.sql.GraftColumnBridge.expression(text), merges))

  /** Exact BPE ENCODING under a caller-supplied ranked merge table
    * ([[BpeEncode]]): text → array<long> of token ids in piece order,
    * under the [[BpeMerge.idMap]] derived-vocab scheme. The id-sequence
    * form is what a training loader actually consumes; [[bpeMergeCount]]
    * is its length. Same curried shape and same no-SQL-registry rationale
    * as the count. */
  def bpeEncode(merges: Seq[(String, String)])(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BpeEncode(org.apache.spark.sql.GraftColumnBridge.expression(text), merges))

  /** 64-bit SimHash fingerprint of the text's distinct whitespace tokens —
    * one codegen'd row-local pass ([[SimHash64]]; bit-identical to the
    * vote-Aggregator form [[graft.operators.Dedup.simhashRef]], pinned by
    * DedupSpec). */
  def simhash64(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      SimHash64(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Σc² over whitespace-token frequencies — one codegen'd row-local pass
    * ([[TokenSqFreqSum]]); the exact integer moment behind Simpson
    * diversity and effective vocabulary. */
  def tokenSqFreqSum(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      TokenSqFreqSum(org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** The declarative higher-order form of [[bpeEstimate]] — kept (test-only)
    * as the semantic pin for the codegen'd expression: it materializes the
    * token array and walks an interpreted lambda per token. */
  private[graft] def bpeEstimateRef(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
}

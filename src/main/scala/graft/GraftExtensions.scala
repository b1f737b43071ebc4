package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, And, Cast, CreateMap, Expression, ExpressionInfo, GreaterThanOrEqual, If, LessThanOrEqual, Literal, Multiply, Pmod, RaiseError}
import org.apache.spark.sql.types.LongType

import graft.functions.{BpeCount, FloatDot, HashedShingles, MultiTokenSetCount, RollingHash, SimHash64, SrpBandKeys, TokenSetCount}

/** SQL surface for the library's codegen'd expressions. Two entry points:
  *
  *  - session build:  `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - existing session: `GraftExtensions.registerAll(spark)`
  *
  * Registered functions:
  *  - `float_dot(array<float>, array<float>) → double`
  *  - `rolling_hash(string[, mult, mod]) → bigint`
  *  - `hashed_shingles(string, n[, distinct]) → array<bigint>` (distinct=false
  *    keeps every occurrence in token order — the substring-dedup shape)
  *  - `srp_band_keys(array<float>, bands, bitsPerBand) → array<bigint>`
  *  - `bpe_count(string) → bigint`
  *  - `simhash64(string) → bigint` (64-bit distinct-token SimHash)
  *  - `token_set_count(string, array<string> literal) → bigint` (tokens ∈ set)
  *  - `lang_hits(string) → array<bigint>` (per-language stopword hit counts
  *    in `TextFns.langOrder` order, ONE text scan)
  *  - `token_sq_freq_sum(string) → bigint` (Σc² over token counts — the
  *    Simpson-diversity kernel, one scan, no explode)
  *  - `sample_bucket(id) → bigint` (deterministic [0,1000) sampling bucket)
  *  - `split_bucket(id) → bigint` (deterministic [0,1000) holdout bucket,
  *    independent multiplier — see [[graft.operators.TrainPrep.splitBucket]])
  *  - `shuffle_key(id) → bigint` (deterministic training-order shuffle key)
  *  - `mix_bucket(id) → bigint` (deterministic [0,1000) mixture-repeat bucket)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}

object GraftExtensions {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }

  private def stringSeqLit(e: Expression, what: String): Seq[String] = e match {
    // array('a', 'b', ...) arrives as CreateArray before constant folding
    case org.apache.spark.sql.catalyst.expressions.CreateArray(children, _) =>
      children.map {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$what must be string literals, got $other")
      }
    case Literal(data: org.apache.spark.sql.catalyst.util.ArrayData, _) =>
      data.toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$what must be an array literal, got $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> { args: Seq[Expression] =>
      require(args.length == 2, "float_dot(a, b)")
      FloatDot(args(0), args(1))
    },
    "rolling_hash" -> { args: Seq[Expression] =>
      args match {
        case Seq(s) => RollingHash(s, 31L, 1000000007L)
        case Seq(s, m, p) => RollingHash(s, longLit(m, "mult"), longLit(p, "mod"))
        case _ => throw new IllegalArgumentException("rolling_hash(s[, mult, mod])")
      }
    },
    "hashed_shingles" -> { args: Seq[Expression] =>
      args match {
        case Seq(t, n) => HashedShingles(t, longLit(n, "n").toInt)
        // 3-arg form: distinct=false keeps every occurrence in token order
        // (index = position) — the substring-dedup input shape
        case Seq(t, n, Literal(d: Boolean, _)) =>
          HashedShingles(t, longLit(n, "n").toInt, distinct = d)
        case _ => throw new IllegalArgumentException(
          "hashed_shingles(text, n[, distinct])")
      }
    },
    "srp_band_keys" -> { args: Seq[Expression] =>
      require(args.length == 3, "srp_band_keys(emb, bands, bitsPerBand)")
      SrpBandKeys(args(0), longLit(args(1), "bands").toInt, longLit(args(2), "bitsPerBand").toInt)
    },
    "bpe_count" -> { args: Seq[Expression] =>
      require(args.length == 1, "bpe_count(text)")
      BpeCount(args(0))
    },
    "simhash64" -> { args: Seq[Expression] =>
      require(args.length == 1, "simhash64(text)")
      SimHash64(args(0))
    },
    "token_set_count" -> { args: Seq[Expression] =>
      require(args.length == 2, "token_set_count(text, array('w', ...))")
      TokenSetCount(args(0), stringSeqLit(args(1), "token_set_count words"))
    },
    "lang_hits" -> { args: Seq[Expression] =>
      require(args.length == 1, "lang_hits(text)")
      MultiTokenSetCount(args(0),
        graft.functions.TextFns.langOrder.map(graft.functions.TextFns.stopwords))
    },
    "token_sq_freq_sum" -> { args: Seq[Expression] =>
      require(args.length == 1, "token_sq_freq_sum(text)")
      graft.functions.TokenSqFreqSum(args(0))
    },
    // composites of built-in expressions (not codegen'd classes): the same
    // guarded pmod(id·mult + inc, m) tree the TrainPrep bucket helpers build
    // through the Column API — ExtensionsSpec pins the two surfaces
    // value-equal in-domain and both faulting out-of-domain. The leading
    // cast pins the documented bigint result for any integral input (a
    // fractional id is a caller bug); ids past the overflow-safe bound raise
    // instead of silently wrapping the 64-bit product.
    "sample_bucket" -> guardedMulHash("sample_bucket", 2654435761L, 40503L, 1000L),
    "split_bucket" -> guardedMulHash("split_bucket",
      graft.operators.TrainPrep.SplitMult, graft.operators.TrainPrep.SplitInc, 1000L),
    "mix_bucket" -> guardedMulHash("mix_bucket",
      graft.operators.TrainPrep.MixMult, graft.operators.TrainPrep.MixInc, 1000L),
    "shuffle_key" -> guardedMulHash("shuffle_key",
      graft.operators.TrainPrep.ShuffleMult, graft.operators.TrainPrep.ShuffleInc,
      graft.operators.TrainPrep.ShuffleMod))

  private def guardedMulHash(name: String, mult: Long, inc: Long,
                             modulus: Long): Seq[Expression] => Expression = {
    args: Seq[Expression] =>
      require(args.length == 1, s"$name(id)")
      val maxSafe = (Long.MaxValue - inc) / mult
      val id = Cast(args(0), LongType)
      val inDomain = And(GreaterThanOrEqual(id, Literal(0L)),
        LessThanOrEqual(id, Literal(maxSafe)))
      // raise_error's tree shape, but typed LongType so If's branches agree
      val raise = RaiseError(Literal("USER_RAISED_EXCEPTION"),
        CreateMap(Seq(Literal("errorMessage"),
          Literal(s"$name: id outside [0, $maxSafe] overflows the 64-bit " +
            s"product; use pmod(xxhash64(id), $modulus) for wide ids"))),
        LongType)
      Pmod(Add(Multiply(If(inDomain, id, raise), Literal(mult)), Literal(inc)),
        Literal(modulus))
  }

  /** Register everything on an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, b)
    }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-character rolling polynomial hash:
  * fp = fold over code points of ((acc · mult + cp) mod modulus).
  * Semantics identical to the SQL form
  * `aggregate(transform(sequence(1,length(s)), i -> ascii(substr(s,i,1))), …)`
  * (character = code point; all arithmetic exact in 64-bit), but compiled —
  * the interpreted higher-order chain evaluates ~4 expression nodes per
  * character. */
case class RollingHash(child: Expression, mult: Long, modulus: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % modulus
      i += Character.charCount(cp)
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${mult}L + $cp) % ${modulus}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** Codegen'd "count whitespace tokens ∈ set": semantics identical to
  * `size(filter(split(s, ' '), t -> t.isin(words)))` (split keeps empty
  * tokens; the sets never contain ""), but one compiled scan instead of an
  * interpreted lambda chain per token. */
case class TokenSetCount(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_set_count expects string, got $t")
  }

  override def dataType: DataType = LongType

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var cnt = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (wordSet.contains(s.substring(start, i))) cnt += 1
        start = i + 1
      }
      i += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val cnt = ctx.freshName("cnt")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      s"""
         |final String $s = $c.toString();
         |long $cnt = 0L;
         |int $start = 0;
         |int $i = 0;
         |while ($i <= $s.length()) {
         |  if ($i == $s.length() || $s.charAt($i) == ' ') {
         |    if ($setRef.contains($s.substring($start, $i))) $cnt++;
         |    $start = $i + 1;
         |  }
         |  $i++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): TokenSetCount = copy(child = c)
}

/** Codegen'd BPE-ish subword estimate: Σ over whitespace tokens of
  * ⌈codePointLen/4⌉, in ONE scan of the string. Semantics identical to the
  * higher-order form `aggregate(split(s,' '), 0L, (acc,t) ->
  * acc + ceil(length(t)/4.0))` — split keeps empty tokens (they add 0) and
  * `length` counts code points, both reproduced here — but compiled: the
  * interpreted HOF materializes the token array and walks ~4 expression
  * nodes per token, on the hot path of four queries. */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_count expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var total = 0L
    var len = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') { total += (len + 3) / 4; len = 0 }
      else len += 1
      i += Character.charCount(cp)
    }
    total + (len + 3) / 4
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val total = ctx.freshName("total")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final String $s = $c.toString();
         |long $total = 0L;
         |long $len = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  if ($cp == ' ') { $total += ($len + 3) / 4; $len = 0; }
         |  else { $len += 1; }
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $total + ($len + 3) / 4;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}

/** Codegen'd 64-bit SimHash of a document: per-bit majority vote over
  * `xxhash64(token)` (seed 42, Spark's `xxhash64`) of the DISTINCT
  * whitespace tokens, all inside ONE row-local pass. Semantics are
  * bit-identical to the aggregate form — explode(array_distinct(split))
  * → groupBy(doc) → vote Aggregator (kept as the test-only semantic pin,
  * [[graft.operators.Dedup.simhashRef]]) — because the vote is a
  * commutative sum: token order never matters. The point of the
  * expression form is SHAPE, not just speed: the fingerprint needs no
  * explode fan-out and no shuffle at any corpus size, so SimHash costs
  * exactly one corpus scan at 100 TB. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        if (seen.add(tok)) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(UTF8String.fromString(tok), 42L)
          var b = 0
          while (b < 64) {
            votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val seen = ctx.freshName("seen")
      val votes = ctx.freshName("votes")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      val tok = ctx.freshName("tok")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val fp = ctx.freshName("fp")
      s"""
         |final String $s = $c.toString();
         |final java.util.HashSet<String> $seen = new java.util.HashSet<String>();
         |final int[] $votes = new int[64];
         |int $start = 0;
         |int $i = 0;
         |while ($i <= $s.length()) {
         |  if ($i == $s.length() || $s.charAt($i) == ' ') {
         |    final String $tok = $s.substring($start, $i);
         |    if ($seen.add($tok)) {
         |      final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
         |        org.apache.spark.unsafe.types.UTF8String.fromString($tok), 42L);
         |      for (int $b = 0; $b < 64; $b++) {
         |        $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |      }
         |    }
         |    $start = $i + 1;
         |  }
         |  $i++;
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $fp |= 1L << $b; }
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Codegen'd multi-set token counter: per-language stopword hit counts for
  * ALL languages in ONE scan of the string. Semantics per language are
  * identical to [[TokenSetCount]] over that language's word list, but a
  * token resolves against one word → language-bitmask map instead of one
  * HashSet probe (and one full string traversal) PER language — the
  * language-ID argmax drops from |langs| text scans to one. Output is
  * `array<long>` in the caller's list order; bounded at 64 sets by the
  * bitmask width. */
case class MultiTokenSetCount(child: Expression, sets: Seq[Seq[String]])
  extends UnaryExpression {

  require(sets.nonEmpty && sets.length <= 64,
    s"multi_token_set_count supports 1..64 sets, got ${sets.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"multi_token_set_count expects string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val masks: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    sets.zipWithIndex.foreach { case (words, idx) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) | (1L << idx)))
      }
    }
    m
  }

  private def count(s: String): Array[Long] = {
    val cnts = new Array[Long](sets.length)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        val m = masks.get(s.substring(start, i))
        if (m != null) {
          var rest = m.longValue()
          while (rest != 0L) {
            val b = java.lang.Long.numberOfTrailingZeros(rest)
            cnts(b) += 1L
            rest &= rest - 1L
          }
        }
        start = i + 1
      }
      i += 1
    }
    cnts
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      count(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Janino compiles generics as raw types: a HashMap<String, Long>.get
    // returns Object there, so the reference must be declared raw and the
    // result cast explicitly or codegen silently falls back to interpreted.
    val mapRef = ctx.addReferenceObj("masks", masks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val cnts = ctx.freshName("cnts")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val rest = ctx.freshName("rest")
      val b = ctx.freshName("b")
      s"""
         |final String $s = $c.toString();
         |final long[] $cnts = new long[${sets.length}];
         |int $start = 0;
         |int $i = 0;
         |while ($i <= $s.length()) {
         |  if ($i == $s.length() || $s.charAt($i) == ' ') {
         |    final java.lang.Long $m = (java.lang.Long) $mapRef.get($s.substring($start, $i));
         |    if ($m != null) {
         |      long $rest = $m.longValue();
         |      while ($rest != 0L) {
         |        final int $b = java.lang.Long.numberOfTrailingZeros($rest);
         |        $cnts[$b] += 1L;
         |        $rest &= $rest - 1L;
         |      }
         |    }
         |    $start = $i + 1;
         |  }
         |  $i++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cnts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MultiTokenSetCount = copy(child = c)
}

/** Codegen'd Σc² over whitespace-token frequencies — the integer moment
  * behind Simpson diversity (1 − Σc²/n²) and effective vocabulary
  * (n²/Σc²): one row-local pass building a token→count map, then an exact
  * long sum of squared counts. The Shannon form of the same concentration
  * signal needs a transcendental log whose last-ulp rounding differs
  * between engines (the reason the BM25 here is log-free); Σc² keeps the
  * whole metric in exact integer arithmetic until one final division.
  * Zero shuffles at any corpus size — the per-(doc, token) explode +
  * count aggregate form shuffles every token occurrence. */
case class TokenSqFreqSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_sq_freq_sum expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[String, Long]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        counts.merge(s.substring(start, i), 1L, (a, b) => a + b)
        start = i + 1
      }
      i += 1
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); sum += c * c }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val counts = ctx.freshName("counts")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      val prev = ctx.freshName("prev")
      val sum = ctx.freshName("sum")
      val it = ctx.freshName("it")
      val cnt = ctx.freshName("cnt")
      s"""
         |final String $s = $c.toString();
         |final java.util.HashMap $counts = new java.util.HashMap();
         |int $start = 0;
         |int $i = 0;
         |while ($i <= $s.length()) {
         |  if ($i == $s.length() || $s.charAt($i) == ' ') {
         |    final java.lang.Long $prev = (java.lang.Long) $counts.get($s.substring($start, $i));
         |    $counts.put($s.substring($start, $i),
         |      java.lang.Long.valueOf($prev == null ? 1L : $prev.longValue() + 1L));
         |    $start = $i + 1;
         |  }
         |  $i++;
         |}
         |long $sum = 0L;
         |final java.util.Iterator $it = $counts.values().iterator();
         |while ($it.hasNext()) {
         |  final long $cnt = ((java.lang.Long) $it.next()).longValue();
         |  $sum += $cnt * $cnt;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TokenSqFreqSum = copy(child = c)
}

/** Per-document character-count moments for the entropy gate — the
  * row-local helper [[CharEntropyMoments]] compiles against (shared by the
  * interpreted eval and the generated code, so the two paths cannot
  * drift). One pass over code points; the log lands on the integer
  * micro-nat grid via `Math.round` = floor(x+0.5) on a positive value —
  * the same binary rounding the DuckDB oracle applies (libm 1-ulp
  * differences move ln·10⁶ by ~10⁻⁹, never across a .5 boundary in
  * practice; the shared-definition spec replays the Shannon formula). */
object CharEntropy {
  def moments(s: String): org.apache.spark.sql.catalyst.InternalRow = {
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1L
      i += Character.charCount(cp)
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sum += c * Math.round(Math.log(c.toDouble) * 1e6)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size.toLong, sum))
  }
}

/** Codegen'd `struct(n, k, s)` char-count moments: n = code-point count,
  * k = distinct code points, s = Σ c·round(ln c · 10⁶) — semantics
  * identical to the explode → groupBy(doc, char) → aggregate pipeline,
  * but ROW-LOCAL: the ~70×-row char explode and its shuffle never exist,
  * so the entropy gate stays inside the document scan at any scale. */
case class CharEntropyMoments(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_entropy_moments expects string, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("s", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CharEntropy.moments(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.moments($c.toString());")

  override protected def withNewChildInternal(c: Expression): CharEntropyMoments =
    copy(child = c)
}

package graft

/** SQL-function registration: the codegen'd expressions must be reachable
  * from plain SQL. */
class ExtensionsSpec extends SparkSpec {

  test("float_dot and rolling_hash are callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val dot = spark.sql(
      """SELECT float_dot(array(cast(1.0 AS float), cast(2.0 AS float)),
        |                 array(cast(3.0 AS float), cast(4.0 AS float))) AS r""".stripMargin)
      .collect().head.getDouble(0)
    assert(dot === 11.0)

    val rh = spark.sql("SELECT rolling_hash('ab') AS r").collect().head.getLong(0)
    assert(rh === (97L * 31 + 98) % 1000000007L) // fold over 'a','b'

    val rh2 = spark.sql("SELECT rolling_hash('ab', 7L, 1000003L) AS r").collect().head.getLong(0)
    assert(rh2 === (97L * 7 + 98) % 1000003L)

    // hashed_shingles: same values as the Column-API form
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val viaSql = spark.sql("SELECT hashed_shingles('a b c d', 3) AS r")
      .as[Array[Long]].collect().head.toSeq
    val viaCol = Seq("a b c d").toDF("t")
      .select(graft.functions.TextFns.hashedShingles(col("t"), 3))
      .as[Array[Long]].collect().head.toSeq
    assert(viaSql === viaCol && viaSql.length === 2)

    // 3-arg positional form: repeats survive, index = token position
    val posSql = spark.sql("SELECT hashed_shingles('a b a b', 2, false) AS r")
      .as[Array[Long]].collect().head.toSeq
    val posCol = Seq("a b a b").toDF("t")
      .select(graft.functions.TextFns.hashedShinglesAll(col("t"), 2))
      .as[Array[Long]].collect().head.toSeq
    assert(posSql === posCol && posSql.length === 3 && posSql(0) === posSql(2))

    // srp_band_keys: same values as the Column-API form
    val sqlKeys = spark.sql(
      "SELECT srp_band_keys(array(cast(1.0 AS float), cast(-2.0 AS float)), 3, 4) AS r")
      .as[Array[Long]].collect().head.toSeq
    val colKeys = Seq(Seq(1f, -2f).toArray).toDF("e")
      .select(graft.functions.VectorFns.srpBandKeys(col("e"), 3, 4))
      .as[Array[Long]].collect().head.toSeq
    assert(sqlKeys === colKeys && sqlKeys.length === 3)

    // an empty embedding yields NULL through the SQL surface too (no
    // band-zero collisions for zero-length vectors)
    val emptyKeys = spark.sql(
      "SELECT srp_band_keys(array_remove(array(cast(1.0 AS float)), cast(1.0 AS float)), 3, 4) AS r")
      .collect().head
    assert(emptyKeys.isNullAt(0))

    // bpe_count: matches the Column-API estimate
    val sqlBpe = spark.sql("SELECT bpe_count('abcd efghi') AS r").collect().head.getLong(0)
    val colBpe = Seq("abcd efghi").toDF("t")
      .select(graft.functions.TextFns.bpeEstimate(col("t")))
      .as[Long].collect().head
    assert(sqlBpe === colBpe && sqlBpe === 3L) // ceil(4/4) + ceil(5/4)

    // token_set_count: same value as the Column-API form
    val sqlTsc = spark.sql("SELECT token_set_count('the a of x', array('the', 'of')) AS r")
      .collect().head.getLong(0)
    assert(sqlTsc === 2L)

    // lang_hits: per-language counts in langOrder order, one scan
    val sqlLang = spark.sql("SELECT lang_hits('the der el le 的') AS r")
      .as[Seq[Long]].collect().head
    assert(sqlLang === Seq(1L, 1L, 1L, 1L, 1L)) // one planted hit per language

    // token_sq_freq_sum: Σc² over token counts (a a a b → 9 + 1)
    val sqlSq = spark.sql("SELECT token_sq_freq_sum('a a a b') AS r")
      .collect().head.getLong(0)
    assert(sqlSq === 10L)

    // sample_bucket: same value as the Column-API form
    val sqlBucket = spark.sql("SELECT sample_bucket(42L) AS r").collect().head.getLong(0)
    val colBucket = Seq(42L).toDF("id")
      .select(graft.operators.TrainPrep.sampleBucket(col("id")))
      .as[Long].collect().head
    assert(sqlBucket === colBucket && sqlBucket === (42L * 2654435761L + 40503L) % 1000L)

    // split_bucket / shuffle_key: same values as the Column-API forms
    val sqlSplit = spark.sql("SELECT split_bucket(42L) AS r").collect().head.getLong(0)
    val colSplit = Seq(42L).toDF("id")
      .select(graft.operators.TrainPrep.splitBucket(col("id")))
      .as[Long].collect().head
    assert(sqlSplit === colSplit && sqlSplit === (42L * 2246822519L + 104729L) % 1000L)
    val sqlKey = spark.sql("SELECT shuffle_key(42L) AS r").collect().head.getLong(0)
    assert(sqlKey === (42L * 1779033703L + 512927357L) % 1000000007L)
    val sqlMix = spark.sql("SELECT mix_bucket(42L) AS r").collect().head.getLong(0)
    val colMix = Seq(42L).toDF("id")
      .select(graft.operators.TrainPrep.mixBucket(col("id")))
      .as[Long].collect().head
    assert(sqlMix === colMix && sqlMix === (42L * 2654435789L + 7919L) % 1000L)

    // out-of-domain ids raise through the SQL surface too (same guard as the
    // Column form — no silent 64-bit wrap). sample_bucket is additionally
    // probed at exactly maxSafe+1 (the tightest of the three domains); the
    // shared huge id overflows all of them
    val boundaryE = intercept[Exception] {
      spark.sql(s"SELECT sample_bucket(${graft.operators.TrainPrep.MaxSafeSampleId + 1L}L)")
        .collect()
    }
    assert(Iterator.iterate(boundaryE: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString("; ").contains("overflows the 64-bit product"))
    val overflowId = Long.MaxValue / 2
    for (fn <- Seq("sample_bucket", "split_bucket", "shuffle_key", "mix_bucket")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT $fn(${overflowId}L)").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.toString).mkString("; ")
      assert(msgs.contains("overflows the 64-bit product"), s"$fn: $msgs")
    }
  }

  test("wrong-typed SQL calls fail at analysis time, not mid-job") {
    GraftExtensions.registerAll(spark)
    import org.apache.spark.sql.AnalysisException
    intercept[AnalysisException] { spark.sql("SELECT bpe_count(123)").collect() }
    intercept[AnalysisException] { spark.sql("SELECT rolling_hash(1.5)").collect() }
    intercept[AnalysisException] { spark.sql("SELECT hashed_shingles(1, 3)").collect() }
    intercept[AnalysisException] { spark.sql("SELECT float_dot(array(1L), array(2L))").collect() }
  }
}

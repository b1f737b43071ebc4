package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.functions.UnigramViterbi

/** EM/Viterbi contract for the unigram-LM tokenizer (no oracle — the
  * training is iterative float EM): monotone log-likelihood, normalized
  * probabilities, single-char coverage, frequent-word pieces, lossless
  * Viterbi round-trip, exact integer scores, unknown-char accounting, and
  * refit determinism. */
class UnigramSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private lazy val model = graft.queries.ExtQueries.uniModel(spark, d)

  test("EM log-likelihood is monotone non-decreasing across the pre-prune iterations") {
    val pre = model.llHistory.take(graft.queries.ExtQueries.UniIters)
    assert(pre.length >= 2)
    pre.zip(pre.tail).foreach { case (a, b) =>
      assert(b >= a - math.abs(a) * 1e-12, s"EM regressed: $a -> $b in ${model.llHistory}")
    }
  }

  test("final probabilities normalize and every training character is covered") {
    val s = model.probs.sum
    assert(math.abs(s - 1.0) < 1e-9, s"Σp = $s")
    val pieceSet = model.pieces.map(_._1).toSet
    val chars = graft.Tables.documents(spark, d)
      .select(explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= " ").distinct()
      .collect().map(_.getString(0)).toSet
    val uncovered = chars.filterNot(pieceSet)
    assert(uncovered.isEmpty, s"uncovered chars: $uncovered")
  }

  test("the corpus' most frequent words earn whole-word pieces") {
    val top = graft.Tables.documents(spark, d)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy("w").count().orderBy(col("count").desc, col("w"))
      .limit(5).collect().map(_.getString(0))
    val pieceSet = model.pieces.map(_._1).toSet
    val missing = top.filterNot(w => w.length <= Unigram.MaxPieceLen && pieceSet(w))
      .filter(_.length <= Unigram.MaxPieceLen)
    assert(missing.isEmpty, s"top words without a piece: ${missing.toSeq}")
  }

  test("Viterbi round-trips losslessly with exact integer scores and zero unks on the fixture") {
    val pieces = model.pieces
    val rows = graft.Tables.documents(spark, d).limit(30)
      .select(col("doc_id"), col("text"),
        Unigram.encode(model, col("text")).as("e"))
      .select(col("text"), col("e.ids"), col("e.score_micro"), col("e.n_unk"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(0)
      val ids = r.getSeq[Long](1)
      assert(r.getLong(3) === 0L, "fixture chars are all covered")
      val joined = ids.map(id => pieces(id.toInt)._1).mkString
      assert(joined === text.replace(" ", ""), "pieces must reconstruct the text")
      val score = ids.map(id => pieces(id.toInt)._2).sum
      assert(score === r.getLong(2), "score must equal the sum of piece micros")
    }
  }

  test("fused encode audit: true on real encodes (incl. empty docs), flips on tampering") {
    import spark.implicits._
    def audit(text: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.UnigramAudit(
          org.apache.spark.sql.GraftColumnBridge.expression(text),
          org.apache.spark.sql.GraftColumnBridge.expression(e),
          model.pieces))
    val base = graft.Tables.documents(spark, d).limit(20)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "   ")).toDF("doc_id", "text"))
      .select(col("doc_id"), col("text"), Unigram.encode(model, col("text")).as("e"))
    val ok = base.select(col("doc_id"), audit(col("text"), col("e")).as("a"))
      .select(col("doc_id"), col("a.n_chars"), col("a.ok"))
      .as[(Long, Long, Boolean)].collect()
    assert(ok.forall(_._3), s"real encodes must audit true: ${ok.filterNot(_._3).mkString(",")}")
    assert(ok.filter(r => r._1 >= 9001L).forall(_._2 === 0L), "empty docs have 0 chars")
    // tampered score: +1 micronat breaks the exact-sum conjunct
    val badScore = base.withColumn("e", expr(
      "named_struct('ids', e.ids, 'score_micro', e.score_micro + 1L, 'n_unk', e.n_unk)"))
      .select(audit(col("text"), col("e")).getField("ok")).as[Boolean].collect()
    assert(badScore.forall(!_), "tampered score must fail")
    // tampered ids: dropping the first piece breaks the round-trip
    // (whitespace-only docs excluded: slicing their empty ids is a no-op)
    val badIds = base.withColumn("e", expr(
      "named_struct('ids', slice(e.ids, 2, size(e.ids)), 'score_micro', e.score_micro, 'n_unk', e.n_unk)"))
      .filter(length(regexp_replace(col("text"), " ", "")) > 0)
      .select(audit(col("text"), col("e")).getField("ok")).as[Boolean].collect()
    assert(badIds.forall(!_), "tampered ids must fail")
    // claimed unks fail even when everything else lines up
    val badUnk = base.withColumn("e", expr(
      "named_struct('ids', e.ids, 'score_micro', e.score_micro, 'n_unk', 1L)"))
      .select(audit(col("text"), col("e")).getField("ok")).as[Boolean].collect()
    assert(badUnk.forall(!_), "claimed unks must fail")
  }

  test("unknown characters encode as id -1 with the fixed penalty, counted per occurrence") {
    val m = Unigram.fitLocal(Array(("ab", 5L), ("ba", 3L)), vocabSize = 10,
      seedSize = 20, iters = 2)
    val enc = new UnigramViterbi.Encoder(m.pieces)
    val row = enc.encode("ab zz")
    val ids = row.getArray(0).toLongArray()
    assert(row.getLong(2) === 2L, "two unknown chars")
    assert(ids.count(_ == -1L) === 2)
    val knownScore = ids.filter(_ >= 0).map(i => m.pieces(i.toInt)._2).sum
    assert(row.getLong(1) === knownScore + 2 * UnigramViterbi.UnkMicro)
  }

  test("bench scale (sf0.1): corpus-wide-trained model round-trips the 10x corpus") {
    val d1 = "/root/testdata/sf0.1"
    val m = graft.queries.ExtQueries.uniModel(spark, d1)
    val pre = m.llHistory.take(graft.queries.ExtQueries.UniIters)
    pre.zip(pre.tail).foreach { case (a, b) => assert(b >= a - math.abs(a) * 1e-12) }
    val rows = graft.Tables.documents(spark, d1).limit(10)
      .select(col("text"), graft.operators.Unigram.encode(m, col("text")).as("e"))
      .select(col("text"), col("e.ids"), col("e.n_unk")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) === 0L)
      val joined = r.getSeq[Long](1).map(id => m.pieces(id.toInt)._1).mkString
      assert(joined === r.getString(0).replace(" ", ""))
    }
  }

  test("ties prefer the longer last piece; refit is bit-identical") {
    // vocab where 'abc' segments as [abc] even when [a][bc]/[ab][c] exist
    val words = Array(("abc", 10L), ("ab", 5L), ("bc", 5L), ("a", 2L), ("c", 2L))
    val m = Unigram.fitLocal(words, vocabSize = 12, seedSize = 30, iters = 3)
    val enc = new UnigramViterbi.Encoder(m.pieces)
    val ids = enc.encode("abc").getArray(0).toLongArray()
    val seg = ids.map(i => m.pieces(i.toInt)._1).toSeq
    assert(seg.mkString === "abc")
    // whichever split wins must be a maximum-score one; recompute by brute force
    def score(parts: Seq[String]): Option[Long] = {
      val byPiece = m.pieces.map(p => p._1 -> p._2).toMap
      val ms = parts.map(byPiece.get)
      if (ms.forall(_.isDefined)) Some(ms.flatten.sum) else None
    }
    val all = Seq(Seq("abc"), Seq("a", "bc"), Seq("ab", "c"), Seq("a", "b", "c"))
      .flatMap(p => score(p).map(p -> _))
    val best = all.map(_._2).max
    assert(score(seg).contains(best), s"viterbi picked $seg, scores: $all")

    val again = graft.operators.Unigram.train(
      graft.Tables.documents(spark, d), vocabSize = graft.queries.ExtQueries.UniVocab,
      seedSize = graft.queries.ExtQueries.UniSeed, iters = graft.queries.ExtQueries.UniIters)
    assert(again.pieces === model.pieces)
    assert(again.llHistory === model.llHistory)
  }

  test("distributed corpus-wide fit is bit-identical to the local reference fit") {
    // collect the full word-type frame and fit on the driver with the same
    // lattice + integer-unit quantization; the distributed E-step must
    // produce exactly the same longs, hence the same model
    val words = graft.Tables.documents(spark, d)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val local = Unigram.fitLocal(words, vocabSize = graft.queries.ExtQueries.UniVocab,
      seedSize = graft.queries.ExtQueries.UniSeed, iters = graft.queries.ExtQueries.UniIters)
    assert(local.pieces === model.pieces, "piece table must match the distributed fit")
    assert(local.probs === model.probs)
    assert(local.llHistory === model.llHistory)
  }

  test("train→count→pack composition: windows replay the running-sum recurrence over encode counts") {
    // hash-grade gate for ext_pack_windows_unigram (rows-only at the
    // driver): every window column must equal the concat-and-chunk
    // recurrence replayed on the driver over independently-encoded counts
    val budget = 2048L
    val packed = graft.queries.ExtQueries.queries("ext_pack_windows_unigram")(spark, d)
      .select("doc_id", "shard", "n_tokens", "window_id", "window_offset", "n_windows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(packed.nonEmpty)
    val counts = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        size(Unigram.encode(model, col("text")).getField("ids")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val replay = counts.keys.toSeq.sorted
      .groupBy(_ % 8).flatMap { case (shard, ids) =>
        var before = 0L
        ids.sorted.map { id =>
          val n = counts(id)
          val row = (id, shard, n, before / budget, before % budget,
            (before % budget + math.max(n, 1L) - 1L) / budget + 1L)
          before += n
          row
        }
      }.toSeq.sortBy(_._1)
    assert(packed.toSeq.sortBy(_._1) === replay)
  }

  test("log-space lattice survives word types long enough to underflow linear-space EM") {
    // alpha in linear space underflows around p^k ~ 1e-308; a 400-char
    // blob of per-char prob ~1e-2 is far past that. The log-space lattice
    // must fit and round-trip it without tripping the coverage require.
    val blob = Seq.tabulate(400)(i => ('a' + i % 7).toChar).mkString
    val m = Unigram.fitLocal(Array((blob, 3L), ("abc", 10L), ("cab", 5L)),
      vocabSize = 16, seedSize = 40, iters = 3)
    assert(math.abs(m.probs.sum - 1.0) < 1e-9)
    val enc = new UnigramViterbi.Encoder(m.pieces)
    val row = enc.encode(blob)
    val ids = row.getArray(0).toLongArray()
    assert(row.getLong(2) === 0L, "all chars covered")
    assert(ids.map(i => m.pieces(i.toInt)._1).mkString === blob)
  }
}

package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The JSONL corpus-source adapter: declared-schema parse, corrupt-line
  * quarantine (nothing lost, nothing crashed), contract normalization,
  * and parity with the parquet source through the live ingest stream. */
class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("jsonlDocs: clean/quarantine split, absent-field backfill, wrong-type lines quarantined") {
    val dir = tmp("jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"),
      Seq(
        // fully-specified row
        """{"doc_id": 1, "text": "a clean document", "lang": "en", "source": "web", "n_chars": 16}""",
        // dump without ids/metadata: absent fields are backfilled
        """{"text": "an id-less document from a raw dump"}""",
        // wrong TYPE: the whole line corrupts under the declared schema
        """{"doc_id": "not-a-number", "text": "typed wrong", "lang": "en", "source": "web", "n_chars": 1}""",
        // unparsable line
        """{"doc_id": 4, "text": "truncated""",
        // parses but has no text: contract violation, quarantined
        """{"doc_id": 5, "lang": "en", "source": "web", "n_chars": 0}""").mkString("\n"))

    val raw = CorpusIngest.jsonlDocs(spark, dir.toString)
    val clean = CorpusIngest.cleanDocs(raw)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._2).toSeq
    assert(clean.length === 2)
    assert(clean(0) === ((1L, "a clean document", "en", "web", 16L)))
    val backfilled = clean(1)
    assert(backfilled._2 === "an id-less document from a raw dump")
    assert(backfilled._1 >= 0L) // content-addressed id, sign-cleared
    assert((backfilled._3, backfilled._4, backfilled._5) ===
      (("und", "unknown", backfilled._2.length.toLong)))
    // the backfilled id is a pure function of the text (re-read: same id)
    val again = CorpusIngest.cleanDocs(CorpusIngest.jsonlDocs(spark, dir.toString))
      .filter(col("source") === "unknown").select("doc_id")
      .as[Long].collect().toSeq
    assert(again === Seq(backfilled._1))

    // quarantine carries EVERY excluded line — corrupt ones verbatim
    val q = CorpusIngest.quarantined(raw).as[String].collect().toSeq
    assert(q.length === 3)
    assert(q.exists(_.contains("not-a-number")))
    assert(q.exists(_.contains("truncated")))
    assert(q.exists(_.contains("\"doc_id\":5")))
  }

  test("the live ingest over a JSONL dir converges to the parquet-driven survivor state") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "web", 44L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "mirror", 44L),
      (3L, "an entirely different second document body text", "en", "web", 48L))

    // parquet-driven run (the fixture path)
    val psrc = tmp("jip-psrc")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(psrc.toString)
    val ptgt = tmp("jip-ptgt").resolve("state").toString
    CorpusIngest.start(spark, psrc.toString, ptgt,
      tmp("jip-pckp").toString).awaitTermination()

    // jsonl-driven run over the SAME rows plus a corrupt line the stream
    // must survive without losing the clean ones
    val jsrc = tmp("jip-jsrc")
    val lines = docs.map { case (id, text, lang, source, n) =>
      s"""{"doc_id": $id, "text": "$text", "lang": "$lang", "source": "$source", "n_chars": $n}"""
    } :+ """{"doc_id": 99, "text": "broken"""
    Files.writeString(jsrc.resolve("dump-0.jsonl"), lines.mkString("\n"))
    val jtgt = tmp("jip-jtgt").resolve("state").toString
    CorpusIngest.start(spark, jsrc.toString, jtgt,
      tmp("jip-jckp").toString, format = "json").awaitTermination()

    def rows(tgt: String) = CorpusIngest.state(spark, tgt)
      .as[(String, Long, String, Double)].collect().sortBy(_._2).toSeq
    assert(rows(jtgt) === rows(ptgt))
    // min-id-wins on the duplicated digest: doc 1 survives, 3 rows in, 2 out
    assert(rows(jtgt).map(_._2) === Seq(1L, 3L))

    // an unsupported format fails loud, not as an empty stream
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.start(spark, jsrc.toString, jtgt, tmp("jip-x").toString,
        format = "csv")
    }
    assert(e.getMessage.contains("unsupported source format"))
  }
}

package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Reconcile
import graft.operators.Reconcile.{cents, plain}

/** Diff-classification properties (SURVEY §5.3): diff(x,x)=∅, label
  * symmetry, null-vs-value mismatch handling (js:457–475). */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(plain("name"), cents("bal"))

  private def t(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("id", "name", "bal")

  test("diff(x, x) is empty") {
    val x = t((1, "a", 1.50), (2, "b", 2.25))
    assert(Reconcile.fieldDiff(x, x, "id", fields).count() === 0)
    val s = Reconcile.diffSummary(x, x, "id", fields)
      .as[(Long, Long)].collect().head
    assert(s === ((2L, 0L)))
  }

  test("fieldDiff classifies one-sided keys and per-field mismatches") {
    val src = t((1, "a", 1.50), (2, "b", 2.25), (3, "c", 3.00))
    val tgt = t((1, "a", 1.50), (2, "B", 2.25), (4, "d", 4.00))
    val d = Reconcile.fieldDiff(src, tgt, "id", fields)
      .select("id", "field", "diff_type").as[(Long, String, String)].collect().toSet
    assert(d === Set(
      (2L, "name", "value_mismatch"),
      (3L, "_doc_", "missing_in_target"),
      (4L, "_doc_", "missing_in_source")))
  }

  test("diff is symmetric modulo missing-in-source/target label swap") {
    val src = t((1, "a", 1.0), (2, "b", 2.0))
    val tgt = t((2, "x", 2.0), (3, "c", 3.0))
    def norm(df: DataFrame, swap: Boolean) =
      df.select("id", "field", "diff_type").as[(Long, String, String)].collect()
        .map { case (id, f, dt) =>
          val dt2 = if (!swap) dt else dt match {
            case "missing_in_source" => "missing_in_target"
            case "missing_in_target" => "missing_in_source"
            case other => other
          }
          (id, f, dt2)
        }.toSet
    val fwd = norm(Reconcile.fieldDiff(src, tgt, "id", fields), swap = false)
    val bwd = norm(Reconcile.fieldDiff(tgt, src, "id", fields), swap = true)
    assert(fwd === bwd)
  }

  test("null field value vs present value is a mismatch; null-vs-null is not") {
    val src = Seq((1L, Option.empty[String], 1.0), (2L, Option.empty[String], 2.0))
      .toDF("id", "name", "bal")
    val tgt = Seq((1L, Option("a"), 1.0), (2L, Option.empty[String], 2.0))
      .toDF("id", "name", "bal")
    val d = Reconcile.fieldDiff(src, tgt, "id", fields)
      .select("id", "field").as[(Long, String)].collect().toSet
    assert(d === Set((1L, "name")))
  }
}

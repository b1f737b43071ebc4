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

  private val ckFields =
    Seq(Reconcile.intLen("name"), Reconcile.intCents("bal"))

  private def checksumRows(src: DataFrame, tgt: DataFrame) =
    Reconcile.bucketChecksum(src, tgt, "id", ckFields, buckets = 4)
      .select("bucket", "n_src", "n_tgt", "bal_match", "cross_match", "bucket_clean")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("bucketChecksum: identical sides are clean; a drifted value dirties only its bucket") {
    val src = t((1, "a", 1.00), (2, "b", 2.00), (5, "c", 3.00), (6, "d", 4.00))
    assert(checksumRows(src, src).values.forall(_._6), "diff(x,x) must be clean")
    // drift id=5's balance: only bucket 5 % 4 = 1 goes dirty, and the
    // balance component names the culprit
    val tgt = t((1, "a", 1.00), (2, "b", 2.00), (5, "c", 3.50), (6, "d", 4.00))
    val r = checksumRows(src, tgt)
    assert(!r(1L)._6 && !r(1L)._4, "bucket 1 must flag the balance component")
    assert(r(2L)._6 && r(2L)._4, "untouched buckets stay clean")
  }

  test("bucketChecksum: the key-weighted cross term catches a same-sum value swap") {
    // ids 1 and 5 share bucket 1 (mod 4); swapping their balances keeps
    // every per-field SUM identical — only the key-weighted term can tell
    val src = t((1, "a", 1.00), (5, "b", 9.00))
    val tgt = t((1, "a", 9.00), (5, "b", 1.00))
    val r = checksumRows(src, tgt)
    assert(r(1L)._4, "per-field sums agree by construction")
    assert(!r(1L)._5 && !r(1L)._6, "the cross term must flag the swap")
  }

  test("scoped diff over dirty buckets equals the unscoped full diff (fixture drift)") {
    val d = "/root/testdata/sf0.001"
    val full = SparkEntry.queries("join_full_outer_diff")(spark, d)
      .collect().map(_.toSeq).toSet
    val scoped = SparkEntry.queries("reconcile_scoped_diff")(spark, d)
      .drop("bucket").collect().map(_.toSeq).toSet
    assert(scoped === full, "every differing row must fall in a dirty bucket")
    assert(full.nonEmpty)
  }

  test("bucketChecksum: one-sided buckets report zero counts and dirty flags") {
    val src = t((1, "a", 1.00), (2, "b", 2.00))
    val tgt = t((1, "a", 1.00))
    val r = checksumRows(src, tgt)
    assert(r(2L)._2 === 1L && r(2L)._3 === 0L && !r(2L)._6)
  }
}

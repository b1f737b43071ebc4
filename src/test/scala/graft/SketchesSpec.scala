package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Misra–Gries heavy-hitters contracts the DuckDB oracle can't express:
  * the oracle gate (`agg_heavy_hitters`) only pins the NO-EVICTION regime
  * (k ≥ distinct keys ⇒ exact); these pin the eviction-mode error bound,
  * merge-tree independence, and the fixture precondition the oracle gate
  * silently relies on. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def truthOf(data: Seq[String]): Map[String, Long] =
    data.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact when k ≥ distinct keys, under any partitioning of the input") {
    val data = (1 to 2000).map(i => s"k${i % 23}")
    val mg = udaf(new MisraGries(64))
    for (parts <- Seq(1, 13)) {
      val est = data.toDF("key").repartition(parts)
        .agg(mg(col("key"))).as[Map[String, Long]].head()
      assert(est === truthOf(data), s"parts=$parts")
    }
  }

  test("eviction mode: one-sided undercount within n/(k+1); heavy keys survive the summary") {
    // 800× one hot key interleaved with 200 distinct tail keys; k=9 forces
    // constant eviction pressure
    val data = (0 until 1000).map(i => if (i % 5 != 4) "hot" else s"t${i / 5}")
    val (n, k) = (data.size, 9)
    val truth = truthOf(data)
    val mg = udaf(new MisraGries(k))
    for (parts <- Seq(1, 7)) { // sequential and merged combine trees
      val est = data.toDF("key").repartition(parts)
        .agg(mg(col("key"))).as[Map[String, Long]].head()
      assert(est.size <= k)
      est.foreach { case (key, c) =>
        assert(c <= truth(key), s"overcount on $key (parts=$parts)")
        assert(truth(key) - c <= n / (k + 1),
          s"undercount beyond n/(k+1) on $key (parts=$parts)")
      }
      // any key with true frequency > n/(k+1) must be present
      assert(est.contains("hot"), s"heavy hitter evicted (parts=$parts)")
      assert(est("hot") >= truth("hot") - n / (k + 1))
    }
  }

  test("streaming sketch merge preserves the summed-n bound across any batch split (eviction mode)") {
    // the DataFrame-level mergeSketch must honor the mergeable-summaries
    // theorem: merging per-slice sketches keeps true − (n1+n2+…)/(k+1) ≤
    // est ≤ true, even when every slice AND every merge evicts
    import graft.streaming.HeavyHittersStream
    val k = 9
    val slices = Seq(
      (0 until 600).map(i => if (i % 3 != 2) "hot" else s"a${i / 3}"),
      (0 until 500).map(i => if (i % 4 != 3) "hot" else s"b${i / 4}"),
      (0 until 400).map(i => s"c${i % 40}") ++ Seq.fill(100)("hot"))
    val truth = truthOf(slices.flatten)
    val n = slices.map(_.size).sum
    val mg = udaf(new MisraGries(k))
    def sliceSketch(data: Seq[String]): org.apache.spark.sql.DataFrame =
      data.toDF("key").agg(mg(col("key")).as("sk"), count(lit(1)).as("__n"))
        .select(explode(map_concat(col("sk"), map(lit(" n"), col("__n"))))
          .as(Seq("k", "est_n")))
    val merged = slices.map(sliceSketch).reduce(
      (a, b) => HeavyHittersStream.mergeSketch(a, b, k))
    val est = merged.filter(col("k") =!= " n")
      .as[(String, Long)].collect().toMap
    assert(est.size <= k)
    est.foreach { case (key, c) =>
      assert(c <= truth(key), s"overcount on $key")
      assert(truth(key) - c <= n / (k + 1), s"undercount beyond Σn/(k+1) on $key")
    }
    assert(est.contains("hot") && est("hot") >= truth("hot") - n / (k + 1))
    // the n row sums through the merges
    assert(merged.filter(col("k") === " n").as[(String, Long)].head()._2 === n.toLong)
  }

  test("agg_heavy_hitters' exactness precondition holds on the ORACLE fixtures (k=256 ≥ distinct users)") {
    // the driver's correctness gate runs at sf0.01 — there the sketch must
    // be in the no-eviction (exact) regime for the plain-count oracle to be
    // checking anything
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val n = Tables.events(spark, sf).select("user_id").distinct().count()
      assert(n <= 256,
        s"$sf carries $n distinct users — the k=256 sketch would evict and " +
          "the oracle gate would no longer be checking exact counts")
    }
  }

  test("at bench scale (sf0.1, eviction mode) the sketch honors its error contract") {
    // 1500 distinct users > k=256: the sketch is doing its actual job here —
    // pin the one-sided bound and heavy-key retention against exact counts
    val sf = "/root/testdata/sf0.1"
    val keyed = Tables.events(spark, sf).select(col("user_id").cast("string").as("key"))
    val n = keyed.count()
    val truth = keyed.groupBy("key").count().as[(String, Long)].collect().toMap
    val mg = udaf(new MisraGries(256))
    val est = keyed.agg(mg(col("key"))).as[Map[String, Long]].head()
    assert(est.size <= 256)
    val bound = n / 257
    est.foreach { case (key, c) =>
      assert(c <= truth(key), s"overcount on $key")
      assert(truth(key) - c <= bound, s"undercount beyond n/(k+1) on $key")
    }
    truth.filter(_._2 > bound).keys.foreach(k =>
      assert(est.contains(k), s"key $k with true count ${truth(k)} > $bound evicted"))
  }
}

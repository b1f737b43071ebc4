package graft.tmp
import org.apache.spark.sql.functions._
import graft.operators.Knn
object CurveProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"[t] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    (1 to 2).foreach { round =>
      val emb = graft.Tables.embeddings(spark, d)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = time(s"r$round brute+ckpt") {
        Knn.bruteForce(emb, qs, "vec_id", "embedding", k = 8)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("__er")).localCheckpoint(true) }
      time(s"r$round lsh") { Knn.lshKnn(emb, qs, "vec_id", "embedding", k=8, bands=16, bitsPerBand=6)
        .write.format("noop").mode("overwrite").save() }
      time(s"r$round ivf") { Knn.ivfKnn(emb, qs, "vec_id", "embedding", k=8,
        nCells=graft.queries.ExtQueries.IvfCells, iters=graft.queries.ExtQueries.IvfIters,
        nProbe=graft.queries.ExtQueries.IvfProbe, sampleN=graft.queries.ExtQueries.IvfSampleN)
        .write.format("noop").mode("overwrite").save() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

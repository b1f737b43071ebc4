package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY §4's partitioning story, made
  * concrete). Two fact tables written with identical `bucketBy(n, key)` +
  * `sortBy(key)` layouts join with ZERO exchange — each task merge-joins
  * bucket i of both sides in place. At 100 TB the shuffle this removes IS
  * the cost of a fact⋈fact join; re-bucketing is paid once at ingest and
  * amortized over every subsequent join/aggregation on the key. */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet).
    *
    * Re-runnable across sessions: a previous session's managed-table
    * directory survives in the warehouse while the fresh in-memory catalog
    * has no entry for it, so a bare `saveAsTable` dies with
    * LOCATION_ALREADY_EXISTS — drop any catalog entry AND clear the stale
    * location before writing. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two identically-bucketed tables on their bucket key. The
    * caller can verify the plan has no Exchange (see BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}

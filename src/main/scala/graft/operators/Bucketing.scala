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

  /** Bit-interleaved Z-order key over two non-negative integer dimensions
    * (Morton code, `bits` bits each): points close in BOTH dimensions land
    * close on the curve, so range-partitioning files by this ONE key gives
    * every file a tight bounding RECTANGLE in (x, y) — a 2-D rectangle
    * predicate then prunes by file min/max stats on either dimension,
    * where a single-column sort clusters only its own column. The
    * data-skipping layout trick of the lakehouse formats, as a plain
    * column expression.
    *
    * Shift/mask arithmetic only (exact int64; inputs must fit in `bits`
    * bits — callers mask or bucket first), emitted term-for-term identical
    * by [[zKeySql]] so the oracle computes the same key. */
  def zKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
           bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Oracle-side twin of [[zKey]] — the same shift/mask terms in SQL. */
  def zKeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Write `df` Z-ordered on (xCol, yCol): range-partition into `files`
    * tasks by the interleaved key, sort within each — every output file
    * covers one contiguous z-range, i.e. a bounded (x, y) rectangle.
    * PartitionSpec pins the disjoint per-file z-ranges. */
  def zOrderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                  bits: Int, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zKey(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Date-partitioned layout: a day predicate must prune to one partition at
  * planning time (PartitionFilters), not scan-and-filter. This is the
  * production layout for the events log — at 100 TB a day filter reads
  * 1/365th of the data or it reads all of it. */
class PartitionSpec extends SparkSpec {

  test("day filter on a date-partitioned events layout prunes partitions") {
    val dir = Files.createTempDirectory("events-bydate").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(plan.contains("2024-01-05"), plan.take(800))

    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(q.count() === expected)
    assert(expected > 0)
  }
}

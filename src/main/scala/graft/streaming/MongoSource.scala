package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Production MongoDB change-stream source wiring — the reference's
  * `startCDCReplication` entry point (js:205–248) mapped onto the public
  * MongoDB Spark connector's Structured Streaming source
  * (`format("mongodb")`, connector v10.x option surface). This sandbox
  * ships no connector jar and no MongoDB, so `.load()` is never called
  * here: the OPTION MAPPING is the design artifact — compiled, pure, and
  * unit-tested — and [[CdcPipeline.start]]'s file source stays the tested
  * execution path (same [[CdcPipeline.transform]] downstream either way).
  *
  * Reference behavior → connector option, line by line:
  *  - `$match operationType ∈ {insert, update}` server-side (js:221–223)
  *    → `aggregation.pipeline` (the same $match document, applied by the
  *    server before events reach Spark).
  *  - `fullDocument: 'updateLookup'` (js:236) →
  *    `change.stream.lookup.full.document` = `updateLookup`.
  *  - `resumeAfter: token` from the checkpoint file (js:241–242) → NOT an
  *    option: Structured Streaming's `checkpointLocation` persists the
  *    connector's resume tokens in the offset log, replacing the
  *    reference's hand-rolled {resumeToken, timestamp} JSON file
  *    (js:104–110) wholesale — passing a stale token around it would fork
  *    the two stores. [[resumeFrom]] asserts that contract.
  *  - `startAtOperationTime: startTime` (js:243–244) →
  *    `change.stream.startup.mode` = `timestamp` +
  *    `change.stream.startup.mode.timestamp.start.at.operation.time`
  *    (ISO-8601); no start time → `latest`, the watch default.
  *  - `batchSize` (js:237, flush buffer 1000) → micro-batch sizing is the
  *    trigger's job in Spark (see [[CdcPipeline.start]]'s 5 s cadence);
  *    the connector-side read batch hint is left to its default.
  */
object MongoSource {

  /** The reference's CDC source configuration surface (js:13–22, 205). */
  final case class MongoCdc(
    uri: String,
    database: String,
    collection: String,
    startAtEpochSec: Option[Long] = None, // js:243–244 startAtOperationTime
    fullDocumentLookup: Boolean = true)   // js:236 updateLookup

  private val Prefix = "spark.mongodb.read."

  /** The connector option map for [[MongoCdc]] — pure and total, the
    * unit-tested core of the wiring. */
  def options(c: MongoCdc): Map[String, String] = {
    val startup: Map[String, String] = c.startAtEpochSec match {
      case Some(sec) => Map(
        Prefix + "change.stream.startup.mode" -> "timestamp",
        Prefix + "change.stream.startup.mode.timestamp.start.at.operation.time" ->
          java.time.Instant.ofEpochSecond(sec).toString)
      case None => Map(Prefix + "change.stream.startup.mode" -> "latest")
    }
    Map(
      Prefix + "connection.uri" -> c.uri,
      Prefix + "database" -> c.database,
      Prefix + "collection" -> c.collection,
      // the server-side insert+update $match (js:221–223); deletes never
      // leave the source — the stream-side dropDeletes stays as the guard
      // for sources configured without it
      Prefix + "aggregation.pipeline" ->
        """[{"$match": {"operationType": {"$in": ["insert", "update"]}}}]""",
      Prefix + "change.stream.lookup.full.document" ->
        (if (c.fullDocumentLookup) "updateLookup" else "default")) ++ startup
  }

  /** Resume semantics (js:241–242): a previous run's `checkpointLocation`
    * IS the resume token store. Returns the checkpoint dir to pass to the
    * writer and rejects a caller trying to carry a token by hand next to
    * it — the two stores would fork on the first restart. */
  def resumeFrom(checkpointDir: String, handCarriedToken: Option[String]): String = {
    require(handCarriedToken.isEmpty,
      "resume tokens live in the Structured Streaming checkpoint " +
        "(offset log); passing one around it would fork the two stores — " +
        "point checkpointLocation at the previous run's dir instead")
    checkpointDir
  }

  /** The configured (unloaded) reader: `format("mongodb")` + the option
    * map. Calling `.load()` requires the connector jar on the classpath —
    * the production entry, exercised only off-sandbox. */
  def reader(spark: SparkSession, c: MongoCdc): DataStreamReader =
    spark.readStream.format("mongodb").options(options(c))

  /** Change-stream envelope → the canonical event shape
    * [[CdcPipeline.transform]] consumes (js:160–176: operationType,
    * clusterTime, documentKey._id, fullDocument). The connector delivers
    * `fullDocument` as extended-JSON; key fields project out via
    * `get_json_object` — the same dynamic-payload escape hatch as the
    * fixture's `props`. Pure column projection, unit-testable on any frame
    * with the envelope columns. */
  def fromChangeStream(envelope: DataFrame): DataFrame =
    envelope.select(
      col("operationType").as("op_type"),
      col("clusterTime").cast("timestamp").as("ts"),
      get_json_object(col("documentKey"), "$._id").as("doc_key"),
      col("fullDocument").as("doc"))
}

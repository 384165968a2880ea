package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming source adapters.
  *
  * The reference consumes Kafka topics (gmall2024-realtime-master/
  * realtime-common/src/main/java/com/atguigu/gmall/realtime/common/
  * util/FlinkSourceUtil.java:1). This container has no Kafka, so the
  * jobs take any streaming DataFrame with the right columns; these
  * adapters provide the file-based equivalent (each parquet drop = a
  * micro-batch, the same at-least-once replayable contract a Kafka
  * offset range gives). Swapping in `spark.readStream.format("kafka")`
  * changes nothing downstream.
  */
object Sources {

  /** Schema of events.parquet as Spark reads it under the CURRENT
    * testdata encoding (timestamp[us]; with inferTimestampNTZ off it
    * arrives as TimestampType). [[eventsSchemaFor]] probes the actual
    * files and overrides `ts` when the directory holds a different
    * historical encoding, so a FileStreamSource never silently
    * mis-decodes rows after a testdata regeneration (the r5 failure:
    * a hardcoded nanos-long schema read micros files as garbage).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Probe the on-disk `ts` encoding with a footer-only batch read.
    * Falls back to [[eventsRawSchema]] for a not-yet-populated stream
    * directory (files arriving later are expected to carry the
    * current encoding).
    */
  def eventsSchemaFor(s: SparkSession, pathGlob: String): StructType =
    try {
      val onDisk = s.read.parquet(pathGlob).schema("ts").dataType
      StructType(eventsRawSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = onDisk) else f))
    } catch { case _: Throwable => eventsRawSchema }

  /** Stream of events from a directory/glob of parquet files, with
    * ts normalized to a proper timestamp at the edge (shared with the
    * batch path: graft.sources.Tables.normalizeTs).
    */
  def events(s: SparkSession, pathGlob: String): DataFrame =
    graft.sources.Tables.normalizeTs(
      s.readStream.schema(eventsSchemaFor(s, pathGlob)).parquet(pathGlob))

  /** REAL Kafka source — the reference's actual ODS transport
    * (FlinkSourceUtil.java:14 builds a KafkaSource per topic; every
    * DWD/DWS job consumes one). Env-gated like the live-JDBC sink
    * path: set `SPARK_GRAFT_KAFKA_BOOTSTRAP` (and have the
    * spark-sql-kafka connector on the classpath — this container
    * ships neither broker nor jar, so the format string resolves at
    * RUNTIME and nothing here links against it at compile time).
    * Values are the JSON event envelope; the parse lands on the same
    * [[eventsRawSchema]] columns + ts normalization the file source
    * produces, so every downstream job is transport-agnostic —
    * `Jobs.pageViewWindow(Sources.eventsKafka(s, "ods_log"))` is the
    * reference topology verbatim. `startingOffsets=earliest` gives
    * the same replayable at-least-once contract the file source's
    * directory listing gives.
    */
  def eventsKafka(s: SparkSession, topic: String,
      bootstrap: String = sys.env.getOrElse(
        "SPARK_GRAFT_KAFKA_BOOTSTRAP", "")): DataFrame = {
    require(bootstrap.nonEmpty,
      "eventsKafka needs SPARK_GRAFT_KAFKA_BOOTSTRAP (or an explicit bootstrap)")
    val raw = s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    // ts travels as ISO-8601/epoch-micros inside the JSON envelope;
    // from_json with the raw schema + the shared normalizer keeps
    // Kafka and file transports bit-identical downstream
    graft.sources.Tables.normalizeTs(
      raw.select(from_json(col("value").cast("string"),
          eventsRawSchema).as("e"))
        .select(col("e.*")))
  }

  /** LIVE Debezium-over-Kafka CDC — the reference's actual ODS
    * database transport (FlinkSourceUtil.java:14 +
    * DwdBaseDb.java:1: MySQL binlog → Debezium/Maxwell JSON on an
    * `ods_db` topic → per-table routing). Env-gated exactly like
    * [[eventsKafka]]: needs `SPARK_GRAFT_KAFKA_BOOTSTRAP` and the
    * spark-sql-kafka jar at runtime; nothing links at compile time.
    *
    * Parses the Debezium envelope with the SAME semantics as the
    * batch `graft-cdc` connector's Debezium mode
    * (sources.v2.CdcEnvelope.Debezium): op c/r→insert, u→update,
    * d→delete (payload from `before`), table from `source.table`,
    * ts from epoch-millis `ts_ms` — emitting the (ts, table, op,
    * data) columns [[CdcRouter]] routes, so
    * `CdcRouter.start(Sources.cdcKafka(s, "ods_db"), routes, ck)`
    * is the reference's DwdBaseDb topology verbatim. Non-row lines
    * (schema-change events, tombstones) drop out via the null
    * filters, mirroring the connector's parse-to-None path.
    */
  def cdcKafka(s: SparkSession, topic: String,
      bootstrap: String = sys.env.getOrElse(
        "SPARK_GRAFT_KAFKA_BOOTSTRAP", "")): DataFrame = {
    require(bootstrap.nonEmpty,
      "cdcKafka needs SPARK_GRAFT_KAFKA_BOOTSTRAP (or an explicit bootstrap)")
    debeziumEnvelope(s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load())
  }

  /** The Debezium-envelope projection behind [[cdcKafka]], applicable
    * to ANY frame with a (binary or string) `value` column — which is
    * what lets CI gate the parsing semantics on a batch frame of
    * literal envelopes while the broker-backed path stays env-gated.
    */
  def debeziumEnvelope(raw: DataFrame): DataFrame = {
    val j = col("value").cast("string")
    val opCode = get_json_object(j, "$.op")
    val op = when(opCode.isin("c", "r"), "insert")
      .when(opCode === "u", "update")
      .when(opCode === "d", "delete")
    raw.select(
        (get_json_object(j, "$.ts_ms").cast("long") / 1000)
          .cast("timestamp").as("ts"),
        get_json_object(j, "$.source.table").as("table"),
        op.as("op"),
        when(op === "delete", get_json_object(j, "$.before"))
          .otherwise(get_json_object(j, "$.after")).as("data"))
      .filter(col("table").isNotNull && col("op").isNotNull)
  }

  /** CDC-style change records synthesized from events — the shape the
    * reference's ods_db topic carries (op/table/data envelope,
    * DwdBaseDb.java:1). Used by [[CdcRouter]] and its tests.
    */
  def cdcFromEvents(events: DataFrame): DataFrame =
    events.select(
      col("ts"),
      // event_type stands in for the source table name
      col("event_type").as("table"),
      when(col("value") < 10, "delete")
        .when(col("value") < 50, "update").otherwise("insert").as("op"),
      to_json(struct(col("event_id"), col("user_id"), col("value")))
        .as("data"))
}

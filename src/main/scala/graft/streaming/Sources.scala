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

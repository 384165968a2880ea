package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Config-driven CDC router — the DwdBaseDb.java:1 +
  * TableProcessFunction.java:1 pattern: a change stream carrying
  * (table, op, data) envelopes is routed to per-table sinks according
  * to a config map, unconfigured tables dropped, deletes filtered or
  * propagated per table config.
  *
  * The reference broadcasts the config table from a CDC stream of
  * MySQL `table_process`; here the config is a plain Map resolved per
  * micro-batch inside foreachBatch — swapping in a config *stream*
  * would make it a broadcast join, same plan shape.
  */
object CdcRouter {

  /** Per-table routing config: target directory + whether deletes
    * flow through (the reference's sink_type/sink_columns analogue).
    */
  case class Route(path: String, keepDeletes: Boolean = false)

  /** Start routing `cdc` (columns: ts, table, op, data) to parquet
    * sinks. One scan per micro-batch; the per-table writes partition
    * the batch by the routing key — at scale this is
    * `partitionBy(table)` on a single write, used here per-route so
    * each table controls its own path and delete policy.
    */
  def start(cdc: DataFrame, routes: Map[String, Route],
      checkpoint: String): StreamingQuery =
    startDynamic(cdc, () => routes, checkpoint)

  /** Dynamic-config variant: `routes` is re-evaluated at every
    * micro-batch, mirroring the reference's broadcast config stream
    * (TableProcessFunction.java:1 watches the MySQL `table_process`
    * table via CDC) — routing changes take effect on the next batch
    * with no restart.
    */
  def startDynamic(cdc: DataFrame, routes: () => Map[String, Route],
      checkpoint: String): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.cache()
        try routes().foreach { case (table, route) =>
          val rows = cached.filter(col("table") === table)
          val kept = if (route.keepDeletes) rows
                     else rows.filter(col("op") =!= "delete")
          kept.write.mode(SaveMode.Append).parquet(route.path)
        } finally cached.unpersist()
      }
      .start()
}

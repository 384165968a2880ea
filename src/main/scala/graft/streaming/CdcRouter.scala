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
    * sinks. The DEFAULT execution is the single-pass shape: one
    * `partitionBy` write job per micro-batch regardless of how many
    * tables the config routes (the per-route filter loop would
    * re-scan the batch once per table — N passes that matter when the
    * config grows past dozens of tables). Per-route custom paths are
    * honored by staging the partitioned write and renaming each
    * table's files into its target (metadata-only on HDFS/local; on
    * rename-less object stores prefer [[startPartitioned]]'s hive
    * layout). Configs at or below `loopThreshold` routes keep the
    * simple loop — at that size the extra passes are cheaper than the
    * staging round-trip.
    */
  def start(cdc: DataFrame, routes: Map[String, Route],
      checkpoint: String): StreamingQuery =
    startDynamic(cdc, () => routes, checkpoint)

  /** Dynamic-config variant: `routes` is re-evaluated at every
    * micro-batch, mirroring the reference's broadcast config stream
    * (TableProcessFunction.java:1 watches the MySQL `table_process`
    * table via CDC) — routing changes take effect on the next batch
    * with no restart. Same single-pass default as [[start]].
    */
  def startDynamic(cdc: DataFrame, routes: () => Map[String, Route],
      checkpoint: String, loopThreshold: Int = 4): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cfg = routes()
        if (cfg.nonEmpty) {
          if (cfg.size <= loopThreshold) {
            val cached = batch.cache()
            try cfg.foreach { case (table, route) =>
              val rows = cached.filter(col("table") === table)
              val kept = if (route.keepDeletes) rows
                         else rows.filter(col("op") =!= "delete")
              kept.write.mode(SaveMode.Append).parquet(route.path)
            } finally cached.unpersist()
          } else {
            // ONE write job: combined routing+delete predicate
            // map-side, partitioned by a duplicate of the routing key
            // (so the data files keep the `table` column the loop
            // writes), staged next to the checkpoint, then each
            // table's files rename into its route path. Job-UUID file
            // names are collision-free under append.
            val keepD = cfg.collect {
              case (t, r) if r.keepDeletes => t
            }.toSeq
            val deletePolicy =
              if (keepD.isEmpty) col("op") =!= "delete"
              else col("op") =!= "delete" || col("table").isin(keepD: _*)
            val stagingRoot = s"$checkpoint-staging"
            val staging = s"$stagingRoot/$batchId"
            batch
              .filter(col("table").isin(cfg.keys.toSeq: _*))
              .filter(deletePolicy)
              .withColumn("__route", col("table"))
              .write.mode(SaveMode.Overwrite)
              .partitionBy("__route").parquet(staging)
            val conf = batch.sparkSession.sparkContext.hadoopConfiguration
            val fs = new org.apache.hadoop.fs.Path(staging)
              .getFileSystem(conf)
            cfg.foreach { case (table, route) =>
              val src = new org.apache.hadoop.fs.Path(staging,
                s"__route=$table")
              if (fs.exists(src)) {
                val dst = new org.apache.hadoop.fs.Path(route.path)
                fs.mkdirs(dst)
                fs.listStatus(src)
                  .filter(st => st.isFile &&
                    !st.getPath.getName.startsWith("_") &&
                    !st.getPath.getName.startsWith("."))
                  .foreach { st =>
                    val to = new org.apache.hadoop.fs.Path(dst,
                      st.getPath.getName)
                    // rename returns FALSE (not an exception) on
                    // cross-filesystem targets — losing the batch
                    // silently once staging is deleted. Fail loudly;
                    // cross-FS routes should use startPartitioned.
                    require(fs.rename(st.getPath, to),
                      s"rename ${st.getPath} -> $to failed (cross-" +
                        "filesystem route path? use startPartitioned)")
                  }
              }
            }
            fs.delete(new org.apache.hadoop.fs.Path(stagingRoot), true)
            ()
          }
        }
      }
      .start()

  /** SINGLE-PASS variant: ONE `partitionBy(table)` write per
    * micro-batch instead of one filtered pass per route — the shape
    * that matters when the config grows past dozens of tables (N
    * passes over the batch become one). The trade: every table lands
    * under `basePath/table=<name>/` (hive layout) instead of a
    * per-route custom path; delete policy folds into one combined
    * predicate evaluated map-side. Downstream per-table readers use
    * `tablePath(basePath, name)`, and a partition-pruned scan of one
    * table reads only its directory.
    */
  def startPartitioned(cdc: DataFrame, routes: () => Map[String, Route],
      basePath: String, checkpoint: String): StreamingQuery =
    cdc.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cfg = routes()
        if (cfg.nonEmpty) {
          val keepD = cfg.collect {
            case (t, r) if r.keepDeletes => t
          }.toSeq
          val deletePolicy =
            if (keepD.isEmpty) col("op") =!= "delete"
            else col("op") =!= "delete" || col("table").isin(keepD: _*)
          batch
            .filter(col("table").isin(cfg.keys.toSeq: _*))
            .filter(deletePolicy)
            .write.mode(SaveMode.Append)
            .partitionBy("table").parquet(basePath)
        }
      }
      .start()

  /** Where [[startPartitioned]] lands a given table's rows. */
  def tablePath(basePath: String, table: String): String =
    s"$basePath/table=$table"
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Upsert-by-key sink — the ClickHouse ReplacingMergeTree /Doris
  * aggregate-model semantics the reference sinks into
  * (realtime-common/.../ClickHouseUtil.java:1, FlinkSinkUtil.java:1):
  * for each key, the row with the highest version wins.
  *
  * Implementation: per micro-batch, (1) collapse the batch to its
  * latest row per key (cheap, batch-local), (2) merge with the
  * current snapshot keeping max-version rows. Parquet has no MERGE,
  * so the merge rewrites the snapshot — correct and idempotent
  * (replayed batches converge), which is the property checkpoint
  * recovery needs. At warehouse scale the same foreachBatch body
  * targets a real MergeTree/Doris table (or Iceberg/Delta MERGE) and
  * step (2) becomes the storage engine's job — step (1)'s map-side
  * collapse is still worth doing to shrink the write.
  */
object ReplacingSink {

  def start(stream: DataFrame, keyCols: Seq[String], versionCol: String,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch, keyCols, versionCol, path)
      }
      .start()

  /** Doris-aggregate-model variant: rows sharing a key MERGE by
    * summing the value columns (the reference's Doris sum-agg tables,
    * e.g. the DWS pv/uv rollups). Each batch pre-aggregates map-side,
    * then the snapshot merge sums again — associative, so replay
    * yields the same totals as one big batch only if each batch is
    * delivered exactly once; pair with [[graft.streaming.Jobs
    * .streamingDedup]] upstream when the source can replay.
    */
  def startSumming(stream: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String], path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sumUpsert(batch, keyCols, sumCols, path)
      }
      .start()

  /** Doris-HLL-model variant: each key keeps additive counters PLUS a
    * mergeable DataSketches HLL of `idCol` — `hll_union_agg` folds the
    * batch sketch into the stored one, so the snapshot serves exact
    * sums and approximate distincts per key without ever re-reading
    * past batches. This is the streaming dual of
    * [[graft.warehouse.Sketched]]: there sketches merge across
    * PARTITIONS at read time; here they merge across MICRO-BATCHES at
    * write time.
    */
  def startSketching(stream: DataFrame, keyCols: Seq[String],
      idCol: String, path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sketchUpsert(batch, keyCols, idCol, path)
      }
      .start()

  /** Doris-BITMAP-model variant: like [[startSketching]] but the
    * per-key distinct state is an EXACT bitmap
    * (`graft_bitmap_bytes` / `graft_bitmap_union`), so the snapshot
    * serves exact UV per key — the reference's Doris bitmap columns
    * without the approximation. Bitmap bytes are bounded by the id
    * domain, merge is a word-OR, and replayed batches converge
    * (OR is idempotent — the one aggregate where at-least-once
    * delivery alone is already exactly-once for the DISTINCT part).
    */
  def startBitmap(stream: DataFrame, keyCols: Seq[String], idCol: String,
      maxId: Long, path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        bitmapUpsert(batch, keyCols, idCol, maxId, path)
      }
      .start()

  /** One bitmap-merge step; also usable from batch jobs. */
  def bitmapUpsert(batch: DataFrame, keyCols: Seq[String], idCol: String,
      maxId: Long, path: String): Unit = {
    val spark = batch.sparkSession
    graft.functions.Vectors.ensureRegistered(spark)
    val compact = batch.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("pv_ct"),
        call_function("graft_bitmap_bytes", col(idCol), lit(maxId))
          .as("uv_bm"))
    val merged =
      if (new java.io.File(path).exists()) {
        val cur = spark.read.parquet(path)
        cur.unionByName(compact.select(cur.columns.map(col): _*))
          .groupBy(keyCols.map(col): _*)
          .agg(
            sum(col("pv_ct")).cast("long").as("pv_ct"),
            call_function("graft_bitmap_union", col("uv_bm")).as("uv_bm"))
      } else compact
    replaceDir(merged, path)
  }

  /** One sketch-merge step; also usable from batch jobs. */
  def sketchUpsert(batch: DataFrame, keyCols: Seq[String], idCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    val compact = batch.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("pv_ct"),
        hll_sketch_agg(col(idCol)).as("uv_sketch"))
    val merged =
      if (new java.io.File(path).exists()) {
        val cur = spark.read.parquet(path)
        cur.unionByName(compact.select(cur.columns.map(col): _*))
          .groupBy(keyCols.map(col): _*)
          .agg(
            sum(col("pv_ct")).cast("long").as("pv_ct"),
            hll_union_agg(col("uv_sketch")).as("uv_sketch"))
      } else compact
    replaceDir(merged, path)
  }

  /** One summing-merge step; also usable from batch jobs. */
  def sumUpsert(batch: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String], path: String): Unit = {
    val spark = batch.sparkSession
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    val compact = batch.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val merged =
      if (new java.io.File(path).exists()) {
        val cur = spark.read.parquet(path)
        cur.unionByName(compact.select(cur.columns.map(col): _*))
          .groupBy(keyCols.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
      } else compact
    replaceDir(merged, path)
  }

  /** One merge step; also usable from batch jobs. */
  def upsert(batch: DataFrame, keyCols: Seq[String], versionCol: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val merged =
      if (new java.io.File(path).exists()) {
        val cur = spark.read.parquet(path)
        cur.unionByName(latest.select(cur.columns.map(col): _*))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      } else latest
    replaceDir(merged, path)
  }

  /** Crash-recoverable snapshot swap — shared with the batch
    * compaction utility (see [[graft.sources.Compaction.replaceDir]]
    * for the protocol).
    */
  private[streaming] def replaceDir(df: DataFrame, path: String): Unit =
    graft.sources.Compaction.replaceDir(df, path)
}

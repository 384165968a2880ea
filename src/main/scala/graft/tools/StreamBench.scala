package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput measurement for the streaming flagship (r10 VERDICT
  * "Next round" #5): §2.3 proves stream == batch for every streaming
  * job, but the reference is an OPERATIONAL real-time pipeline —
  * parity needs a sustained-rate number, not just equal answers.
  *
  * Drives `Jobs.skuOrderWindow` — the full DWS trade topology
  * (detail stream ⋈ broadcast dim → watermarked 1-day tumbling
  * window → money agg), the Spark re-expression of the reference's
  * DwsTradeSkuOrderWindow.java:1 — over the ENTIRE sf-dir lineitem
  * fact staged as a multi-file parquet source, consumed with
  * Trigger.AvailableNow in bounded micro-batches on the RocksDB
  * state store (the operational backend every TWS job already
  * requires). Reports end-to-end seconds, micro-batch count, input
  * rows, sustained rows/sec, and peak state rows:
  *
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.StreamBench \
  *     /root/testdata/sf0.1 STREAMBENCH_r11.json
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("STREAMBENCH.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-stream-bench")
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
            "RocksDBStateStoreProvider"),
        // r11 opt note: rocksdb.changelogCheckpointing was tried and
        // measured 62.0k -> 56.7k rows/s here — with LOCAL-disk
        // checkpoints the snapshot upload it avoids is nearly free,
        // so the changelog write is pure overhead. On object-store
        // checkpoints it is the standard production setting; left
        // off so the committed artifact reflects this box.
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables

    // stage the fact as a 32-chunk event-time-ordered source so
    // AvailableNow consumes it as real micro-batches (4 files each)
    // in the operational Kafka order — see graft.streaming.Replay
    // for why random file order would void the number
    val stageDir = "/tmp/streambench_stage"
    val ckpt = s"/tmp/streambench_ckpt_${System.currentTimeMillis()}"
    val chunks = 32
    val src0 = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").cast("timestamp").as("d_time"),
        col("l_partkey").as("sku_id"),
        col("l_extendedprice").as("amount"))
    val inputRows = graft.streaming.Replay
      .stageOrdered(src0, "d_time", stageDir, chunks)
    val dim = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"))

    val stream = spark.readStream
      .schema(spark.read.parquet(stageDir).schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(stageDir)
      .drop("ck")
    val t0 = System.nanoTime()
    val q = graft.streaming.Jobs
      .skuOrderWindow(stream, dim, "p_partkey", "p_brand")
      .writeStream.format("memory").queryName("streambench")
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    val batches = progress.count(_.numInputRows > 0)
    val streamedRows = progress.map(_.numInputRows).sum
    val stateRows = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsTotal).maxOption.getOrElse(0L)
    val outRows = spark.sql("SELECT count(*) FROM streambench")
      .collect()(0).getLong(0)
    val sinkGroups = spark.sql(
      "SELECT count(*) FROM (SELECT DISTINCT wstart, p_brand FROM streambench)")
      .collect()(0).getLong(0)
    // batch replay cross-check: same join + window over the staged
    // input must agree with the stream's final aggregate universe
    val batchGroups = spark.read.parquet(stageDir)
      .join(dim, col("sku_id") === col("p_partkey"))
      .groupBy(window(col("d_time"), "1 day"), col("p_brand"))
      .count().count()
    val rate = if (elapsed > 0) streamedRows / elapsed else 0.0
    val line =
      s"""{"metric":"stream_rows_per_sec","value":${f"$rate%.0f"},""" +
      s""""unit":"rows/sec","job":"skuOrderWindow","backend":"rocksdb",""" +
      s""""trigger":"AvailableNow","sf":"$sfDir",""" +
      s""""input_rows":$inputRows,"streamed_rows":$streamedRows,""" +
      s""""batches":$batches,"elapsed_sec":${f"$elapsed%.2f"},""" +
      s""""state_rows_peak":$stateRows,"sink_rows":$outRows,""" +
      s""""sink_group_count":$sinkGroups,"batch_group_count":$batchGroups,""" +
      s""""git_sha":"${graft.Verify.gitSha()}",""" +
      s""""utc":"${graft.Verify.utcNow()}"}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    require(streamedRows == inputRows,
      s"stream consumed $streamedRows of $inputRows staged rows")
    require(sinkGroups == batchGroups,
      s"watermark dropped windows: sink has $sinkGroups of " +
        s"$batchGroups groups — the rate is not an operational number")
    spark.stop()
  }
}

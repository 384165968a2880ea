package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Maps the reference's domain onto the testdata: the page-view log
  * topic (reference DwdBaseLog.java) → `events`; order_info →
  * `orders`; order_detail → `lineitem`; sku/spu/trademark dims →
  * `part`; province/region → `nation`/`region`; user_info →
  * `customer`; documents/embeddings back the LLM-pipeline operators.
  *
  * All reads are plain parquet scans so Catalyst keeps predicate
  * pushdown and column pruning; at warehouse scale these would be
  * partitioned (orders/lineitem by date) and the loaders stay valid —
  * partition pruning composes with the same call sites.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // memoized per (session, dir, table): spark.read.parquet re-reads
  // footers (schema inference + file listing) on EVERY call, and every
  // query construction calls it once per table — ~20-50 ms each that
  // the bench pays per run per table (r11 floor attribution). The
  // returned plan is immutable; the testdata paths are too.
  private val loadRegistry =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    loadRegistry.computeIfAbsent((spark, sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Register every table as a temp view so callers can work in raw
    * SQL — the reference's BaseSQLApp pattern (gmall2024-realtime-
    * master/realtime-common/.../base/BaseSQLApp.java:1) where each
    * app body is `tableEnv.executeSql(...)`. With [[graft.
    * GraftExtensions]] on the session, graft's native functions are
    * available in those queries too.
    */
  // last-registered dir per session: re-registering ten views per
  // raw-SQL query construction is pure overhead when the dir hasn't
  // changed (the bench/verify case); a different dir re-registers
  private val viewsRegistered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    if (viewsRegistered.put(spark, sfDir) != sfDir) {
      all.foreach { name =>
        val df = if (name == "events") events(spark, sfDir)
                 else load(spark, sfDir, name)
        df.createOrReplaceTempView(name)
      }
    }

  /** Widen a narrow scan to cluster parallelism. A single parquet
    * file with one row group scans as ONE partition no matter what
    * `maxPartitionBytes` says — so a CPU-heavy operator downstream
    * runs single-threaded. Conditional: already-wide inputs (the
    * normal case at warehouse scale, where tables are thousands of
    * files) pass through untouched, so this costs nothing on a real
    * cluster and only pays one small shuffle on consolidated inputs.
    */
  def spread(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    // A small single-row-group parquet file defeats the partition
    // COUNT check: Spark slices it into bytes/core splits (so the
    // count reads >= dp), but every row lives in the slice holding
    // the row-group start — "32 partitions" executing as ONE busy
    // task. Per-row-expensive work (winnowing was the one that
    // visibly hung: ~20 min single-threaded at sf0.1) then runs
    // serially. Inputs under 64 MB are always round-robined: that
    // shuffle is free by definition, and at real scale the size
    // guard makes spread a no-op, so large corpora never shuffle.
    val tiny =
      df.queryExecution.optimizedPlan.stats.sizeInBytes < (64L << 20)
    if (tiny || df.rdd.getNumPartitions < dp) df.repartition(dp) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Normalize an `ts` column to session-zone TimestampType whatever
    * the file-level encoding was. The testdata has shipped as
    * TIMESTAMP(NANOS) (reads as a nanos long under nanosAsLong), as
    * timestamp[us] isAdjustedToUTC=false (reads as TIMESTAMP_NTZ when
    * inference is on), and as plain LTZ micros — a warehouse edge
    * must absorb all three without touching any call site, the same
    * role the reference centralizes in DateFormatUtil.java:1. The
    * session runs in UTC, so the NTZ→LTZ cast preserves the instant
    * and DuckDB-oracle parity.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType => // legacy nanos encoding: micro truncation, same
        // wall time DuckDB sees
        df.withColumn(colName, timestamp_micros(expr(s"$colName DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: co-locate both sides of a recurring
  * fact⋈fact join so the join needs NO shuffle at read time.
  *
  * At warehouse scale the orders⋈lineitem join is the one shuffle the
  * declarative plan can't avoid — unless both tables are written
  * bucketed (and sorted) by the join key, in which case Spark's scan
  * reports the partitioning and the sort-merge join elides both
  * Exchanges and both Sorts. This is the batch equivalent of the
  * reference keying both Kafka topics by order_id so the Flink join
  * is local (FlinkSourceUtil.java:1).
  */
object Bucketing {

  /** Collision-resistant dataset tag for derived-layout table names
    * (`graft_ps_<tag>` etc): 16 hex chars (64 bits) of SHA-256 over
    * the dataset path. The previous 32-bit `String.hashCode` tag
    * could collide across two dataset dirs in one session, silently
    * serving one dataset's bucketed layout for the other (the
    * catalog `tableExists` check passes on the colliding name).
    */
  def datasetTag(d: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  /** Write `df` as a bucketed+sorted managed table. Extra sort
    * columns (e.g. a timestamp after the key) let ORDER-sensitive
    * consumers — the sort-merge as-of join — read pre-sorted buckets.
    *
    * The pre-write `repartition(buckets, key)` uses the same
    * Murmur3 HashPartitioning the bucket spec uses, so every writer
    * task holds exactly the rows of one bucket: one file per bucket
    * (which is what lets the scan REPORT the sort order to the
    * planner), written by `buckets` tasks in parallel rather than a
    * single coalesced writer.
    */
  /** Remove a stale on-disk location for a managed table the CURRENT
    * catalog does not know. A derived layout written by a previous
    * JVM survives in the warehouse dir while the in-memory metastore
    * starts empty — `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS and every consumer of the layout errors
    * (this took all six graph queries down in a fresh-JVM verify).
    * A compute-once layout must be REBUILDABLE whenever the catalog
    * forgot it; deleting the orphaned location is safe exactly
    * because no catalog entry points at it.
    */
  def dropStaleLocation(s: SparkSession, table: String): Unit =
    if (!s.catalog.tableExists(table)) {
      val wh = s.sessionState.conf.warehousePath
      val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }

  /** r12 (VERDICT r11 #6): per-JVM log of compute-once layout builds —
    * table → build seconds. The bench's min-of-k methodology means a
    * layout-backed query's reported seconds are warm-layout reads (the
    * one-time build lands in run 1 and is excluded from the min);
    * stamping the builds into the bench artifact (`layout_builds`)
    * makes that amortized cost visible instead of implicit. Only
    * layouts actually BUILT in this JVM appear — a `tableExists` hit
    * logs nothing, which is itself the disclosure (nothing was built,
    * nothing was paid).
    */
  val buildLog = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def timedBuild(table: String)(build: => Unit): Unit = {
    val t0 = System.nanoTime()
    build
    buildLog.put(table, (System.nanoTime() - t0) / 1e9)
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Seq.empty): Unit =
    timedBuild(table) {
      import org.apache.spark.sql.functions.col
      dropStaleLocation(df.sparkSession, table)
      val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
      df.repartition(buckets, col(key))
        .sortWithinPartitions(sorts.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, key).sortBy(sorts.head, sorts.tail: _*)
        .format("parquet").saveAsTable(table)
    }

  /** Bucket the orders/lineitem pair by order key. */
  def bucketTradeTables(s: SparkSession, d: String, buckets: Int = 16): Unit = {
    writeBucketed(Tables.orders(s, d), "orders_b", "o_orderkey", buckets)
    writeBucketed(Tables.lineitem(s, d), "lineitem_b", "l_orderkey", buckets)
  }

  /** The order-detail join over the bucketed tables — same result as
    * Dwd.tradeOrderDetail, zero shuffles in the plan. The merge hint
    * keeps the planner from broadcasting a locally-small side (which
    * would bypass the bucketing this utility exists to exploit; at
    * warehouse scale neither side is broadcastable anyway).
    */
  def bucketedOrderDetail(s: SparkSession): DataFrame = {
    val o = s.table("orders_b").hint("merge")
    val li = s.table("lineitem_b").hint("merge")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
  }
}

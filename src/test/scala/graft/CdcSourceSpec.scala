package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSource V2 CDC connector: schema, filter pushdown,
  * column pruning, multi-file parallelism, malformed-line tolerance.
  */
class CdcSourceSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def writeChangelog(): String = {
    val dir = Files.createTempDirectory("cdc-src")
    val f1 =
      """{"database":"gmall","table":"order_info","type":"insert","ts":100,"data":{"id":1,"amount":50}}
        |{"database":"gmall","table":"order_info","type":"update","ts":101,"data":{"id":1,"amount":60}}
        |{"database":"gmall","table":"user_info","type":"insert","ts":102,"data":{"id":7,"name":"a"}}
        |not json at all
        |{"database":"gmall","table":"order_info","type":"delete","ts":103,"data":{"id":1}}
        |""".stripMargin
    val f2 =
      """{"database":"gmall","table":"sku_info","type":"insert","ts":200,"data":{"id":9}}
        |{"database":"gmall","table":"order_info","type":"insert","ts":201,"data":{"id":2,"amount":70}}
        |""".stripMargin
    Files.write(dir.resolve("part-000.jsonl"), f1.getBytes("UTF-8"))
    Files.write(dir.resolve("part-001.jsonl"), f2.getBytes("UTF-8"))
    dir.toString
  }

  test("reads Maxwell-shaped changelogs, skipping malformed lines") {
    val df = s.read.format("graft-cdc").load(writeChangelog())
    assert(df.schema.fieldNames.toSeq === Seq("table", "op", "ts", "data"))
    assert(df.count() === 6, "malformed line must be skipped, not fatal")
    val ops = df.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops === Map("insert" -> 4L, "update" -> 1L, "delete" -> 1L))
    // data payload survives as raw JSON
    val d0 = df.filter(col("ts") === 100).select("data").collect()(0).getString(0)
    assert(d0.contains("\"amount\":50"))
  }

  test("table/op filters push into the scan; pruning narrows ReadSchema") {
    val dir = writeChangelog()
    val filtered = s.read.format("graft-cdc").load(dir)
      .filter(col("table") === "order_info" && col("op") =!= "delete")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(table,order_info)"),
      s"table filter not pushed:\n$plan")
    assert(filtered.count() === 3)
    // pruning: only `ts` requested → scan's ReadSchema is just ts
    val narrow = s.read.format("graft-cdc").load(dir).select("ts")
    val nplan = narrow.queryExecution.executedPlan.toString
    assert(nplan.contains("ReadSchema: struct<ts:bigint>"),
      s"columns not pruned:\n$nplan")
    assert(narrow.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(100L, 101L, 102L, 103L, 200L, 201L))
  }

  test("streams the changelog: new files arrive as new micro-batches, exactly once") {
    val dir = Files.createTempDirectory("cdc-stream")
    Files.write(dir.resolve("log-000.jsonl"),
      """{"table":"t1","type":"insert","ts":1,"data":{"id":1}}
        |{"table":"t1","type":"insert","ts":2,"data":{"id":2}}
        |""".stripMargin.getBytes("UTF-8"))
    val stream = s.readStream.format("graft-cdc").load(dir.toString)
    val q = stream.writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("cdc-ck").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(s.sql("SELECT count(*) FROM cdc_stream").collect()(0).getLong(0) === 2)
      // a new changelog file appears → exactly its rows arrive
      Files.write(dir.resolve("log-001.jsonl"),
        """{"table":"t2","type":"update","ts":3,"data":{"id":3}}
          |""".stripMargin.getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = s.sql("SELECT ts FROM cdc_stream ORDER BY ts").collect()
        .map(_.getLong(0)).toSeq
      assert(rows === Seq(1L, 2L, 3L), "each file delivered exactly once")
    } finally q.stop()
  }

  test("offset compaction: aged-out names leave the checkpoint, rows still exactly-once") {
    val dir = Files.createTempDirectory("cdc-compact")
    def log(name: String, ts: Long, ageMs: Long): Unit = {
      val p = dir.resolve(name)
      Files.write(p,
        s"""{"table":"t","type":"insert","ts":$ts,"data":{"id":$ts}}\n"""
          .getBytes("UTF-8"))
      p.toFile.setLastModified(System.currentTimeMillis() - ageMs)
    }
    log("log-000.jsonl", 1, 60000) // a minute old
    val stream = s.readStream.format("graft-cdc")
      .option("maxFileAgeMs", "5000").load(dir.toString)
    val ck = Files.createTempDirectory("cdc-compact-ck")
    val q = stream.writeStream.format("memory").queryName("cdc_compact")
      .outputMode("append").option("checkpointLocation", ck.toString)
      .start()
    try {
      q.processAllAvailable()
      // the old file is within the first batch's horizon? No: the
      // watermark trails the NEWEST mtime, so a single old file is
      // still newest and gets read
      assert(s.sql("SELECT count(*) FROM cdc_compact")
        .collect()(0).getLong(0) === 1)
      // a fresh file advances the watermark past log-000's mtime
      log("log-001.jsonl", 2, 0)
      q.processAllAvailable()
      val rows = s.sql("SELECT ts FROM cdc_compact ORDER BY ts").collect()
        .map(_.getLong(0)).toSeq
      assert(rows === Seq(1L, 2L), "compaction must not re-deliver or drop")
      // the latest committed offset no longer carries the aged-out name
      val offsets = ck.resolve("offsets").toFile.listFiles()
        .filter(f => f.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val last = new String(Files.readAllBytes(
        offsets.last.toPath), "UTF-8")
      assert(last.contains("w:"), s"no watermark in offset: $last")
      assert(!last.contains("log-000"),
        s"aged-out file still in the offset: $last")
      assert(last.contains("log-001"), "young file must stay in the offset")
    } finally q.stop()
  }

  test("Debezium envelope: op codes map, delete takes before, ts_ms read") {
    val dir = Files.createTempDirectory("cdc-dbz")
    Files.write(dir.resolve("dbz-000.jsonl"),
      """{"op":"c","ts_ms":1000,"source":{"table":"order_info"},"after":{"id":1,"amount":50}}
        |{"op":"u","ts_ms":1001,"source":{"table":"order_info"},"before":{"id":1,"amount":50},"after":{"id":1,"amount":60}}
        |{"op":"d","ts_ms":1002,"source":{"table":"order_info"},"before":{"id":1,"amount":60}}
        |{"op":"r","ts_ms":1003,"source":{"table":"user_info"},"after":{"id":7}}
        |""".stripMargin.getBytes("UTF-8"))
    val df = s.read.format("graft-cdc")
      .option("envelope", "debezium").load(dir.toString)
    val rows = df.orderBy("ts").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_._2).toSeq === Seq("insert", "update", "delete", "insert"))
    assert(rows(2)._4.contains("\"amount\":60"), "delete carries the before image")
    assert(rows(3)._1 === "user_info", "snapshot read maps to insert")
    // pushdown on the mapped op name: insert must match BOTH c and r
    val ins = s.read.format("graft-cdc")
      .option("envelope", "debezium").load(dir.toString)
      .filter(col("op") === "insert")
    assert(ins.count() === 2)
    val plan = ins.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(op,insert)"), s"op filter not pushed:\n$plan")
  }

  test("end-to-end ODS: graft-cdc stream through the CdcRouter to per-table sinks") {
    import graft.streaming.CdcRouter
    val dir = Files.createTempDirectory("cdc-e2e")
    Files.write(dir.resolve("log-000.jsonl"),
      """{"table":"order_info","type":"insert","ts":1,"data":{"id":1}}
        |{"table":"order_info","type":"delete","ts":2,"data":{"id":1}}
        |{"table":"user_info","type":"insert","ts":3,"data":{"id":7}}
        |{"table":"ignored_tbl","type":"insert","ts":4,"data":{"id":9}}
        |""".stripMargin.getBytes("UTF-8"))
    val out = Files.createTempDirectory("cdc-e2e-out")
    val routes = Map(
      "order_info" -> CdcRouter.Route(s"$out/order_info"),
      "user_info" -> CdcRouter.Route(s"$out/user_info", keepDeletes = true))
    val stream = s.readStream.format("graft-cdc").load(dir.toString)
    val q = CdcRouter.start(stream, routes,
      Files.createTempDirectory("cdc-e2e-ck").toString)
    try q.processAllAvailable() finally q.stop()
    // order_info: delete dropped -> 1 row; user_info: 1; ignored: none
    assert(s.read.parquet(s"$out/order_info").count() === 1)
    assert(s.read.parquet(s"$out/user_info").count() === 1)
    assert(!new java.io.File(s"$out/ignored_tbl").exists())
  }

  test("single-pass partitioned router equals the per-route loop") {
    import graft.streaming.CdcRouter
    val dir = Files.createTempDirectory("cdc-part")
    Files.write(dir.resolve("log-000.jsonl"),
      """{"table":"order_info","type":"insert","ts":1,"data":{"id":1}}
        |{"table":"order_info","type":"delete","ts":2,"data":{"id":1}}
        |{"table":"user_info","type":"insert","ts":3,"data":{"id":7}}
        |{"table":"user_info","type":"delete","ts":4,"data":{"id":7}}
        |{"table":"ignored_tbl","type":"insert","ts":5,"data":{"id":9}}
        |""".stripMargin.getBytes("UTF-8"))
    val base = Files.createTempDirectory("cdc-part-out").toString + "/ods"
    val routes = Map(
      "order_info" -> CdcRouter.Route("", keepDeletes = false),
      "user_info" -> CdcRouter.Route("", keepDeletes = true))
    val stream = s.readStream.format("graft-cdc").load(dir.toString)
    val q = CdcRouter.startPartitioned(stream, () => routes, base,
      Files.createTempDirectory("cdc-part-ck").toString)
    try q.processAllAvailable() finally q.stop()
    // one write, hive layout: order_info drops its delete, user_info
    // keeps its delete, unconfigured table never lands
    val order = s.read.parquet(CdcRouter.tablePath(base, "order_info"))
    assert(order.count() === 1)
    val user = s.read.parquet(CdcRouter.tablePath(base, "user_info"))
    assert(user.count() === 2)
    assert(!new java.io.File(s"$base/table=ignored_tbl").exists())
    // a one-table read prunes to that table's directory
    val pruned = s.read.parquet(base).filter(col("table") === "user_info")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"not pruned:\n${plan.take(800)}")
    assert(pruned.count() === 2)
  }

  test("one partition per file; feeds the CDC router input shape") {
    val dir = writeChangelog()
    val df = s.read.format("graft-cdc").load(dir)
    assert(df.rdd.getNumPartitions === 2, "one split per changelog file")
    // the router's exact consumption pattern (batch form)
    val routed = df.filter(col("table") === "order_info")
      .filter(col("op") =!= "delete")
      .select("ts", "table", "op", "data")
    assert(routed.count() === 3)
  }
}

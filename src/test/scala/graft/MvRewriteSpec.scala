package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized-view rewrite: canonical aggregate → summary scan,
  * exprIds preserved, non-matching plans untouched, drift-safe.
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private val key = "spark.graft.mv.eventsDaily"

  private def scans(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("registered MV: plan scans the summary, answers match the direct agg") {
    val direct = graft.warehouse.Dws.trafficDaily(s, d)
      .select(col("day"), col("event_type"), col("pv_ct"),
        col("value_sum").cast("double").as("value_sum"))
      .collect().toSet
    try {
      val viaMv = graft.warehouse.Dws.trafficDailyViaMv(s, d)
      // registration is SCOPED to the one query: the conf must not
      // leak onto the session after the call returns
      assert(s.conf.getOption(key).isEmpty,
        "MV conf must be restored after the scoped query")
      val plan = scans(viaMv)
      assert(plan.contains("events_daily"),
        s"summary scan missing:\n${plan.take(1500)}")
      assert(!plan.contains("events.parquet"),
        s"raw fact scan must be gone:\n${plan.take(1500)}")
      assert(viaMv.collect().toSet === direct)
      // parents keep working on the rewritten child (explicit session
      // registration here — the scoped helper restores the conf).
      // NOTE: the filter sits on an AGGREGATE OUTPUT (pv_ct) so it
      // cannot push below the canonical aggregate — a grouping-key
      // filter WOULD push under it and change the matched shape
      // (that's the residual-predicate containment case this
      // exact-match rule explicitly does not claim; see
      // SummaryRewrite scaladoc)
      val path = java.nio.file.Files.createTempDirectory("graft-mv")
        .toString + "/events_daily"
      graft.warehouse.Dws.trafficDaily(s, d)
        .write.mode("overwrite").parquet(path)
      s.conf.set(key, path)
      val filtered = graft.warehouse.Dws.trafficDaily(s, d)
        .filter(col("pv_ct") > 0)
        .agg(sum(col("pv_ct")).as("views"))
      assert(scans(filtered).contains("events_daily"))
      val expect = direct.toSeq.filter(_.getLong(2) > 0)
        .map(_.getLong(2)).sum
      assert(filtered.head().getLong(0) === expect)
    } finally s.conf.unset(key)
  }

  test("roll-up: the MONTHLY grain re-aggregates the daily summary") {
    val direct = graft.warehouse.Dws.trafficMonthly(s, d)
      .select(col("month"), col("event_type"), col("pv_ct"),
        col("value_sum").cast("double").as("value_sum"))
      .collect().toSet
    try {
      val viaMv = graft.warehouse.Dws.trafficMonthlyViaMv(s, d)
      val plan = scans(viaMv)
      assert(plan.contains("events_daily"),
        s"roll-up must read the daily summary:\n${plan.take(1500)}")
      assert(!plan.contains("events.parquet"),
        s"raw fact scan must be gone:\n${plan.take(1500)}")
      assert(viaMv.collect().toSet === direct)
    } finally s.conf.unset(key)
  }

  test("encoding drift: NTZ-read session still splices the LTZ-built MV") {
    // the r5 failure mode: testdata re-encoded ts as timestamp[us]
    // NTZ and the MV serving path silently died (structural veto).
    // The summary is built under the tuned session (NTZ inference
    // off → ts reads as LTZ); the query runs in a DRIFTED session
    // with NTZ inference on, the way an untuned deployment would
    // read the same files. The splice must still fire — the loader's
    // NTZ→UTC-session cast is one of the canonical ts shapes — and
    // answers must match the tuned session's.
    val path = java.nio.file.Files.createTempDirectory("graft-mv")
      .toString + "/events_daily"
    graft.warehouse.Dws.trafficDaily(s, d)
      .write.mode("overwrite").parquet(path)
    val sNtz = s.newSession()
    sNtz.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    sNtz.conf.set(key, path)
    try {
      // drift must actually happen in this session or the test is vacuous
      val raw = sNtz.read.parquet(s"$d/events.parquet").schema("ts").dataType
      assert(raw == org.apache.spark.sql.types.TimestampNTZType,
        s"expected a TIMESTAMP_NTZ read, got $raw — testdata encoding changed?")
      val viaMv = graft.warehouse.Dws.trafficDaily(sNtz, d)
      val plan = scans(viaMv)
      assert(plan.contains("events_daily"),
        s"drifted-encoding session must still serve from the MV:\n${plan.take(1500)}")
      assert(!plan.contains("events.parquet"),
        s"raw fact scan must be gone:\n${plan.take(1500)}")
      val tuned = graft.warehouse.Dws.trafficDaily(s, d)
        .select(col("day"), col("event_type"), col("pv_ct"),
          col("value_sum").cast("double").as("value_sum")).collect().toSet
      assert(viaMv.select(col("day"), col("event_type"), col("pv_ct"),
        col("value_sum").cast("double").as("value_sum"))
        .collect().toSet === tuned)
    } finally { sNtz.conf.unset(key) }
  }

  test("non-matching aggregates are left alone") {
    val path = java.nio.file.Files.createTempDirectory("graft-mv")
      .toString + "/events_daily"
    graft.warehouse.Dws.trafficDaily(s, d)
      .write.mode("overwrite").parquet(path)
    s.conf.set(key, path)
    try {
      // hourly grouping — not the canonical shape
      val hourly = graft.warehouse.Dws.trafficPageView(s, d)
      assert(!scans(hourly).contains("events_daily"))
    } finally s.conf.unset(key)
  }

  test("full loop: a STREAM maintains the summary, the optimizer serves from it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sq = s.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-mv")
      .toString + "/events_daily"
    val ck = java.nio.file.Files.createTempDirectory("graft-mv-ck").toString
    // the events table replayed as a stream; each micro-batch
    // incrementally folds into the day-grain summary (sum-merge —
    // correct under any batching)
    val rows = graft.sources.Tables.events(s, d)
      .select(col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val serving = path + "_serving"
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = mem.toDF().toDF("ts", "event_type", "value")
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch(
        graft.streaming.Jobs.maintainDailySummary(path, serving))
      .start()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    mem.addData(h1.toSeq); q.processAllAvailable()
    mem.addData(h2.toSeq); q.processAllAvailable()
    q.stop()
    // register the stream-maintained summary; the dashboard query is
    // rewritten onto it and matches the batch answer exactly
    s.conf.set(key, serving)
    try {
      val dash = graft.warehouse.Dws.trafficDaily(s, d)
      assert(scans(dash).contains("events_daily"))
      s.conf.unset(key)
      val direct = graft.warehouse.Dws.trafficDaily(s, d).collect().toSet
      s.conf.set(key, path)
      assert(dash.collect().toSet === direct)
    } finally s.conf.unset(key)
  }

  test("summary maintenance skips replayed micro-batches (no double count)") {
    val path = java.nio.file.Files.createTempDirectory("graft-mv-idem")
      .toString + "/state"
    val serving = path + "_serving"
    val fn = graft.streaming.Jobs.maintainDailySummary(path, serving)
    val ev = graft.sources.Tables.events(s, d)
      .select(col("ts"), col("event_type"), col("value"))
    fn(ev, 0L)
    val once = s.read.parquet(serving).collect().toSet
    // at-least-once replay of the SAME batchId must be a no-op fold
    fn(ev, 0L)
    assert(s.read.parquet(serving).collect().toSet === once,
      "replayed micro-batch double-counted the summary")
    // a genuinely new batch still folds
    fn(ev, 1L)
    val twice = s.read.parquet(serving).collect()
      .map(r => (r.getDate(0), r.getString(1)) -> r.getLong(2)).toMap
    val base = once.toSeq
      .map(r => (r.getDate(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(twice === base.map { case (k, v) => k -> v * 2 })
  }

  test("same-named but semantically different bodies are NOT spliced") {
    import org.apache.spark.sql.types.DecimalType
    val path = java.nio.file.Files.createTempDirectory("graft-mv")
      .toString + "/events_daily"
    graft.warehouse.Dws.trafficDaily(s, d)
      .write.mode("overwrite").parquet(path)
    s.conf.set(key, path)
    try {
      val ev = graft.sources.Tables.events(s, d)
      def agg2(day: org.apache.spark.sql.Column,
          sm: org.apache.spark.sql.Column) =
        ev.groupBy(day.as("day"), col("event_type"))
          .agg(count(lit(1)).as("pv_ct"), sm.as("value_sum"))
      val canonSum = sum(col("value").cast(DecimalType(12, 2)))
      // negated sum: same references, same result type, different query
      val neg = agg2(col("ts").cast("date"),
        sum(-col("value").cast(DecimalType(12, 2))))
      assert(!scans(neg).contains("events_daily"),
        "sum(-cast(value)) must not be served from value_sum")
      // shifted day: cast-to-date whose only reference is ts, but not
      // the canonical cast(ts as date)
      val shifted = agg2(
        (col("ts") + expr("interval 1 day")).cast("date"), canonSum)
      assert(!scans(shifted).contains("events_daily"),
        "cast(ts + interval 1 day as date) must not be served from day")
      // count(DISTINCT value) aliased pv_ct: not count(*)
      val dist = ev.groupBy(col("ts").cast("date").as("day"),
          col("event_type"))
        .agg(countDistinct(col("value")).as("pv_ct"), canonSum.as("value_sum"))
      assert(!scans(dist).contains("events_daily"),
        "count(DISTINCT …) must not be served from pv_ct")
      // the canonical shape itself still splices under the same conf
      val canon = agg2(col("ts").cast("date"), canonSum)
      assert(scans(canon).contains("events_daily"))
    } finally s.conf.unset(key)
  }

  test("schema drift: incompatible summary is ignored, not spliced") {
    val bad = java.nio.file.Files.createTempDirectory("graft-mv")
      .toString + "/events_daily"
    // right column names, wrong types (pv_ct as string)
    graft.warehouse.Dws.trafficDaily(s, d)
      .select(col("day"), col("event_type"),
        col("pv_ct").cast("string").as("pv_ct"), col("value_sum"))
      .write.mode("overwrite").parquet(bad)
    s.conf.set(key, bad)
    try {
      val q = graft.warehouse.Dws.trafficDaily(s, d)
      assert(!scans(q).contains("events_daily"),
        "drifted summary must NOT be spliced")
      assert(q.count() > 0)
    } finally s.conf.unset(key)
  }
  test("bitmap rewrite: declared column serves COUNT(DISTINCT) via the native aggregate") {
    val bk = "spark.graft.bitmap.countDistinct"
    def dailyUv = graft.sources.Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("dt"))
      .agg(countDistinct(col("user_id")).as("uv"))
    val plainPlan = dailyUv.queryExecution.executedPlan.toString
    assert(!plainPlan.contains("graft_bitmap_distinct"),
      "no rewrite without the declaration")
    val baseline = dailyUv.collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    s.conf.set(bk, s"events.parquet:user_id:${1L << 24}")
    try {
      val rewritten = dailyUv
      assert(rewritten.queryExecution.executedPlan.toString
        .contains("graft_bitmap_distinct"), "declared column must rewrite")
      val got = rewritten.collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(got === baseline, "rewrite must not change the answer")
      // relation gate: same column name on another table is untouched
      val other = graft.sources.Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")))
      assert(!other.queryExecution.executedPlan.toString
        .contains("graft_bitmap_distinct"))
    } finally s.conf.unset(bk)
    // a mis-declared domain fails loudly, never a silent wrong count
    s.conf.set(bk, "events.parquet:user_id:10")
    try {
      val e = intercept[Exception] { dailyUv.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("outside")), s"got: ${msgs(e)}")
    } finally s.conf.unset(bk)
  }
}

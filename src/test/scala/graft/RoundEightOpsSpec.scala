package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.warehouse.Analytics
import graft.operators.TextAnalysis

/** Driver-replay and invariant specs for the r8 operators — each
  * oracle-graded in the gate, these pin the SEMANTICS against an
  * independent in-memory replay so an oracle-and-engine-agree-but-
  * both-wrong regression can't slip through.
  */
class RoundEightOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("Mann-Kendall: S and Var replay on the driver; z bounded") {
    val r = Analytics.mannKendall(s, d).collect().head
    // independent replay over the same daily series
    val daily = graft.sources.Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long")).as("g"))
      .orderBy("dt").collect().map(_.getLong(1))
    val n = daily.length
    var sStat = 0L
    for (i <- daily.indices; j <- (i + 1) until n)
      sStat += java.lang.Long.signum(daily(j) - daily(i))
    val tie = daily.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n.toLong * (n - 1) * (2L * n + 5) - tie
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Long]("s_stat") === sStat)
    assert(r.getAs[Long]("var18") === var18)
    val z = r.getAs[Double]("z_mk")
    val zExpect =
      if (sStat > 0) (sStat - 1.0) / math.sqrt(var18 / 18.0)
      else if (sStat < 0) (sStat + 1.0) / math.sqrt(var18 / 18.0)
      else 0.0
    assert(math.abs(z - zExpect) < 1e-5, s"$z vs replay $zExpect")
  }

  test("Kaplan-Meier: survival starts <= 1e6, is non-increasing, risk sets shrink") {
    val rows = Analytics.kaplanMeier(s, d)
      .orderBy("t_days").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Long]("survival_ppm"))
    assert(surv.head <= 1000000L)
    surv.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "survival must be non-increasing")
    }
    val risk = rows.map(_.getAs[Long]("n_risk"))
    risk.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "risk sets shrink as t grows")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("d_events") >= 1L)
      assert(r.getAs[Long]("d_events") <= r.getAs[Long]("n_risk"))
    }
    // exact recurrence replay: s_t = s_{t-1} * (n-d) / n truncating
    var acc = 1000000L
    rows.foreach { r =>
      acc = acc * (r.getAs[Long]("n_risk") - r.getAs[Long]("d_events")) /
        r.getAs[Long]("n_risk")
      assert(r.getAs[Long]("survival_ppm") === acc)
    }
  }

  test("Shapley: efficiency (sum phi24 = 24*(v(N)-v(empty))) and shares sum to ~1e6") {
    val rows = Analytics.shapleyAttribution(s, d).collect()
    assert(rows.length === 4)
    val phiSum = rows.map(_.getAs[Long]("phi24")).sum
    // v(N) = all converters; v(empty) = converters with no
    // pre-purchase touch — replay both counts directly
    val ev = graft.sources.Tables.events(s, d)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("pay_ts"))
    val vN = fp.count()
    val touched = ev.join(fp, "user_id")
      .filter(col("ts") < col("pay_ts") &&
        col("event_type").isin("view", "click", "signup", "error"))
      .select("user_id").distinct().count()
    val vEmpty = vN - touched
    assert(phiSum === 24L * (vN - vEmpty),
      s"efficiency: $phiSum vs ${24L * (vN - vEmpty)}")
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // truncating divisions: the 4 shares sum to 1e6 minus <= 3 ulps
    assert(shareSum <= 1000000L && shareSum >= 1000000L - 4)
    rows.foreach(r => assert(r.getAs[Long]("phi24") >= 0L,
      "v is monotone, so marginals are non-negative"))
  }

  test("13-gram contamination: ppm bounded, hits <= grams, a planted duplicate reads 1e6") {
    val rows = TextAnalysis.ngramContamination(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("n_grams")
      val h = r.getAs[Long]("n_hit")
      assert(h >= 0 && h <= g)
      assert(r.getAs[Long]("contamination_ppm") === h * 1000000L / g)
    }
    // planted-duplicate contract on a tiny synthetic corpus: an eval
    // doc that is an exact copy of a train doc must read 1e6, and a
    // disjoint eval doc must read 0
    import s.implicits._
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val other = (1 to 20).map(i => s"zzz$i").mkString(" ")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ngram").toString
    Seq((0L, text, "en", "a", text.length.toLong),
        (18L, text, "en", "a", text.length.toLong),
        (19L, other, "en", "a", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = TextAnalysis.ngramContamination(s, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("contamination_ppm"))
      .toMap
    assert(planted(18L) === 1000000L)
    assert(planted(19L) === 0L)
  }

  test("strict_dedup funnel replays the greedy interrupt scan") {
    val got = Analytics.windowFunnelDedup(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wUs = 86400L * 1000000L
    val ev = graft.sources.Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // driver replay of CH max-over-anchors greedy with the
    // strict_dedup interrupt: from each view anchor, advance to the
    // FIRST event of the next wanted type; any earlier repeat of an
    // already-matched type (or the window) stops that anchor
    val expect = ev.groupBy(_._1).map { case (_, xs) =>
      val es = xs.sortBy(e => (e._2, e._3))
      var best = 0L
      es.indices.foreach { i =>
        if (es(i)._4 == "view") {
          best = math.max(best, 1L)
          var lvl = 1
          var j = i + 1
          var alive = true
          while (alive && j < es.length && lvl < 3) {
            val t = es(j)._4
            val inWin = es(j)._2 <= es(i)._2 + wUs
            if (!inWin) alive = false
            else if (lvl == 1) {
              if (t == "view") alive = false // dup of matched type
              else if (t == "click") { lvl = 2; best = math.max(best, 2L) }
            } else { // lvl == 2
              if (t == "view" || t == "click") alive = false
              else if (t == "purchase") { lvl = 3; best = math.max(best, 3L) }
            }
            j += 1
          }
        }
      }
      best
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // users with no view at all read level 0
    val allUsers = ev.map(_._1).distinct.length.toLong
    val withExpect = expect + (0L -> (expect.getOrElse(0L, 0L) +
      (allUsers - expect.values.sum)))
    assert(got === withExpect.filter(_._2 > 0), s"got $got")
  }

  test("sequenceMatch (?1)(?t<W)(?2) replays the exists-with-gap scan") {
    val got = Analytics.sequenceMatchTime(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wUs = 3600L * 1000000L
    val ev = graft.sources.Tables.events(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // naive quadratic replay: ANY view→click pair under the gap (the
    // engine's first-following-click closed form must agree)
    val expect = ev.groupBy(_._1).map { case (_, xs) =>
      val es = xs.sortBy(e => (e._2, e._3))
      val hit = es.indices.exists { i =>
        es(i)._4 == "view" && ((i + 1) until es.length).exists { j =>
          es(j)._4 == "click" && es(j)._2 - es(i)._2 < wUs
        }
      }
      if (hit) 1L else 0L
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expect, s"got $got vs replay $expect")
    assert(got.values.sum === ev.map(_._1).distinct.length.toLong)
  }

  test("sequenceNextNode replays the first-match adjacency walk") {
    val got = Analytics.sequenceNextNode(s, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.sources.Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val expect = ev.groupBy(_._1).values.flatMap { xs =>
      val es = xs.toSeq.sortBy(e => (e._2, e._3)).map(_._4)
      val i = es.indexOf("view")
      if (i < 0) None // users with no view emit no row
      else if (i + 1 >= es.length || es(i + 1) != "click")
        Some("(no match)")
      else if (i + 2 >= es.length) Some("(end)")
      else Some(es(i + 2))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expect, s"got $got vs replay $expect")
  }

  test("deltaSum/boundingRatio replay the daily series fold") {
    val r = Analytics.deltaSumGmv(s, d).collect().head
    val daily = graft.sources.Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long")).as("g"))
      .orderBy("dt").collect()
    val gs = daily.map(_.getLong(1))
    val ds = gs.sliding(2).map { case Array(a, b) =>
      math.max(b - a, 0L) }.sum
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      daily.head.getDate(0).toLocalDate, daily.last.getDate(0).toLocalDate)
    assert(r.getAs[Long]("delta_sum_cents") === ds)
    assert(r.getAs[Long]("n_days") === daily.length.toLong)
    // span = 0 (single-day series) is DEFINED as slope 0 on both
    // engines — the replay must not divide by it either
    assert(r.getAs[Long]("bounding_ratio_cents_per_day") ===
      (if (span == 0) 0L else (gs.last - gs.head) / span))
  }

  test("strict_dedup funnel pins tied first clicks by (us, event_id)") {
    // forged equal-microsecond pair: user 1 has TWO clicks at the
    // same timestamp. Greedy advances to the single first click by
    // (us, event_id) — event 2 — whose next event is the tied click
    // (a repeat of a matched type), so the chain STOPS at level 2.
    // A timestamp-only anchor→click join fans out to the second
    // click too, whose window sees only the purchase → level 3: the
    // bug this test pins. User 2 is the untied control (level 3).
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_funnel_tie").toString
    Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(10), 1L, "click", 0.0, "{}"),
      (3L, ts(10), 1L, "click", 0.0, "{}"),
      (4L, ts(20), 1L, "purchase", 0.0, "{}"),
      (5L, ts(0), 2L, "view", 0.0, "{}"),
      (6L, ts(10), 2L, "click", 0.0, "{}"),
      (7L, ts(20), 2L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.windowFunnelDedup(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1L, 3L -> 1L), s"got $got")
  }

  test("strict-order funnel replays the adjacency scan; <= relaxed") {
    val got = Analytics.windowFunnelStrict(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wUs = 86400L * 1000000L
    // driver replay: per user, sort ALL events (ClickHouse strict
    // order is interrupted by any row, tracked or not), scan triples
    val ev = graft.sources.Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val expect = ev.groupBy(_._1).map { case (_, xs) =>
      val es = xs.sortBy(e => (e._2, e._3))
      val l3 = es.indices.dropRight(2).exists { i =>
        es(i)._4 == "view" && es(i + 1)._4 == "click" &&
          es(i + 2)._4 == "purchase" && es(i + 2)._2 <= es(i)._2 + wUs
      }
      val l2 = es.indices.dropRight(1).exists { i =>
        es(i)._4 == "view" && es(i + 1)._4 == "click" &&
          es(i + 1)._2 <= es(i)._2 + wUs
      }
      val l1 = es.exists(_._4 == "view")
      if (l3) 3L else if (l2) 2L else if (l1) 1L else 0L
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got === expect)
    // strict order can only demote: cumulative users at depth >= L
    // never exceed the relaxed windowFunnel's
    val relaxed = Analytics.windowFunnel(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cum(m: Map[Long, Long], l: Long) =
      m.filter(_._1 >= l).values.sum
    (1L to 3L).foreach { l =>
      assert(cum(got, l) <= cum(relaxed, l),
        s"strict depth-$l exceeded relaxed")
    }
  }

  test("duplicate-order screen replays the per-customer pair scan") {
    val got = graft.warehouse.Quality.duplicateOrders(s, d).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(0), r.getLong(3), r.getLong(4)))).toMap
    val o = graft.sources.Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"),
        to_date(col("o_orderdate"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toLocalDate))
    val expect = o.groupBy(_._2).values.flatMap { arr =>
      val xs = arr.toSeq
      xs.flatMap { a =>
        xs.filter(b => a._1 < b._1).flatMap { b =>
          val gap = math.abs(java.time.temporal.ChronoUnit.DAYS
            .between(a._4, b._4))
          if (gap > 3) None
          else Some((a._1, b._1) -> ((a._2, gap,
            math.abs(a._3 - b._3) * 1000000L / math.max(a._3, b._3))))
        }
      }
    }.toMap
    assert(got === expect)
    assert(got.nonEmpty, "screen found no candidate pairs at this SF")
    // sanity: the proximity score is a ppm in [0, 1e6)
    assert(got.values.forall(v => v._3 >= 0L && v._3 < 1000000L))
  }

  test("fd audit: brand->mfgr holds; g3 replays per candidate") {
    val got = graft.warehouse.Quality.fdAudit(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got.size === 4)
    // generator contract: a nation name maps to exactly one region
    assert(got("n_name->n_regionkey")._2 === 0L,
      "true FD must audit clean")
    assert(got("n_name->n_regionkey")._3 === 0L)
    def replay(df: org.apache.spark.sql.DataFrame, lhs: String,
        rhs: String): (Long, Long, Long, Long) = {
      val rows = df.select(col(lhs).cast("string"),
          col(rhs).cast("string")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      val byL = rows.groupBy(_._1)
      val nGroups = byL.size.toLong
      val viol = byL.values.count(_.map(_._2).distinct.size > 1).toLong
      val g3 = byL.values.map { xs =>
        xs.size - xs.groupBy(_._2).values.map(_.size).max }.sum.toLong
      val ppm = g3 * 1000000L / rows.length
      (nGroups, viol, g3, ppm)
    }
    assert(got("o_custkey->o_orderpriority") ===
      replay(graft.sources.Tables.orders(s, d), "o_custkey",
        "o_orderpriority"))
    assert(got("l_partkey->l_suppkey") ===
      replay(graft.sources.Tables.lineitem(s, d), "l_partkey",
        "l_suppkey"))
    assert(got("c_nationkey->c_mktsegment") ===
      replay(graft.sources.Tables.customer(s, d), "c_nationkey",
        "c_mktsegment"))
  }
}

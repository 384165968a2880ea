package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-memory exact-quantile descent: engine-exact vs Spark's
  * own `percentile()` on adversarial distributions, and the three
  * graded queries carry NO Percentile buffer aggregate in their
  * plans (the 100×-scale memory hazard the operator exists to kill).
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def reference(df: org.apache.spark.sql.DataFrame,
      ps: Seq[(String, Double)]) =
    df.groupBy(col("g"))
      .agg(ps.map { case (n, p) =>
        round(expr(s"percentile(v, $p)"), 6).as(n)
      }.head, ps.map { case (n, p) =>
        round(expr(s"percentile(v, $p)"), 6).as(n)
      }.tail: _*)

  private def check(rows: Seq[(String, Double)],
      ps: Seq[(String, Double)]): Unit = {
    import s.implicits._
    val df = rows.toDF("g", "v")
    val got = graft.operators.Quantiles
      .groupQuantiles(df, Seq("g"), "v", ps, buckets = 16, small = 8)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.get(i + 1))).toMap
    val want = reference(df, ps).collect().map(r => r.getString(0) ->
      ps.indices.map(i => r.get(i + 1))).toMap
    assert(got === want)
  }

  test("descent equals percentile() on uniform, duplicated, and skewed groups") {
    val rnd = new scala.util.Random(42)
    val rows =
      // continuous uniform
      (1 to 500).map(i => ("uniform", rnd.nextDouble() * 1000)) ++
      // one value duplicated massively (bucket of pure duplicates)
      (1 to 400).map(_ => ("dup", 7.25)) ++
      (1 to 40).map(i => ("dup", i.toDouble)) ++
      // heavy tail: five orders of magnitude
      (1 to 300).map(i => ("skew", math.pow(10, rnd.nextDouble() * 5))) ++
      // tiny groups: interpolation edge cases
      Seq(("one", 3.0), ("two", 1.0), ("two", 2.0)) ++
      // negatives straddling zero
      (1 to 100).map(i => ("neg", i - 50.5))
    check(rows, Seq("q01" -> 0.01, "q25" -> 0.25, "q50" -> 0.50,
      "q90" -> 0.90, "q99" -> 0.99))
  }

  test("extreme quantiles hit exact min/max; p in {0,1} supported") {
    import s.implicits._
    val df = (1 to 97).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = graft.operators.Quantiles
      .groupQuantiles(df, Seq("g"), "v",
        Seq("p0" -> 0.0, "p100" -> 1.0), buckets = 8, small = 4)
      .head()
    assert(got.getDouble(1) === 1.0)
    assert(got.getDouble(2) === 97.0)
  }

  test("adjacent-double range resolves (width cannot split)") {
    import s.implicits._
    // at 1e12 one ulp is ~1.2e-4, so the two adjacent doubles stay
    // distinguishable through the 6dp output rounding
    val base = 1e12
    val next = java.lang.Math.nextUp(base)
    val rows = (1 to 50).map(_ => ("g", base)) ++ (1 to 50).map(_ => ("g", next))
    val got = graft.operators.Quantiles
      .groupQuantiles(rows.toDF("g", "v"), Seq("g"), "v",
        Seq("q25" -> 0.25, "q75" -> 0.75), buckets = 4, small = 2)
      .head()
    assert(got.getDouble(1) === math.rint(base * 1e6) / 1e6)
    assert(got.getDouble(2) === math.rint(next * 1e6) / 1e6)
  }

  test("all-null group surfaces with null quantiles (SQL GROUP BY parity)") {
    import s.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
      ("b", None), ("b", None)).toDF("g", "v")
    val got = graft.operators.Quantiles
      .groupQuantiles(df, Seq("g"), "v", Seq("q50" -> 0.5))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else Double.box(r.getDouble(1)))).toMap
    assert(got === Map("a" -> Double.box(2.0), "b" -> null))
  }

  test("driver guard budgets targets×buckets and trips before any descent pass") {
    import s.implicits._
    // 2000 groups × 1 quantile ≈ up to 4000 (group, rank) targets;
    // a 1000-row budget cannot fit even the 16-bucket floor, so the
    // call must fail on the BUDGET message — thrown before the first
    // histogram pass ever collects — not OOM or converge
    val df = (1 to 2000).flatMap(g =>
      Seq((s"g$g", 1.0), (s"g$g", 2.0), (s"g$g", 3.0))).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Quantiles.groupQuantiles(df, Seq("g"), "v",
        Seq("q50" -> 0.5), driverBudget = 1000L)
    }
    assert(e.getMessage.contains("driver budget"),
      s"wrong failure: ${e.getMessage}")
    // the same call under the default budget auto-shrinks the bucket
    // fan-out and still resolves exactly
    val ok = graft.operators.Quantiles.groupQuantiles(df, Seq("g"), "v",
      Seq("q50" -> 0.5), driverBudget = 16L * 2 * 2000 + 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ok("g7") === 2.0 && ok.size === 2000)
  }

  test("group-key encoding collision fails loudly instead of merging groups") {
    import s.implicits._
    // ("a<SEP>b", "c") and ("a", "b<SEP>c") both encode to the same
    // key under the \u0001 separator scheme — distinct groups,
    // one key. The operator must detect and refuse, not corrupt.
    val df = Seq(("a\u0001b", "c", 1.0), ("a", "b\u0001c", 9.0))
      .toDF("g1", "g2", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Quantiles.groupQuantiles(df, Seq("g1", "g2"), "v",
        Seq("q50" -> 0.5))
    }
    assert(e.getMessage.contains("collision"), s"wrong failure: ${e.getMessage}")
  }

  test("graded quantile queries carry no Percentile aggregate in their plans") {
    val qs = Seq(
      graft.warehouse.Analytics.exactQuantiles(s, d),
      graft.warehouse.Analytics.orderTotalHistogramEqDepth(s, d),
      graft.warehouse.Analytics.winsorizedValues(s, d))
    qs.foreach { q =>
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("percentile"),
        s"Percentile buffer aggregate present:\n${plan.take(1200)}")
    }
  }
}

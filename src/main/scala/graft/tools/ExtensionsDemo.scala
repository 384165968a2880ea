package graft.tools

import graft.{GraftExtensions, GraftSession}
import org.apache.spark.sql.SparkSession

/** Drives the deployment path for graft's native functions: a session
  * built with GraftExtensions resolves graft_dot / graft_minhash_sig
  * from raw SQL — the same wiring `spark.sql.extensions=
  * graft.GraftExtensions` gives spark-submit jobs. Also exercises the
  * typed Dataset layer against the decimal DataFrame sum.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[4]")
        .appName("graft-extensions-demo")
        .withExtensions(new GraftExtensions), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false
    def check(name: String, ok: Boolean): Unit = {
      if (!ok) failed = true
      println(s"[ext] $name: ${if (ok) "OK" else "FAIL"}")
    }

    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect()(0).getDouble(0)
    check("graft_dot from SQL via extensions", dot == 11.0)
    val sig = spark.sql(
      "SELECT size(graft_minhash_sig(array(1L, 2L, 3L), 64))")
      .collect()(0).getInt(0)
    check("graft_minhash_sig from SQL via extensions", sig == 64)

    graft.sources.Tables.registerViews(spark, d)
    val sqlOnly = spark.sql("""
      SELECT l_returnflag, count(*) AS ct,
             avg(graft_dot(array(l_quantity), array(l_discount))) AS dotavg
      FROM lineitem GROUP BY 1""").collect()
    check("raw SQL over registered views + native fn", sqlOnly.length == 3)

    val typed = graft.warehouse.Typed.revenueByFlag(spark, d).collect().toMap
    check("typed aggregator returns all flags",
      typed.keySet == Set("A", "N", "R"))
    check("typed revenue positive", typed.values.forall(_ > 0))

    // custom operator through the INJECTED planner strategy alone:
    // build the logical node directly — no runtime registration —
    // so only GraftExtensions' injectPlannerStrategy can plan it
    val l = spark.sql("SELECT * FROM VALUES (1L, 10L), (1L, 20L) AS t(k, ts)")
    val r = spark.sql("SELECT * FROM VALUES (1L, 15L, 1.5D) AS t(k, ts, v)")
    def a(df: org.apache.spark.sql.DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).get
    val node = graft.plans.AsOfJoinNode(
      l.queryExecution.analyzed, r.queryExecution.analyzed,
      a(l, "k"), a(l, "ts"), a(r, "k"), a(r, "ts"), Seq(a(r, "v")))
    val asof = org.apache.spark.sql.classic.GraftSqlBridge.ofRows(spark, node)
      .collect().map(row => row.getLong(1) -> Option(row.get(2))).toMap
    check("as-of exec planned via injected strategy",
      asof == Map(10L -> None, 20L -> Some(1.5)))

    spark.stop()
    if (failed) sys.exit(1)
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Scratch profiling harness for round-5 bench investigation.
  * Usage: runMain graft.tools.ProfileR5 <sfDir> <mode> <names...>
  * Runs each named query `runs` times in the given order, printing
  * per-run timings — unlike Bench it can isolate suite-ordering and
  * cache-residency effects (mode=clear clears the SQL cache between
  * queries).
  */
object ProfileR5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "keep"
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filter(_.startsWith("dedup"))
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("profile-r5"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => }
    names.foreach { name =>
      if (mode == "clear") spark.catalog.clearCache()
      val fn = SparkEntry.queries(name)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"load=$load%.1f")
    spark.stop()
  }
}

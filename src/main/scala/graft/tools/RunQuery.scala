package graft.tools

import org.apache.spark.sql.SparkSession

/** Run ONE registered query by name with the full driver stack trace
  * on failure — `graft.Verify` records only the exception message, so
  * this is the repro harness for a red verify entry:
  *
  *   tools/run.sh graft.tools.RunQuery analytics_theil_sen /root/testdata/sf0.01
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: RunQuery <query_key> [sf_dir]"))
    val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-run-query"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query key: $name"))
    val t0 = System.nanoTime()
    val df = q(spark, d)
    df.show(20, truncate = false)
    println(f"rows=${df.count()} elapsed=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}

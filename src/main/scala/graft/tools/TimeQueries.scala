package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-evaluation query timer — the soak/scale companion to
  * `graft.Bench`. Bench times `df.count()`, which lets Catalyst
  * PRUNE output expressions that don't affect cardinality (that is
  * how a 2⁶³ overflow in waveletEnergy's energy column survived
  * every sf0.1 bench until the first sf0.1 Verify evaluated it).
  * This tool executes the UNPRUNED physical plan —
  * `queryExecution.toRdd.count()` materializes every output column —
  * so its numbers are what a consumer writing the result would pay.
  *
  *   SPARK_GRAFT_TQ_ONLY='^analytics_mann' tools/run.sh \
  *     graft.tools.TimeQueries /tmp/sf1
  *
  * Prints one JSON line per query: {name, min_sec, max_sec, rows}.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_TQ_ONLY").map(_.r)
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-time-queries"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val rows = fn(spark, sfDir).queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
        System.gc()
        println(f"""{"name":"$name","min_sec":${times.map(_._1).min}%.3f,"max_sec":${times.map(_._1).max}%.3f,"rows":${times.head._2}}""")
      }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Window

/** One-off auditor: list every registered query whose analyzed plan
  * contains an unpartitioned Window (empty partitionSpec) — input
  * for the PlanLintSpec bounded-grain whitelist.
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-window-scan"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val wins = fn(spark, d).queryExecution.analyzed.collect {
          case w: Window if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.name).mkString(",")
        }
        if (wins.nonEmpty) println(s"UNPART $n :: ${wins.mkString(" | ")}")
      } catch { case e: Throwable =>
        println(s"ERR $n ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}

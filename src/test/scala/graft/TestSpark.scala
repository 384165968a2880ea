package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide lazy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(cores = 4, appName = "graft-test")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

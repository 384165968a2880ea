package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide lazy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    val s = GraftSession.local(cores = 4, appName = "graft-test",
      extraConfs = Map("spark.sql.warehouse.dir" -> wh.toString))
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

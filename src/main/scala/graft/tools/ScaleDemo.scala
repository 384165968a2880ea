package graft.tools

import graft.GraftSession
import graft.operators.{Multimodal, Skew}
import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._

/** Runnable drive of the scale-pattern utilities: bucketed
  * zero-shuffle join, salted join/agg parity, multimodal batch ops.
  * Prints one observation line each; exits nonzero on mismatch.
  *
  *   sbt "runMain graft.tools.ScaleDemo [sfDir]"
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wh = java.nio.file.Files.createTempDirectory("scaledemo-wh")
    val s = GraftSession.local(8, "graft-scale-demo",
      Map("spark.sql.warehouse.dir" -> wh.toString))
    s.sparkContext.setLogLevel("ERROR")
    var failed = false
    def check(name: String, ok: Boolean, detail: String = ""): Unit = {
      if (!ok) failed = true
      println(s"[scale] $name: ${if (ok) "OK" else "FAIL"} $detail")
    }

    Bucketing.bucketTradeTables(s, d, buckets = 8)
    val bucketed = Bucketing.bucketedOrderDetail(s)
    val plan = bucketed.queryExecution.executedPlan.toString
    check("bucketed join has zero Exchange", !plan.contains("Exchange"))
    check("bucketed join row parity",
      bucketed.count() == Tables.lineitem(s, d).count())

    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
    check("salted join parity",
      Skew.saltedJoin(li, o, "o_orderkey", 4).count() ==
        li.join(o, Seq("o_orderkey")).count())

    val frames = Multimodal.sampleFrames(s, d).count()
    val resized = Multimodal.resize(s, d).count()
    val docs = Tables.documents(s, d).count()
    check("multimodal resize one row per doc", resized == docs)
    check("multimodal frame sampling fan-out", frames > docs,
      s"($frames frames from $docs docs)")

    s.stop()
    if (failed) sys.exit(1)
  }
}

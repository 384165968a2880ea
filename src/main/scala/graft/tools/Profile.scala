package graft.tools

import graft.GraftSession
import graft.operators.Dedup

/** Scratch profiler for operator tuning (not part of the contract).
  * Cold vs warm timings separate codegen/compile fixed costs from
  * data-proportional work — bench times queries cold, so a flat
  * cross-SF number usually means compile overhead, not a bad plan.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(32, "graft-profile")
    s.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (q <- args.drop(1)) {
      time(s"$q cold")(graft.SparkEntry.queries(q)(s, d).count())
      time(s"$q warm")(graft.SparkEntry.queries(q)(s, d).count())
    }
    if (args.length <= 1) {
      time("ngramJaccard cold")(Dedup.ngramJaccard(s, d).count())
      time("ngramJaccard warm")(Dedup.ngramJaccard(s, d).count())
      time("dedupClusters")(Dedup.dedupClusters(Dedup.ngramJaccard(s, d)).count())
    }
    s.stop()
  }
}

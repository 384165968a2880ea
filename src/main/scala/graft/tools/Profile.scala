package graft.tools

import graft.GraftSession
import graft.operators.Dedup

/** Scratch profiler for operator tuning (not part of the contract). */
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
    time("warmup jaccard")(Dedup.ngramJaccard(s, d).count())
    time("jaccard")(Dedup.ngramJaccard(s, d).count())
    time("clusters")(Dedup.dedupClusters(Dedup.ngramJaccard(s, d)).count())
    time("clusters again")(Dedup.dedupClusters(Dedup.ngramJaccard(s, d)).count())
    s.stop()
  }
}

package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

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
    val docs = s.read.parquet(s"$d/documents.parquet")
    val sh = docs.select(col("doc_id"),
      graft.functions.Text.charShingles(col("text"), 12).as("shingles"))
      .select(col("doc_id"), size(col("shingles")).as("n"),
        explode(transform(col("shingles"), x => xxhash64(x))).as("sh"))
      .cache()
    time("explode+cache")(sh.count())
    val joined = sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
    time("join only")(joined.count())
    val grouped = joined.groupBy(col("a.doc_id").as("id_a"),
      col("b.doc_id").as("id_b")).agg(count(lit(1)).as("c"))
    time("join+groupBy")(grouped.count())
    time("full ngramJaccard")(Dedup.ngramJaccard(s, d).count())
    grouped.explain("formatted")
    s.stop()
  }
}

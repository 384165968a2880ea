package graft.tools

import org.apache.spark.sql.functions._
import graft._

/** r12 stage probes, batch 2 — graph heavy-tail attribution at sf1
  * (khop_reach, substitutes, assoc_triples) quoted in
  * OPTIMIZATION_r12.md. Run:
  *   tools/run.sh graft.tools.ProfileR12c [sf_dir]
  */
object ProfileR12c {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val s = GraftSession.local(32, "profile-r12c")
    s.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.operators.Graph

    // ---- khop_reach stages ----
    val und = Graph.coPurchaseEdges(s, d)
      .select(col("s").as("src"), col("t").as("dst"))
    val e = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst")))
    timed("khop: edge scan (sym union)")(println("e=" + e.count()))
    val h1 = e.filter(col("src") % 20 === 0)
    val h2 = h1.select(col("src"), col("dst").as("mid"))
      .join(e.select(col("src").as("mid"), col("dst")), "mid")
      .select(col("src"), col("dst"))
    timed("khop: h2 join (path multiset)")(println("h2=" + h2.count()))
    val tagged = h1.select(col("src"), col("dst"), lit(1L).as("one"))
      .unionByName(h2.select(col("src"), col("dst"), lit(0L).as("one")))
      .filter(col("dst") =!= col("src"))
    val dedup = tagged.groupBy("src", "dst").agg(max(col("one")).as("one"))
    timed("khop: +frontier dedup")(println("dedup=" + dedup.count()))
    timed("khop: full")(println("out=" + Graph.kHopReach(s, d).count()))

    // ---- substitutes stages ----
    val li = Graph.orderParts(s, d)
    timed("subst: nb groupBy(pk)")(println("nb=" +
      li.groupBy("pk").agg(count(lit(1)).as("n")).count()))
    timed("subst: countDistinct(ok)")(println("tot=" +
      li.agg(countDistinct(col("ok"))).collect()(0)))
    timed("subst: pair layout scan")(println("pairs=" +
      Graph.coPurchasePairCounts(s, d).count()))
    timed("subst: full")(println("out=" +
      Graph.substitutePairs(s, d).count()))

    // ---- assoc_triples stages ----
    timed("assoc: total distinct(ok) count")(println("tot=" +
      li.select(col("ok")).distinct().count()))
    val triples = li.as("a")
      .join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .join(li.as("c"),
        col("a.ok") === col("c.ok") && col("b.pk") < col("c.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"),
        col("c.pk").as("pc"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= 2)
    timed("assoc: triple wedge+rollup")(println("triples=" +
      triples.count()))
    timed("assoc: full")(println("out=" +
      Graph.assocTriples(s, d).count()))
    s.stop()
  }
}

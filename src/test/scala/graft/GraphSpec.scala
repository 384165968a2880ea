package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("pagerank: total assignment, determinism, degree correlation") {
    val pr = Graph.pagerankCoPurchase(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.nonEmpty)
    // every score carries at least the teleport mass
    assert(pr.values.forall(_ >= 150000L))
    // deterministic across runs (the integer-arithmetic guarantee)
    val again = Graph.pagerankCoPurchase(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === pr)
    // rank mass follows connectivity: the top-degree decile must
    // outrank the bottom decile on average
    val li = graft.sources.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val deg = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst")).distinct()
      .groupBy("src").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDeg = pr.keys.toSeq.sortBy(deg(_))
    val n10 = math.max(byDeg.size / 10, 1)
    val lo = byDeg.take(n10).map(pr).sum.toDouble / n10
    val hi = byDeg.takeRight(n10).map(pr).sum.toDouble / n10
    assert(hi > lo, s"top-degree decile $hi should outrank bottom $lo")
  }
}

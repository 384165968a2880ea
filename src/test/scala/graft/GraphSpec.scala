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

  test("triangle counts match a brute-force adjacency check") {
    val counts = graft.operators.Graph.triangleCounts(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: adjacency sets on the driver (test scale only)
    val li = graft.sources.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk"), col("b.pk")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      (adj(a) & adj(b)).foreach { c =>
        if (a < b && b < c) { // count each triangle once at its apex pass
          brute(a) += 1; brute(b) += 1; brute(c) += 1
        }
      }
    }
    assert(counts === brute.toMap, "per-node triangle counts diverge")
    // sum over nodes = 3 × triangle count (each triangle hits 3 nodes)
    assert(counts.values.sum % 3 === 0)
  }
}

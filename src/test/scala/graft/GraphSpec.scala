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

  test("k-hop reach equals driver-side BFS on the co-purchase graph") {
    val got = Graph.kHopReach(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    val li = graft.sources.Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val und = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("s0"), col("b.pk").as("t0")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    und.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    got.foreach { case (src, (k1, k2)) =>
      assert(src % 20 === 0)
      val n1 = adj(src)
      val n2 = (n1 ++ n1.flatMap(adj)) - src
      assert(k1 === n1.size.toLong, s"k1 mismatch at $src")
      assert(k2 === n2.size.toLong, s"k2 mismatch at $src")
    }
  }

  test("hot-vertex graph: counts exact, hub adjacency bounded by sqrt(2m)") {
    import s.implicits._
    // synthetic baskets: a hub part rides in 30% of orders, the rest
    // form a sparse ring — the skew shape the degree orientation
    // exists for
    val orders = (1 to 300).flatMap { ok =>
      val ring = Seq(ok % 60, (ok % 60) + 1, (ok % 60) + 2)
        .map(_.toLong + 100L)
      val withHub = if (ok % 10 < 3) ring :+ 9999L else ring
      withHub.map(pk => (ok.toLong, pk))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-hub").toString
    orders.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(dir + "/lineitem.parquet")
    val got = Graph.triangleCounts(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // oracle: the id-oriented wedge join (orientation-invariant)
    val li = orders.toDF("ok", "pk")
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("s"), col("b.pk").as("t")).distinct().cache()
    val tri = e.as("e1").join(e.as("e2"), col("e1.t") === col("e2.s"))
      .join(e.as("e3"),
        col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
      .select(col("e1.s").as("va"), col("e1.t").as("vb"), col("e2.t").as("vc"))
    val want = tri.select(col("va").as("p"))
      .unionByName(tri.select(col("vb").as("p")))
      .unionByName(tri.select(col("vc").as("p")))
      .groupBy("p").agg(count(lit(1)).as("ct")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // the scale property: undirected hub degree is huge, but the
    // (degree, id) orientation caps EVERY out-neighborhood at sqrt(2m)
    val m = e.count()
    val deg = e.select(col("s").as("v")).unionByName(e.select(col("t").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val maxUndirected = deg.agg(max("dg")).head().getLong(0)
    assert(maxUndirected > math.sqrt(2.0 * m),
      s"test graph not skewed enough (hub deg $maxUndirected, m=$m)")
    val sLower = col("ds") < col("dt") ||
      (col("ds") === col("dt") && col("s") < col("t"))
    val maxOut = e
      .join(deg.select(col("v").as("s"), col("dg").as("ds")), "s")
      .join(deg.select(col("v").as("t"), col("dg").as("dt")), "t")
      .select(when(sLower, col("s")).otherwise(col("t")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("outdeg"))
      .agg(max("outdeg")).head().getLong(0)
    assert(maxOut <= math.ceil(math.sqrt(2.0 * m)).toLong,
      s"oriented out-degree $maxOut exceeds sqrt(2m)=${math.sqrt(2.0 * m)}")
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
  test("related items: per-part top-3 replays the basket-Jaccard ranking") {
    val rs = graft.operators.Graph.relatedItems(s, d).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rk")) ->
        (r.getLong(1), r.getAs[Long]("jac_ppm")))
    val li = graft.sources.Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = li.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val parts = byPart.keys.toSeq.sorted
    val pairScores = (for {
      i <- parts.indices; j <- (i + 1) until parts.length
      a = parts(i); b = parts(j)
      shared = (byPart(a) & byPart(b)).size
      if shared >= 2
    } yield {
      val jac = shared.toLong * 1000000L /
        (byPart(a).size + byPart(b).size - shared)
      Seq((a, b, jac), (b, a, jac))
    }).flatten
    val expect = pairScores.groupBy(_._1).flatMap { case (p, xs) =>
      xs.sortBy { case (_, rid, jac) => (-jac, rid) }.take(3)
        .zipWithIndex.map { case ((_, rid, jac), i) =>
          (p, i + 1L) -> (rid, jac)
        }
    }
    assert(rs.toMap === expect)
  }

  test("supplier overlap: pairs replay the bipartite projection") {
    val rs = graft.operators.Graph.supplierOverlap(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("shared_parts"), r.getAs[Long]("jaccard_ppm"))).toMap
    val ps = graft.sources.Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = ps.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val supps = bySupp.keys.toSeq.sorted
    val expect = (for {
      i <- supps.indices; j <- (i + 1) until supps.length
      a = supps(i); b = supps(j)
      sharedSet = bySupp(a) & bySupp(b)
      if sharedSet.size >= 3
    } yield {
      val sh = sharedSet.size.toLong
      (a, b) -> (sh,
        sh * 1000000L / (bySupp(a).size + bySupp(b).size - sh))
    }).toMap
    assert(rs === expect)
  }

  test("clustering coefficient: replays tri/C(deg,2) and stays in [0, 1e6]") {
    val cc = graft.operators.Graph.clusteringCoeff(s, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val tri = graft.operators.Graph.triangleCounts(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deg = graft.operators.Graph.coPurchaseEdges(s, d).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expectKeys = deg.filter(_._2 >= 2).keySet
    assert(cc.keySet === expectKeys, "deg>=2 nodes exactly")
    cc.foreach { case (v, (dg, tc, ppm)) =>
      assert(dg === deg(v))
      assert(tc === tri.getOrElse(v, 0L))
      assert(ppm === tc * 2000000L / (dg * (dg - 1)))
      assert(ppm >= 0L && ppm <= 1000000L,
        s"node $v coefficient $ppm out of range")
    }
  }

  test("link prediction: candidates are non-adjacent, Jaccard bounded, cn verified") {
    val rs = Graph.commonNeighborPairs(s, d).collect()
    val strong = Graph.coPurchasePairCounts(s, d)
      .filter(col("n_st") >= 2).select("s", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // neighbor sets of the strong subgraph
    val nbrs = strong.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rs.foreach { r =>
      val (u, v, cn, j) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("jaccard_ppm"))
      assert(u < v, "pair orientation")
      assert(!strong.contains((u, v)), s"($u,$v) is an existing edge")
      val expect = (nbrs.getOrElse(u, Set.empty) &
        nbrs.getOrElse(v, Set.empty)).size.toLong
      assert(cn === expect, s"cn($u,$v)")
      assert(j > 0 && j <= 1000000L)
    }
    // completeness: every non-adjacent pair with a common strong
    // neighbor is present
    val expectPairs = nbrs.keys.toSeq.combinations(2).map(_.sorted)
      .collect { case Seq(a, b)
        if (nbrs(a) & nbrs(b)).nonEmpty && !strong.contains((a, b)) =>
          (a, b) }.toSet
    assert(rs.map(r => (r.getLong(0), r.getLong(1))).toSet === expectPairs)
  }

  test("assortativity: bounded, and replays a driver-side Pearson over edge degrees") {
    val r = Graph.assortativity(s, d).collect()(0)
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0, s"out of range: $a")
    // driver replay over the collected edge list
    val edges = Graph.coPurchaseEdges(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = scala.collection.mutable.LongMap.empty[Long]
    edges.foreach { case (a2, b) =>
      deg(a2) = deg.getOrElse(a2, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
    }
    val pts = edges.flatMap { case (s2, t) =>
      Seq((deg(s2), deg(t)), (deg(t), deg(s2))) }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val expect = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(math.abs(a - expect) < 1e-5, s"$a vs replay $expect")
    assert(r.getAs[Long]("n") === pts.length.toLong)
  }

  test("k-core equals a driver-side iterative peel, every survivor has degree >= k") {
    val k = 3
    val rs = Graph.kCore(s, d, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver replay of the peel on the same strong edge set
    var edges = Graph.coPurchasePairCounts(s, d)
      .filter(col("n_st") >= 2).select("s", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var stable = false
    while (!stable) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val pruned = edges.filter(e => deg(e._1) >= k && deg(e._2) >= k)
      stable = pruned == edges
      edges = pruned
    }
    val expectDeg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rs === expectDeg)
    rs.values.foreach(deg => assert(deg >= k))
  }

  test("degree distribution: handshake identity and node-count conservation") {
    val rs = Graph.degreeDist(s, d).collect()
    val edgeCt = Graph.coPurchaseEdges(s, d).count()
    val nodeCt = Graph.coPurchaseEdges(s, d)
      .select(col("s").as("n")).union(
        Graph.coPurchaseEdges(s, d).select(col("t").as("n")))
      .distinct().count()
    // Σ degree·count = 2|E| (each edge contributes to two nodes)
    assert(rs.map(r => r.getAs[Long]("degree") * r.getAs[Long]("node_ct"))
      .sum === 2 * edgeCt)
    assert(rs.map(_.getAs[Long]("node_ct")).sum === nodeCt)
    rs.foreach(r => assert(r.getAs[Long]("degree") >= 1L))
  }

  test("hits: broadcast-hinted and AQE-planned shuffle joins agree row-for-row") {
    // broadcastVectors is the scale knob (per-node score vectors
    // outgrow a broadcast at planet scale); both plans must be the
    // same relation
    def rows(b: Boolean) = Graph.hits(s, d, broadcastVectors = b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.get(3))).toSet
    assert(rows(true) === rows(false))
  }

  test("MST: Borůvka forest equals driver Kruskal under the same edge order") {
    // localEdgeThreshold = 0 FORCES the distributed Borůvka branch —
    // the 100 TB path — while the default small-side branch is the
    // Kruskal replay below compared against it
    val got = Graph.minimumSpanningForest(s, d, localEdgeThreshold = 0L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotLocal = Graph.minimumSpanningForest(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === gotLocal,
      "driver-Kruskal branch must equal the Borůvka branch")
    val edges = Graph.coPurchasePairCounts(s, d)
      .filter(col("n_st") >= 2).collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("t"),
        1000000L / r.getAs[Long]("n_st")))
    // Kruskal with union-find under (cost, s, t) lexicographic order
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val expect = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    edges.sortBy(e => (e._3, e._1, e._2)).foreach { e =>
      val (ra, rb) = (find(e._1), find(e._2))
      if (ra != rb) { parent(ra) = rb; expect += e }
    }
    assert(got === expect.toSet)
    // forest invariants: |E| = |V| − #components, total cost matches
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val nComp = nodes.map(find).distinct.length
    assert(got.size === nodes.length - nComp)
    assert(got.toSeq.map(_._3).sum === expect.toSeq.map(_._3).sum)
  }

  test("diameter: driver-BFS branch equals the distributed BSP sweeps") {
    // localEdgeThreshold = 0 forces the distributed 2-sweep ladder
    // (the 100 TB path); the default gated branch is one driver BFS
    // pair — identical start/far tie order, identical hop horizon
    val dist = Graph.diameterTwoSweep(s, d, localEdgeThreshold = 0L)
      .collect().map(_.toSeq).toSeq
    val local = Graph.diameterTwoSweep(s, d)
      .collect().map(_.toSeq).toSeq
    assert(dist === local,
      s"driver BFS $local must equal distributed sweeps $dist")
  }

  test("shortest path: bounded Bellman-Ford replays the driver relaxation") {
    val got = Graph.shortestPath(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = Graph.coPurchasePairCounts(s, d)
      .filter(col("n_st") >= 2).collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("t"),
        1000000L / r.getAs[Long]("n_st")))
    val adj = (st.map(e => (e._1, e._2, e._3)) ++
      st.map(e => (e._2, e._1, e._3))).groupBy(_._1)
    val seed = st.map(_._1).min
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 4) {
      val relax = dist.toSeq.flatMap { case (u, du) =>
        adj.getOrElse(u, Array.empty).map(e => e._2 -> (du + e._3)) }
      dist = (dist.toSeq ++ relax).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(got === dist)
    assert(got(seed) === 0L)
    // triangle inequality against direct edges out of the seed
    adj.getOrElse(seed, Array.empty).foreach { e =>
      assert(got(e._2) <= e._3) }
  }

  test("substitute pairs replay the bounded top-N negative-association scan") {
    val got = Graph.substitutePairs(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val li = graft.sources.Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = li.map(_._1).distinct.length.toLong
    val nb = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val top = nb.toSeq.sortBy { case (pk, n) => (-n, pk) }.take(40)
    val co = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val expect = (for {
      (a, na) <- top; (b, nbb) <- top if a < b
      nab = co((a, b))
      lift = (BigInt(nab) * nBaskets * 1000000 / (BigInt(na) * nbb)).toLong
      if lift < 500000L
    } yield (a, b) -> ((na, nbb, nab, lift))).toMap
    assert(got === expect)
    // the operator must surface at least one never-co-purchased pair
    // OR be empty only if independence truly holds everywhere
    if (got.nonEmpty)
      assert(got.values.forall(_._4 < 500000L))
  }

  test("component sizes partition the node set and replay the rollup") {
    val comp = Graph.components(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val got = Graph.componentSizes(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = comp.groupBy(_._2).values.map(_.size)
      .groupBy(identity).map { case (k, v) =>
        k.toLong -> v.size.toLong }
    assert(got === expect)
    // histogram mass equals the labeled node count (partition proof)
    assert(got.map { case (sz, n) => sz * n }.sum === comp.length.toLong)
  }

  test("personalized pagerank replays the seeded integer iteration") {
    val got = Graph.pprCoPurchase(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    // driver replay with identical truncating-integer semantics
    val e0 = Graph.coPurchaseEdges(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val inbound: Map[Long, Seq[Long]] =
      edges.map { case (src, dst) => (dst, src) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val seeds = deg.keySet.filter(_ % 25 == 0)
    var pr: Map[Long, Long] =
      deg.keySet.map(id => id -> (if (seeds(id)) 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      pr = deg.keySet.map { id =>
        val sc = inbound.getOrElse(id, Seq.empty)
          .map(src => pr(src) / deg(src)).sum
        id -> ((if (seeds(id)) 150000L else 0L) + sc * 85L / 100L)
      }.toMap
    }
    val expect = pr.filter(_._2 > 0)
      .map { case (id, v) => id -> ((if (seeds(id)) 1L else 0L, v)) }
    assert(got === expect)
    // every seed survives with at least the restart mass
    seeds.foreach(id => assert(got(id)._2 >= 150000L))
  }

  test("truss support equals adjacency-set intersection per edge") {
    val got = Graph.trussSupport(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val e0 = Graph.coPurchaseEdges(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    e0.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    assert(got.keySet === e0.toSet)
    e0.foreach { case (a, b) =>
      val sup = (adj(a) & adj(b)).size.toLong
      assert(got((a, b)) === ((sup, sup + 2L)),
        s"support mismatch on edge ($a,$b)")
    }
    // truss property: an edge's support never exceeds min degree - 1
    e0.foreach { case (a, b) =>
      assert(got((a, b))._1 <= math.min(adj(a).size, adj(b).size) - 1L)
    }
  }
}

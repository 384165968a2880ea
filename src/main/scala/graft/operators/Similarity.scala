package graft.operators

import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small)
  * query set against the full corpus — the corpus never shuffles, so
  * at 100 TB this is a single scan with per-row math, O(nq·N·d),
  * embarrassingly parallel. The LSH variant is the scale path when
  * the query set itself is large: both sides bucket on hyperplane
  * signs and only bucket-mates are scored.
  */
object Similarity {

  /** Brute-force cosine top-k for query vectors (vec_id < nQueries).
    * row_number partitions by query id, so the top-k sort is per
    * query, never global.
    *
    * Materialized as a compute-once managed layout per (dataset,
    * nQueries, k): this relation is the shared ground truth of the
    * whole recall-eval family ([[annRecallEval]],
    * [[matryoshkaRecall]], [[ivfProbeSweep]], the DedupSpec recall
    * tests), each of which re-paid the full corpus scan per call —
    * the result is nQueries·k rows, the textbook persist-the-truth
    * case. The one-time build is the documented single broadcast
    * scan; consumers read a tiny table.
    */
  private val bfRegistry = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int, Int), DataFrame]

  def bruteForceTopK(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5): DataFrame =
    bfRegistry.computeIfAbsent((s, d, nQueries, k), _ => {
      val tbl = "graft_bftopk_" +
        s"${graft.sources.Bucketing.datasetTag(d)}_${nQueries}_$k"
      if (!s.catalog.tableExists(tbl))
        graft.sources.Bucketing.timedBuild(tbl) {
          graft.sources.Bucketing.dropStaleLocation(s, tbl)
          bruteForceTopKCompute(s, d, nQueries, k).write
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .format("parquet").saveAsTable(tbl)
        }
      s.table(tbl)
    })

  private def bruteForceTopKCompute(s: SparkSession, d: String,
      nQueries: Int, k: Int): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** IVF-style ANN: corpus vectors are assigned to the nearest of
    * `nCells` centroid vectors (deterministically seeded from the
    * corpus itself — evenly-strided rows, one assignment pass, no
    * iterative training); a query probes its `nProbe` closest cells.
    * Centroid assignment is a broadcast join + per-row argmax, so the
    * corpus never shuffles for indexing; the search join is an
    * equi-join on cell id. Higher recall than plain LSH at the same
    * candidate budget because cells follow the data distribution.
    */
  // r11 OPT (guide §1.2): like [[bruteForceTopK]], the IVF and LSH
  // top-k relations are rank-only nQueries·k-row results consumed by
  // a whole eval family (annRecallEval, rankFusion, the spec recall
  // tests) — each consumer re-paid the index + search pipeline per
  // call. Compute-once managed layouts, same registry discipline and
  // crash-safe dropStaleLocation as the truth table.
  // STALENESS CONTRACT (r12, ADVICE): the table tag hashes the
  // dataset PATH + parameters, matching every other compute-once
  // layout here (bf/km/cooc/truth). Regenerating a dataset IN PLACE
  // therefore requires clearing the warehouse dir (or a new path) —
  // the same rule the rest of the layout family already documents;
  // the deterministic testdata this repo is driven against never
  // mutates in place.
  private val annRegistry = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]

  def annIvf(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val tbl = "graft_annivf_" +
      s"${graft.sources.Bucketing.datasetTag(d)}_${nQueries}_${k}_${nCells}_$nProbe"
    annRegistry.computeIfAbsent((s, d, tbl), _ => {
      if (!s.catalog.tableExists(tbl))
        graft.sources.Bucketing.timedBuild(tbl) {
          graft.sources.Bucketing.dropStaleLocation(s, tbl)
          annIvfCompute(s, d, nQueries, k, nCells, nProbe).write
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .format("parquet").saveAsTable(tbl)
        }
      s.table(tbl)
    })
  }

  private def annIvfCompute(s: SparkSession, d: String, nQueries: Int,
      k: Int, nCells: Int, nProbe: Int): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .cache()
    // centroids: evenly-strided corpus rows, collected to the driver
    // (nCells × dim doubles — the same "tiny broadcast config" shape
    // the reference ships to every task) and inlined as literals, so
    // cell assignment is a pure per-row expression: no join, no
    // window, no shuffle.
    val total = e.count()
    val stride = math.max(1L, total / nCells)
    val cents = e.filter(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < nCells)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getSeq[Double](1).toArray, r.getDouble(2)))
    val cellScores = array(cents.map { case (cv, cn) =>
      Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * cn)
    }: _*)
    val bestCell = (array_position(col("__scores"),
      array_max(col("__scores"))) - 1).cast("int")
    val corpus = e.withColumn("__scores", cellScores)
      .withColumn("cell", bestCell).drop("__scores")
    // queries probe their nProbe best cells: sort (score, idx) structs
    // descending — a 16-element in-row sort, not a window
    val ranked = array_sort(
      transform(sequence(lit(0), lit(cents.length - 1)),
        i => struct(element_at(col("__scores"), i + 1).as("s"), i.as("i"))),
      (a, b) => when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
        .otherwise(a("i").cast("int") - b("i").cast("int")))
    val queries = e.filter(col("vec_id") < nQueries)
      .withColumn("__scores", cellScores)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(transform(slice(ranked, 1, nProbe), x => x("i")))
          .as("cell"))
      .drop("__scores")
    val scored = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    // rank-only output: the float score orders but is never emitted —
    // engine-exact results (and hashable) regardless of fp accumulation
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** Scalar-quantized (int8) ANN — the OTHER practical vector
    * compression beside PQ ([[annPq]]): every coordinate maps to a
    * 0..255 code via the corpus-global (min, max) range, shrinking
    * the corpus 4× with no codebook training, and the search ranks
    * by the cosine of the DEQUANTIZED vectors (x̂ = mn + c·Δ). A raw
    * code dot product is WRONG here: codes are all non-negative, so
    * the (x−mn) shift biases the dot toward high-mass vectors
    * regardless of direction — the first cut of this operator did
    * exactly that and its recall collapsed to 0.03. The quantizer is
    * floor((x−mn)·255/(mx−mn)) — floor, not round: a half-way tie
    * under round could fork engines, floor cannot. Range from a
    * 1-row broadcast; the scan never shuffles to quantize; output is
    * rank-only like every ANN query here.
    */
  def annSq8(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
    val rng = broadcast(e
      .select(explode(col("v")).as("x"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx")))
    val deq = e.crossJoin(rng)
      .select(col("vec_id"),
        transform(col("v"), x =>
          col("mn") + floor((x - col("mn")) * 255d /
            (col("mx") - col("mn"))) *
            ((col("mx") - col("mn")) / 255d)).as("dv"))
      .withColumn("nrm", Vectors.norm(col("dv")))
    val q = deq.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("dv").as("qv"),
        col("nrm").as("qn"))
    val scored = deq.join(broadcast(q),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("dv"), col("qn"),
          col("nrm")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** Hard-negative mining — the contrastive-training complement to
    * [[graft.operators.Dedup.contrastivePairs]]' easy negatives: for
    * each anchor, the most embedding-similar document that is NOT a
    * textual near-duplicate (the pair a similarity model actually
    * learns from; a random negative teaches nothing, a near-dup
    * mislabeled negative poisons). Candidates come from the same
    * strided-centroid IVF cells as [[annIvf]] (the scale path — the
    * corpus never self-joins), the textual-dup exclusion is a
    * LEFT-ANTI join against the exact-Jaccard pair set in both
    * orientations, and the winner is rank-only (cos desc, id) so the
    * output hash-grades.
    */
  def hardNegatives(s: SparkSession, d: String, nQueries: Int = 20,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .cache()
    val total = e.count()
    val stride = math.max(1L, total / nCells)
    val cents = e.filter(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < nCells)
      .orderBy("vec_id").collect()
      .map(r => (r.getSeq[Double](1).toArray, r.getDouble(2)))
    val cellScores = array(cents.map { case (cv, cn) =>
      Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * cn)
    }: _*)
    val bestCell = (array_position(col("__s"),
      array_max(col("__s"))) - 1).cast("int")
    val corpus = e.withColumn("__s", cellScores)
      .withColumn("cell", bestCell).drop("__s")
    val ranked = array_sort(
      transform(sequence(lit(0), lit(cents.length - 1)),
        i => struct(element_at(col("__s"), i + 1).as("s"), i.as("i"))),
      (a, b) => when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
        .otherwise(a("i").cast("int") - b("i").cast("int")))
    val queries = e.filter(col("vec_id") < nQueries)
      .withColumn("__s", cellScores)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(transform(slice(ranked, 1, nProbe), x => x("i")))
          .as("cell"))
    val dups = graft.operators.Dedup.ngramJaccard(s, d)
      .select(col("id_a"), col("id_b"))
    val dupBoth = dups.unionByName(
      dups.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val cand = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(dupBoth.select(col("id_a").as("query_id"),
        col("id_b").as("vec_id")), Seq("query_id", "vec_id"), "left_anti")
      .select(col("query_id"), col("vec_id").as("hard_neg_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("hard_neg_id"))
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("query_id", "hard_neg_id")
  }

  /** Maximum-inner-product top-k (MIPS — the retrieval objective
    * un-normalized rerankers and recommender dot-product models
    * actually optimize, where cosine ANN returns the WRONG answer
    * for vectors of unequal norm): the Shrivastava–Li reduction
    * augments every corpus vector with √(M²−‖x‖²) so all augmented
    * vectors share norm M and the augmented-space angular order
    * equals the inner-product order; cells are assigned by AUGMENTED
    * dot (≡ cosine at constant norm), queries probe with the raw
    * dot (their augmented coordinate is 0), and the candidate set
    * reranks by the exact raw inner product — so the output is
    * hash-gradeable rank-only, like every ANN query here. Same
    * zero-shuffle strided-centroid indexing as [[annIvf]].
    */
  def mipsTopK(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    Vectors.ensureRegistered(s)
    val e0 = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .cache()
    // r11 OPT (guide §1.2): max-norm and row count in ONE 1-row
    // driver action instead of two jobs over the cached corpus
    val hdr = e0.agg(max(col("nrm")), count(lit(1))).collect()(0)
    val mMax = hdr.getDouble(0)
    val total = hdr.getLong(1)
    val e = e0.withColumn("aug",
      sqrt(greatest(lit(0d), lit(mMax * mMax) - col("nrm") * col("nrm"))))
    val stride = math.max(1L, total / nCells)
    val cents = e.filter(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < nCells)
      .orderBy("vec_id").select("v", "aug").collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val corpusScores = array(cents.map { case (cv, ca) =>
      Vectors.dot(col("v"), typedLit(cv)) + col("aug") * ca }: _*)
    val queryScores = array(cents.map { case (cv, _) =>
      Vectors.dot(col("v"), typedLit(cv)) }: _*)
    def best(scores: Column) = (array_position(scores,
      array_max(scores)) - 1).cast("int")
    val corpus = e.withColumn("__s", corpusScores)
      .withColumn("cell", best(col("__s"))).drop("__s", "aug")
    val ranked = array_sort(
      transform(sequence(lit(0), lit(cents.length - 1)),
        i => struct(element_at(col("__s"), i + 1).as("s"), i.as("i"))),
      (a, b) => when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
        .otherwise(a("i").cast("int") - b("i").cast("int")))
    val queries = e.filter(col("vec_id") < nQueries)
      .withColumn("__s", queryScores)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(transform(slice(ranked, 1, nProbe), x => x("i")))
          .as("cell"))
    val scored = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.dot(col("qv"), col("v")).as("ip"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ip").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** Hybrid filtered ANN — vector search constrained by a structured
    * predicate (the AnalyticDB-V "query fusion" shape, VLDB 2020):
    * top-k neighbors among only the documents matching `lang`. This
    * is the PRE-FILTER strategy: the predicate joins/filters the
    * corpus BEFORE any distance math, so the expensive dot products
    * run only on survivors — correct whenever the predicate is
    * selective. (The post-filter alternative — ANN first, predicate
    * after — wins only when the predicate keeps most of the corpus
    * and an index would be bypassed; with our bucketed ANN both
    * compose, bucket-join then filter.) The predicate reaches the
    * documents scan as a PushedFilter; the allowed-id semi-join is
    * UNHINTED — the filtered id set is a linear fraction of the
    * corpus, so AQE broadcasts it while it fits and shuffles beyond.
    */
  def filteredTopK(s: SparkSession, d: String, lang: String = "en",
      nQueries: Int = 20, k: Int = 5): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val allowed = Tables.documents(s, d)
      .filter(col("lang") === lang).select(col("doc_id"))
    val corpus = e.join(allowed, e("vec_id") === allowed("doc_id"),
      "left_semi")
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** Distributed k-means (Lloyd) over the embedding corpus — the
    * semantic-clustering primitive a training pipeline uses for
    * diversity sampling and cluster-balanced dedup, and the trained
    * upgrade of [[annIvf]]'s one-shot strided cells.
    *
    * Scale shape: each iteration is (1) a per-row argmin against
    * k broadcast centroid literals — no join, no shuffle — and (2)
    * one map-side-combinable groupBy computing per-dimension sums
    * (k×dim doubles cross the wire per partition). Centroids collect
    * to the driver between rounds (k×dim — the same "tiny broadcast
    * config" shape as the IVF centroids).
    *
    * Engine-exact grading: embeddings are quantized to integer-valued
    * doubles (round(x·1000)), so per-dimension sums are EXACT whatever
    * the aggregation order, and the assignment metric is the expanded
    * `dot(c,c) − 2·dot(v,c)` evaluated left-to-right — bit-identical
    * in DuckDB's list_sum, with first-minimum tie-break both sides.
    * Production would run raw floats (ties then decided by fp noise,
    * harmless to clustering quality); the quantization exists so the
    * oracle can be exact rather than tolerance-based.
    *
    * The final ASSIGNMENT persists as a bucketed disk layout per
    * (dataset, k, iters, init) — the co-purchase/ps contract: the
    * probe sweep, cluster purity, semdedup and the graded kmeans
    * query all ride the same assignment, and a trained index is
    * exactly the artifact a 100 TB deployment would write once and
    * serve; vec_id-keyed joins read it pre-partitioned.
    */
  def kmeansClusters(s: SparkSession, d: String, k: Int = 8,
      iters: Int = 4, farthestInit: Boolean = true): DataFrame =
    kmRegistry.computeIfAbsent((s, d, k, iters, farthestInit), _ => {
      val tbl = ("graft_kmeans_" +
        graft.sources.Bucketing.datasetTag(d) +
        s"_${k}_${iters}_${if (farthestInit) 1 else 0}")
      if (!s.catalog.tableExists(tbl)) {
        val asg = kmeansCompute(s, d, k, iters, farthestInit)
        graft.sources.Bucketing.writeBucketed(asg, tbl, "vec_id", 16,
          Seq("vec_id"))
      }
      s.table(tbl)
    })

  private val kmRegistry = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int, Int, Boolean), DataFrame]

  private def kmeansCompute(s: SparkSession, d: String, k: Int,
      iters: Int, farthestInit: Boolean): DataFrame = {
    Vectors.ensureRegistered(s)
    val dim = 64
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
        transform(Vectors.asDouble(col("embedding")),
          x => round(x * 1000).cast("double")).as("v"))
      .cache()
    var cents: IndexedSeq[Array[Double]] =
      if (farthestInit) farthestFirstSeeds(e, k)
      else {
        val total = e.count()
        val stride = math.max(1L, total / k)
        e.filter(col("vec_id") % stride === 0 && col("vec_id") / stride < k)
          .orderBy("vec_id").collect()
          .map(_.getSeq[Double](1).toArray).toIndexedSeq
      }
    def assigned: DataFrame = {
      val scores = array(cents.map { c =>
        val cc = c.map(x => x * x).sum
        lit(cc) - lit(2.0) * Vectors.dot(col("v"), typedLit(c))
      }: _*)
      e.withColumn("__s", scores)
        .withColumn("cluster_id",
          (array_position(col("__s"), array_min(col("__s"))) - 1)
            .cast("long"))
        .drop("__s")
    }
    var it = 1
    while (it < iters) {
      val sums = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1)).as(s"s$i"))
      val agg = assigned.groupBy("cluster_id")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map(r => r.getLong(0) ->
          Array.tabulate(dim)(i => r.getDouble(i + 2) / r.getLong(1)))
        .toMap
      // empty cells keep their previous centroid (standard Lloyd)
      cents = cents.indices.map(c => agg.getOrElse(c.toLong, cents(c)))
      it += 1
    }
    assigned.select(col("vec_id"), col("cluster_id"))
  }

  /** Deterministic SEEDED farthest-first (k-center) initialization —
    * the engine-exact counterpart of k-means++/k-means|| seeding:
    * the probabilistic forms sample proportional to d², favoring
    * far-from-chosen points; this takes the argmax outright, which
    * is their determinization and needs no random draw an oracle
    * would have to mirror bit-for-bit. The FIRST seed is a seeded
    * pseudo-random pick (Knuth multiplicative hash of vec_id — the
    * same derivation every executor and both engines compute
    * identically); each next seed maximizes true squared distance
    * (exact integer arithmetic on the quantized vectors) to the
    * chosen set, ties broken by smallest vec_id.
    *
    * Scale shape: k-1 passes, each a one-row argmax collect over a
    * cached map-side scoring against ≤ k broadcast centroid
    * literals — the k-means|| trade (O(log n) rounds of bulk
    * sampling) only pays off when k is large enough that k scans
    * hurt; at dashboard-k it is strictly more machinery for the same
    * seeds-quality goal.
    */
  private def farthestFirstSeeds(e: DataFrame,
      k: Int): IndexedSeq[Array[Double]] = {
    val scored = e.select(col("vec_id"),
      pmod(col("vec_id") * 2654435761L, lit(4294967296L)).as("hh"),
      col("v"), Vectors.dot(col("v"), col("v")).as("nn"))
    val first = scored.orderBy(col("hh"), col("vec_id")).limit(1)
      .collect()(0).getSeq[Double](2).toArray
    val buf = scala.collection.mutable.ArrayBuffer(first)
    while (buf.length < k) {
      val dists = array(buf.toSeq.map { c =>
        val cc = c.map(x => x * x).sum
        col("nn") - lit(2.0) * Vectors.dot(col("v"), typedLit(c)) + lit(cc)
      }: _*)
      buf += scored.withColumn("md", array_min(dists))
        .orderBy(col("md").desc, col("vec_id")).limit(1)
        .collect()(0).getSeq[Double](2).toArray
    }
    buf.toIndexedSeq
  }

  /** DuckDB oracle GENERATOR for [[kmeansClusters]]: unrolls the
    * seeded farthest-first init (k stages) and `iters` Lloyd rounds
    * into one CTE chain — configurable where the previous oracle was
    * a hand-written 2-round constant. Every term mirrors the Spark
    * side exactly: integer-quantized vectors, Knuth-hash first seed,
    * true squared distance for seeding, expanded `c·c − 2·v·c` for
    * assignment (per-point shift cannot change an argmin over c),
    * first-minimum tie-breaks, empty cells keep their centroid.
    */
  def kmeansOracleSql(k: Int, iters: Int, dim: Int = 64): String = {
    require(k >= 2 && iters >= 1)
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(range($dim), i -> $a[i + 1] * $b[i + 1]))"
    def cnorm(c: String): String =
      s"list_sum(list_transform($c, x -> x * x))"
    // Every CTE is AS MATERIALIZED: the chain references cset_{j-1}
    // (and emb/scored) twice per stage, and DuckDB's default CTE
    // inlining re-evaluates each reference — 2^k blow-up that turned
    // this replay into ~20 min at sf0.01 (the r6 driver-gate killer).
    // MATERIALIZED pins one evaluation per CTE: same result, <1s.
    val init = new StringBuilder
    init ++=
      s"""emb AS MATERIALIZED (
         |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
         |    x -> CAST(round(x * 1000) AS DOUBLE)) AS v
         |  FROM embeddings),
         |scored AS MATERIALIZED (SELECT vec_id, (vec_id * 2654435761) % 4294967296 AS hh,
         |    v, ${cnorm("v")} AS nn FROM emb),
         |cset1 AS MATERIALIZED (SELECT 0 AS cid, v FROM
         |  (SELECT v FROM scored ORDER BY hh, vec_id LIMIT 1)),
         |""".stripMargin
    for (j <- 2 to k) {
      init ++=
        s"""mind$j AS MATERIALIZED (SELECT e.vec_id,
           |    MIN(e.nn - 2.0 * ${dot("e.v", "c.v")} + ${cnorm("c.v")}) AS md
           |  FROM scored e CROSS JOIN cset${j - 1} c GROUP BY e.vec_id),
           |cset$j AS MATERIALIZED (SELECT * FROM cset${j - 1} UNION ALL
           |  SELECT ${j - 1} AS cid, v FROM emb WHERE vec_id =
           |    (SELECT vec_id FROM mind$j ORDER BY md DESC, vec_id LIMIT 1)),
           |""".stripMargin
    }
    init ++= s"c0 AS MATERIALIZED (SELECT cid, v FROM cset$k),\n"
    val rounds = new StringBuilder
    def assignCte(t: Int, cents: String): String =
      s"""d$t AS MATERIALIZED (SELECT e.vec_id, c.cid,
         |    ${cnorm("c.v")} - 2.0 * ${dot("e.v", "c.v")} AS dist
         |  FROM emb e CROSS JOIN $cents c),
         |a$t AS MATERIALIZED (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d$t) t
         |  WHERE rn = 1),
         |""".stripMargin
    for (t <- 1 until iters) {
      rounds ++= assignCte(t, s"c${t - 1}")
      rounds ++=
        s"""m$t AS MATERIALIZED (SELECT a$t.cid, g.i,
           |    CAST(SUM(e.v[g.i]) AS DOUBLE) / COUNT(*) AS mv
           |  FROM a$t JOIN emb e USING (vec_id)
           |  CROSS JOIN range(1, ${dim + 1}) AS g(i) GROUP BY 1, 2),
           |c$t AS MATERIALIZED (SELECT c${t - 1}.cid,
           |    CASE WHEN m.cid IS NULL THEN c${t - 1}.v ELSE m.v END AS v
           |  FROM c${t - 1} LEFT JOIN (SELECT cid, list(mv ORDER BY i) AS v
           |                            FROM m$t GROUP BY cid) m
           |    ON m.cid = c${t - 1}.cid),
           |""".stripMargin
    }
    rounds ++= assignCte(iters, s"c${iters - 1}")
    val body = (init.toString + rounds.toString).stripSuffix(",\n")
    s"""WITH $body
       |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM a$iters"""
      .stripMargin
  }

  /** CLUSTER PURITY against the label column — the unsupervised-
    * quality readout ("do the k-means cells recover the label
    * structure?"): assignments joined to labels, per-cluster
    * majority label and its share in ppm. Rides the exact
    * deterministic k-means; one label join + a per-cluster top-1
    * over ≤|labels| rows each.
    */
  def clusterPurity(s: SparkSession, d: String, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val asg = kmeansClusters(s, d, k, iters)
    val lab = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val cells = asg.join(lab, "vec_id")
      .groupBy("cluster_id", "label").agg(count(lit(1)).as("ct"))
    val tot = cells.groupBy("cluster_id")
      .agg(sum(col("ct")).as("n_vecs"))
    cells.join(broadcast(tot), "cluster_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col("ct").desc, col("label"))))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("n_vecs"),
        col("label").as("majority_label"),
        expr("ct * 1000000 DIV n_vecs").as("purity_ppm"))
  }

  /** Purity oracle: the k-means replay SQL with the label rollup
    * spliced in place of the assignment SELECT.
    */
  def kmeansPurityOracleSql(k: Int, iters: Int): String = {
    val base = kmeansOracleSql(k, iters)
    val marker =
      s"SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM a$iters"
    require(base.endsWith(marker), "kmeans oracle tail changed")
    base.stripSuffix(marker) +
      s""", asg AS MATERIALIZED (SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id
         |    FROM a$iters),
         |cells AS MATERIALIZED (SELECT cluster_id, CAST(e.label AS BIGINT) AS label,
         |    COUNT(*) AS ct
         |  FROM asg JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
         |tot AS MATERIALIZED (SELECT cluster_id, CAST(SUM(ct) AS BIGINT) AS n_vecs
         |  FROM cells GROUP BY 1)
         |SELECT cluster_id, n_vecs, label AS majority_label,
         |  ct * 1000000 // n_vecs AS purity_ppm
         |FROM (SELECT cells.cluster_id, cells.label, cells.ct,
         |    tot.n_vecs, row_number() OVER (PARTITION BY cells.cluster_id
         |      ORDER BY cells.ct DESC, cells.label) AS rk
         |  FROM cells JOIN tot ON cells.cluster_id = tot.cluster_id) x
         |WHERE rk = 1""".stripMargin
  }

  /** Full KNN self-join: EVERY corpus vector gets its top-k
    * neighbors — the primitive behind embedding-cluster dedup and
    * diversity sampling, where the "query set" is the corpus itself
    * and broadcasting it is impossible. Both sides bucket on
    * hyperplane signs and the candidate join is an equi-join on
    * bucket id, so shuffle volume is O(n), never the O(n²) cross
    * product; the per-query top-k window partitions by vec_id (high
    * cardinality — no single-partition sort anywhere).
    */
  /** Hubness report over the [[knnJoin]] neighbor graph — the
    * k-occurrence distribution N_k (Radovanović et al., JMLR 2010):
    * how many vectors appear 0, 1, 2, … times in OTHER vectors'
    * top-k lists. High-dimensional embedding spaces grow "hubs"
    * (vectors in everyone's neighbor list) and "anti-hubs" (in
    * nobody's) — skew here predicts ANN recall loss and retrieval
    * bias before any index ships, which is why it sits beside the
    * recall evaluations as embedding-health telemetry. The zero
    * bucket NEEDS the left join back onto the corpus (vectors never
    * retrieved are exactly the anti-hubs the report exists to
    * count). Cost: one key-grain rollup over the already-bounded
    * knn output plus a corpus-key left join; the histogram domain
    * is ≤ max-occurrence — tiny at any scale.
    */
  def hubness(s: SparkSession, d: String): DataFrame = {
    val occ = knnJoin(s, d)
      .groupBy(col("neighbor_id").as("vec_id"))
      .agg(count(lit(1)).as("n_k"))
    Tables.embeddings(s, d).select(col("vec_id"))
      .join(occ, Seq("vec_id"), "left")
      .select(coalesce(col("n_k"), lit(0L)).as("k_occurrences"))
      .groupBy("k_occurrences").agg(count(lit(1)).as("n_vectors"))
  }

  def knnJoin(s: SparkSession, d: String, k: Int = 5,
      nBits: Int = 6): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .withColumn("bucket", Vectors.lshBucket(col("v"), 64, nBits))
      .cache()
    val scored = e.as("q").join(e.as("c"),
        col("q.bucket") === col("c.bucket") &&
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("q.v"), col("c.v"),
          col("q.nrm"), col("c.nrm")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** Product-quantization (PQ) ANN — the memory-side scale move the
    * IVF/LSH variants don't make: corpus vectors compress to `m`
    * small codes (here 32 4-bit codes — 16 bytes replacing 64
    * doubles, 32× compression; random unit vectors have no low-dim
    * structure, so narrow 2-dim subspaces beat fewer/wider ones —
    * recall measured across (m, ks) in the spec history), and
    * query-to-candidate distance becomes `m`
    * lookup-table reads instead of a `dim`-long dot product (the ADC
    * — asymmetric distance computation — of Jégou et al., TPAMI
    * 2011). At 100 TB the encoded corpus fits where raw vectors
    * can't, the scan streams codes not floats, and per-pair cost
    * drops from O(dim) to O(m).
    *
    * Codebooks are deterministic strided corpus rows (the same
    * no-training seeding as [[annIvf]]; [[kmeansClusters]] is the
    * trained upgrade), collected once — ks×dim doubles, the "tiny
    * broadcast config" shape — and inlined as literals: encoding is
    * a pure per-row expression, zero shuffle. Queries precompute
    * their LUT (m×ks distances) BEFORE the join, so the per-pair
    * expression really is m `element_at`s + adds.
    *
    * Engine-exact grading: vectors quantize to integer-valued
    * doubles (round(x·1000)), so every subspace distance is an exact
    * integer in a double and the ADC sum is order-independent —
    * codes, distances, and ranks replay bit-for-bit in the DuckDB
    * oracle (first-minimum tie-breaks both sides). Rank-only output.
    */
  def annPq(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5,
      m: Int = 32, ks: Int = 16): DataFrame = {
    Vectors.ensureRegistered(s)
    val dim = 64
    val sub = dim / m
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
        transform(Vectors.asDouble(col("embedding")),
          x => round(x * 1000).cast("double")).as("v"))
      .cache()
    val total = e.count()
    val stride = math.max(1L, total / ks)
    // flattened (ks × dim) codebook literal for the native PQ family
    // (the m×ks composed-expression form blows past codegen method
    // limits and re-evaluates interpreted — 23s vs ~2s at sf0.1)
    val cbFlat = e.filter(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < ks)
      .orderBy("vec_id").collect()
      .flatMap(_.getSeq[Double](1))
    // encode: per subspace, first-minimum centroid index. CACHED —
    // this is the index build, done once per corpus; without the
    // materialization boundary CollapseProject folds the encode into
    // the post-join projection and re-runs it per (query, candidate)
    // pair
    val corpus = e.select(col("vec_id"),
      call_function("graft_pq_encode", col("v"), typedLit(cbFlat),
        lit(m), lit(ks)).as("codes")).cache()
    // queries carry their LUTs (computed once per query row, before
    // the join); the corpus never shuffles
    val q = e.filter(col("vec_id") < nQueries).select(
      col("vec_id").as("query_id"),
      call_function("graft_pq_lut", col("v"), typedLit(cbFlat),
        lit(m), lit(ks)).as("lut"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        call_function("graft_pq_adc", col("lut"), col("codes"), lit(ks))
          .as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** IVF+PQ composed ANN — the production vector-index architecture
    * (FAISS's IVFPQ): IVF cells PRUNE candidates (equi-join on cell,
    * only nProbe/nCells of the corpus is scored per query) and PQ
    * codes COMPRESS the scoring (m LUT reads per candidate instead
    * of a dim-long dot product). The two halves are exactly the
    * graded [[annIvf]] and [[annPq]] mechanisms — same strided seed
    * rows for both structures, raw-double cosine for cell routing,
    * quantized L2 for codes — so the oracle composes their two CTE
    * chains verbatim and the result is engine-exact end to end.
    * Unlike [[annPq]]'s full-scan BNLJ, the search join here is an
    * EQUI-join on cell id: at 100 TB the encoded, cell-bucketed
    * corpus is both 32× smaller and (nCells/nProbe)× less scanned.
    */
  def annIvfPq(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 32, ks: Int = 16)
      : DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
        Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .withColumn("vq", transform(col("v"),
        x => round(x * 1000).cast("double")))
      .cache()
    val total = e.count()
    val strideC = math.max(1L, total / nCells)
    val cents = e.filter(col("vec_id") % strideC === 0 &&
        col("vec_id") / strideC < nCells)
      .orderBy("vec_id").collect()
      .map(r => (r.getSeq[Double](1).toArray, r.getDouble(2)))
    val strideK = math.max(1L, total / ks)
    val cbFlat = e.filter(col("vec_id") % strideK === 0 &&
        col("vec_id") / strideK < ks)
      .orderBy("vec_id").collect()
      .flatMap(_.getSeq[Double](3))
    val cellScores = array(cents.map { case (cv, cn) =>
      Vectors.dot(col("v"), typedLit(cv)) / (col("nrm") * cn)
    }: _*)
    val corpus = e.withColumn("__s", cellScores)
      .select(col("vec_id"),
        (array_position(col("__s"), array_max(col("__s"))) - 1)
          .cast("int").as("cell"),
        call_function("graft_pq_encode", col("vq"), typedLit(cbFlat),
          lit(m), lit(ks)).as("codes"))
      .cache()
    val ranked = array_sort(
      transform(sequence(lit(0), lit(cents.length - 1)),
        i => struct(element_at(col("__s"), i + 1).as("s"), i.as("i"))),
      (a, b) => when(a("s") > b("s"), -1).when(a("s") < b("s"), 1)
        .otherwise(a("i").cast("int") - b("i").cast("int")))
    val queries = e.filter(col("vec_id") < nQueries)
      .withColumn("__s", cellScores)
      .select(col("vec_id").as("query_id"),
        call_function("graft_pq_lut", col("vq"), typedLit(cbFlat),
          lit(m), lit(ks)).as("lut"),
        explode(transform(slice(ranked, 1, nProbe), x => x("i")))
          .as("cell"))
    val scored = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        call_function("graft_pq_adc", col("lut"), col("codes"), lit(ks))
          .as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** LSH-bucketed ANN: queries and corpus bucket on `nBits`
    * hyperplane signs; scoring happens only within a bucket. Recall
    * vs [[bruteForceTopK]] is asserted in the test suite; trading
    * recall for a ~2^nBits candidate reduction is the point.
    */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, nBits: Int = 6): DataFrame = {
    val tbl = "graft_annlsh_" +
      s"${graft.sources.Bucketing.datasetTag(d)}_${nQueries}_${k}_$nBits"
    annRegistry.computeIfAbsent((s, d, tbl), _ => {
      if (!s.catalog.tableExists(tbl))
        graft.sources.Bucketing.timedBuild(tbl) {
          graft.sources.Bucketing.dropStaleLocation(s, tbl)
          annLshCompute(s, d, nQueries, k, nBits).write
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .format("parquet").saveAsTable(tbl)
        }
      s.table(tbl)
    })
  }

  private def annLshCompute(s: SparkSession, d: String, nQueries: Int,
      k: Int, nBits: Int): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .withColumn("bucket", Vectors.lshBucket(col("v"), 64, nBits))
    // MULTI-PROBE (Lv et al., VLDB'07): each query also probes every
    // 1-bit and 2-bit-flip neighbor bucket — near-threshold
    // hyperplane votes are the common miss, and flipping the
    // closest-to-zero votes recovers them. Probe fan-out rides the
    // tiny QUERY side (1 + b + b(b−1)/2 rows per query = 22 at six
    // bits); the corpus side keeps exactly ONE bucket per vector, so
    // the equi-join scale path is unchanged. Lifts recall@5
    // 0.07 → 0.52 on the spec's ground truth without touching the
    // index; at production bit-widths the probe set stays quadratic
    // in bits while bucket count grows exponentially.
    val oneBit = (0 until nBits).map(j => 1L << j)
    val twoBit = for {
      i <- 0 until nBits; j <- (i + 1) until nBits
    } yield (1L << i) | (1L << j)
    val masks = 0L +: (oneBit ++ twoBit)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(array(masks.map(m =>
          col("qb").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** RANGE similarity search — every corpus neighbor with cosine ≥
    * `tau` for each query, the radius-query counterpart of the
    * top-k forms. Unlike top-k (whose per-query rank needs a window
    * and therefore a key shuffle), a pure threshold is a FILTER:
    * scan the corpus once, broadcast the query set, score and keep —
    * the executed plan carries no hash-partitioned Exchange at all
    * (plan-linted; the only Exchange is [[Tables.spread]]'s
    * small-input round-robin, a no-op at real scale), so at 100 TB
    * this is embarrassingly parallel with output proportional only
    * to the matches. The cosine is exact (no LSH
    * loss): prefiltering would change the graded answer, and the
    * scan is one pass regardless. Both engines evaluate the dot
    * product in identical array order, so the IEEE doubles — and
    * hence the τ boundary — agree bit-for-bit.
    */
  def rangeSearch(s: SparkSession, d: String, nQueries: Int = 20,
      tau: Double = 0.30): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", Vectors.cosineWithNorms(
        col("qv"), col("v"), col("qn"), col("nrm")))
      .filter(col("cos") >= tau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
  }

  /** k-NN CLASSIFICATION over the labeled embedding set — the
    * serving form of similarity search (label a new vector by its
    * neighbors' majority vote): query vectors take their k nearest
    * non-query neighbors by exact cosine (broadcast-queries scan,
    * corpus never shuffles), then ONE small aggregation turns
    * neighbor labels into a deterministic vote (count desc, label
    * asc — ties can't drift). Cosine ordering is hash-stable
    * because the doubles are bit-identical across engines; ranks
    * tie-break on vec_id like the whole ANN family.
    */
  def knnClassify(s: SparkSession, d: String, nQueries: Int = 50,
      k: Int = 5): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"), col("label"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val corpus = e.filter(col("vec_id") >= nQueries)
    val topk = corpus.join(broadcast(q))
      .withColumn("cos", Vectors.cosineWithNorms(
        col("qv"), col("v"), col("qn"), col("nrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
    topk.groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("votes").desc, col("label"))))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("label").cast("long").as("pred_label"),
        col("votes"))
  }

  /** Pairwise-cosine DISTRIBUTION over a deterministic linear pair
    * sample — the embedding-space health readout (a drifted or
    * collapsed encoder shows up as mass piling into the high-cos
    * buckets long before any dedup threshold trips). Pairing is
    * (i, i+offset): one equi-join on a computed key, O(n) pairs,
    * one shuffle — never the all-pairs quadratic, and deterministic
    * so the histogram is reproducible and oracle-checkable. Buckets
    * are floor(cos·10): the cosine doubles are bit-identical across
    * engines (same sequential dot/norm fold the graded dedup family
    * relies on), so the bucket assignment hash-grades.
    */
  def cosHistogram(s: SparkSession, d: String,
      offset: Long = 497): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val b = e.select((col("vec_id") - offset).as("aid"),
      col("v").as("bv"), col("nrm").as("bnrm"))
    e.join(b, col("vec_id") === col("aid"))
      .select(floor(Vectors.cosineWithNorms(
        col("v"), col("bv"), col("nrm"), col("bnrm")) * 10)
        .cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
  }

  /** SemDeDup screening (Abbas et al. 2023, arXiv:2303.09540):
    * semantic near-duplicate detection as k-means clustering +
    * pairwise cosine ONLY within each cluster — the design that
    * makes embedding dedup tractable at corpus scale, because the
    * quadratic term is bounded by cell size (k grows with the
    * corpus, cells stay ~constant) and cells are embarrassingly
    * parallel across executors. Reuses [[kmeansClusters]] (same
    * seeded farthest-first + Lloyd rounds the `sim_kmeans` grade
    * pins), so the cluster assignment is engine-exact.
    *
    * Graded output is each cluster's top-`topN` most-similar pairs
    * with cos² in integer ppm — ALL-BIGINT arithmetic:
    * `dp² div max((na·nb) div 10⁶, 1)` over the 1000-quantized
    * vectors, every operand ≤ ~6.5e16 so both engines compute the
    * identical integer (no decimal-width promotion, no float
    * boundary). The production form thresholds the same number
    * (`sim2_ppm > τ²·10⁶` drops the higher-id member); the corpus
    * here has no true semantic dups (measured max cos ≈ 0.77), so
    * the grade pins the extremes rather than an empty set.
    */
  def semDedupPairs(s: SparkSession, d: String, k: Int = 8,
      iters: Int = 4, topN: Int = 5): DataFrame = {
    Vectors.ensureRegistered(s)
    val assign = kmeansClusters(s, d, k, iters)
    val e = Tables.embeddings(s, d).select(col("vec_id"),
        transform(Vectors.asDouble(col("embedding")),
          x => round(x * 1000).cast("double")).as("v"))
      .withColumn("nn", Vectors.dot(col("v"), col("v")).cast("long"))
      .filter(col("nn") > 0)
    val ce = assign.join(e, "vec_id")
    val pairs = ce.as("a").join(ce.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cluster_id").as("cluster_id"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Vectors.dot(col("a.v"), col("b.v")).cast("long").as("dp"),
        col("a.nn").as("na"), col("b.nn").as("nb"))
      .filter(col("dp") > 0)
      .withColumn("sim2_ppm",
        expr("(dp * dp) DIV greatest((na * nb) DIV 1000000, 1)"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("sim2_ppm").desc, col("vec_a"), col("vec_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topN)
      .select(col("cluster_id"), col("vec_a"), col("vec_b"),
        col("sim2_ppm"))
  }

  /** DuckDB oracle for [[semDedupPairs]]: the generated k-means
    * assignment CTE ([[kmeansOracleSql]]) nested as a subquery, then
    * the same all-BIGINT within-cluster pair scoring and per-cluster
    * top-N window.
    */
  def semDedupOracleSql(k: Int, iters: Int, topN: Int,
      dim: Int = 64): String = {
    val dot = s"list_sum(list_transform(range($dim), " +
      "i -> a.v[i + 1] * b.v[i + 1]))"
    s"""WITH assign AS MATERIALIZED (
       |${kmeansOracleSql(k, iters, dim)}),
       |en AS MATERIALIZED (SELECT vec_id, v,
       |    CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nn
       |  FROM (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> CAST(round(x * 1000) AS DOUBLE)) AS v FROM embeddings)
       |  WHERE list_sum(list_transform(v, x -> x * x)) > 0),
       |p AS MATERIALIZED (SELECT ca.cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    CAST($dot AS BIGINT) AS dp, a.nn AS na, b.nn AS nb
       |  FROM assign ca JOIN assign cb
       |    ON ca.cluster_id = cb.cluster_id AND ca.vec_id < cb.vec_id
       |  JOIN en a ON a.vec_id = ca.vec_id
       |  JOIN en b ON b.vec_id = cb.vec_id),
       |scored AS MATERIALIZED (SELECT cluster_id, vec_a, vec_b,
       |    (dp * dp) // greatest((na * nb) // 1000000, 1) AS sim2_ppm
       |  FROM p WHERE dp > 0)
       |SELECT cluster_id, vec_a, vec_b, sim2_ppm FROM (
       |  SELECT *, row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY sim2_ppm DESC, vec_a, vec_b) AS rn FROM scored)
       |WHERE rn <= $topN""".stripMargin
  }

  /** ANN recall evaluation — "measure, don't guess" as a first-class
    * relation: per query, how many of the exact cosine top-k does the
    * IVF index actually return? Joins the [[annIvf]] result set
    * against the [[bruteForceTopK]] ground truth (semi-join on
    * (query, neighbor)), emits integer hit counts and recall ppm so
    * the quality of the scale path is a graded, hashable table rather
    * than a number buried in a spec log. Both inputs are rank-only
    * relations, so the eval inherits their determinism; queries the
    * index misses entirely still surface (outer join, 0 hits). The
    * 100 TB story is the inputs': this adds one broadcast-sized join
    * over 2·nQueries·k rows.
    */
  def annRecallEval(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val exact = bruteForceTopK(s, d, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = annIvf(s, d, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
        "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left_outer")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_ppm", expr(s"n_hits * 1000000 DIV $k"))
  }

  /** RECIPROCAL-RANK FUSION across the two bucketed index variants —
    * the standard hybrid-retrieval merge (Cormack et al.'s RRF: score
    * = Σ 1/(k₀+rank), k₀=60) applied to [[annLsh]] and [[annIvf]]'s
    * per-query top-k lists: a neighbor surfaced by BOTH indexes
    * outranks either index's solo candidates, which is what makes
    * fusion robust to each index's blind spots. Scores are EXACT
    * integers (10⁶ DIV (60+rank), summed over lists), ties break on
    * neighbor id; re-ranking touches only 2·nQueries·k rows — the
    * inputs' scale story is the whole story.
    */
  def rankFusion(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val lsh = annLsh(s, d, nQueries, k)
      .select(col("query_id"), col("neighbor_id"),
        col("rk").as("rk_lsh"))
    val ivf = annIvf(s, d, nQueries, k)
      .select(col("query_id"), col("neighbor_id"),
        col("rk").as("rk_ivf"))
    val fused = lsh.join(ivf, Seq("query_id", "neighbor_id"),
        "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(expr("1000000 DIV (60 + rk_lsh)"), lit(0L)) +
          coalesce(expr("1000000 DIV (60 + rk_ivf)"), lit(0L)))
          .as("rrf_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_e6").desc, col("neighbor_id"))
    fused.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "rrf_e6")
  }

  /** MATRYOSHKA prefix-dimension recall — the evaluation behind
    * truncatable embeddings (Kusupati et al., "Matryoshka
    * Representation Learning", NeurIPS'22): how much of the exact
    * full-dimension top-k does a search over only the FIRST P
    * dimensions retain? The production pattern at 100 TB is
    * two-stage retrieval — a cheap prefix-dim scan (P/dim of the
    * bytes and multiplies) shortlists, the full vector reranks —
    * and this table says what each prefix actually buys, the same
    * "measure, don't guess" contract as [[annRecallEval]]. Per
    * prefix: the identical broadcast-query scoring shape as
    * [[bruteForceTopK]] over sliced vectors (sequential-fold cosine
    * — bit-identical in DuckDB's list_sum replay), per-query top-k
    * window, hit counting via semi-join against the full-dim truth.
    */
  def matryoshkaRecall(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, prefixes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    Vectors.ensureRegistered(s)
    val truth = bruteForceTopK(s, d, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint()
    // r11 OPT (guide §1.2/§2.4): the four per-prefix branches each
    // re-scanned the corpus and re-joined the broadcast query set
    // (16 scans, 48 Exchanges). One pair scan now computes all four
    // prefix cosines (prefix norms precomputed PER VECTOR, dots are
    // the same graft_dot left-fold over slice() — bit-identical to
    // the sliced-vector formula), posexplode fans them to (prefix,
    // pair) grain, and ONE window ranks every (prefix, query) group.
    // A prefix with zero hits still emits its row via the left join
    // against the literal prefix frame.
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
    val pe = e.select(col("vec_id"), col("v"),
      array(prefixes.map(p => Vectors.norm(slice(col("v"), 1, p))): _*)
        .as("nrms"))
    val q = pe.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrms").as("qns"))
    val cosAll = prefixes.indices.map { pi =>
      val p = prefixes(pi)
      Vectors.dot(slice(col("qv"), 1, p), slice(col("v"), 1, p)) /
        (element_at(col("qns"), pi + 1) * element_at(col("nrms"), pi + 1))
    }
    val scored = pe.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        posexplode(array(cosAll: _*)).as(Seq("pi", "cos")))
    val w = Window.partitionBy("pi", "query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val hits = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("pi").agg(count(lit(1)).as("n_hits"))
    val pframe = s.createDataFrame(
      prefixes.indices.map(pi => (pi, prefixes(pi).toLong)))
      .toDF("pi", "prefix_dim")
    pframe.join(hits, Seq("pi"), "left_outer")
      .select(col("prefix_dim"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_ppm",
        expr(s"n_hits * 1000000 DIV ${nQueries.toLong * k}"))
  }

  /** DuckDB oracle GENERATOR for [[matryoshkaRecall]]: per prefix,
    * the sliced-vector cosine ranks replayed with the same
    * sequential list_sum fold, semi-joined against the full-dim
    * rank CTE.
    */
  def matryoshkaRecallOracleSql(nQueries: Int = 20, k: Int = 5,
      prefixes: Seq[Int] = Seq(8, 16, 32, 64)): String = {
    def rankCte(name: String, vexpr: String): String =
      s"""${name}_s AS MATERIALIZED (SELECT q.vec_id AS query_id,
         |    e.vec_id AS neighbor_id,
         |    list_sum(list_transform(range(len(q.$vexpr)),
         |      i -> (q.$vexpr)[i + 1] * (e.$vexpr)[i + 1]))
         |      / (sqrt(list_sum(list_transform(q.$vexpr, x -> x * x)))
         |       * sqrt(list_sum(list_transform(e.$vexpr, x -> x * x))))
         |      AS cos
         |  FROM emb e JOIN emb q ON q.vec_id < $nQueries
         |    AND e.vec_id <> q.vec_id),
         |$name AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
         |      AS rk
         |    FROM ${name}_s) t
         |  WHERE rk <= $k),
         |""".stripMargin
    val sb = new StringBuilder
    sb ++=
      """WITH emb AS MATERIALIZED (SELECT vec_id,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |""".stripMargin
    sb ++= rankCte("truth", "v")
    for (p <- prefixes) {
      sb ++= s"p$p AS MATERIALIZED (SELECT vec_id, v[1:$p] AS v FROM emb),\n"
      // prefix rank CTE reads the sliced relation
      sb ++= rankCte(s"top$p", "v")
        .replace("FROM emb e JOIN emb q", s"FROM p$p e JOIN p$p q")
    }
    val unions = prefixes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS prefix_dim,
         |  CAST(COUNT(*) AS BIGINT) AS n_hits,
         |  CAST(COUNT(*) * 1000000 // ${nQueries.toLong * k} AS BIGINT)
         |    AS recall_ppm
         |FROM top$p SEMI JOIN truth
         |  ON top$p.query_id = truth.query_id
         |  AND top$p.neighbor_id = truth.neighbor_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    sb.toString.stripSuffix(",\n").stripSuffix(",") + "\n" + unions
  }

  /** IVF nprobe RECALL SWEEP — the measured recall-vs-cost trade
    * table behind every "how many cells should a query probe?"
    * decision, completing the evaluation trio: [[annRecallEval]]
    * grades one LSH config, [[matryoshkaRecall]] the prefix-dim
    * axis, this the probe-count axis. Cells come from the exact
    * deterministic k-means ([[kmeansClusters]] — iters=2, the same
    * half-replay grade as cluster purity); probe centroids are
    * DEFINED as the member means of the final assignment, so the
    * oracle rebuilds them from the assignment replay alone. Per
    * nprobe ∈ {1,2,4}: a query searches only its nprobe nearest
    * cells; exact-cosine top-k inside the candidates, hits counted
    * by semi-join against the brute-force truth, plus the TOTAL
    * candidate volume — the cost number the recall buys.
    *
    * Scale shape: centroid build is one combinable rollup to
    * ≤nCells rows (the [[kmeansClusters]] bounded-collect
    * contract); the search join is an equi-join on cell id; the
    * per-query top-k window partitions by query.
    */
  def ivfProbeSweep(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, nCells: Int = 8, iters: Int = 2,
      probes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    import s.implicits._
    Vectors.ensureRegistered(s)
    val dim = 64
    // already a bucketed-table read — re-scanning it for the two
    // consumers below is cheaper than an eager checkpoint job
    val asg = kmeansClusters(s, d, nCells, iters)
    val eq = Tables.spread(Tables.embeddings(s, d)).select(
      col("vec_id"),
      transform(Vectors.asDouble(col("embedding")),
        x => round(x * 1000).cast("double")).as("vq"))
    val dimSums = (0 until dim).map(i =>
      sum(element_at(col("vq"), i + 1)).as(s"s$i"))
    // the member-mean rollup (≤ nCells rows × dim sums) is itself a
    // compute-once layout beside the kmeans assignment — the
    // assignment⋈corpus shuffle it rides was ~1/3 of the warm sweep
    val tCent = "graft_kmcent_" +
      s"${graft.sources.Bucketing.datasetTag(d)}_${nCells}_$iters"
    if (!s.catalog.tableExists(tCent))
      graft.sources.Bucketing.timedBuild(tCent) {
        graft.sources.Bucketing.dropStaleLocation(s, tCent)
        asg.join(eq, "vec_id").groupBy("cluster_id")
          .agg(count(lit(1)).as("n"), dimSums: _*)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").saveAsTable(tCent)
      }
    // ≤ nCells rows — the same bounded collect kmeans itself makes
    val cents = s.table(tCent)
      .collect()
      .map { r =>
        val v = Array.tabulate(dim)(i => r.getDouble(i + 2) / r.getLong(1))
        (r.getLong(0), v.toSeq, v.map(x => x * x).sum)
      }.toSeq.toDF("cluster_id", "cv", "cc")
    val qrank = eq.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vq"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("cluster_id"),
        (col("cc") - lit(2.0) * Vectors.dot(col("vq"), col("cv")))
          .as("dist"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("dist"), col("cluster_id"))))
    // the truth is the shared [[bruteForceTopK]] layout — a tiny
    // table read, no checkpoint job
    val truth = bruteForceTopK(s, d, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val er = Tables.spread(Tables.embeddings(s, d)).select(
        col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val qr = er.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    // Score ONCE at max(probes): each vector belongs to exactly one
    // cell, so a candidate's probe level IS its cell's rank `crk` —
    // the p=1,2 candidate sets are nested filters of the p=4 scored
    // set, never a re-join/re-score (r8 rebuilt all three from
    // scratch, tripling the dominant cosine join).
    val scored = qrank.filter(col("crk") <= probes.max)
      .select(col("query_id"), col("cluster_id"), col("crk"))
      .join(asg, "cluster_id")
      .filter(col("vec_id") =!= col("query_id"))
      .join(er, "vec_id").join(broadcast(qr), "query_id")
      .select(col("query_id"), col("crk"),
        col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"),
          col("nrm")).as("cos"))
    // all probe levels fold in ONE pass: candidate sets are nested
    // (crk <= p), so a row's per-probe top-k rank is a RUNNING count
    // of same-or-lower-crk rows over one shared (cos desc, neighbor)
    // window; a LEFT join marks truth membership so candidate
    // volumes and hits reduce in the SAME 1-row aggregate — one
    // linear pipeline, no intermediate checkpoint, replacing the
    // previous per-probe loop's 9 jobs
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = scored.select(
      Seq(col("query_id"), col("neighbor_id"), col("crk")) ++
        probes.map { p =>
          (sum(when(col("crk") <= p, 1L).otherwise(0L)).over(w) <= k &&
            col("crk") <= p).as(s"top_$p")
        }: _*)
      .join(broadcast(truth.withColumn("in_truth", lit(true))),
        Seq("query_id", "neighbor_id"), "left")
    val aggs = probes.map(p =>
        count_if(col("crk") <= p).as(s"cand_$p")) ++
      probes.map(p =>
        count_if(col(s"top_$p") && col("in_truth")).as(s"hits_$p"))
    // 1 row; checkpointed so the per-probe row fan-out below doesn't
    // re-run the pipeline once per probe level
    val one = flagged.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    probes.map { p =>
      one.select(lit(p.toLong).as("nprobe"),
        col(s"cand_$p").cast("long").as("n_candidates"),
        col(s"hits_$p").cast("long").as("n_hits"),
        expr(s"hits_$p * 1000000 DIV ${nQueries.toLong * k}")
          .as("recall_ppm"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB oracle for [[ivfProbeSweep]] — the k-means assignment
    * replay, member-mean probe centroids, query-to-centroid ranks,
    * and per-probe candidate cosine top-k vs the brute-force truth.
    */
  def ivfProbeSweepOracleSql(nQueries: Int = 20, k: Int = 5,
      nCells: Int = 8, iters: Int = 2,
      probes: Seq[Int] = Seq(1, 2, 4)): String = {
    val dim = 64
    val base = kmeansOracleSql(nCells, iters)
    val marker =
      s"SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM a$iters"
    require(base.endsWith(marker), "kmeans oracle tail changed")
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(range($dim), i -> $a[i + 1] * $b[i + 1]))"
    val sb = new StringBuilder(base.stripSuffix(marker))
    sb ++=
      s""", asg AS MATERIALIZED (SELECT vec_id,
         |    CAST(cid AS BIGINT) AS cluster_id FROM a$iters),
         |emb_raw AS MATERIALIZED (SELECT vec_id,
         |    CAST(embedding AS DOUBLE[]) AS vr,
         |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> x * x))) AS nrm
         |  FROM embeddings),
         |cent AS MATERIALIZED (SELECT cluster_id,
         |    list(mv ORDER BY i) AS cv,
         |    list_sum(list_transform(list(mv ORDER BY i),
         |      x -> x * x)) AS cc
         |  FROM (SELECT asg.cluster_id, g.i,
         |      CAST(SUM(e.v[g.i]) AS DOUBLE) / COUNT(*) AS mv
         |    FROM asg JOIN emb e USING (vec_id)
         |    CROSS JOIN range(1, ${dim + 1}) AS g(i) GROUP BY 1, 2)
         |  GROUP BY 1),
         |qrank AS MATERIALIZED (SELECT query_id, cluster_id, crk FROM (
         |    SELECT q.vec_id AS query_id, c.cluster_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY c.cc - 2.0 * ${dot("q.v", "c.cv")},
         |          c.cluster_id) AS crk
         |    FROM emb q CROSS JOIN cent c
         |    WHERE q.vec_id < $nQueries) t),
         |truth_s AS MATERIALIZED (SELECT q.vec_id AS query_id,
         |    e.vec_id AS neighbor_id,
         |    ${dot("q.vr", "e.vr")} / (q.nrm * e.nrm) AS cos
         |  FROM emb_raw e JOIN emb_raw q ON q.vec_id < $nQueries
         |    AND e.vec_id <> q.vec_id),
         |truth AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
         |      AS rk FROM truth_s) t
         |  WHERE rk <= $k),
         |""".stripMargin
    for (p <- probes) {
      sb ++=
        s"""cand$p AS MATERIALIZED (SELECT pr.query_id,
           |    e.vec_id AS neighbor_id,
           |    ${dot("q.vr", "e.vr")} / (q.nrm * e.nrm) AS cos
           |  FROM qrank pr
           |  JOIN asg ON asg.cluster_id = pr.cluster_id
           |    AND pr.crk <= $p
           |  JOIN emb_raw e ON e.vec_id = asg.vec_id
           |    AND e.vec_id <> pr.query_id
           |  JOIN emb_raw q ON q.vec_id = pr.query_id),
           |top$p AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           |      AS rk FROM cand$p) t
           |  WHERE rk <= $k),
           |""".stripMargin
    }
    val unions = probes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS nprobe,
         |  (SELECT COUNT(*) FROM cand$p) AS n_candidates,
         |  CAST(COUNT(*) AS BIGINT) AS n_hits,
         |  CAST(COUNT(*) * 1000000 // ${nQueries.toLong * k} AS BIGINT)
         |    AS recall_ppm
         |FROM top$p SEMI JOIN truth
         |  ON top$p.query_id = truth.query_id
         |  AND top$p.neighbor_id = truth.neighbor_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    sb.toString.stripSuffix(",\n") + "\n" + unions
  }

  /** Batch diversity score — the mean pairwise similarity inside
    * each label group, the metric a training-data sampler watches to
    * avoid redundant batches (high mean cosine = the group is
    * near-duplicates; cf. the SemDeDup argument). The O(n²) pairwise
    * sum collapses to O(n·d) EXACTLY via the Gram identity
    * Σ_{i≠j}⟨vᵢ,vⱼ⟩ = ‖Σvᵢ‖² − Σ‖vᵢ‖², so no pair is ever
    * materialized: one posexplode → per-(label,dim) component sums +
    * per-label square sums, both map-side combinable. Components
    * quantize to integer millionths (truncation — both engines'
    * double→int semantics agree) so the two Gram terms are EXACT
    * DECIMAL integers and the mean finishes in one rounded double.
    * At 100 TB this is a single scan with a 640-row shuffle.
    */
  def batchDiversity(s: SparkSession, d: String): DataFrame = {
    val q = Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        (col("v").cast("double") * 1000000).cast("long").as("q"))
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val a = q.groupBy("label", "dim")
      .agg(sum(col("q")).as("sq"))
      .groupBy("label")
      .agg(sum((col("sq").cast(d19) * col("sq").cast(d19)).cast(d38))
        .as("a2"))
    val b = q.groupBy("label")
      .agg(sum((col("q").cast(d19) * col("q").cast(d19)).cast(d38))
        .as("b2"))
    val n = Tables.embeddings(s, d)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    a.join(b, Seq("label")).join(n, Seq("label"))
      .select(col("label"), col("n"),
        round((col("a2").cast("double") - col("b2").cast("double")) /
          (col("n").cast("double") * (col("n").cast("double") - 1) *
            lit(1e12)), 6)
          .as("mean_pair_cos"))
  }

  /** IVF cell-balance report — the SCALE property of the ANN index
    * graded as a relation: per cell, the vector count, corpus share,
    * and load factor vs the ideal n/nCells (ppm). A cell at 3× ideal
    * is the probe-latency tail; rebalancing (or a finer codebook) is
    * due when load_ppm spreads past ~2·10⁶. Uses the same
    * deterministic stride-seeded centroids and argmax-cosine
    * assignment as the IVF family, so the report grades against the
    * SQL oracle exactly like the index it audits.
    *
    * Assignment scores are QUANTIZED to integer nano-units before
    * the argmax (ties → lowest cell id) on both engines: the r9 sf1
    * oracle gate caught this query flipping whole vector blocks
    * between engines when the tiled dataset made two stride-seeded
    * centroids near-twins of the same base vector — cosines agree to
    * ~1e-15 across engines but raw-double argmax is chaotic inside
    * that band, while a 1e-9 grid makes the near-tie deterministic
    * and keeps every real distinction.
    */
  def ivfBalance(s: SparkSession, d: String,
      nCells: Int = 16): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val total = e.count()
    val stride = math.max(1L, total / nCells)
    val cents = e.filter(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < nCells)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2)))
    val cellScores = array(cents.map { case (_, cv, cn) =>
      round(Vectors.dot(col("v"), typedLit(cv)) /
        (col("nrm") * cn) * lit(1e9)).cast("long")
    }: _*)
    // cell LABEL = the centroid's stride index (vec_id DIV stride),
    // NOT its dense position in the collected list: a sparse id
    // space (the tiled sf1 layout) can lack some stride multiples,
    // and position-labels would silently renumber the surviving
    // cells while the SQL oracle (and any consumer joining on cell
    // id) keys on the stride index — the r9 sf1 gate caught exactly
    // that relabeling.
    val cellIds = cents.map(_._1 / stride).toSeq
    val bestCell = element_at(typedLit(cellIds),
      array_position(col("__s"), array_max(col("__s"))).cast("int"))
    e.withColumn("__s", cellScores)
      .withColumn("cell", bestCell)
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"))
      .select(col("cell"), col("n_vectors"),
        expr(s"n_vectors * 1000000 DIV $total").as("share_ppm"),
        expr(s"n_vectors * $nCells * 1000000 DIV $total")
          .as("load_ppm"))
  }

  /** Centroid outliers — the top-k vectors FARTHEST from their own
    * label's centroid, the standard mislabel/anomaly shortlist an
    * annotation-QA pass reviews first. Exact without ever forming
    * the (fractional) centroid: multiplying ‖vᵢ − S/n‖² through by
    * n² gives score = n²‖vᵢ‖² − 2n⟨vᵢ,S⟩ + ‖S‖², all integer in the
    * quantized space — no division, no float, so the ranking
    * hash-grades. ⟨vᵢ,S⟩ comes from ONE equi-join of the exploded
    * components against the 640-row (label,dim) sum table — the
    * per-vector work is a second pass over the same explode, linear
    * at any corpus size.
    */
  def centroidOutliers(s: SparkSession, d: String,
      k: Int = 5): DataFrame = {
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("label"), col("dim"),
        (col("v").cast("double") * 1000000).cast("long").as("q"))
    val sd = q.groupBy("label", "dim")
      .agg(sum(col("q")).cast("long").as("sd"))
    val a2 = sd.groupBy("label")
      .agg(sum(col("sd") * col("sd")).cast("long").as("a2"))
    val n = Tables.embeddings(s, d)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    val pv = q.join(sd, Seq("label", "dim"))
      .groupBy("label", "vec_id")
      .agg(sum(col("q") * col("q")).cast("long").as("norm2"),
        sum(col("q") * col("sd")).cast("long").as("ip"))
    val w = Window.partitionBy("label")
      .orderBy(col("score").desc, col("vec_id"))
    pv.join(broadcast(a2), Seq("label"))
      .join(broadcast(n), Seq("label"))
      .withColumn("score",
        col("n") * col("n") * col("norm2") -
          lit(2L) * col("n") * col("ip") + col("a2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("label"), col("rk"), col("vec_id"), col("score"))
  }

  /** Per-dimension embedding health profile — mean and variance of
    * every coordinate, the standard "dead / collapsed dimension"
    * check run before an embedding table is trusted for ANN or
    * semantic dedup: a dimension whose variance is ~0 carries no
    * information (wasted index bytes, degenerate PQ codebooks), and a
    * strongly off-center mean signals a missing normalization step
    * upstream.
    *
    * Engine-exact: coordinates quantize to integer millionths
    * (truncation — both engines' double→int semantics agree), so n,
    * Σq and Σq² are exact integers and the variance finishes in one
    * exact integer division: var_q12 = (n·Σq² − (Σq)²) DIV n² in
    * 10⁻¹² units of the original scale. One posexplode → one
    *
    * map-side-combinable groupBy(dim): at 100 TB this is a single
    * scan producing d rows — no join, no second pass, the cheapest
    * possible full-corpus audit.
    */
  def dimVariance(s: SparkSession, d: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        (col("v").cast("double") * 1000000).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
        sum((col("q").cast(d19) * col("q").cast(d19)).cast(d38))
          .as("sqq"))
      .select(col("dim"), col("n"),
        expr("sq DIV n").as("mean_q6"),
        expr("""(CAST(n AS DECIMAL(38,0)) * sqq
                 - CAST(sq AS DECIMAL(38,0)) * CAST(sq AS DECIMAL(38,0)))
                DIV (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))""")
          .as("var_q12"))
  }

  /** Embedding drift profile between two corpus slices — the check a
    * training pipeline runs when a new ingest batch lands: has the
    * embedding distribution moved? Slices here are the deterministic
    * halves vec_id %% 2 (stand-in for "reference snapshot" vs "new
    * batch"); per dimension we report both means, the raw shift, both
    * variances, and a standardized drift score
    * shift² / pooled-variance in ppm (a squared z-shift — the
    * per-dimension term of a population-stability test).
    *
    * Engine-exact: coordinates quantize to integer millionths, so all
    * sums are exact integers and every derived stat is one truncating
    * integer division, matching DuckDB's `//` (both truncate toward
    * zero). One scan, one map-side-combinable groupBy(dim) with
    * conditional sums — no join, no second pass; at 100 TB this costs
    * exactly one pass over the corpus and emits d rows.
    */
  def embeddingDrift(s: SparkSession, d: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val q = Tables.embeddings(s, d)
      .select((col("vec_id") % 2 === 0).as("ref"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("ref"), col("dim").cast("long").as("dim"),
        (col("v").cast("double") * 1000000).cast("long").as("q"))
    val qq = (col("q").cast(d19) * col("q").cast(d19)).cast(d38)
    def varExpr(n: String, sq: String, sqq: String) =
      expr(s"""(CAST($n AS DECIMAL(38,0)) * $sqq
               - CAST($sq AS DECIMAL(38,0)) * CAST($sq AS DECIMAL(38,0)))
              DIV (CAST($n AS DECIMAL(38,0)) * CAST($n AS DECIMAL(38,0)))""")
    q.groupBy("dim")
      .agg(count(when(col("ref"), 1)).as("n_ref"),
        sum(when(col("ref"), col("q")).otherwise(0L)).as("sq_ref"),
        sum(when(col("ref"), qq).otherwise(lit(0).cast(d38))).as("sqq_ref"),
        count(when(!col("ref"), 1)).as("n_cur"),
        sum(when(!col("ref"), col("q")).otherwise(0L)).as("sq_cur"),
        sum(when(!col("ref"), qq).otherwise(lit(0).cast(d38))).as("sqq_cur"))
      .withColumn("mean_ref_q6", expr("sq_ref DIV n_ref"))
      .withColumn("mean_cur_q6", expr("sq_cur DIV n_cur"))
      .withColumn("var_ref_q12", varExpr("n_ref", "sq_ref", "sqq_ref"))
      .withColumn("var_cur_q12", varExpr("n_cur", "sq_cur", "sqq_cur"))
      .withColumn("shift_q6", col("mean_cur_q6") - col("mean_ref_q6"))
      .withColumn("pooled_var_q12",
        expr("(n_ref * var_ref_q12 + n_cur * var_cur_q12) DIV (n_ref + n_cur)"))
      .withColumn("drift_ppm",
        expr("""CASE WHEN pooled_var_q12 > 0 THEN
                  (CAST(shift_q6 AS DECIMAL(38,0))
                   * CAST(shift_q6 AS DECIMAL(38,0)) * 1000000)
                  DIV CAST(pooled_var_q12 AS DECIMAL(38,0))
                ELSE NULL END"""))
      .select("dim", "n_ref", "n_cur", "mean_ref_q6", "mean_cur_q6",
        "shift_q6", "var_ref_q12", "var_cur_q12", "pooled_var_q12",
        "drift_ppm")
  }

  /** Simplified (centroid-based) silhouette per label: for each
    * vector, a = squared distance to its own label centroid, b = min
    * squared distance to any other label centroid, s = (b−a)/max(a,b)
    * — the standard clustering-quality read-out, aggregated per label
    * with the count of negative-silhouette (likely mislabeled /
    * boundary) vectors.
    *
    * Engine-exact without ever materializing a fractional centroid:
    * with quantized coordinates, the squared distance to centroid
    * S/n is ‖n·q − S‖²/n² = (n²·‖q‖² − 2n·⟨q,S⟩ + ‖S‖²)/n², an exact
    * DECIMAL(38,0) integer over n²; we truncate it to whole quantized
    * units (d2 = dd DIV n², ≤ ~7·10¹³ — far above any real tie) and
    * break exact ties by label id, so the argmin is deterministic in
    * both engines. The s-value finishes as one ppm integer division.
    *
    * Scale shape: centroid sums are d·L rows (tiny) and BROADCAST to
    * the ⟨q,S⟩ join, so the corpus shuffles once into the per-vector
    * groupBy — at 100 TB: one scan, one combinable aggregation, one
    * broadcast join, one conditional a/b aggregate over the L rows
    * per vector.
    */
  def silhouette(s: SparkSession, d: String): DataFrame = {
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("own"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("own"), col("dim"),
        (col("v").cast("double") * 1000000).cast("long").as("q"))
    // label counts ride the centroid aggregation (every vector
    // contributes each dim exactly once, so any dim's count IS the
    // label's vector count) — the separate embeddings scan + third
    // broadcast are gone
    val cent = q.groupBy(col("own").as("label"), col("dim"))
      .agg(sum(col("q")).as("sd"), count(lit(1)).as("nd"))
    val ssq = cent.groupBy("label")
      .agg(sum((col("sd").cast(d19) * col("sd").cast(d19)).cast(d38))
        .as("cnorm2"), max(col("nd")).as("n"))
    // r11 OPT (guide §2.4): ‖q‖² folds into the ⟨q,S⟩ aggregation —
    // each (vec, label) group sees every dim exactly once (the
    // centroid table is dense in (label, dim)), so sum(q·q) inside
    // the same groupBy IS the vector norm and the separate `vn`
    // pass + its (vec_id, own) sort-merge join disappear. The
    // a/b selection is a conditional aggregate over the same
    // (vec_id, own) grain instead of a self-referencing
    // filter-join + per-vec window: b2 = min d2 over other labels
    // (the window's rank-1 row only ever contributed its d2, so the
    // tie-break was decoration), one groupBy instead of two plan
    // copies of the whole ip subtree. 20 scans → 3, 46 Exchanges → 7.
    // r12 OPT (guide §4, the cov_matrix discipline): the ⟨q,S⟩
    // products run on the n·d·L-row stream — the query's biggest
    // relation — and each paid two DECIMAL(19) casts + a decimal
    // multiply per row. |q| ≤ 10⁶ (unit-scale embedding × 10⁶) and
    // |sd| ≤ n_label·10⁶, so the LONG product |q·sd| ≤ n_label·10¹²
    // stays exact while any label holds < ~9.2·10⁶ vectors — far
    // above every tested SF (sf1: 2·10³/label); only the
    // ACCUMULATING sum stays DECIMAL(38,0), which is where the
    // unbounded growth lives. Identical integers, oracle-pinned.
    val ip = q.join(broadcast(cent.select("label", "dim", "sd")), Seq("dim"))
      .groupBy("vec_id", "own", "label")
      .agg(sum((col("q") * col("sd")).cast(d38)).as("ipqs"),
        sum(col("q") * col("q")).as("norm2"))
    val scaled = ip.join(broadcast(ssq), Seq("label"))
      .withColumn("d2",
        expr("""(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                  * CAST(norm2 AS DECIMAL(38,0))
                 - 2 * CAST(n AS DECIMAL(38,0)) * ipqs + cnorm2)
                DIV (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))"""))
    scaled.groupBy("vec_id", "own")
      .agg(max(when(col("label") === col("own"), col("d2"))).as("a2"),
        min(when(col("label") =!= col("own"), col("d2"))).as("b2"))
      // inner-join parity: a vector with no other label (single-label
      // corpus) dropped out of the old own⋈nearestOther join
      .filter(col("b2").isNotNull)
      .withColumn("s_ppm",
        expr("""CASE WHEN a2 = 0 AND b2 = 0 THEN CAST(0 AS BIGINT)
                ELSE (CAST(b2 AS DECIMAL(38,0)) - CAST(a2 AS DECIMAL(38,0)))
                  * 1000000 DIV CAST(GREATEST(a2, b2) AS DECIMAL(38,0))
                END"""))
      .groupBy(col("own").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("SUM(s_ppm) DIV COUNT(1)").as("mean_sil_ppm"),
        min(col("s_ppm")).as("min_sil_ppm"),
        sum(when(col("s_ppm") < 0, 1L).otherwise(0L)).as("n_negative"))
  }

  /** Maximal-marginal-relevance rerank of each query's top-`m`
    * retrieval candidates down to `k` diverse results — the standard
    * serving-side move when the raw top-k is five near-copies of the
    * same document: greedily pick argmax λ·sim(q,c) −
    * (1−λ)·max_{s∈selected} sim(c,s), λ = 0.7.
    *
    * Spark-first with ZERO UDFs: after the (broadcast-query ×
    * corpus) scoring pass, each query's m=10 candidates collapse to
    * ONE row (sorted array of structs), the m×m candidate-similarity
    * matrix materializes via `transform`+`zip_with`+`aggregate`, and
    * the k−1 greedy steps run inside ONE `aggregate` loop over a
    * (sel, pen) accumulator struct — the per-step argmax is an
    * `array_max` over score structs with the (score desc, index asc)
    * tiebreak encoded as (sc, −i). All
    * similarities are exact integer dots of ×10³-quantized vectors
    * (7·simq − 3·penalty is the λ split in tenths), so the greedy
    * trajectory is bit-deterministic and the spec replays it on the
    * driver. Cost: the scoring scan dominates; the rerank itself
    * touches nQueries rows of m-length arrays — free at any scale.
    */
  def mmrRerank(s: SparkSession, d: String, nQueries: Int = 20,
      m: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.spread(Tables.embeddings(s, d))
      .select(col("vec_id"),
        transform(col("embedding"),
          v => (v.cast("double") * 1000).cast("long")).as("qv"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("query_v"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("cand_id"))
    val cand = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"), col("qv"),
        expr("""aggregate(zip_with(qv, query_v, (a, b) -> a * b),
                0L, (acc, x) -> acc + x)""").as("dot"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
    val grouped = cand
      .groupBy("query_id")
      .agg(array_sort(collect_list(
        struct(col("rk"), col("cand_id"), col("dot"), col("qv"))))
        .as("c"))
      .withColumn("simq", expr("transform(c, x -> x.dot)"))
      .withColumn("sims",
        expr("""transform(c, x -> transform(c, y ->
                aggregate(zip_with(x.qv, y.qv, (a, b) -> a * b),
                  0L, (acc, v) -> acc + v)))"""))
    // the k−1 greedy steps run INSIDE one `aggregate` loop — the
    // lambda is authored once and executed k−1 times at runtime, so
    // the expression tree stays constant-size (an unrolled
    // withColumn fold re-substitutes sel/pen into every step and
    // blows codegen up exponentially — measured minutes of compile
    // for k=5)
    val pick =
      s"""-array_max(transform(sequence(0, ${m - 1}, 1), i ->
          IF(array_contains(acc.sel, i), NULL,
            named_struct('sc', 7 * simq[i] - 3 * acc.pen[i],
              'ni', -i)))).ni"""
    val stepped = grouped.withColumn("sel",
      expr(s"""aggregate(sequence(2, $k, 1),
               named_struct('sel', array(0), 'pen', sims[0]),
               (acc, t) -> named_struct(
                 'sel', concat(acc.sel, array($pick)),
                 'pen', zip_with(acc.pen,
                   element_at(sims, ($pick) + 1),
                   (a, b) -> greatest(a, b))),
               acc -> acc.sel)"""))
    stepped
      .select(col("query_id"), col("c"),
        posexplode(col("sel")).as(Seq("p", "i")))
      .select(col("query_id"), (col("p") + 1).cast("long").as("rank"),
        expr("element_at(c, i + 1).cand_id").as("cand_id"),
        expr("element_at(c, i + 1).dot").as("dot_q6"))
  }
}

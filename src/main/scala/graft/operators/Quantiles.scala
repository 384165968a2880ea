package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import scala.collection.mutable

/** Bounded-memory EXACT quantiles by iterative range-count selection.
  *
  * Spark's exact `percentile()` aggregates a value→count map per
  * group; over continuous doubles at 100 TB, distinct ≈ rows and the
  * aggregation buffer OOMs — exactness traded for a scale hazard.
  * This operator keeps the exactness and drops the hazard: the k-th
  * order statistic is found by DESCENT, not by materializing the
  * distribution.
  *
  *   pass 0   per group: n, min, max               (combinable agg)
  *   repeat   per (group, rank): histogram the live range [lo, hi]
  *            into B equal-width buckets — count + in-bucket min/max
  *            each — and descend into the bucket holding the target
  *            rank (combinable agg; every scan is filtered map-side
  *            against a BROADCAST of the tiny state table)
  *   final    once a candidate range holds ≤ `small` rows (or its
  *            width can no longer split), resolve exactly from the
  *            (distinct value, count) pairs inside it
  *
  * Every pass is a single whole-stage-codegen aggregation over the
  * fact scan; executor state is O(B) per (group, rank) — O(1) in the
  * data. Driver state is O(groups × quantiles): the same "tiny
  * broadcast model" bound as k-means centroids, never the corpus.
  * Each descent multiplies the candidate width by 1/B and the
  * in-bucket min/max tighten it further, so convergence is
  * ~log_B(width/ulp) ≤ 7 passes worst-case; uniform data resolves in
  * 2-3 total scans. A bucket of pure duplicates resolves immediately
  * (min == max).
  *
  * Results are EXACT (counts and comparisons only — no sketches, no
  * float accumulation), so the DuckDB `quantile_cont` oracle is
  * unchanged: linear interpolation between the two neighboring order
  * statistics, which are just two targets sharing the same scans.
  *
  * Reference behavior: gmall-realtime-ck serves quantile dashboards
  * from ClickHouse `quantileExact*` (TradeStatsMapper.java:1 family);
  * this is the multi-pass shape those single-node sorts become when
  * one node's memory no longer holds a group.
  */
object Quantiles {

  private final case class Target(gk: String, rank: Long) // 0-based
  private final case class State(var lo: Double, var hi: Double,
      var below: Long, // rows with value < lo (rank offset)
      var count: Long, // rows with lo <= value <= hi
      var value: Option[Double])

  private val SEP = "\u0001"
  private val NULLMARK = "\u0000null"

  /** Exact interpolated quantiles per group.
    *
    * @param ps (outputColumn, p) pairs, 0 <= p <= 1
    * @param driverBudget max rows any per-pass collect may return to
    *        the driver: histogram passes return up to
    *        openTargets × buckets rows, so the bucket count is
    *        auto-shrunk (floor 16) to fit the budget and the call
    *        fails loudly if even 16 buckets per target exceeds it —
    *        the guard bounds what is actually collected, not just
    *        the group count
    * @return one row per group: groupCols ++ ps-named double columns
    *         (6dp-rounded, matching the repo's cross-engine quantile
    *         discipline); empty groups (all-null values) yield null
    */
  def groupQuantiles(fact0: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)], buckets: Int = 1024,
      small: Int = 4096, driverBudget: Long = 16L * 1024 * 1024): DataFrame = {
    val spark = fact0.sparkSession
    val global = groupCols.isEmpty
    val gcols = if (global) Seq("__g") else groupCols
    val keyed0 = if (global) fact0.withColumn("__g", lit(1)) else fact0
    val keyed = keyed0
      .select((gcols.map(col) :+ col(valueCol).cast("double").as("__v")): _*)
      .withColumn("__gk", concat_ws(SEP,
        gcols.map(c => coalesce(col(c).cast("string"), lit(NULLMARK))): _*))
    val fact = keyed.filter(col("__v").isNotNull)

    // pass 0: per-group extent over the UNFILTERED frame — count(__v)
    // ignores nulls, so an all-null group surfaces with n = 0 and
    // emits a null-quantile row (matching SQL GROUP BY semantics)
    // instead of disappearing. Also captures the original group
    // column VALUES for the output rows.
    val stats = keyed.groupBy((col("__gk") +: gcols.map(col)): _*)
      .agg(count(col("__v")).as("__n"), min("__v").as("__mn"),
        max("__v").as("__mx"))
      .collect()
    // the encoded key must be injective or two groups' descents
    // silently merge (a group string containing the separator, or
    // equal to the null marker, collides); the driver already holds
    // one row per group here, so detect ANY collision exactly where
    // it would corrupt — before state is built
    require(stats.iterator.map(_.getString(0)).toSet.size == stats.length,
      "group-key encoding collision: a group value contains the " +
        "\\u0001 separator or the null marker — rename/escape the " +
        "group values before calling groupQuantiles")

    // ranks needed per group: floor and ceil of p*(n-1) per quantile
    val states = mutable.Map[Target, State]()
    val groupInfo = stats.map { r =>
      val gk = r.getString(0)
      val n = r.getLong(gcols.length + 1)
      if (n > 0) {
        val mn = r.getDouble(gcols.length + 2)
        val mx = r.getDouble(gcols.length + 3)
        ps.foreach { case (_, p) =>
          val r0 = p * (n - 1)
          val k = math.floor(r0).toLong
          Seq(k, math.min(k + 1, n - 1)).distinct.foreach { rk =>
            states.getOrElseUpdate(Target(gk, rk),
              State(mn, mx, 0L, n,
                if (mn == mx) Some(mn) else None))
          }
        }
      }
      gk -> (r, n)
    }.toMap

    // driver guard: each histogram pass collects up to
    // openTargets × buckets rows. Bound THAT product, not the group
    // count — shrink the bucket fan-out (floor 16; descent just takes
    // more passes) and fail loudly if even the floor busts the
    // budget. The old guard capped groups at 100k but would still
    // have let `targets × 1024` reach ~10⁸ collected rows.
    val bAdj = math.max(16L, math.min(buckets.toLong,
      driverBudget / math.max(states.size.toLong, 1L))).toInt
    require(states.size.toLong * bAdj <= driverBudget,
      s"groupQuantiles targets dashboard-grain groups: ${states.size} " +
        s"(group, rank) targets × $bAdj buckets exceeds the driver " +
        s"budget of $driverBudget collected rows per pass — use " +
        "approx sketches for high-cardinality keys")

    var pass = 0
    while (states.valuesIterator.exists(_.value.isEmpty) && pass < 64) {
      pass += 1
      val open = states.filter(_._2.value.isEmpty).toSeq
      val (finals, descents) = open.partition { case (_, st) =>
        st.count <= small || (st.hi - st.lo) / bAdj <= 0d
      }
      if (descents.nonEmpty) descend(spark, fact, descents, bAdj)
      if (finals.nonEmpty) resolveSmall(spark, fact, finals)
    }
    require(states.valuesIterator.forall(_.value.isDefined),
      "quantile descent did not converge")

    // interpolate per group and build the (tiny) output
    val outRows = groupInfo.toSeq.map { case (gk, (statRow, n)) =>
      val gvals = gcols.indices.map(i => statRow.get(i + 1))
      val qs = ps.map { case (_, p) =>
        if (n == 0) null
        else {
          val r0 = p * (n - 1)
          val k = math.floor(r0).toLong
          val frac = r0 - k
          val vLo = states(Target(gk, k)).value.get
          val v = if (frac == 0d) vLo else {
            val vHi = states(Target(gk, math.min(k + 1, n - 1))).value.get
            vLo + frac * (vHi - vLo)
          }
          // HALF_UP to match DuckDB round() — math.rint is
          // half-even and would hash-mismatch on an exact 5e-7 tie
          Double.box(if (v.isNaN || v.isInfinite) v
            else BigDecimal(v).setScale(6,
              scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      Row.fromSeq(gvals ++ qs)
    }
    val schema = StructType(
      gcols.map(c => fact.schema(c)) ++
        ps.map { case (name, _) => StructField(name, DoubleType) })
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1), schema)
    if (global) out.drop("__g") else out
  }

  /** One histogram pass over all open (group, rank) targets: bucket
    * counts + in-bucket min/max, then descend each target into the
    * bucket containing its rank.
    */
  /** Exact interpolated quantiles in ONE pass for BOUNDED-DOMAIN
    * value columns (integer days, quantities, bucketed codes — any
    * column whose distinct-count is data-independent). Where the
    * descent above trades passes for O(1) state on continuous
    * domains, a bounded domain needs neither: a map-side-combined
    * frequency rollup shrinks the fact to (groups × domain) rows,
    * a per-group cumulative count assigns each distinct value its
    * 0-based rank range [rlo, rhi), and the two order statistics
    * around rank h = (n−1)·q are read off those ranges and
    * interpolated (the `quantile_cont` contract, same as the
    * descent and the DuckDB oracle). At any fact size the only
    * fact-shaped work is the first aggregation; the windows run
    * over the tiny rollup. Output: groupCols ++ one round-6 double
    * per quantile.
    */
  def boundedDomainQuantiles(fact: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val freq = fact.groupBy((gcols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    val cum = freq
      .withColumn("__rhi", sum(col("__c")).over(w))
      .withColumn("__rlo", col("__rhi") - col("__c"))
      // group size from the same partitioning — one shuffle, reused
      .withColumn("__n", max(col("__rhi")).over(
        Window.partitionBy(groupCols.map(col): _*)))
    // h = (n-1)·q is constant per group; grouping by __n keeps it
    // expressible after the aggregate
    def stat(rank: Column): Column =
      max(when(col("__rlo") <= rank && rank < col("__rhi"), col(valueCol)))
    val aggs = ps.flatMap { case (name, q) =>
      val h = (col("__n") - 1) * lit(q)
      Seq(stat(floor(h)).as(s"__f_$name"), stat(ceil(h)).as(s"__c_$name"))
    }
    val picked = cum.groupBy((gcols :+ col("__n")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, q) =>
      val h = (col("__n") - 1) * lit(q)
      round((col(s"__f_$name") + (h - floor(h)) *
        (col(s"__c_$name") - col(s"__f_$name"))).cast("double"), 6).as(name)
    }
    picked.select(gcols ++ outs: _*)
  }

  private def descend(spark: SparkSession, fact: DataFrame,
      open: Seq[(Target, State)], buckets: Int): Unit = {
    val stateRows = open.map { case (t, st) =>
      Row(t.gk, t.rank, st.lo, st.hi)
    }
    val stateDf = spark.createDataFrame(
      spark.sparkContext.parallelize(stateRows, 1),
      StructType(Seq(StructField("__sgk", org.apache.spark.sql.types.StringType),
        StructField("__rank", LongType), StructField("__lo", DoubleType),
        StructField("__hi", DoubleType))))
    val w = (col("__hi") - col("__lo")) / buckets
    val hist = fact
      .join(broadcast(stateDf), col("__gk") === col("__sgk"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
      .withColumn("__b", least(lit(buckets - 1),
        floor((col("__v") - col("__lo")) / w)).cast("int"))
      .groupBy(col("__sgk"), col("__rank"), col("__b"))
      .agg(count(lit(1)).as("__ct"), min("__v").as("__bmn"),
        max("__v").as("__bmx"))
      .collect()
    val byTarget = hist.groupBy(r => Target(r.getString(0), r.getLong(1)))
    open.foreach { case (t, st) =>
      val bs = byTarget(t).sortBy(_.getInt(2))
      val need = t.rank - st.below // 0-based rank within [lo, hi]
      var cum = 0L
      var done = false
      for (b <- bs if !done) {
        val ct = b.getLong(3)
        if (cum + ct > need) {
          st.below += cum
          st.count = ct
          st.lo = b.getDouble(4)
          st.hi = b.getDouble(5)
          if (st.lo == st.hi) st.value = Some(st.lo)
          done = true
        } else cum += ct
      }
      require(done, s"rank ${t.rank} not found in any bucket")
    }
  }

  /** Final exact resolution for targets whose candidate range is
    * small: (distinct value, count) pairs inside [lo, hi] — bounded
    * by the range's row count — walked in order to the rank.
    */
  private def resolveSmall(spark: SparkSession, fact: DataFrame,
      open: Seq[(Target, State)]): Unit = {
    val stateRows = open.map { case (t, st) => Row(t.gk, t.rank, st.lo, st.hi) }
    val stateDf = spark.createDataFrame(
      spark.sparkContext.parallelize(stateRows, 1),
      StructType(Seq(StructField("__sgk", org.apache.spark.sql.types.StringType),
        StructField("__rank", LongType), StructField("__lo", DoubleType),
        StructField("__hi", DoubleType))))
    val vals = fact
      .join(broadcast(stateDf), col("__gk") === col("__sgk"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
      .groupBy(col("__sgk"), col("__rank"), col("__v"))
      .agg(count(lit(1)).as("__ct"))
      .collect()
    val byTarget = vals.groupBy(r => Target(r.getString(0), r.getLong(1)))
    open.foreach { case (t, st) =>
      val vs = byTarget(t).map(r => (r.getDouble(2), r.getLong(3)))
        .sortBy(_._1)
      val need = t.rank - st.below
      var cum = 0L
      var done = false
      for ((v, ct) <- vs if !done) {
        if (cum + ct > need) { st.value = Some(v); done = true }
        else cum += ct
      }
      require(done, s"rank ${t.rank} not found in candidate range")
    }
  }
}

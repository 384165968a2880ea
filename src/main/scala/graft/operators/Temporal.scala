package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins.
  *
  * The as-of join (each left row picks the latest right row with
  * `right.ts <= left.ts` per key) is the batch analogue of the
  * reference's dim-versioned lookup: a CDC-updated dimension row is
  * valid until its next version, and facts must join the version in
  * effect at event time (realtime-dim/.../DimSinkFunction.java:1
  * keeps only the latest; this keeps every version addressable).
  *
  * Implementation is a single shuffle + sort, NOT a range join: tag
  * and union both inputs, sort per key by (ts, side), and carry the
  * last non-null right value forward with an unbounded-preceding
  * `last(ignoreNulls)` frame. O((|L|+|R|) log) per key group, no
  * quadratic candidate generation — the formulation that survives a
  * billion-row fact table (partitioned by key, sorted once).
  */
object Temporal {

  /** As-of join `left` to `right` on `key`: for each left row, the
    * right row with the greatest `rightTs <= leftTs` (ties on equal
    * timestamps take the right row — "value in effect at ts").
    * `right` must be unique per (key, ts); pre-aggregate otherwise.
    * Right value columns come back null when no right row precedes.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 sorts before side 1 at equal ts, so a right row AT the
    // left timestamp is visible to it (<= semantics)
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** Time-bounded interval join, batch form of the reference's
    * stream-stream interval join (DwdTradeOrderDetail.java:1): left
    * rows match right rows of the same key whose timestamp falls in
    * `(leftTs - lowerUs, leftTs]`. The equi-key shuffles; the range is
    * a post-join filter — never a cross product. The right key column
    * is dropped from the output (it duplicates the left's).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsUs: Column, rightTsUs: Column, lowerUs: Long): DataFrame =
    left.join(right.withColumnRenamed(key, "__rkey"),
      left(key) === col("__rkey") &&
        rightTsUs > leftTsUs - lowerUs && rightTsUs <= leftTsUs,
      "left").drop("__rkey")

  import graft.sources.Tables

  private def asOfInputs(s: org.apache.spark.sql.SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    // unique per (key, ts): collapse same-microsecond views to the max
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
      .agg(max(col("value")).as("last_view_value"))
    (purchases, views)
  }

  /** As-of query: each purchase event carries the value of the same
    * user's most recent view at-or-before it (microsecond grain).
    */
  def lastViewBeforePurchase(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    asOfJoin(purchases, views, "user_id", "us", Seq("last_view_value"))
      .select("event_id", "user_id", "us", "last_view_value")
  }

  /** Same query through the custom Catalyst operator
    * ([[graft.plans.AsOfJoinExec]]) — graded against the same DuckDB
    * ASOF JOIN oracle, so the native plan's correctness is checked by
    * an entirely independent implementation.
    */
  def lastViewBeforePurchaseNative(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    graft.plans.AsOfJoin(purchases, views, "user_id", "us",
        Seq("last_view_value"))
      .select("event_id", "user_id", "us", "last_view_value")
  }

  private def intervalInputs(s: org.apache.spark.sql.SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
    (p, c)
  }

  /** The as-of query written in RAW SQL through the TVF surface
    * ([[graft.plans.AsOfSql]]) — how a view-registry user reaches the
    * custom operator without the Scala API. Same DuckDB ASOF oracle.
    */
  def lastViewBeforePurchaseSql(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    purchases.createOrReplaceTempView("asof_purchases")
    views.createOrReplaceTempView("asof_views")
    s.sql(
      """SELECT event_id, user_id, us, last_view_value
        |FROM graft_asof_join('asof_purchases', 'asof_views',
        |                     'user_id', 'us', 'last_view_value')
        |""".stripMargin)
  }

  /** Interval query: clicks by the same user in the 15 minutes up to
    * each purchase (inclusive) — the order⋈detail interval-join shape.
    */
  def clicksBeforePurchase(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (p, c) = intervalInputs(s, d)
    intervalJoin(p, c, "user_id", col("p_us"), col("c_us"), 900000000L)
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("c_us")).as("clicks_15m"))
  }

  /** Same interval query through the custom Catalyst operator
    * ([[graft.plans.IntervalJoinExec]]) — graded against the same
    * DuckDB range-join oracle. The exec evaluates the range inside
    * the merge walk, so no Filter node sits above it in the plan.
    */
  def clicksBeforePurchaseNative(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (p, c) = intervalInputs(s, d)
    graft.plans.IntervalJoin(p, c, "user_id", "p_us", "c_us",
        900000000L, Seq("c_us"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("c_us")).as("clicks_15m"))
  }

  /** SCD2 dim builder: turn a CDC-style change feed (key, ts, value)
    * into versioned dimension rows with validity intervals —
    * `[valid_from_us, valid_to_us)` half-open, the last version open
    * (null). This is the batch materialization of what the
    * reference's HBase dim layer loses (DimSinkFunction.java:1 keeps
    * only the latest version); an as-of join against the change feed
    * and an interval-containment join against this table answer
    * identically. One window over (key, ts) — single shuffle on the
    * key, the partition-friendly SCD2 shape.
    */
  def scd2Build(changes: DataFrame, key: String, ts: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    changes.select(
      Seq(col(key), col(ts).as("valid_from_us"),
        lead(col(ts), 1).over(w).as("valid_to_us")) ++
        valueCols.map(col): _*)
  }

  /** SCD2 query over the view change feed: per-user view-value
    * versions with validity intervals.
    */
  def userValueScd2(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (_, views) = asOfInputs(s, d)
    scd2Build(views, "user_id", "us", Seq("last_view_value"))
  }

  /** SCD Type-3 — the "current + previous" dimension the reference's
    * boards join when only ONE step of history matters (vs Type-2's
    * full interval history from [[scd2Build]] and Type-1's overwrite
    * merge): per key, the latest value, the value it replaced, and
    * when it changed — two frames over ONE descending per-key sort.
    */
  def userValueScd3(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (_, views) = asOfInputs(s, d)
    val w = Window.partitionBy("user_id").orderBy(col("us").desc)
    views
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_value", lead(col("last_view_value"), 1).over(w))
      .withColumn("prev_changed_us", lead(col("us"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("last_view_value").as("cur_value"),
        col("prev_value"), col("us").as("changed_us"),
        col("prev_changed_us"))
  }

  /** NEAREST-direction as-of join (pandas `merge_asof
    * direction='nearest'` parity — the calibration-lookup semantics
    * a backward-only as-of can't express): each left row takes the
    * right row minimizing |Δt|, ties preferring the backward
    * (at-or-before) candidate. Same union+window shape as
    * [[asOfJoin]] — ONE shuffle on the key, two frames over one
    * sort (backward last + forward first, both ignore-nulls) — so
    * the nearest variant costs exactly the backward variant, not a
    * second pass. `ts` must be long-backed (microseconds).
    */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val vType = right.schema(valueCol).dataType
    val lT = left.withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        Seq(lit(null).cast(vType).as(valueCol),
          lit(null).cast("long").as("__rts")): _*)
    val rT = right.withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(valueCol), col(ts).cast("long").as("__rts")): _*)
    val wb = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lT.unionByName(rT)
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++ Seq(
          last(col(valueCol), ignoreNulls = true).over(wb).as("__pv"),
          last(col("__rts"), ignoreNulls = true).over(wb).as("__pt"),
          first(col(valueCol), ignoreNulls = true).over(wf).as("__nv"),
          first(col("__rts"), ignoreNulls = true).over(wf).as("__nt")): _*)
      .filter(col("__side") === 1)
      .withColumn(valueCol,
        when(col("__pt").isNotNull && (col("__nt").isNull ||
          (col(ts) - col("__pt")) <= (col("__nt") - col(ts))),
          col("__pv")).otherwise(col("__nv")))
      .drop("__side", "__pv", "__pt", "__nv", "__nt")
  }

  /** Nearest-view query: each purchase takes the same user's view
    * CLOSEST in time (either direction), ties backward.
    */
  def nearestViewToPurchase(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    asOfJoinNearest(purchases, views, "user_id", "us", "last_view_value")
      .select(col("event_id"), col("user_id"), col("us"),
        col("last_view_value").as("nearest_view_value"))
  }

  /** FORWARD as-of join (pandas merge_asof direction='forward' —
    * "the next reading at-or-after", the sensor-alignment dual of
    * backward): first right row with ts ≥ left ts. Same union+sort,
    * one forward-first frame. At equal ts the right row sorts
    * before the left (side 0 < 1), so AT-ts rights are visible —
    * ≥ semantics, mirroring the backward join's ≤.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val vType = right.schema(valueCol).dataType
    val lT = left.withColumn("__side", lit(1))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        Seq(lit(null).cast(vType).as(valueCol)): _*)
    val rT = right.withColumn("__side", lit(0))
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(valueCol)): _*)
    // side 0 sorts FIRST at equal ts, so a right row AT the left
    // timestamp is inside the current..following frame
    val wf = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lT.unionByName(rT)
      .select(Seq(col(key), col(ts), col("__side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        Seq(first(col(valueCol), ignoreNulls = true).over(wf)
          .as(valueCol)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Forward query: each purchase takes the same user's NEXT view
    * at-or-after it.
    */
  def nextViewAfterPurchase(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    asOfJoinForward(purchases, views, "user_id", "us", "last_view_value")
      .select(col("event_id"), col("user_id"), col("us"),
        col("last_view_value").as("next_view_value"))
  }

  /** Backward as-of with a TOLERANCE bound (merge_asof `tolerance` —
    * "the latest reading, but only if fresh enough"): the match
    * nulls out when the backward candidate is older than
    * `toleranceUs`. Rides [[asOfJoin]]'s plan plus a carried
    * match-timestamp; serving systems use exactly this to refuse
    * stale dimension data instead of silently joining it.
    */
  def staleBoundedViewBeforePurchase(
      s: org.apache.spark.sql.SparkSession, d: String,
      toleranceUs: Long = 3600000000L): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    val withTs = views.withColumn("match_us", col("us"))
    asOfJoin(purchases, withTs, "user_id", "us",
        Seq("last_view_value", "match_us"))
      .select(col("event_id"), col("user_id"), col("us"),
        when(col("match_us").isNotNull &&
          col("us") - col("match_us") <= toleranceUs,
          col("last_view_value")).as("fresh_view_value"))
  }

  /** Generic interval-OVERLAP join, banded for scale: per-(user,
    * day) activity spans against monthly promo windows. Both
    * interval sets map to a MONTH band key (a day-grain span never
    * crosses months; a generic span would `sequence`-explode to the
    * bands it touches), the join is a plain equi-join on the band
    * plus a residual overlap predicate — never a cross product, and
    * both sides stay shuffle-partitioned on the band at any scale.
    * The overlap test is closed-vs-half-open:
    * a_start < p_end ∧ a_end ≥ p_start.
    */
  def promoOverlap(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val act = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(unix_micros(col("ts"))).as("a_start"),
        max(unix_micros(col("ts"))).as("a_end"))
      .withColumn("mi", (year(col("day")) * 12 + month(col("day")))
        .cast("long"))
    // one promo window per active month: first 10 days
    val promos = ev.select(trunc(to_date(col("ts")), "month").as("m0"))
      .distinct()
      .select((year(col("m0")) * 12 + month(col("m0"))).cast("long")
          .as("mi"),
        unix_micros(to_timestamp(col("m0"))).as("p_start"),
        unix_micros(to_timestamp(date_add(col("m0"), 10))).as("p_end"))
    act.join(promos, "mi")
      .filter(col("a_start") < col("p_end") &&
        col("a_end") >= col("p_start"))
      .groupBy(col("mi"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_user_days"))
  }

  /** Point-in-time serving AGAINST the SCD2 dim — the warehouse
    * access path (probe ⋈ versioned-dim on key + half-open interval
    * containment) that answers exactly what the as-of join answers
    * from the raw change feed. Both paths are graded against the
    * same semantics and a spec asserts row-for-row parity with
    * [[lastViewBeforePurchase]] — the SCD2 table earns its storage
    * only if the containment join is provably the as-of join. Each
    * probe hits at most ONE version (intervals partition the
    * timeline per key); left-outer keeps pre-first-version probes
    * with a null value. One shuffle per side on the user key; the
    * per-key interval list is the version count, which SCD2 keeps
    * small by construction.
    */
  def scd2Serve(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, _) = asOfInputs(s, d)
    val dim = userValueScd2(s, d).withColumnRenamed("user_id", "dim_uid")
    purchases.join(dim,
        purchases("user_id") === col("dim_uid") &&
          col("us") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("us") < col("valid_to_us")),
        "left_outer")
      .select(purchases("event_id"), purchases("user_id"), col("us"),
        col("last_view_value"))
  }

  /** Time-travel diff — "what changed in the dimension between two
    * as-of instants?", the audit a slowly-changing dim owner runs
    * after a backfill (the temporal dual of [[snapshotDiff]], which
    * diffs two DERIVED snapshots; this diffs the SAME versioned dim
    * at two times). Both as-of states are interval-containment
    * filters over [[userValueScd2]]'s versions — no rebuild, no
    * second scan of the change feed — full-outer joined at the key
    * so appears/disappears classify as added/removed.
    */
  def asofDiff(s: org.apache.spark.sql.SparkSession, d: String,
      t1Us: Long = 1704844800000000L,   // 2024-01-10T00:00Z
      t2Us: Long = 1706140800000000L    // 2024-01-25T00:00Z
      ): DataFrame = {
    val dim = userValueScd2(s, d)
    def at(t: Long, n: String) = dim
      .filter(col("valid_from_us") <= t &&
        (col("valid_to_us").isNull || col("valid_to_us") > t))
      .select(col("user_id"), col("last_view_value").as(n))
    at(t1Us, "v1").join(at(t2Us, "v2"), Seq("user_id"), "full_outer")
      .withColumn("op",
        when(col("v1").isNull, lit("added"))
          .when(col("v2").isNull, lit("removed"))
          .when(col("v1") =!= col("v2"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("op") =!= "same")
  }

  /** Batch SCD1 MERGE (the `MERGE INTO` / Delta-upsert shape, SCD2's
    * latest-version-only sibling): fold the newest change per key
    * into the dim — matched rows take the new value (`update`),
    * unmatched base rows pass through (`keep`), unmatched changes
    * become `insert`s. One per-key window on the (small) change feed
    * + one full-outer join on the dim key; both shuffle on the key
    * once, which is the minimal MERGE plan at any scale (Delta/
    * Iceberg add file-pruning around exactly this join).
    */
  def mergeUpsert(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
    val upd = Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("k"), col("value").as("new_bal"))
    Tables.customer(s, d)
      .join(upd, col("c_custkey") === col("k"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("k")).as("cust_id"),
        col("c_name"),
        coalesce(col("new_bal"), col("c_acctbal")).as("acctbal"),
        when(col("c_custkey").isNull, lit("insert"))
          .when(col("k").isNull, lit("keep"))
          .otherwise(lit("update")).as("op"))
  }

  /** Broadcast as-of join — the third physical strategy in the as-of
    * family (after the shuffling SMJ exec and its zero-Exchange
    * bucketed form): when the versioned dim is small (the common
    * case — dim versions ≪ facts), ship a per-key sorted timestamp
    * index to every task and binary-search it per fact row. The FACT
    * SIDE NEVER SHUFFLES OR SORTS — the plan is scan → mapPartitions,
    * embarrassingly parallel, the same trade Spark's own
    * BroadcastHashJoin makes. Right must be unique per (key, ts);
    * key/ts must be long-backed.
    */
  def asOfJoinBroadcast(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val valSchema = valueCols.map(c => right.schema(c))
    val outSchema = StructType(left.schema.fields ++
      valSchema.map(_.copy(nullable = true)))
    val rIdx = right.select((Seq(col(key), col(ts)) ++ valueCols.map(col)): _*)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        (k, (sorted.map(_.getLong(1)), sorted.map(r =>
          Array.tabulate(valueCols.length)(i => r.get(i + 2)))))
      }
    val bc = spark.sparkContext.broadcast(rIdx)
    val keyOrd = left.schema.fieldIndex(key)
    val tsOrd = left.schema.fieldIndex(ts)
    val nVals = valueCols.length
    left.mapPartitions { it =>
      val idx = bc.value
      it.map { row =>
        val vals: Array[Any] =
          if (row.isNullAt(keyOrd) || row.isNullAt(tsOrd)) new Array[Any](nVals)
          else idx.get(row.getLong(keyOrd)) match {
            case Some((tss, vs)) =>
              // greatest right ts <= left ts: binary search for the
              // insertion point, take the element before it
              var lo = 0; var hi = tss.length
              val t = row.getLong(tsOrd)
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) <= t) lo = mid + 1 else hi = mid
              }
              if (lo == 0) new Array[Any](nVals) else vs(lo - 1)
            case None => new Array[Any](nVals)
          }
        Row.fromSeq(row.toSeq ++ vals)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** The as-of query through the broadcast strategy — same DuckDB
    * ASOF oracle as the SMJ variants; plan-asserted shuffle-free.
    */
  def lastViewBeforePurchaseBroadcast(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (purchases, views) = asOfInputs(s, d)
    asOfJoinBroadcast(purchases, views, "user_id", "us",
        Seq("last_view_value"))
      .select("event_id", "user_id", "us", "last_view_value")
  }

  /** Snapshot reconciliation — the table-diff dual of
    * [[mergeUpsert]]: given two snapshots of the same keyed state,
    * emit the change feed that turns A into B (added / deleted /
    * changed rows; unchanged rows are dropped before they reach any
    * sink). This is the audit/backfill primitive: diff yesterday's
    * dim against today's, or a recomputed table against the serving
    * copy, and ship only the delta.
    *
    * Snapshots here are per-customer order rollups over two
    * deterministic order subsets (parity / mod-3 splits), chosen so
    * all four ops genuinely occur. Shape: one co-partitioned
    * full-outer join on the key — both sides shuffle once; at
    * warehouse scale both snapshots would be bucketed by key and the
    * join goes zero-Exchange (the same story ScaleSpec proves for
    * the bucketed as-of). Decimal sums make 'changed' an exact
    * comparison, never a float epsilon.
    */
  /** Calendar dimension builder — the Kimball date dim every
    * warehouse joins instead of re-deriving date parts in every
    * query: one row per calendar day spanning the fact table's date
    * range (GAP DAYS INCLUDED — that is the point of a date dim),
    * with the derived attributes the serving layer filters on.
    * Generated via `sequence` + explode off a 1-row min/max
    * aggregate — no driver loop, no fact re-scan per attribute; DOW
    * is epoch-day % 7 (0 = Thursday) for cross-engine parity.
    */
  def calendarDim(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    graft.sources.Tables.orders(s, d)
      .agg(min(to_date(col("o_orderdate"))).as("lo"),
        max(to_date(col("o_orderdate"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("dt"))
      .select(col("dt"),
        (datediff(col("dt"), lit("1970-01-01").cast("date")) % 7)
          .cast("long").as("dow"),
        year(col("dt")).cast("long").as("y"),
        month(col("dt")).cast("long").as("mo"),
        dayofmonth(col("dt")).cast("long").as("dom"),
        quarter(col("dt")).cast("long").as("q"),
        (date_trunc("month", col("dt")).cast("date") === col("dt"))
          .cast("long").as("is_month_start"),
        (last_day(col("dt")) === col("dt")).cast("long")
          .as("is_month_end"))

  /** Interval-union coverage (merge overlapping activity windows —
    * the "total active time" metric billing/engagement boards need):
    * each event opens a `holdUs`-long window; per user, overlapping
    * windows merge into islands and the report is islands + covered
    * microseconds. The classic two-window island trick: a window is
    * a NEW island iff its start exceeds the running max end of all
    * earlier windows; island ids are the running sum of those flags.
    * One per-user sort carries both windows and the rollup — the
    * same single-shuffle contract as sessionize, but measuring
    * COVERAGE (union length) where sessionize measures gaps.
    */
  def intervalUnion(s: org.apache.spark.sql.SparkSession, d: String,
      holdUs: Long = 300000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prior = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    graft.sources.Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("en", col("us") + holdUs)
      .withColumn("prev_max", max(col("en")).over(prior))
      .withColumn("fresh",
        when(col("prev_max").isNull || col("us") > col("prev_max"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("fresh")).over(upto))
      .groupBy("user_id", "island")
      .agg(min(col("us")).as("st"), max(col("en")).as("en"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("en") - col("st")).as("covered_us"))
  }

  def snapshotDiff(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    import graft.warehouse.Dwd.dec
    def snap(pred: Column, prefix: String): DataFrame =
      graft.sources.Tables.orders(s, d)
        .filter(pred)
        .groupBy(col("o_custkey").as("cust_id"))
        .agg(count(lit(1)).as(s"${prefix}_n"),
          sum(dec(col("o_totalprice"))).as(s"${prefix}_tot"))
    val a = snap(col("o_orderkey") % 2 === 0, "a")
    val b = snap(col("o_orderkey") % 3 =!= 0, "b")
    a.join(b, Seq("cust_id"), "full_outer")
      .withColumn("op",
        when(col("a_n").isNull, lit("added"))
          .when(col("b_n").isNull, lit("deleted"))
          .when(col("a_n") =!= col("b_n") ||
            col("a_tot") =!= col("b_tot"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("op") =!= "unchanged")
      .select(col("cust_id"), col("a_n"), col("b_n"),
        col("a_tot").cast("double").as("a_tot"),
        col("b_tot").cast("double").as("b_tot"), col("op"))
  }

  /** The interval query in RAW SQL through the TVF surface — reaches
    * [[graft.plans.IntervalJoinExec]] from a plain `spark.sql` call.
    */
  def clicksBeforePurchaseSql(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val (p, c) = intervalInputs(s, d)
    p.createOrReplaceTempView("iv_purchases")
    c.createOrReplaceTempView("iv_clicks")
    s.sql(
      """SELECT event_id, user_id, COUNT(c_us) AS clicks_15m
        |FROM graft_interval_join('iv_purchases', 'iv_clicks',
        |       'user_id', 'p_us', 'c_us', '900000000', 'c_us')
        |GROUP BY event_id, user_id""".stripMargin)
  }

  /** Interval COMPLEMENT — the downtime dual of [[intervalUnion]]:
    * after per-user activity windows merge into islands, the report
    * is the GAPS between consecutive islands (count, total idle
    * microseconds, longest single outage) — the shape of an
    * uptime/SLA board or a sensor-blackout audit. Rides the exact
    * island machinery of the union query (one per-user sort carries
    * the running-max-end island assignment), then ONE more window —
    * over the already-collapsed islands, thousands of times smaller
    * than the fact — lags each island's end under the next's start.
    * Users with a single island report zero gaps (LEFT semantics,
    * not dropped), so coverage and downtime reconcile per user.
    */
  def intervalGaps(s: org.apache.spark.sql.SparkSession, d: String,
      holdUs: Long = 300000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prior = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val islands = graft.sources.Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("en", col("us") + holdUs)
      .withColumn("prev_max", max(col("en")).over(prior))
      .withColumn("fresh",
        when(col("prev_max").isNull || col("us") > col("prev_max"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("fresh")).over(upto))
      .groupBy("user_id", "island")
      .agg(min(col("us")).as("st"), max(col("en")).as("en"))
    val byIsland = Window.partitionBy("user_id").orderBy("island")
    islands
      .withColumn("prev_en", lag(col("en"), 1).over(byIsland))
      .groupBy("user_id")
      .agg(
        coalesce(count(col("prev_en")), lit(0L)).as("n_gaps"),
        coalesce(sum(col("st") - col("prev_en")), lit(0L))
          .as("idle_us"),
        coalesce(max(col("st") - col("prev_en")), lit(0L))
          .as("max_gap_us"))
  }

  /** Bitemporal restatement report — "GMV by month AS IT WAS KNOWN
    * when the month closed" vs "as finally corrected", the
    * late-arriving-fact view the SCD family (entity versioning)
    * doesn't cover. Corrections are a deterministic synthetic log:
    * every 10th order is restated +5% (exact: cents + cents DIV 20),
    * becoming KNOWN 30 days after the order date; the month-close
    * report sees a correction only if it landed by month-end + 14
    * days (the books-close grace window). One scan, no join — the
    * knowledge predicate is pure date arithmetic per row — and the
    * restatement column is the audit delta accountants reconcile.
    */
  def restatementReport(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val o = graft.sources.Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("od"),
        (col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(12, 2)) * 100).cast("long").as("c"),
        (col("o_orderkey") % 10 === 0).as("corr"))
      .withColumn("cf",
        when(col("corr"), col("c") + expr("c DIV 20"))
          .otherwise(col("c")))
      .withColumn("known", col("corr") &&
        date_add(col("od"), 30) <= date_add(last_day(col("od")), 14))
    o.groupBy(date_trunc("month", col("od")).cast("date").as("mth"))
      .agg(
        sum(when(col("corr") && col("known"), col("cf"))
          .otherwise(col("c"))).cast("long").as("gmv_known_cents"),
        sum(col("cf")).cast("long").as("gmv_final_cents"),
        count_if(col("corr") && !col("known")).as("late_orders"))
      .withColumn("restatement_cents",
        col("gmv_final_cents") - col("gmv_known_cents"))
  }

  /** Hourly concurrency gauge — how many user sessions are active at
    * once (the capacity-planning number behind "peak concurrent
    * users"): 30-min-gap sessions become +1/−1 boundary events, a
    * sweep-line running sum is the live session count, and each hour
    * reports entering / peak / exiting concurrency plus start/end
    * volumes.
    *
    * The running sum is a TWO-LEVEL distributed prefix sum, never a
    * global sort: per-hour delta totals (a tiny relation — one row
    * per hour) take a window over hours to become each hour's
    * entering offset, and the within-hour running sum windows
    * PARTITIONED BY hour — so the corpus-sized sort is sharded on
    * the hour key and the only unpartitioned window runs over the
    * hour table. Boundary order (us, delta DESC, user_id) is a
    * unique key — starts before ends at the same microsecond, so
    * touching sessions count as overlapping — making the sweep
    * deterministic in both engines. Ends decrement at end+1µs
    * (inclusive intervals).
    */
  def concurrency(s: org.apache.spark.sql.SparkSession, d: String,
      gapSeconds: Long = 1800): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val wU = Window.partitionBy("user_id").orderBy("us")
    val sess = ev.withColumn("is_new",
        when(lag(col("us"), 1).over(wU).isNull ||
          col("us") - lag(col("us"), 1).over(wU) > gapSeconds * 1000000L,
          1).otherwise(0))
      .withColumn("sess_id", sum(col("is_new"))
        .over(wU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val bounds = sess.select(col("start_us").as("us"),
        lit(1L).as("delta"), col("user_id"))
      .unionByName(sess.select((col("end_us") + 1).as("us"),
        lit(-1L).as("delta"), col("user_id")))
      .withColumn("hr", expr("us DIV 3600000000"))
    val perHour = bounds.groupBy("hr")
      .agg(sum(col("delta")).as("hsum"),
        count_if(col("delta") === 1).as("n_starts"),
        count_if(col("delta") === -1).as("n_ends"))
    val wH = Window.orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perHour.withColumn("enter_c",
      coalesce(sum(col("hsum")).over(wH), lit(0L)))
    val wIn = Window.partitionBy("hr")
      .orderBy(col("us"), col("delta").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val runs = bounds.withColumn("run", sum(col("delta")).over(wIn))
      .groupBy("hr").agg(max(col("run")).as("max_run"))
    offsets.join(runs, "hr")
      .select(col("hr"), col("n_starts"), col("n_ends"),
        col("enter_c"),
        greatest(col("enter_c"), col("enter_c") + col("max_run"))
          .as("peak_c"),
        (col("enter_c") + col("hsum")).as("exit_c"))
  }
}

package graft.warehouse

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-layer analytics — the queries the reference's Spring
  * publisher runs against Doris/ClickHouse (gmall2024-realtime-master/
  * gmall2024-publisher/src/main/java/com/atguigu/gmall/mapper/
  * TradeStatsMapper.java:1, TrafficStatsMapper.java:1), re-expressed
  * directly over the warehouse. Also the classic star-join shapes
  * those dashboards reduce to.
  */
object Publisher {
  import Dwd.dec

  /** GMV + order count per day. Ref: TradeStatsMapper.java:1. */
  def gmvDaily(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("cur_date"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("gmv"),
        count(lit(1)).as("order_ct"))

  /** Top-10 provinces by order amount, deterministic rank (amount
    * desc, name asc tiebreak). Ref: TradeProvinceOrderAmount.java:1.
    * The rank runs over ~25 post-aggregation rows — the window's
    * single partition is fine because the heavy lifting (the fact
    * aggregation) already reduced cardinality by 6 orders of
    * magnitude.
    */
  def provinceTopN(s: SparkSession, d: String, topN: Int = 10): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val agg = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("province_name"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("order_amount"))
    val w = Window.orderBy(col("order_amount").desc, col("province_name"))
    agg.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topN)
  }

  /** Channel UV/PV — channel derived from the JSON props payload,
    * mirroring the reference's pervasive JSONObject parsing
    * (TrafficStatsMapper.java:1). get_json_object is codegen'd.
    */
  def channelUvCt(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.events(s, d))
      .select(
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("ch"),
        col("user_id"))
      .groupBy("ch")
      .agg(
        countDistinct(col("user_id")).as("uv_ct"),
        count(lit(1)).as("pv_ct"))

  /** Local-supplier-volume star join: 6 tables, region filter pushed
    * to the region dim scan, dims broadcast. The only shuffles are
    * the two fact-fact joins (orders⋈lineitem on orderkey,
    * customer⋈orders on custkey) and the final 25-group agg.
    */
  def starJoinRevenue(s: SparkSession, d: String,
      region: String = "ASIA"): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === region)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  /** Forecast-revenue-change filter-and-sum (the TPC-H Q6 shape): a
    * pure scan query — every predicate pushes to parquet, no join, a
    * single global sum. The canonical "is pushdown working" probe.
    */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  /** Orders having at least one refunded line, counted per priority —
    * EXISTS semantics as a left-semi join (the probe side reduced to
    * distinct keys before the join).
    */
  def priorityRefundExists(s: SparkSession, d: String): DataFrame = {
    val refunded = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey")).distinct()
    Tables.orders(s, d)
      .join(refunded, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_ct"))
  }

  /** Top-10 revenue among a segment's unshipped orders (shipped-date
    * after cutoff), deterministic tiebreak on order id.
    */
  /** TPC-H Q17 shape — CORRELATED SCALAR SUBQUERY: revenue lost to
    * small-quantity orders of one brand, where "small" is each
    * part's own 20%-of-average threshold. Catalyst DECORRELATES the
    * subquery into an aggregate + join (no per-row re-execution —
    * the property that makes the shape viable at all on a fact
    * table); `.explain` shows one aggregation over lineitem joined
    * back, not N subplans. Engine-exact: quantities are
    * integer-valued doubles, so sum/count (and hence 0.2·avg) are
    * bit-identical on both engines; money rides DECIMAL(12,2).
    */
  def smallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DOUBLE) / 7.0, 6) AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  /** TPC-H Q18 shape — IN-subquery over a grouped HAVING plus a
    * correlated scalar re-read: large-volume orders. Both subqueries
    * decorrelate to joins; the quantity sum is exact integer
    * arithmetic.
    */
  def largeOrders(s: SparkSession, d: String,
      minQty: Long = 180): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      s"""SELECT o_orderkey,
         |  CAST((SELECT sum(l_quantity) FROM lineitem
         |        WHERE l_orderkey = o.o_orderkey) AS BIGINT) AS sum_qty
         |FROM orders o
         |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
         |                     GROUP BY l_orderkey
         |                     HAVING sum(l_quantity) > $minQty)""".stripMargin)
  }

  /** TPC-H Q21 shape — MULTI-WAY CORRELATED EXISTS + NOT EXISTS
    * against the SAME fact table, the hardest decorrelation Catalyst
    * handles: suppliers who were the SOLE at-fault supplier on a
    * finished multi-supplier order (this dataset carries no
    * commit/receipt dates, so "at fault" is the returned-line flag —
    * the correlation structure is Q21's exactly). Catalyst rewrites
    * the EXISTS to a left-semi and the NOT EXISTS to a left-anti
    * join, both equi-keyed on the order key with the supplier
    * inequality as a join residual — no per-row subquery
    * re-execution anywhere ([[graft.PlanLintSpec]] pins the absence
    * of nested-loop shapes). Counts are exact integers; the top-100
    * cut is total-ordered by (numwait DESC, s_name), so the boundary
    * is engine-deterministic.
    */
  def waitingSuppliers(s: SparkSession, d: String): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
  }

  /** TPC-H Q22 shape — UNCORRELATED SCALAR SUBQUERY threshold +
    * anti-join: high-balance customers with no recent orders,
    * bucketed by country code (nationkey mod 5 stands in for the
    * phone prefix). The classic float hazard — `avg()` as a
    * threshold drifts with summation order — is removed ALGEBRAICALLY:
    * `bal > S/n` is evaluated as `bal·n > S` in exact decimal, so
    * the qualifying set is engine-identical. The scalar subqueries
    * plan as one-row subquery broadcasts (not a nested-loop join);
    * NOT EXISTS decorrelates to a left-anti join on the customer
    * key with the recency predicate pushed into the build side.
    */
  def lapsedCustomers(s: SparkSession, d: String,
      cutoff: String = "2000-10-01"): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      s"""SELECT c_nationkey % 5 AS cntrycode, count(*) AS numcust,
         |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
         |    AS totacctbal
         |FROM customer
         |WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
         |      (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
         |    > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2)))
         |              AS DECIMAL(18,2))
         |       FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '$cutoff')
         |GROUP BY c_nationkey % 5""".stripMargin)
  }

  /** TPC-H Q15 shape — aggregate-of-aggregate selection: the
    * supplier(s) achieving MAX total revenue, via a scalar subquery
    * over the same CTE (the view-based formulation). Revenue stays
    * in exact decimal through the max comparison, so ties and the
    * argmax are engine-exact.
    */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(total_rev AS DOUBLE) AS total_rev
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM revenue)""".stripMargin)
  }

  /** TPC-H Q7 shape — bi-directional nation-pair volume shipping:
    * a 6-way join (supplier→lineitem→orders→customer plus TWO
    * aliases of nation) with a DISJUNCTIVE cross-alias predicate
    * `(n1=A AND n2=B) OR (n1=B AND n2=A)`. The interesting plan
    * property: Catalyst pushes the single-alias residues of the OR
    * (`n1 IN (A,B)`, `n2 IN (A,B)`) down to each nation scan, so
    * both dimension sides broadcast at 2 rows each and the fact
    * side is filtered early; only the 4-row cross-pair residual
    * evaluates post-join. Revenue sums in exact decimal before the
    * final DOUBLE cast, grouped per (supp_nation, cust_nation,
    * year) — the classic market-flow matrix.
    */
  def volumeShipping(s: SparkSession, d: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |         * (1 - CAST(l_discount AS DECIMAL(12,2))))
         |       AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS INT) AS l_year,
         |         l_extendedprice, l_discount
         |  FROM supplier, lineitem, orders, customer,
         |       nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = '$nationA' AND n2.n_name = '$nationB')
         |      OR (n1.n_name = '$nationB' AND n2.n_name = '$nationA'))
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** TPC-H Q13 shape — customer order-count distribution: a LEFT
    * OUTER join whose extra predicate lives in the ON clause (NOT
    * the WHERE — moving it would silently drop zero-order
    * customers), then an aggregate OF an aggregate (count per
    * customer → histogram of those counts). Exercises
    * outer-join-aware filter placement: Catalyst must keep
    * `o_orderpriority <> X` on the stream side of the join, never
    * pushing it below the null-supplying semantics. Counts are
    * exact integers end-to-end.
    */
  def customerDistribution(s: SparkSession, d: String,
      excludedPriority: String = "1-URGENT"): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      s"""SELECT c_count, count(*) AS custdist FROM (
         |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
         |  FROM customer c LEFT OUTER JOIN orders o
         |    ON c.c_custkey = o.o_custkey
         |   AND o.o_orderpriority <> '$excludedPriority'
         |  GROUP BY c.c_custkey) c_orders
         |GROUP BY c_count""".stripMargin)
  }

  def segmentRevenue(s: SparkSession, d: String,
      segment: String = "BUILDING", cutoff: String = "1998-01-01"): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === segment)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    val agg = c.join(o, c("c_custkey") === o("o_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(
        col("l_orderkey").as("order_id"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
    val w = Window.orderBy(col("revenue").desc, col("order_id"))
    agg.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
  }
}

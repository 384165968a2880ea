package graft.warehouse

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the "refresh the serving table
  * without rescanning history" pass every warehouse ships (the
  * reference's DWS layers recompute per micro-batch and fold into
  * Doris/ClickHouse agg models; ref DwsTradeSkuOrderWindow.java:1,
  * ClickHouseUtil.java:1). Batch analogue: keep PARTIAL aggregates
  * (count / decimal sum — all algebraic, all mergeable) per grain,
  * and on refresh aggregate only the delta, then merge partials at
  * the agg grain.
  *
  * Scale shape: the base partial is computed ONCE and persisted; each
  * refresh scans only the delta partition, and the merge touches
  * agg-grain rows (days), never the fact table. At 100 TB with daily
  * deltas this turns a full-history scan into a delta scan + a
  * grain-sized merge — the same contract as Doris's agg-model
  * tables or a materialized view with incremental refresh. Decimal
  * partials make the merge order-independent, so merged == full
  * recompute EXACTLY — which is precisely what the oracle checks
  * (the oracle is the full recompute).
  */
object Incremental {

  /** Mergeable daily partial: (day, count, exact decimal sum). */
  private def partialDaily(df: DataFrame): DataFrame =
    df.groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_part"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("gmv_part"))

  /** Daily GMV maintained incrementally: a "base" partial (even order
    * keys — standing in for the persisted historical aggregate) and a
    * "delta" partial (odd keys — the new arrivals) are merged at day
    * grain. The parity split puts BOTH halves in every day, so the
    * merge genuinely combines partials rather than concatenating
    * disjoint key ranges. Output == one-shot groupBy over all orders.
    */
  def dailyGmv(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val base = partialDaily(orders.filter(col("o_orderkey") % 2 === 0))
    val delta = partialDaily(orders.filter(col("o_orderkey") % 2 =!= 0))
    base.unionByName(delta)
      .groupBy("day")
      .agg(sum(col("n_part")).as("n_orders"),
        sum(col("gmv_part")).as("gmv_dec"))
      .select(col("day"), col("n_orders"),
        col("gmv_dec").cast("double").as("gmv"))
  }

  /** Incremental JOIN maintenance — the delta rule for a two-sided
    * refresh (view-maintenance 101, and what a streaming
    * changelog join materializes continuously):
    *
    *   (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈(B ∪ ΔB) ∪ A⋈ΔB
    *
    * The three terms tile the four quadrants exactly once, so the
    * maintained result is duplicate-free BY CONSTRUCTION — no
    * dedup pass, which is what makes the identity usable at scale:
    * a refresh joins delta-sized inputs against the other side
    * (delta⋈history prunes by join key; history⋈history — the
    * 100 TB term — is never recomputed). Parity splits stand in for
    * base/delta snapshots, putting both halves on every join key so
    * the union genuinely interleaves rather than concatenating
    * disjoint ranges. Output is the maintained order-detail join
    * rolled to day grain; the oracle is the one-shot join — merged
    * == recomputed EXACTLY, decimal partials keeping the sum
    * order-independent.
    */
  def maintainedOrderDetail(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(s, d).select(col("l_orderkey"),
      col("l_linenumber"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(12, 2)))).as("rev"))
    val a = orders.filter(col("o_orderkey") % 2 === 0)
    val dA = orders.filter(col("o_orderkey") % 2 =!= 0)
    val b = li.filter((col("l_orderkey") + col("l_linenumber")) % 2 === 0)
    val dB = li.filter((col("l_orderkey") + col("l_linenumber")) % 2 =!= 0)
    def j(o: DataFrame, l: DataFrame): DataFrame =
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_orderdate"), col("rev"))
    j(a, b).unionByName(j(dA, b.unionByName(dB))).unionByName(j(a, dB))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("rev")).cast("double").as("revenue"))
  }
}

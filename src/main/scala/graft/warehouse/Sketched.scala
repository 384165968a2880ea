package graft.warehouse

import graft.sources.Partitioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-columned serving tables — the Doris/ClickHouse HLL-column
  * analogue (the reference's DWS tables store uv as a pre-aggregated
  * distinct-count per window; Doris' HLL type keeps it MERGEABLE
  * across partitions, which is what a date-range dashboard needs).
  *
  * Here each day's partition stores a binary DataSketches HLL of the
  * user ids (`hll_sketch_agg`) next to the exact additive counters;
  * a cross-day read merges sketches with `hll_union_agg` — one small
  * scan of pre-aggregated partitions, NEVER a rescan of the raw
  * events. That asymmetry (build once per partition at write time,
  * merge many times at read time) is the whole point of sketch
  * columns at 100 TB: distinct counts stop being a full-data query.
  */
object Sketched {

  /** Build the per-day serving rows: additive counters + an HLL
    * sketch of user ids, one row per (dt, event_type).
    */
  def dailyTraffic(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        col("event_type"))
      .agg(
        count(lit(1)).as("pv_ct"),
        hll_sketch_agg(col("user_id")).as("uv_sketch"))

  /** Write the sketch table date-partitioned (hive layout). */
  def write(events: DataFrame, path: String): Unit =
    Partitioned.write(dailyTraffic(events), path, "dt")

  /** Dashboard read: UV + PV for a date range, merging the stored
    * sketches — partition-pruned scan of pre-aggregated rows only.
    */
  def uvAcrossDays(s: SparkSession, path: String, from: String,
      to: String): DataFrame =
    s.read.parquet(path)
      .filter(col("dt") >= from && col("dt") <= to)
      .groupBy(col("event_type"))
      .agg(
        sum(col("pv_ct")).as("pv_ct"),
        hll_sketch_estimate(hll_union_agg(col("uv_sketch")))
          .as("uv_estimate"))
}

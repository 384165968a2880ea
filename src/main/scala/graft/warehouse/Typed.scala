package graft.warehouse

import graft.sources.Tables
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset layer: case-class models for the fact tables and a
  * typed Aggregator, for call sites that want compile-time field
  * checks. The typed API pays a deserialization cost per row versus
  * the columnar DataFrame plans (which stay in Tungsten rows), so the
  * warehouse queries use DataFrames; this layer exists for
  * user-defined per-entity logic where a case class is the natural
  * unit — and as the pattern for typed `mapGroups` state logic in
  * streaming.
  */
object Typed {

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  def lineitems(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._
    // parquet stores naive (NTZ) timestamps; the case class carries
    // java.sql.Timestamp, so cast at the boundary
    Tables.lineitem(s, d)
      .withColumn("l_shipdate",
        org.apache.spark.sql.functions.col("l_shipdate").cast("timestamp"))
      .as[Lineitem]
  }

  def orders(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, d)
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp"))
      .as[Order]
  }

  /** Typed revenue aggregator: exact decimal accumulation of
    * extendedprice × (1 − discount) in cents — the Aggregator form of
    * the warehouse revenue sums, safe to reuse in typed
    * `groupByKey(...).agg(...)` pipelines.
    */
  object RevenueAgg extends Aggregator[Lineitem, Long, Double] {
    override def zero: Long = 0L
    override def reduce(cents: Long, li: Lineitem): Long = {
      // prices have 2 decimals, discounts 2 → product exact at 4
      val price = math.round(li.l_extendedprice * 100)
      val disc = math.round(li.l_discount * 100)
      cents + price * (100 - disc)
    }
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(c: Long): Double = c / 10000.0
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Revenue per return flag via the typed path. */
  def revenueByFlag(s: SparkSession, d: String): Dataset[(String, Double)] = {
    import s.implicits._
    lineitems(s, d).groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("revenue"))
  }
}

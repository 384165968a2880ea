package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most cases
  * at runtime; these are the explicit forms for when the skew is
  * known ahead of time — a celebrity user, a null-heavy foreign key,
  * a default enum value — and for aggregations, which AQE does not
  * re-balance.
  */
object Skew {

  /** Salted fact⋈dim equi-join: the fact side gets a uniform salt in
    * [0, salts), the dim side is replicated `salts` times, and the
    * join key becomes (key, salt) — a hot key's rows now land on
    * `salts` reducers instead of one. Result is row-identical to the
    * plain join; cost is dim × salts replication, so size the salt
    * count to the skew, not to the cluster.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial-aggregate on
    * (key, salt), then merge per key. Use when one group holds a
    * large share of all rows — the partial phase spreads that group
    * over `salts` tasks. `partials` maps each aggregate to its merge
    * form, e.g. count → sum of partial counts.
    */
  def twoPhaseAgg(df: DataFrame, key: String, salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}

package graft.operators

import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small)
  * query set against the full corpus — the corpus never shuffles, so
  * at 100 TB this is a single scan with per-row math, O(nq·N·d),
  * embarrassingly parallel. The LSH variant is the scale path when
  * the query set itself is large: both sides bucket on hyperplane
  * signs and only bucket-mates are scored.
  */
object Similarity {

  /** Brute-force cosine top-k for query vectors (vec_id < nQueries).
    * row_number partitions by query id, so the top-k sort is per
    * query, never global.
    */
  def bruteForceTopK(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id")
  }

  /** LSH-bucketed ANN: queries and corpus bucket on `nBits`
    * hyperplane signs; scoring happens only within a bucket. Recall
    * vs [[bruteForceTopK]] is asserted in the test suite; trading
    * recall for a ~2^nBits candidate reduction is the point.
    */
  def annLsh(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, nBits: Int = 6): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .withColumn("bucket", Vectors.lshBucket(col("v"), 64, nBits))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "cos")
  }
}

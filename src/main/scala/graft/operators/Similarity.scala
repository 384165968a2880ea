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

  /** IVF-style ANN: corpus vectors are assigned to the nearest of
    * `nCells` centroid vectors (deterministically seeded from the
    * corpus itself — evenly-strided rows, one assignment pass, no
    * iterative training); a query probes its `nProbe` closest cells.
    * Centroid assignment is a broadcast join + per-row argmax, so the
    * corpus never shuffles for indexing; the search join is an
    * equi-join on cell id. Higher recall than plain LSH at the same
    * candidate budget because cells follow the data distribution.
    */
  def annIvf(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    Vectors.ensureRegistered(s)
    val e = Tables.spread(Tables.embeddings(s, d)).select(col("vec_id"),
      Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
      .cache()
    val total = e.count()
    val stride = math.max(1L, total / nCells)
    val cents = e.filter(col("vec_id") % stride === 0 &&
        col("vec_id") / stride < nCells)
      .select((col("vec_id") / stride).cast("int").as("cell"),
        col("v").as("cv"), col("nrm").as("cn"))
    // assign every vector to its best cell (rank over cell scores)
    def assign(df: DataFrame, keep: Int): DataFrame = {
      val scored = df.join(broadcast(cents), lit(true))
        .withColumn("cscore", Vectors.cosineWithNorms(
          col("v"), col("cv"), col("nrm"), col("cn")))
      val w = Window.partitionBy(df.columns.map(col): _*)
        .orderBy(col("cscore").desc, col("cell"))
      scored.withColumn("crk", row_number().over(w))
        .filter(col("crk") <= keep)
        .drop("cv", "cn", "cscore", "crk")
    }
    val corpus = assign(e, keep = 1)
    val queries = assign(
      e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn")).withColumnRenamed("qv", "v")
        .withColumnRenamed("qn", "nrm"), keep = nProbe)
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qn")
    val scored = corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Vectors.cosineWithNorms(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "cos")
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

package graft

/** Ad-hoc profiling entrypoint (test scope only; not part of the
  * library surface). sbt "Test/runMain graft.Scratch".
  */
object Scratch {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = GraftSession.local(32, "scratch")
    s.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val ta = graft.operators.TextAnalysis
    t("winnow count")(ta.winnow(s, d, 25, 25).count())
    t("winnow count again")(ta.winnow(s, d, 25, 25).count())
    val mins = ta.winnow(s, d, 25, 25)
      .filter(col("n_fp") >= 10)
      .select(col("doc_id"), array_sort(col("fingerprints")).as("sfp"))
      .cache()
    t("mins materialize")(mins.count())
    val ix = mins.select(col("doc_id"), explode(col("sfp")).as("fp"))
    t("ix count")(ix.count())
    val dfc = ix.groupBy("fp").agg(count(lit(1)).as("df"))
    t("dfc count")(dfc.count())
    import org.apache.spark.sql.expressions.Window
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("fp"))
    val prefix = ix.join(dfc, "fp")
      .select(col("doc_id"), col("fp"),
        row_number().over(byRarity).as("rank"),
        count(lit(1)).over(Window.partitionBy("doc_id")).as("n"))
      .filter(col("rank") <= col("n") - lit(10) + 1)
      .select("doc_id", "fp")
    t("prefix count")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    t("cand count")(cand.count())
    val out = cand
      .join(mins.select(col("doc_id").as("id_a"), col("sfp").as("fa")), "id_a")
      .join(mins.select(col("doc_id").as("id_b"), col("sfp").as("fb")), "id_b")
      .select(col("id_a"), col("id_b"),
        call_function("graft_sorted_intersect_count",
          col("fa"), col("fb")).as("shared_fp"))
      .filter(col("shared_fp") >= 10)
    t("confirm count")(out.count())
    t("full winnowPairs")(ta.winnowPairs(s, d).count())
    s.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import graft._

/** r12 stage probes — point measurements quoted in
  * OPTIMIZATION_r12.md (edit-distance head-grain stages at sf1,
  * top-movers rollup attribution). Run:
  *   tools/run.sh graft.tools.ProfileR12 [sf_dir]
  */
object ProfileR12 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val s = GraftSession.local(32, "profile-r12")
    s.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val h = graft.sources.Tables.documents(s, d).select(col("doc_id"),
        substring(lower(col("text")), 1, 40).as("head"))
      .withColumn("blk", substring(col("head"), 1, 8))
    println("docs=" + h.count())
    val hd = h.groupBy(col("blk"), col("head")).agg(count(lit(1)).as("n"))
    timed("distinct-head count")(println("distinct heads=" + hd.count()))
    println("top blocks: " + hd.groupBy("blk").count()
      .orderBy(desc("count")).limit(5).collect().mkString(","))
    val cand = hd.as("a").join(hd.as("b"),
      col("a.blk") === col("b.blk") && col("a.head") < col("b.head") &&
      abs(length(col("a.head")) - length(col("b.head"))) <= 10)
    timed("candidate head pairs")(println("cand=" +
      cand.select(lit(1)).count()))
    timed("banded DP over candidates")(println("surviving=" +
      cand.select(levenshtein(col("a.head"), col("b.head"), 10).as("dist"))
        .filter(col("dist") >= 0).count()))

    // top_movers stage attribution (r11 VERDICT #7)
    import graft.sources.Tables
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    val rev = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy((year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).cast("long").as("mi"),
        col("l_partkey").as("part_id"))
      .agg(sum((dec(col("l_extendedprice")) * 100).cast("long") *
        (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("x"))
    timed("tm: join only")(println("joined=" +
      Tables.lineitem(s, d).join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey")).count()))
    timed("tm: join+rollup")(println("groups=" + rev.count()))
    timed("tm: join+rollup run2")(println("groups=" + rev.count()))
    val ranked = rev.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("mi")
        .orderBy(col("x").desc, col("part_id"))).cast("long"))
    timed("tm: +permonth rank")(println("ranked=" + ranked.count()))
    timed("tm: full")(println("out=" +
      graft.warehouse.Analytics.topMovers(s, d).count()))

    // moment-row cost attribution (partial_corr/cov_matrix, sf1)
    val li4 = Tables.lineitem(s, d).select(
      (col("l_quantity").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("a"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("b"),
      (col("l_discount").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("c0"),
      (col("l_tax").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("d0"))
    timed("mom: scan+casts only")(println(
      li4.agg(count(lit(1))).collect()(0)))
    timed("mom: 4 long sums")(println(
      li4.agg(sum(col("a")), sum(col("b")), sum(col("c0")),
        sum(col("d0"))).collect()(0)))
    val prods = Seq(("a","a"),("a","b"),("a","c0"),("a","d0"),("b","b"),
      ("b","c0"),("b","d0"),("c0","c0"),("c0","d0"),("d0","d0"))
    timed("mom: 10 decimal38 product sums")(println(
      li4.agg(prods.map { case (x, y) =>
        sum((col(x) * col(y)).cast(DecimalType(38, 0))) }.head,
        prods.tail.map { case (x, y) =>
          sum((col(x) * col(y)).cast(DecimalType(38, 0))) }: _*)
        .collect()(0).toString.take(60)))
    s.stop()
  }
}

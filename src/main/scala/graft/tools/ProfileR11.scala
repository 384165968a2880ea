package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** r11 floor attribution for the ≥1s clean-load residue (r10 VERDICT
  * "Next round" #6): times each query's plan STAGES in isolation —
  * bare scan, scan+agg, full plan — so the ~1s attributes to scan
  * cost, Exchange count, or stage-launch overhead instead of guesses.
  */
object ProfileR11 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = graft.GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-profile-r11"), cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[p] $name: min ${ts.map(_._1).min}%.2f s (${ts.head._2} rows)")
    }
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    // warm up JIT/session
    Tables.lineitem(s, d).groupBy("l_returnflag").count().count()

    time("empty-stage floor (1-row df, 2 exchanges)") {
      s.range(1).repartition(32).groupBy("id").count()
        .repartition(32).groupBy("id").count().count()
    }
    time("lineitem scan 2col count") {
      Tables.lineitem(s, d).select("l_partkey", "l_extendedprice")
        .groupBy().count().count()
    }
    time("lineitem agg by suppkey DECIMAL") {
      Tables.lineitem(s, d).groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount")))).as("r")).count()
    }
    time("lineitem agg by suppkey LONG-1e4") {
      Tables.lineitem(s, d).groupBy("l_suppkey")
        .agg(sum(((dec(col("l_extendedprice")) * 100).cast("long")) *
          (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("r"))
        .count()
    }
    time("li x part bc-join + (type,part) agg DECIMAL") {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount")))).as("r")).count()
    }
    time("li x orders join (auto) + (month,part) agg") {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy((year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).cast("long").as("mi"),
          col("l_partkey"))
        .agg(sum(lit(1L)).as("x")).count()
    }
    // r11 opt-round probes: attribute analytics_cov_matrix's residue
    def momentBase(spreadIt: Boolean) = {
      val sel = Tables.lineitem(s, d).select(
        (col("l_quantity").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("qty"),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("price"),
        (col("l_discount").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("disc"),
        (col("l_tax").cast(DecimalType(12, 2)) * 100)
          .cast("long").as("tax"))
      if (spreadIt) Tables.spread(sel) else sel
    }
    val d38 = DecimalType(38, 0)
    val vars = Seq("qty", "price", "disc", "tax")
    val prs = for { i <- vars.indices; j <- i until vars.length }
      yield (vars(i), vars(j))
    def momentAggs = vars.map(v => sum(col(v)).as(s"s_$v")) ++
      prs.map { case (a, b) =>
        sum((col(a) * col(b)).cast(d38)).as(s"s_${a}_$b") }
    time("moment row: spread + long-products") {
      momentBase(true).agg(count(lit(1)).as("n"), momentAggs: _*).count()
    }
    time("moment row: NO spread, long-products") {
      momentBase(false).agg(count(lit(1)).as("n"), momentAggs: _*).count()
    }
    time("moment row: spread + LONG sums only (no decimal)") {
      momentBase(true).agg(count(lit(1)).as("n"),
        vars.map(v => sum(col(v)).as(s"s_$v")) ++
        prs.map { case (a, b) =>
          sum(col(a) * col(b)).as(s"s_${a}_$b") }: _*).count()
    }
    time("spread alone (4-long project)") {
      momentBase(true).groupBy().count().count()
    }
    // bloom_decontaminate stage attribution
    time("bloom: eval shingle distinct+collect") {
      import org.apache.spark.sql.Encoders
      graft.functions.Vectors.ensureRegistered(s)
      Tables.spread(Tables.documents(s, d)).select(
          col("doc_id"),
          substring(col("source"), 4, 10).cast("int").as("src_n"),
          call_function("graft_shingle_hashes",
            col("text"), lit(12)).as("hashed"))
        .filter(col("src_n") >= 10)
        .select(explode(col("hashed")).as("sh")).distinct()
        .as[java.lang.Long](Encoders.LONG).collect().length.toLong
    }
    time("bloom: full bloomDecontaminate") {
      graft.operators.Dedup.bloomDecontaminate(s, d).count()
    }
    time("q21 semi/anti core (no agg)") {
      val li = Tables.lineitem(s, d)
      val l1 = li.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_suppkey")
      l1.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy().count().count()
    }
    s.stop()
  }
}

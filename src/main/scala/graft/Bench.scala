package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // min-of-k per query: a shared host's load spikes corrupt single
    // timings (a 0.4s query once benched at 47s under external load);
    // the min is the plan's cost, the JSON records k and the 1-min
    // load so the artifact is interpretable without a re-run
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/JIT init so per-query numbers reflect the plans,
    // not first-query warmup; deterministic (sorted) order so numbers
    // are comparable across rounds
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    // iteration aid: SPARK_GRAFT_BENCH_ONLY=<regex> times a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.findFirstIn(n).isDefined)
    }
    val results = picked.map { case (name, fn) =>
      val times = Seq.newBuilder[Double]
      var failed = false
      var i = 0
      while (i < runs && !failed) {
        val t0 = System.nanoTime()
        // failures must not break the JSON line, but must be VISIBLE
        // both on stderr and STRUCTURALLY in the "errors" key — a
        // swallowed exception otherwise reads as a fast query
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          failed = true
          errors += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        i += 1
      }
      // drop whatever this query cached/persisted before the next one
      // runs: CacheManager matches by canonicalized plan and entries
      // are never freed otherwise, so by query ~45 of 130 the storage
      // pool holds dozens of leaked intermediates and the unified
      // memory manager protects them from eviction — shuffle-heavy
      // queries late in the alphabet (dedup_cross_source was measured
      // 1.7-2.4× slower in-suite than isolated) lose execution memory
      // and spill. Clearing BETWEEN queries keeps min-of-k's
      // cross-run cache reuse within a query intact.
      spark.catalog.clearCache()
      // clearCache only empties the SQL CacheManager; localCheckpoint
      // blocks (the lineage-breaking iterative operators — MST,
      // closure, as-of — checkpoint per round) live in the
      // BlockManager until their RDD is GC'd and would pollute the
      // storage pool across the suite the same way leaked cache
      // entries did in r5. Freeing them between queries keeps every
      // query's execution-memory budget position-independent.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(false))
      // broadcast torrent blocks and shuffle files free on GC (the
      // ContextCleaner rides reference processing — the same
      // mechanism behind the 12g-vs-48g heap gotcha); one explicit
      // GC per query makes that cleanup DETERMINISTIC instead of
      // heap-pressure-dependent, so late-suite queries inherit a
      // clean storage pool regardless of position (~50 ms each)
      System.gc()
      val ts = times.result()
      // min = the plan's cost net of load spikes; max ≈ the COLD cost
      // (run 1 pays any cache/index build) — min-of-k alone hid a
      // 33-minute cold index build in r5, so both are recorded
      name -> (if (ts.isEmpty) (0.0, 0.0) else (ts.min, ts.max))
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val qsMax = results.map { case (k, v) => s"\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_max":$qsMax,"sf":"$sfDir","errors":$errs,"load":$load,"runs":$runs}"""
    println(line)
    // the driver may keep only a tail of stdout; persist the full
    // artifact so per-query numbers survive regardless
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // LAST stdout line = a COMPACT JSON the driver can always parse:
    // the full line above is ~15 KB at 384 queries and the driver
    // keeps only a ~4 KB stdout tail, so the full line's head gets
    // truncated away and "parsed" was null six rounds running. The
    // compact line keeps the headline queries (the slowest 24 by
    // min-time — the ones a reader would ask about) and points at the
    // full artifact; build.sbt sets showSuccess := false so no sbt
    // banner lands after it.
    val headline = results.toSeq.sortBy(-_._2._1).take(24)
    val hq = headline.map { case (k, v) => "\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$hq,"sf":"$sfDir","n_queries":${results.size},"errors":$errs,"load":$load,"runs":$runs,"full":"$out"}""")
    spark.stop()
    // errored queries must not read as a healthy rc=0 bench
    if (errors.nonEmpty) sys.exit(1)
  }
}

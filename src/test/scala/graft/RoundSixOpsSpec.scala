package graft

import graft.operators.{Similarity, Temporal}
import graft.warehouse.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract checks for the round-6 additions that compose other
  * operators or clear denominators algebraically: the identities the
  * oracle hash can't express (they relate TWO relations, or replay
  * the algebra in driver BigInt space).
  */
class RoundSixOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("price-volume-mix effects reconcile to the revenue delta exactly") {
    val r = Analytics.priceVolumeMix(s, d).collect()(0)
    val sum = r.getAs[Long]("price_effect") +
      r.getAs[Long]("volume_effect") + r.getAs[Long]("mix_residual") +
      r.getAs[Long]("new_effect") + r.getAs[Long]("lost_effect")
    assert(sum === r.getAs[Long]("total_delta"),
      "bridge effects must sum to the total delta to the cent")
  }

  test("interval union + gaps reconcile to each user's end-to-end span") {
    val union = Temporal.intervalUnion(s, d)
      .select(col("user_id"), col("covered_us"))
    val gaps = Temporal.intervalGaps(s, d)
      .select(col("user_id"), col("idle_us"))
    val span = graft.sources.Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg((max(col("us")) + 300000000L - min(col("us"))).as("span_us"))
    val bad = union.join(gaps, "user_id").join(span, "user_id")
      .filter(col("covered_us") + col("idle_us") =!= col("span_us"))
      .count()
    assert(bad === 0L,
      "covered + idle must equal first-start..last-end for every user")
  }

  test("modularity stays in Newman bounds and covers every brand") {
    val r = graft.operators.Graph.brandModularity(s, d).collect()(0)
    val q = r.getAs[Double]("modularity")
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of [-0.5, 1]")
    assert(r.getAs[Long]("n_communities") === 25L)
    // the cleared-denominator identity: q == q_num / 4m²
    val m = r.getAs[Long]("m_edges").toDouble
    val expected = BigDecimal(r.getAs[Long]("q_num") / (4.0 * m * m))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q === expected)
  }

  test("centroid outlier top-1 matches a driver brute-force argmax") {
    val ranked = Similarity.centroidOutliers(s, d)
      .filter(col("rk") === 1)
      .collect().map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("vec_id"), r.getAs[Long]("score"))).toMap
    val vecs = graft.sources.Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
        r.getSeq[Float](2).map(v => (v.toDouble * 1000000).toLong)))
    vecs.groupBy(_._2).foreach { case (label, vs) =>
      val n = vs.length.toLong
      val dims = vs.head._3.length
      val sums = Array.tabulate(dims)(i => vs.map(_._3(i)).sum)
      val a2 = sums.map(x => x * x).sum
      val best = vs.map { case (id, _, qv) =>
        val norm2 = qv.map(x => x * x).sum
        val ip = qv.zip(sums).map { case (a, b) => a * b }.sum
        (n * n * norm2 - 2 * n * ip + a2, id)
      }.max(Ordering.Tuple2(Ordering.Long, Ordering.Long.reverse))
      assert(ranked(label) === ((best._2, best._1)),
        s"label $label: top outlier mismatch")
    }
  }

  private def quantized(): Array[(Long, Long, Array[Long])] =
    graft.sources.Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
        r.getSeq[Float](2).map(v => (v.toDouble * 1000000).toLong).toArray))

  test("silhouette replays exactly in driver BigInt space") {
    val vecs = quantized()
    val byLabel = vecs.groupBy(_._2)
    val dims = vecs.head._3.length
    val stats = byLabel.map { case (l, vs) =>
      val sums = Array.tabulate(dims)(i => vs.map(_._3(i)).sum)
      l -> (BigInt(vs.length), sums,
        sums.map(x => BigInt(x) * BigInt(x)).sum)
    }
    val perVec = vecs.map { case (_, own, qv) =>
      val norm2 = qv.map(x => BigInt(x) * BigInt(x)).sum
      val d2 = stats.map { case (l, (n, sums, cnorm2)) =>
        val ip = qv.zip(sums).map { case (a, b) => BigInt(a) * b }.sum
        l -> (n * n * norm2 - 2 * n * ip + cnorm2) / (n * n)
      }
      val a2 = d2(own)
      val b2 = d2.filter(_._1 != own).minBy { case (l, v) => (v, l) }._2
      val sPpm = if (a2 == 0 && b2 == 0) BigInt(0)
        else (b2 - a2) * 1000000 / a2.max(b2)
      own -> sPpm
    }
    val expected = perVec.groupBy(_._1).map { case (l, xs) =>
      val ss = xs.map(_._2)
      l -> (ss.length.toLong, (ss.sum / ss.length).toLong,
        ss.min.toLong, ss.count(_ < 0).toLong)
    }
    val got = Similarity.silhouette(s, d).collect().map(r =>
      r.getAs[Long]("label") -> (r.getAs[Long]("n_vecs"),
        r.getAs[Long]("mean_sil_ppm"), r.getAs[Long]("min_sil_ppm"),
        r.getAs[Long]("n_negative"))).toMap
    assert(got === expected)
  }

  test("MMR rerank replays the greedy trajectory exactly on the driver") {
    val nQ = 20; val m = 10; val k = 5
    val vecs = graft.sources.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(v => (v.toDouble * 1000).toLong).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = (0L until nQ).flatMap { qid =>
      val qv = vecs(qid)
      val cands = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, v, dot(v, qv)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(m).toArray
      var sel = List(0)
      var pen = Array.tabulate(m)(i => dot(cands(i)._2, cands(0)._2))
      (2 to k).foreach { _ =>
        val best = (0 until m).filterNot(sel.contains)
          .map(i => (7 * cands(i)._3 - 3 * pen(i), -i)).max
        val idx = -best._2
        sel = sel :+ idx
        pen = Array.tabulate(m)(i =>
          math.max(pen(i), dot(cands(i)._2, cands(idx)._2)))
      }
      sel.zipWithIndex.map { case (i, p) =>
        (qid, (p + 1).toLong) -> (cands(i)._1, cands(i)._3)
      }
    }.toMap
    val got = Similarity.mmrRerank(s, d, nQ, m, k).collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("cand_id"), r.getAs[Long]("dot_q6"))).toMap
    assert(got === expected)
  }

  test("embedding drift replays exactly in driver BigInt space") {
    val vecs = quantized()
    val dims = vecs.head._3.length
    def side(p: Boolean) = vecs.filter(v => (v._1 % 2 == 0) == p)
    val expected = (0 until dims).map { dim =>
      def st(vs: Array[(Long, Long, Array[Long])]) = {
        val n = BigInt(vs.length)
        val sq = vs.map(v => BigInt(v._3(dim))).sum
        val sqq = vs.map(v => BigInt(v._3(dim)) * BigInt(v._3(dim))).sum
        (n, sq, sqq, sq / n, (n * sqq - sq * sq) / (n * n))
      }
      val (nr, _, _, mr, vr) = st(side(true))
      val (nc, _, _, mc, vc) = st(side(false))
      val shift = mc - mr
      val pooled = (nr * vr + nc * vc) / (nr + nc)
      val drift = if (pooled > 0) Some((shift * shift * 1000000 / pooled).toLong)
        else None
      dim.toLong -> (nr.toLong, nc.toLong, mr.toLong, mc.toLong,
        shift.toLong, vr.toLong, vc.toLong, pooled.toLong, drift)
    }.toMap
    val got = Similarity.embeddingDrift(s, d).collect().map { r =>
      r.getAs[Long]("dim") -> (r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"), r.getAs[Long]("mean_ref_q6"),
        r.getAs[Long]("mean_cur_q6"), r.getAs[Long]("shift_q6"),
        r.getAs[Long]("var_ref_q12"), r.getAs[Long]("var_cur_q12"),
        r.getAs[Long]("pooled_var_q12"),
        Option(r.get(r.fieldIndex("drift_ppm"))).map(_.asInstanceOf[Long]))
    }.toMap
    assert(got === expected)
  }
}

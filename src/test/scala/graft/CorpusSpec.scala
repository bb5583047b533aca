package graft

import org.apache.spark.sql.functions._
import graft.operators.DuplicateSpans

/** Round-4 corpus-prep additions: duplicate-span coverage, chunking,
  * domain mixing, sequence construction, winsorize, ANN recall, full
  * outer stream join. Exact values are pinned by the DuckDB oracle;
  * these assert the operator contracts the oracle can't (hashed-path
  * equivalence, bounds, conservation, plan shape). */
class CorpusSpec extends SparkTestBase {

  test("DuplicateSpans: md5, xxhash64, and raw-string gram keys agree") {
    val docs = Tables.documents(spark, sf)
    def cov(key: String) =
      DuplicateSpans.coverage(docs, "doc_id", "text", n = 8, gramKey = key)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val str = cov("string")
    assert(cov("md5") == str)
    assert(cov("xxhash64") == str)
  }

  test("DuplicateSpans: an exact copy drives both twins to full coverage") {
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val withCopies = d.unionAll(
      d.filter(col("doc_id") < 5)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val cov = DuplicateSpans.coverage(withCopies, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dup_frac")).toMap
    (0L until 5L).filter(cov.contains).foreach { id => // short docs drop out
      assert(cov(id) == 1.0, s"original $id: ${cov(id)}")
      assert(cov(id + 100000) == 1.0, s"copy of $id: ${cov(id + 100000)}")
    }
  }

  test("q186: slope is negative (frequency decreases with rank)") {
    val r = run("q186_zipf_slope").head()
    assert(r.getAs[Long]("n_terms") > 2)
    assert(r.getAs[Long]("slope_micro") < 0)
  }

  test("q170: dup_frac bounded; dup spans are symmetric (never exactly one doc)") {
    val rows = run("q170_duplicate_spans").collect()
    rows.foreach { r =>
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("dup_grams") <= r.getAs[Long]("n_grams"))
    }
    // a duplicated span marks at least two documents
    val dupDocs = rows.count(_.getAs[Long]("dup_grams") > 0)
    assert(dupDocs != 1, "a shared span must mark >=2 docs")
  }

  test("q171: chunks tile each doc — stride offsets, full windows except the tail") {
    val rows = run("q171_doc_chunking").collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("start") == 1L + 48L * i) // stride positions
        assert(r.getAs[Long]("n_toks") >= 16 && r.getAs[Long]("n_toks") <= 64)
      }
      // every chunk before the last is a full window
      sorted.dropRight(1).foreach(r => assert(r.getAs[Long]("n_toks") == 64))
    }
  }

  test("q172: integer-hash gate is exact — kept counts match a recount") {
    val rows = run("q172_domain_mix_sample").collect()
    val total = rows.map(_.getAs[Long]("total")).sum
    assert(total == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("total"))
      val w = r.getAs[Long]("wpct")
      assert(w >= 20 && w <= 100 && w % 20 == 0)
    }
  }

  test("q173: sequences are capped, ordered, and span is non-negative") {
    val rows = run("q173_user_sequences").collect()
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= 20 && kept <= r.getAs[Long]("n_events"))
      assert(r.getAs[String]("seq").split(",").length == kept)
      assert(r.getAs[Long]("span_s") >= 0)
    }
  }

  test("q174: winsorized mean lies within the clip thresholds") {
    run("q174_winsorize").collect().foreach { r =>
      val lo = r.getAs[Long]("lo_milli") / 1e3
      val hi = r.getAs[Long]("hi_milli") / 1e3
      val m = r.getAs[Double]("wmean")
      assert(lo <= m && m <= hi, s"mean $m outside [$lo,$hi]")
      assert(r.getAs[Long]("clipped") >= 0)
    }
  }

  test("q175: recall in [0,1]; hits consistent; bucketed search plan broadcasts probes") {
    val df = run("q175_ann_recall")
    df.collect().foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0 && hits <= 10)
      assert(r.getAs[Double]("recall") == hits / 10.0)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "probe batch must broadcast")
  }

  test("q177: feature bounds hold; exact jaccard of injected twins is 1.0") {
    val rows = run("q177_pair_features").collect()
    rows.foreach { r =>
      Seq("est_jaccard", "exact_jaccard", "len_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
    }
    // the synthetic dup twins (id ± 100000) are exact copies
    val twins = rows.filter(r =>
      r.getAs[Long]("b_id") - r.getAs[Long]("a_id") == 100000L)
    assert(twins.nonEmpty)
    twins.foreach { r =>
      assert(r.getAs[Double]("exact_jaccard") == 1.0)
      assert(r.getAs[Int]("same_lang") == 1 && r.getAs[Int]("same_source") == 1)
    }
  }

  test("q178: pair counts descend; every pair is two corpus tokens") {
    val rows = run("q178_bpe_pair_stats").collect()
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sortBy(-_)))
    rows.foreach(r => assert(r.getAs[String]("pair").split(" ").length == 2))
  }

  test("q179: deciles partition the corpus; shares sum to 1") {
    val rows = run("q179_length_curriculum").collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    assert(rows.map(_.getAs[Long]("docs")).sum ==
      Tables.documents(spark, sf).count())
    val share = rows.map(_.getAs[Double]("tok_share")).sum
    assert(math.abs(share - 1.0) < 1e-9)
    // deciles are length-ordered: max_toks non-decreasing
    val maxes = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Long]("max_toks"))
    assert(maxes.sameElements(maxes.sorted))
  }

  test("q182: SCD2 join matches every order exactly once, as an equi-join") {
    val df = run("q182_scd2_join")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == Tables.orders(spark, sf).count())
    // the equality key must carry the join — a nested-loop range join
    // here would be quadratic at scale
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q183: closure rate bounded; triangles never exceed wedges") {
    val r = run("q183_triangle_count").head()
    val (w, t) = (r.getAs[Long]("wedges"), r.getAs[Long]("triangles"))
    assert(t <= w && w > 0)
    val rate = r.getAs[Double]("closure_rate")
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("real codecs: PNG and WAV round-trips are lossless and header-faithful") {
    import graft.operators.Multimodal._
    for (seed <- Seq(0L, 7L, 63L)) {
      val img = decodePng(makePng(seed))
      assert(img.width == 8 + (seed % 9).toInt && img.height == 8 + (seed % 7).toInt)
      val expectSum = (for {
        y <- 0 until img.height; x <- 0 until img.width
      } yield (x * 7 + y * 13 + seed) % 256).sum
      assert(img.sum_v == expectSum)
      val wav = decodeWav(makeWav(seed))
      assert(wav.sample_rate == 8000 && wav.frames == 64 + seed % 64)
      assert(wav.max_amp <= 1000)
    }
  }

  test("motion-PNG clips: container parse recovers the exact frames") {
    import graft.operators.Multimodal._
    for (seed <- Seq(0L, 3L, 47L)) {
      val frames = splitFrames(makeClip(seed))
      assert(frames.length == 4 + (seed % 4).toInt)
      // each recovered frame is byte-identical to its source encoding
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.sameElements(makePng(seed + i)), s"frame $i of clip $seed")
      }
      // sampled decode = direct decode of every 2nd frame
      val facts = decodeClip(2)(makeClip(seed))
      val direct = frames.indices.filter(_ % 2 == 0).map(i => decodePng(frames(i)))
      assert(facts.n_frames == frames.length && facts.n_sampled == direct.length)
      assert(facts.sum_v == direct.map(_.sum_v).sum)
      assert(facts.sum_w == direct.map(_.width.toLong).sum)
    }
    // malformed stream fails loudly, never silently misparses
    intercept[IllegalArgumentException] {
      splitFrames(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    }
  }

  test("q176: full outer = matched + unmatched purchases + unmatched signups") {
    val rows = run("q176_stream_full_outer_join").collect()
    val matched = rows.count(r => !r.isNullAt(0) && !r.isNullAt(1))
    val pOnly = rows.count(r => !r.isNullAt(0) && r.isNullAt(1))
    val cOnly = rows.count(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(matched + pOnly + cOnly == rows.length)
    assert(pOnly > 0 && cOnly > 0, "both outer sides must contribute")
  }
}

package graft

/** Properties for the corpus-preparation operators added on top of the
  * oracle gate: conservation, determinism, and the split-stability
  * contract (exact values are pinned driver-side by DuckDB). */
class TrainingOpsSpec extends SparkTestBase {

  private lazy val totalDocs = Tables.documents(spark, sf).count()

  test("q158: every doc lands in exactly one bucket; kept <= docs per lang") {
    val rows = run("q158_c4_quality_rules").collect()
    assert(rows.map(_.getAs[Long]("docs")).sum == totalDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("docs"))
      assert(r.getAs[Long]("fail_min_words") <= r.getAs[Long]("docs"))
    }
  }

  test("q159: shards partition the corpus and are deterministic") {
    val a = run("q159_shuffle_shard").collect()
    assert(a.map(_.getAs[Long]("docs")).sum == totalDocs)
    assert(a.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 8).toSet))
    // re-run bit-identical (the reproducible-epoch contract)
    val b = run("q159_shuffle_shard").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("q160: split is exhaustive, disjoint, and ~95/5") {
    val rows = run("q160_train_val_split").collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("docs")).sum).toMap
    assert(bySplit.values.sum == totalDocs)
    val train = bySplit.getOrElse("train", 0L).toDouble / totalDocs
    assert(train > 0.85 && train < 1.0, s"train share $train")
  }

  test("q165: domain weights invert token share (fewer tokens => higher weight)") {
    val rows = run("q165_domain_mix").collect()
      .map(r => r.getAs[Long]("src_toks") -> r.getAs[Long]("weight_micro"))
    // pairwise monotonicity: src_toks up => weight down (strictly
    // inverse up to floor ties)
    for (pair <- rows.sortBy(_._1).sliding(2) if pair.length == 2) {
      val Array((t1, w1), (t2, w2)) = pair
      assert(t1 == t2 || w1 >= w2, s"weights not inverse: ($t1,$w1) ($t2,$w2)")
    }
    // a uniform corpus would weight ~1.0: all weights straddle 1e6
    assert(rows.exists(_._2 >= 1000000L) && rows.exists(_._2 <= 1000000L))
  }

  test("q255b: blocked SMOTE is exact SMOTE restricted to the probe's cell") {
    import org.apache.spark.sql.functions._
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Double](2)))).toMap
    val exact = run("q255_smote_oversample").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blocked = run("q255b_smote_blocked").collect()
    assert(blocked.nonEmpty)
    // same IVF artifact the query staged
    val path = graft.queries.Fixtures.stagedIvf(spark, sf)
    val cells = spark.read.parquet(path).select(col("id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    blocked.foreach { r =>
      val (p, nn) = (r.getLong(0), r.getLong(1))
      assert(p != nn)
      // in-cell, same-label: the declared blocking
      assert(cells(p) == cells(nn), s"probe $p: neighbor $nn not in its cell")
      assert(vecs(p)._1 == vecs(nn)._1, s"probe $p: label mismatch")
      // the blocked choice can never beat the exact top-1
      val simB = cos(vecs(p)._2, vecs(nn)._2)
      val simX = cos(vecs(p)._2, vecs(exact(p))._2)
      assert(simB <= simX + 1e-12, s"probe $p: blocked sim $simB > exact $simX")
      // when the exact neighbor shares the probe's cell, blocked MUST find it
      if (cells(exact(p)) == cells(p))
        assert(nn == exact(p), s"probe $p: in-cell exact nn ${exact(p)} missed")
      // synthesis arithmetic identical to q255's
      val synth = r.getString(2).split(',').map(_.toLong)
      synth.indices.foreach { i =>
        val expect = math.floor((vecs(p)._2(i) + vecs(nn)._2(i)) * 0.5 * 1e6 + 0.5).toLong
        assert(synth(i) == expect)
      }
    }
    // blocked probes are exactly the exact probes whose cell holds a
    // second minority vector (singleton-cell probes emit no row — the
    // declared semantics)
    assert(blocked.map(_.getLong(0)).toSet.subsetOf(exact.keySet))
    val minoLabel = vecs(exact.keysIterator.next())._1
    val blockedSet = blocked.map(_.getLong(0)).toSet
    exact.keys.foreach { p =>
      val hasMate = vecs.exists { case (id, (l, _)) =>
        id != p && l == minoLabel && cells(id) == cells(p) }
      assert(blockedSet.contains(p) == hasMate,
        s"probe $p: row emitted=${blockedSet.contains(p)} but cell mate=$hasMate")
    }
  }
}

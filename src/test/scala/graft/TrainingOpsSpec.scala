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
}

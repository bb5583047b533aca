package graft

/** Plan-shape assertions (SURVEY.md §4): the Catalyst rewrites the
  * engine relies on at 100 TB must actually fire — broadcast for the
  * fixed-size dims, predicate pushdown into the parquet scan, top-k
  * instead of global sort. */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("q10: fixed-size dims are broadcast, never shuffled") {
    val plan = planOf("q10_broadcast_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q07: predicates are pushed into the parquet scan") {
    val plan = planOf("q07_predicates")
    assert(plan.contains("PushedFilters: [In(o_orderstatus") ||
      plan.contains("PushedFilters: [IsNotNull"), plan.take(2000))
    assert(!plan.contains("PushedFilters: []"), "no filters pushed")
  }

  test("q29: ORDER BY + LIMIT plans as top-k, not a global sort") {
    val plan = planOf("q29_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q01: count aggregate prunes all columns from the scan") {
    val plan = planOf("q01_scan_count")
    assert(plan.contains("ReadSchema: struct<>"), plan.take(2000))
  }

  test("q40: probe side is broadcast (no shuffle for similarity scan)") {
    val plan = planOf("q40_cosine_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q98: native L2 top-k — broadcast probe, top-k, pruned probe filter") {
    val plan = planOf("q98_l2_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // the probe lookup is pushed into the parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,0)"),
      plan.take(2000))
  }

  test("q12 right outer: filtered small side broadcasts, partial agg before shuffle") {
    // the big-orders filter shrinks the left side enough that the
    // planner broadcasts it — no full shuffle of customer — and the
    // count aggregate runs map-side (partial) before its exchange
    val plan = planOf("q12_right_outer_join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
    assert(plan.contains("partial_count"), plan.take(2000))
  }

  test("bucketed co-located join runs with no exchange on either side") {
    import org.apache.spark.sql.functions.col
    TableIO.writeBucketed(Tables.orders(spark, sf), "orders_bkt", "o_custkey", 8)
    TableIO.writeBucketed(Tables.customer(spark, sf), "customer_bkt", "c_custkey", 8)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan.take(1500))
      // and it is correct
      val expected = Tables.orders(spark, sf).join(
        Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count()
      assert(j.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("q168: the only hash exchange is the final aggregate, not the join") {
    val plan = planOf("q168_bucketed_join")
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // bucketed layout feeds the SMJ directly; the lone hashpartitioning
    // exchange belongs to the 5-group mktsegment aggregate above it
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n" + plan.take(2500))
  }

  test("q18: partial aggregation runs before the shuffle") {
    val plan = planOf("q18_groupby_multi_agg")
    // partial_ functions indicate map-side combine
    assert(plan.contains("partial_"), plan.take(2000))
  }

  test("q110: derived-partsupp joins broadcast the fixed-size dims") {
    // supplier and nation are bounded dims; the 4×part derived relation
    // must stream through broadcast hash joins, never SMJ-shuffle
    val plan = planOf("q110_tpch_q11_shape")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q116: bigram counting partial-aggregates before its shuffle") {
    // the token-level explode → groupBy path must combine map-side, so
    // the shuffle carries (doc, bigram, partial count) not raw tokens
    val plan = planOf("q116_repetition_filter")
    assert(plan.contains("partial_count"), plan.take(2000))
  }

  test("q135: quantized top-k keeps the broadcast-probe + top-k plan") {
    // quantization must not change the ANN plan shape: probe rides a
    // broadcast, ranking is TakeOrderedAndProject, one embeddings scan
    val plan = planOf("q135_embedding_quantization")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q137: decontamination joins the corpus against a BROADCAST eval set") {
    // the eval side is metadata-scale vs the corpus — if this ever
    // degrades to a sort-merge join, the corpus n-grams shuffle and the
    // plan dies at 100 TB
    val plan = planOf("q137_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q144: LATERAL top-k decorrelates to a window group limit, not a full sort") {
    val plan = planOf("q144_lateral_topk")
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("q140: OOV scoring joins documents against a BROADCAST vocabulary") {
    val plan = planOf("q140_oov_rate")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q156: dim filter prunes fact partitions at runtime (DPP)") {
    // the month dim's filter must reach the partitioned fact scan as
    // a DynamicPruningExpression — without it every partition of a
    // 100 TB fact is listed and read no matter how selective the dim
    val plan = planOf("q156_dynamic_partition_pruning")
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }

  test("q119: top-3-per-doc filter plans as a window group limit") {
    // the rank-then-filter idiom must push the limit into the window
    // sort (WindowGroupLimit), never rank every term then filter
    val plan = planOf("q119_tfidf_top_terms")
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    // the per-term df map rides a broadcast, not a full shuffle
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q171: chunking is a pure per-row generate — no shuffle before the output sort") {
    // context-window chunking must not shuffle the corpus: one scan,
    // one Generate, then only the declared output ordering
    val plan = planOf("q171_doc_chunking").split("\n")
    val firstExchange = plan.indexWhere(_.contains("Exchange"))
    val generate = plan.indexWhere(_.contains("Generate"))
    assert(generate >= 0, plan.take(30).mkString("\n"))
    // plans print top-down: the Generate must sit BELOW (after) every
    // Exchange — i.e. no exchange between scan and chunk expansion
    assert(firstExchange < generate, s"shuffle before Generate:\n${plan.take(30).mkString("\n")}")
  }

  test("q172: weighted sampling gate needs exactly one aggregation exchange") {
    // the Bernoulli gate is map-side arithmetic; the only shuffle is
    // the final per-source audit aggregate
    val plan = planOf("q172_domain_mix_sample").toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"$exchanges hash exchanges\n${plan.take(2000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"), plan.take(2000))
  }

  test("q178: BPE pair counts partial-aggregate before the shuffle, top-k not global sort") {
    val plan = planOf("q178_bpe_pair_stats")
    assert(plan.contains("partial_count"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q179: corpus token total rides a broadcast, not a shuffle") {
    val plan = planOf("q179_length_curriculum")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q199: LM pair counts partial-aggregate before the shuffle") {
    val plan = planOf("q199_lm_fluency")
    assert(plan.contains("partial_count"), plan.take(2000))
  }

  test("q202: ADC search reads only codes — no float vectors in the scored scan") {
    val plan = planOf("q202_ann_pq")
    // the encoded-index scan projects (id, codes); the 64-float
    // embedding column must not appear in any scan the search touches
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(scans.contains("codes"), scans)
    assert(!scans.contains("embedding"), scans)
  }

  test("q175: ANN probe batch broadcasts on both search paths") {
    val plan = planOf("q175_ann_recall")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q184: LIMIT/OFFSET plans as top-k with offset, never a global sort") {
    val plan = planOf("q184_limit_offset")
    assert(plan.contains("TakeOrderedAndProject(limit=30"), plan.take(2000))
  }

  test("q67: IVF probe prunes the persisted index to nprobe partitions at file listing") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = run("q67_ann_ivf")
    df.collect() // materialize so scan metrics are populated
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val idx = scans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("ivf_index")))
    assert(idx.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    // nprobe = 4 of k = 16 cells: the listing must touch exactly 4
    // partition directories — pruning happened before any file read
    assert(idx.head.metrics("numPartitions").value == 4,
      idx.head.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
  }

  test("streaming type filters stay above the watermark node (no pushdown stall)") {
    import org.apache.spark.sql.catalyst.plans.logical.{EventTimeWatermark, Filter}
    import org.apache.spark.sql.functions.col
    // rate source: (timestamp, value). A plain value filter written
    // after withWatermark gets pushed BELOW the watermark node by
    // PushPredicateThroughNonJoin — the watermark then tracks only the
    // filtered subset (a sparse event type stalls it for hours; q176
    // lost rows to exactly this). The guard disjunct references the
    // event-time column, which pins the filter above the watermark.
    def optimized(f: org.apache.spark.sql.Column) = {
      val df = spark.readStream.format("rate").load()
        .withWatermark("timestamp", "1 hour")
        .filter(f)
      // run the optimizer directly: .optimizedPlan on a streaming frame
      // trips the batch-execution check before ever optimizing
      spark.sessionState.optimizer.execute(df.queryExecution.analyzed)
    }
    def filterBelowWatermark(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      plan.collect { case w: EventTimeWatermark => w }
        .exists(w => w.child.collect { case f: Filter => f }.nonEmpty)
    // negative control: the hazard is real — a value-only predicate sinks
    assert(filterBelowWatermark(optimized(col("value") % 7 === 0)))
    // the guard pattern stays above (same shape as unpushedTypeIs)
    assert(!filterBelowWatermark(optimized(
      col("timestamp").isNull || col("value") % 7 === 0)))
  }

  test("q208: probe batch broadcasts; per-probe top-k is WindowGroupLimit") {
    // the kNN corpus scan must stream once against a broadcast probe
    // batch — a shuffle here would repartition the full corpus — and
    // the per-probe 10-NN must group-limit, never rank all pairs
    val plan = planOf("q208_knn_classify")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("q209: unigram counts broadcast back onto bigram counts") {
    // vocabulary ≪ corpus (Zipf): both count-table joins and the
    // total-token staple must broadcast — a shuffle of the bigram
    // table on a word key would be pure overhead
    val plan = planOf("q209_pmi_collocations")
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q206: every funnel stage stays partitioned on user_id") {
    // the four step-aggregates and three step-joins all key on
    // user_id; no stage may introduce an exchange on any other key
    // (the plan may re-shuffle user_id between stages — that's the
    // join/agg boundary — but a foreign key would mean a misdesign)
    // (string-level: AdaptiveSparkPlanExec hides its inner plan from
    // TreeNode.collect, so walk the rendered plan instead)
    val plan = planOf("q206_funnel_conversion")
    val hashKeys = "hashpartitioning\\(([^,)]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashKeys.forall(_.contains("user_id")), hashKeys.mkString("; "))
    // per-user step state aggregates map-side before any exchange
    assert(plan.contains("partial_min"), plan.take(2000))
  }

  test("q219: term lookup prunes the inverted index to the probed buckets") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = run("q219_inverted_index")
    df.collect() // materialize so scan metrics are populated
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      // materialized AQE stages are leaves; descend into their plans
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val idx = scans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("inv_index")))
    assert(idx.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    val expected = Seq("spark", "join")
      .map(t => operators.MinHashLSH.baseHashJvm(t) % 16).distinct.size
    // the file listing must touch exactly the probe terms' bucket
    // dirs — the driver-side hash pruned before any file was read
    assert(idx.head.metrics("numPartitions").value == expected,
      idx.head.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
  }

  test("q228: the gram matrix is one Aggregator pass — no wide shuffle at all") {
    // round 7: the CovarTriangle typed Aggregator accumulates all
    // 2,080 floored products in per-partition long buffers; the only
    // distributed movement is one (2081-long array)/partition merge.
    // The returned frame is therefore driver-local metadata — any
    // hashpartitioning Exchange here means the explode path came back
    val plan = planOf("q228_embedding_covariance")
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("q227: in-cell dedup joins on the cell key, never all-pairs") {
    // SemDeDup's blocking IS the cell equi-join; a cartesian or
    // broadcast nested loop here would be the quadratic all-pairs
    // sweep the clustering exists to avoid
    val plan = planOf("q227_semantic_dedup")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q233: wedge enumeration equi-joins on the center, top-k not global sort") {
    val plan = planOf("q233_node_similarity")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q237: item counts broadcast back onto pair counts") {
    // catalog ≪ fact table: shuffling the pair table on a part key to
    // meet the per-item counts would be pure overhead
    val plan = planOf("q237_market_basket")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q242: hard-negative corpus streams once against broadcast probes") {
    val plan = planOf("q242_hard_negatives")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("q229: the daily series partial-aggregates before its shuffle") {
    // the autocovariance input is a map-side count down to ~365 rows;
    // everything after is metadata-scale
    val plan = planOf("q229_autocovariance")
    assert(plan.contains("partial_count"), plan.take(2000))
  }

  test("q253: stats broadcast back onto the scan; scaling is map-only after") {
    val plan = planOf("q253_feature_scaling")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      plan.take(2000))
  }

  test("q255: per-probe top-1 plans as WindowGroupLimit over the class-pruned join") {
    val plan = planOf("q255_smote_oversample")
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
  }

  test("q259: A-ES sample plans as TakeOrdered, never a global sort") {
    val plan = planOf("q259_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q251: CUSUM reads only the columns it scores") {
    val plan = planOf("q251_cusum_changepoint")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // scan schema pruned to the 4 referenced columns
    assert(!plan.contains("props"), "unused events columns not pruned")
  }

  test("q263: vocabulary word-stats broadcast back onto the token stream") {
    val plan = planOf("q263_rake_keyphrases")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q278: label-noise kNN equi-joins on the IVF cell — never all-pairs") {
    val plan = planOf("q278_label_noise")
    // the r7 shape was a BroadcastNestedLoopJoin of (corpus/8)×corpus;
    // blocked, the candidate join has the cell as an EQUALITY key, so
    // it plans as a hash/sort-merge join (a size-estimated broadcast
    // of the probe side is fine — that's the planner's call from
    // stats, not a data-proportional hint)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("cell"), plan.take(3000))
  }

  test("vector-path broadcasts are bounded — no corpus-fraction broadcast can recur") {
    // The q278 class of bug (r7 verdict): a broadcast() hint whose
    // input GROWS with the corpus (e.g. `vec_id % 8 = 0` — 1 in 8 of
    // the table) OOMs the driver long before 100 TB. Repo-wide guard:
    // for EVERY declared query whose plan scans the embeddings corpus
    // (fixture table or a staged /tmp/graft index artifact), each
    // broadcast-hinted subtree must be bounded — a Limit, an
    // Aggregate (metadata-cardinality stats), or a modulo-free
    // comparison/IN filter pinning a constant probe panel. A plain
    // corpus-fraction filter has none of these and FAILS here.
    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, In, InSet, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, ResolvedHint}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

    def scansCorpus(p: LogicalPlan): Boolean = p.collectLeaves().exists {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.exists { rp =>
          val s = rp.toString
          // `._dv` sidecars are declared metadata-scale (deletion
          // vectors), not corpus tables
          (s.contains("/embeddings") || s.contains("/tmp/graft")) &&
            !s.contains("._dv")
        }
        case _ => false
      }
      case _ => false
    }
    // the analyzer inserts Casts around attributes/literals — strip
    // them before shape-matching
    def atom(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => atom(c.child)
      case other => other
    }
    def attrLit(a: Expression, b: Expression): Boolean =
      atom(a).isInstanceOf[Attribute] && atom(b).isInstanceOf[Literal]
    def boundedCmp(e: Expression): Boolean = e match {
      case EqualTo(a, b) => attrLit(a, b) || attrLit(b, a)
      case LessThan(a, b) => attrLit(a, b)
      case LessThanOrEqual(a, b) => attrLit(a, b)
      case In(a, vs) => atom(a).isInstanceOf[Attribute] &&
        vs.forall(v => atom(v).isInstanceOf[Literal])
      case _: InSet => true
      case _ => false
    }
    // a filter is bounding if ANY conjunct is a bounded comparison —
    // `x % 5 = 0 AND x < 250` is bounded by the `< 250`; a bare
    // `x % 8 = 0` (corpus fraction) has no such conjunct and fails
    def bounded(p: LogicalPlan): Boolean = p.collectFirst {
      case _: GlobalLimit => ()
      case _: LocalLimit => ()
      case _: Aggregate => ()
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(boundedCmp) => ()
    }.isDefined

    // q255 is the DECLARED-EXACT oracle twin of q255b: its probe
    // broadcast is a documented corpus fraction, and q255b (cell-
    // blocked, shuffle-routed) is the scale path — the one standing
    // exception, by design, not by omission.
    val exactTwins = Set("q255_smote_oversample")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val broken = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => n.contains("stream") || exactTwins(n) }
      .foreach { case (name, fn) =>
        // a builder that THROWS must fail here too — swallowing it
        // would silently drop the query from the guard, shrinking the
        // guarantee ("every corpus-scanning query is checked") without
        // failing anything
        val df = try fn(spark, sf) catch {
          case e: Throwable => broken += s"$name (${e.getClass.getSimpleName})"; null
        }
        if (df != null) {
          val plan = df.queryExecution.analyzed
          if (scansCorpus(plan)) plan.foreach {
            case h: ResolvedHint if h.hints.strategy.contains(
                org.apache.spark.sql.catalyst.plans.logical.BROADCAST) =>
              if (scansCorpus(h.child) && !bounded(h.child)) offenders += name
            case _ => ()
          }
        }
      }
    assert(broken.isEmpty,
      s"query builders failed (guard coverage lost): ${broken.mkString(", ")}")
    assert(offenders.isEmpty,
      s"corpus-proportional broadcast hint in: ${offenders.distinct.mkString(", ")}")
  }

  test("q280: the DSv2 read pushes the range filter into the graft scan") {
    val plan = planOf("q280_dsv2_read")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(ba,1000)") &&
      plan.contains("LessThanOrEqual(ba,1999)"), plan.take(3000))
    // manifest pruning itself (files=k/n, k<n) is asserted file-count-
    // wise in GraftSourceSpec; here the declared query's plan shape
  }
}

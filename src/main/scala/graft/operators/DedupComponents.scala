package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * between candidate-pair generation (MinHash/SimHash/embedding
  * sweeps) and survivorship: pairs only say "a ~ b"; dedup needs the
  * transitive cluster so exactly one canonical row survives per group.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own label and its neighbors' labels; converged when a round changes
  * nothing. Rounds = graph diameter — and near-duplicate graphs are
  * unions of small dense clusters (diameter 2–4), so the loop runs a
  * handful of shuffles regardless of corpus size. Each round is one
  * hash join + partial-aggregated groupBy on the edge key; lineage is
  * cut per round (localCheckpoint) so the plan stays O(1) instead of
  * growing with iterations. For adversarial long-chain graphs switch
  * to large-star/small-star (alternating pointer doubling, O(log n)
  * rounds) — not needed for LSH-bucket dedup graphs.
  */
object DedupComponents {

  /** @param pairs edges as (a_id, b_id) — undirected, any orientation
    * @param maxIter safety bound on propagation steps
    * @param stepsPerJob propagation steps fused into one
    *   materialization. Each fused step carries its OWN observe()d
    *   label sum, so convergence evidence for every step rides the one
    *   job — min-propagation is idempotent at the fixpoint, so steps
    *   fused past convergence leave labels unchanged. MEASURED round 6
    *   at sf0.1 (JobCount, 3 runs each): k=2 saves one job but the
    *   past-fixpoint step's shuffles cost more than the saved setup
    *   (3.66 s vs 3.2 s) — AQE already runs each shuffle stage as its
    *   own job, so fusing shrinks job COUNT less than expected.
    *   Default stays 1; the knob remains for genuinely
    *   scheduler-bound deployments. (The round-5 fusion loss also
    *   reproduced; its extra recount jobs are now gone — the
    *   remaining cost is the overshoot shuffle itself.)
    * @return (id, comp) — comp is the min id reachable from id
    */
  def components(pairs: DataFrame, maxIter: Int = 20, stepsPerJob: Int = 1): DataFrame = {
    val edges = pairs.select(col("a_id"), col("b_id"))
      .unionAll(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .distinct()
    // self-loops fold "own label" into the neighbor aggregate: each
    // step becomes ONE join + partial-agg groupBy — no outer re-join
    // against the label table to mix the node's own label back in
    val edgesS = edges
      .unionAll(edges.select(col("a_id"), col("a_id").as("b_id")).distinct())
      .localCheckpoint(true) // reused every round — compute the pair graph once
    // labels only ever DECREASE (min of self and neighbor labels), so
    // the label sum is strictly decreasing until convergence — one
    // cheap aggregate detects stability, no per-round diff join.
    // Summed as DECIMAL(38,0): a 64-bit sum could wrap at extreme id
    // scales and a wrap-to-equal would false-positive convergence.
    // Sums ride each materialization via observe(), so every job's
    // convergence evidence is free.
    val sumExpr = sum(col("comp").cast("decimal(38,0)")).as("s")
    // intermediate fused sums have no recount fallback (their frames
    // are not checkpointed) — a missed observe is treated as unknown
    // (conservative: at worst one extra loop, never a wrong answer)
    def observedSum(df: DataFrame, metric: String): Option[BigDecimal] =
      df.queryExecution.observedMetrics.get(metric)
        .flatMap(r => Option(r.getDecimal(0))).map(BigDecimal(_))
    def recount(df: DataFrame): BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)")))
        .head().getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    // one propagation step: min label over self + neighbors (partial
    // agg runs map-side before the shuffle, so a hot hub node ships
    // one row per partition). Unique qualifiers per application keep
    // nested (fused) self-joins unambiguous.
    var stepN = 0
    def step(lbl: DataFrame): DataFrame = {
      stepN += 1
      val (e, l) = (s"e$stepN", s"l$stepN")
      edgesS.as(e).join(lbl.as(l), col(s"$e.b_id") === col(s"$l.id"))
        .groupBy(col(s"$e.a_id").as("id")).agg(min(col(s"$l.comp")).as("comp"))
    }
    // the identity init would cost the same shuffle as a step (distinct
    // over edges ≈ groupBy over edges) — so take step 1 IN the init:
    // label(v) = min(v, neighbors), one round ahead for free. The init
    // is NOT its own job: it fuses into the first propagation job like
    // any other step.
    def initStep(): DataFrame = {
      stepN += 1
      edgesS.groupBy(col("a_id").as("id")).agg(min("b_id").as("comp"))
    }
    var labels: DataFrame = null
    var prevSum: Option[BigDecimal] = None
    var taken = 0
    var converged = false
    while (!converged && taken < maxIter) {
      val k = math.max(1, math.min(stepsPerJob, maxIter - taken))
      var metrics = Vector.empty[String]
      var plan = labels
      for (_ <- 1 to k) {
        plan = if (plan == null) initStep() else step(plan)
        taken += 1
        val m = s"graft_comp_sum_$taken"
        metrics :+= m
        plan = plan.observe(m, sumExpr)
      }
      val updated = plan.localCheckpoint(true)
      val sums = metrics.map(m => observedSum(plan, m))
      val lastSum = sums.last.getOrElse(recount(updated))
      // converged iff any adjacent step pair in the sum chain is equal
      // (prev job's last sum vs this job's first included)
      val chain = prevSum.map(Some(_)).toVector ++ sums.dropRight(1) :+ Some(lastSum)
      converged = chain.sliding(2).exists {
        case Vector(Some(a), Some(b)) => a == b
        case _ => false
      }
      prevSum = Some(lastSum)
      labels = updated
    }
    // a maxIter exit means labels are PARTIAL (graph diameter exceeded
    // the bound) — silent partial components are wrong dedup clusters,
    // so fail loudly; callers with adversarial long-chain graphs should
    // raise maxIter (or switch to large-star/small-star)
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge within $maxIter rounds — " +
          "graph diameter exceeds the bound; raise maxIter")
    labels
  }

  /** Alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC '14): the
    * adversarial-graph path. Round count is O(log n) alternations on
    * ANY shape — a million-node path converges in ~20 alternations
    * where min-label propagation needs a million diameter rounds. The
    * price is a heavier round (each alternation = large-star's
    * groupBy+join plus small-star's groupBy+join, vs one join+groupBy
    * for a propagation step), so for LSH dedup graphs — unions of
    * small dense clusters, diameter 2-4 — [[components]] stays the
    * default (MEASURED round 6: q100's graph, 3× RunOne A/B each:
    * star 5.0 s vs propagation 4.2 s — star pays ~2 extra shuffle
    * rounds at the same convergence point).
    *
    * Steps (edges kept once, oriented (big, small) — large-star output
    * is naturally so oriented since every new target is a neighborhood
    * minimum): large-star re-points every bigger-than-center neighbor
    * at the center's neighborhood min; small-star re-points the center
    * and its smaller neighbors at their min.
    *
    * Convergence: a node's smallest incident label never increases
    * under either star, so the sum of per-node minima is monotone
    * non-increasing; when a full alternation leaves it unchanged the
    * labels are candidates — and before returning they are CERTIFIED
    * against the ORIGINAL edge set (one join: every edge's endpoints
    * must carry equal labels, and every node must be labeled). An
    * uncertified fixpoint keeps looping; exceeding maxAlt throws, the
    * same loud-fail guard as [[components]] — a silent partial
    * clustering is a wrong dedup verdict.
    *
    * @param pairs edges as (a_id, b_id) — undirected, any orientation
    * @param maxAlt bound on large+small alternations (default fits
    *   graphs to ~2^40 nodes with slack)
    * @return (id, comp) — comp is the min id reachable from id
    */
  def componentsStar(pairs: DataFrame, maxAlt: Int = 40): DataFrame = {
    // canonical (big, small) edge set; the symmetric closure is built
    // per-step where a full neighborhood is needed
    val orig = pairs
      .select(greatest(col("a_id"), col("b_id")).as("u"),
        least(col("a_id"), col("b_id")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true) // certificate target — computed once
    val nNodes = orig.select(col("u").as("id"))
      .unionAll(orig.select(col("v").as("id"))).distinct().count()
    def sym(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    // m(u) = min over Γ(u) ∪ {u}; post-select (not inside agg) keeps
    // the grouping-attribute reference unambiguous
    def mins(e: DataFrame): DataFrame =
      e.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.filter(col("v") > col("u")).join(mins(s), "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is (big, small)-oriented: exactly the small-star projection
      val mn = e.groupBy("u").agg(min("v").as("m"))
      e.join(mn, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(mn.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    def labelsOf(e: DataFrame): DataFrame =
      sym(e).groupBy("u").agg(min("v").as("mn"))
        .select(col("u").as("id"), least(col("mn"), col("u")).as("comp"))
    def labelSum(l: DataFrame): BigDecimal =
      Option(l.agg(sum(col("comp").cast("decimal(38,0)")))
        .head().getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    def certified(l: DataFrame): Boolean = {
      val la = l.select(col("id").as("u"), col("comp").as("ca"))
      val lb = l.select(col("id").as("v"), col("comp").as("cb"))
      val bad = orig.join(la, "u").join(lb, "v")
        .filter(col("ca") =!= col("cb")).limit(1).count()
      bad == 0 && l.count() == nNodes
    }
    var e = orig
    var prev: Option[BigDecimal] = None
    var alt = 0
    while (alt < maxAlt) {
      alt += 1
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val l = labelsOf(e)
      val s = labelSum(l)
      if (prev.contains(s)) {
        val cp = l.localCheckpoint(true)
        if (certified(cp)) return cp
      }
      prev = Some(s)
    }
    throw new IllegalStateException(
      s"star contraction did not certify within $maxAlt alternations — " +
        "raise maxAlt")
  }

  /** Survivorship over components: one canonical row (min id) per
    * cluster plus the cluster size — the materialized dedup verdict. */
  def canonical(pairs: DataFrame): DataFrame =
    components(pairs)
      .groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as("canonical_id"), col("cluster_size"))
}

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

  /** Survivorship over components: one canonical row (min id) per
    * cluster plus the cluster size — the materialized dedup verdict. */
  def canonical(pairs: DataFrame): DataFrame =
    components(pairs)
      .groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as("canonical_id"), col("cluster_size"))
}

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
    *   materialization (plan applies the join+groupBy step this many
    *   times before checkpointing). MEASURED round 5 at sf0.1: fusing
    *   (2) was a net LOSS (~+15%) — each fused step doubles join work
    *   and deepens the codegen plan, which outweighs the saved job
    *   setup even on tiny LSH graphs; default stays 1. The knob
    *   remains for genuinely job-bound deployments (thousands of tiny
    *   rounds on a busy cluster scheduler).
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
    def observedSum(df: DataFrame, metric: String, fallback: DataFrame): BigDecimal =
      df.queryExecution.observedMetrics.get(metric)
        .flatMap(r => Option(r.getDecimal(0))).map(BigDecimal(_))
        .getOrElse { // defensive: observe missed → recount
          Option(fallback.agg(sum(col("comp").cast("decimal(38,0)")))
            .head().getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
        }
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
    // label(v) = min(v, neighbors), one round ahead for free
    val init = edgesS.groupBy(col("a_id").as("id")).agg(min("b_id").as("comp"))
      .observe("graft_comp_sum_init", sumExpr)
    var labels = init.localCheckpoint(true)
    var prevSum = observedSum(init, "graft_comp_sum_init", labels)
    var iter = 1 // init consumed step 1
    var converged = false
    while (!converged && iter < maxIter) {
      val metric = s"graft_comp_sum_$iter"
      val fusedSteps = math.min(stepsPerJob, maxIter - iter)
      val advanced = (1 to fusedSteps).foldLeft(labels)((l, _) => step(l))
        .observe(metric, sumExpr)
      val updated = advanced.localCheckpoint(true)
      val s = observedSum(advanced, metric, updated)
      converged = s == prevSum
      prevSum = s
      labels = updated
      iter += fusedSteps
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

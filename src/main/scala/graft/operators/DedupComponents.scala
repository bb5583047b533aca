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
    * @param maxIter safety bound on propagation rounds
    * @return (id, comp) — comp is the min id reachable from id
    */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a_id"), col("b_id"))
      .unionAll(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .distinct()
      .localCheckpoint(true) // reused every round — compute the pair graph once
    var labels = edges.select(col("a_id").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // labels only ever DECREASE (least of own and neighbor min), so
    // the label sum is strictly decreasing until convergence — one
    // cheap aggregate detects stability, no per-round diff join.
    // Summed as DECIMAL(38,0): a 64-bit sum could wrap at extreme id
    // scales and a wrap-to-equal would false-positive convergence.
    // The sum rides the round's own materialization via observe(), so
    // each round costs exactly one job, not a checkpoint + an agg.
    def labelSum(df: org.apache.spark.sql.DataFrame): BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)")))
        .head().getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among neighbors (partial agg runs map-side before the
      // shuffle, so a hot hub node ships one row per partition)
      val nbrMin = edges.join(labels, edges("b_id") === labels("id"))
        .groupBy(edges("a_id").as("nid")).agg(min("comp").as("nbr"))
      val metric = s"graft_comp_sum_$iter"
      val observed = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .observe(metric, sum(col("comp").cast("decimal(38,0)")).as("s"))
      val updated = observed.localCheckpoint(true)
      val s = observed.queryExecution.observedMetrics.get(metric)
        .flatMap(r => Option(r.getDecimal(0))).map(BigDecimal(_))
        .getOrElse(labelSum(updated)) // defensive: observe missed → recount
      converged = s == prevSum
      prevSum = s
      labels = updated
      iter += 1
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

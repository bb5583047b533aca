package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicate-span coverage — the "exact substring dedup" metric
  * of RefinedWeb/MassiveText-style corpus prep: for every document, the
  * fraction of its token n-gram positions whose n-gram also occurs in
  * at least one OTHER document. Documents above a coverage threshold
  * are boilerplate/mirror candidates that MinHash (whole-doc Jaccard)
  * misses when only a passage is shared.
  *
  * Shape: explode n-grams (one row per token position — shuffle linear
  * in corpus tokens), count distinct source docs per gram, join back,
  * re-aggregate per doc. No pairwise comparison anywhere, so cost is
  * O(tokens) regardless of how many documents share a span.
  *
  * Gram keys shuffle hashed, not as strings: a 60-bit hash is 8 bytes
  * per row instead of an ~8-token string — an order of magnitude less
  * shuffle I/O, with a vanishing collision risk that can only
  * overcount duplication. `gramKey` picks the hash: "md5" (default —
  * first 15 md5 hex digits as a long, exactly replayable by the
  * DuckDB oracle), "xxhash64" (fastest; no oracle twin), or "string"
  * (no hashing — the reference semantics). A spec asserts all three
  * agree on the fixtures.
  */
object DuplicateSpans {

  /** Per-document n-gram duplicate coverage.
    *
    * @param docs   input with an id column and a whitespace-tokenizable
    *               text column
    * @param n      span length in tokens (docs shorter than n drop out)
    * @param gramKey "md5" | "xxhash64" | "string" (see object doc)
    * @return (id, n_grams, dup_grams, dup_frac) one row per doc
    */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 8, gramKey: String = "md5"): DataFrame = {
    val toked = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= n)
    // (`toks` is safe to reference inside the lambda here: the size
    // filter between the split projection and this generate blocks
    // project-collapse from re-inlining split(text) per gram — probed
    // at sf1, the HOF-bound formulation measured identical)
    val exploded = toked.select(col("id"), expr(
      s"explode(transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' ')))")
      .as("g"))
    val key = gramKey match {
      case "md5"      => conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
      case "xxhash64" => xxhash64(col("g"))
      case "string"   => col("g")
      case other      => throw new IllegalArgumentException(s"gramKey: $other")
    }
    // Exchange fence: both consumers below (the per-gram agg and the
    // join probe) read this same repartition — ReusedExchange computes
    // the explode+hash pipeline ONCE (without it each side re-derives
    // every gram: measured 2x on the whole query), and the join runs
    // co-partitioned on gram with no further shuffle.
    val grams = exploded.select(col("id"), key.as("gram"))
      .repartition(col("gram"))
    // "appears in >=2 docs" is min(id) != max(id) — a plain single-phase
    // agg; count_distinct here would plan a distinct-aggregate Expand
    // (doubles the shuffle volume for a boolean we can get from min/max)
    val freq = grams.groupBy("gram")
      .agg((min(col("id")) =!= max(col("id"))).as("dup"))
    grams.join(freq, Seq("gram"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("dup_grams"))
      .select(col("id"), col("n_grams"), col("dup_grams"),
        (col("dup_grams") / col("n_grams")).as("dup_frac"))
  }
}

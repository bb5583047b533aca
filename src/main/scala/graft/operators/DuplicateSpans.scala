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
  * `hashGrams = true` is the 100 TB path: grams shuffle as xxhash64
  * longs (8 bytes) instead of ~8-token strings — an order of magnitude
  * less shuffle I/O, with a vanishing 64-bit collision risk that can
  * only overcount duplication. The string path exists so the DuckDB
  * oracle can replay the query exactly; a spec asserts both paths
  * agree on the fixtures.
  */
object DuplicateSpans {

  /** Per-document n-gram duplicate coverage.
    *
    * @param docs   input with an id column and a whitespace-tokenizable
    *               text column
    * @param n      span length in tokens (docs shorter than n drop out)
    * @param hashGrams shuffle xxhash64(gram) longs instead of gram
    *               strings (the at-scale layout)
    * @return (id, n_grams, dup_grams, dup_frac) one row per doc
    */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 8, hashGrams: Boolean = false): DataFrame = {
    val toked = docs
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= n)
    val exploded = toked.select(col("id"), expr(
      s"explode(transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' ')))")
      .as("g"))
    val grams = exploded
      .select(col("id"), (if (hashGrams) xxhash64(col("g")) else col("g")).as("gram"))
    val freq = grams.groupBy("gram")
      .agg(count_distinct(col("id")).as("nd"))
    grams.join(freq, Seq("gram"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_grams"))
      .select(col("id"), col("n_grams"), col("dup_grams"),
        (col("dup_grams") / col("n_grams")).as("dup_frac"))
  }
}

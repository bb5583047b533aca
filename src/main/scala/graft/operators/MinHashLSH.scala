package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding for near-duplicate candidate generation at
  * corpus scale.
  *
  * Pipeline: token 3-shingles → base hash per shingle (first 8 md5 hex
  * digits as int) → K permutation min-hashes ((a·x + b) mod P) → B
  * bands of R rows, each band hashed to a bucket key → candidate pairs
  * are documents sharing any (band, key) bucket → estimated Jaccard =
  * fraction of matching signature components.
  *
  * Scale: the only shuffle is the band-bucket self-join on (band, key)
  * — pair enumeration is linear in bucket sizes instead of quadratic in
  * corpus size. Signatures are computed in a single projection pass
  * (higher-order functions, whole-stage codegen'd, no UDF). All hash
  * constants are fixed so results are deterministic and reproducible in
  * any engine (the DuckDB oracle replays the same arithmetic).
  */
object MinHashLSH {

  /** Modulus: smallest prime above 2^32 → products a·x stay < 2^52,
    * exact in int64 (and in the oracle's arithmetic). */
  val P = 4294967311L
  val K = 16 // signature length
  val Bands = 4
  val Rows = 4 // K = Bands * Rows

  /** Fixed odd multipliers / offsets (deterministic seed). */
  val A: Seq[Long] = Seq(2971L, 5231L, 7673L, 9341L, 11597L, 13469L,
    15643L, 17389L, 19541L, 21269L, 23209L, 25301L, 27791L, 29443L, 31231L, 33149L)
  val B: Seq[Long] = Seq(317L, 1021L, 2053L, 3079L, 4099L, 5119L,
    6143L, 7177L, 8219L, 9241L, 10273L, 11311L, 12347L, 13397L, 14411L, 15451L)

  /** Token n-gram shingles, empty array below n tokens.
    *
    * The token array is bound ONCE through a HOF argument (lambda
    * variables are materialized values) — referencing the `split`
    * expression inside the per-shingle lambda would inline it, costing
    * O(tokens) per shingle = O(tokens²) per document (measured: the
    * dominant cost of the whole MinHash pipeline at sf0.1).
    * Duplicates are kept: MinHash minima are invariant under them, and
    * de-duplicating costs a quadratic array_distinct pass. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    val sh = flatten(transform(array(toks), t =>
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))))
    when(size(toks) >= n, sh).otherwise(array().cast("array<string>"))
  }

  /** Cross-engine-stable base hash: first 8 md5 hex digits as long. */
  def baseHash(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Driver-side mirror of [[baseHash]] — md5 first 8 hex chars as a
    * long — for computing partition keys of literal probe values
    * (e.g. which index bucket a query term lives in) without a job. */
  def baseHashJvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** K-component MinHash signature of a hashed-shingle array.
    *
    * K independent `array_min(transform(...))` passes over the hashes.
    * CAUTION: `xs` must reference a MATERIALIZED column (an attribute
    * behind an Exchange — see [[bucketRows]]'s fence), never the md5
    * expression itself: Catalyst inlines a HOF's argument expression
    * into every consumer (projections collapse, no CSE inside
    * lambdas), which would recompute every shingle md5 K times
    * (measured 16× slower at sf0.1). Over materialized hashes the K
    * passes are pure integer arithmetic — cheaper than a single fold
    * carrying a K-element array, which allocates one array per shingle
    * step. */
  def signature(xs: Column): Column = {
    val aArr = array(A.map(lit): _*)
    val bArr = array(B.map(lit): _*)
    transform(sequence(lit(0), lit(K - 1)), i =>
      array_min(transform(xs, x =>
        (element_at(aArr, i + 1) * x + element_at(bArr, i + 1)) % P)))
  }

  /** Base hashes of a document's shingles (one md5 per shingle). */
  def hashedShingles(text: Column): Column =
    transform(shingles(text), s => baseHash(s))

  /** Band bucket keys: md5 of the '-'-joined signature slice. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)), j =>
      md5(concat_ws("-",
        transform(slice(sig, j * Rows + 1, lit(Rows)), v => v.cast("string")))))

  /** Default bucket-size cap: at corpus scale one degenerate bucket
    * (empty/boilerplate documents collapsing to one signature) makes
    * pair enumeration quadratic; past this size a bucket is dropped
    * (use [[droppedBuckets]] to observe what a capped run skipped). */
  val DefaultMaxBucket = 500

  private def bucketRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Exchange fence after the md5 stage: without it, Catalyst's
    // filter pushdown + project collapse inline `xs` into both the
    // size filter and the signature passes, recomputing one md5 per
    // shingle per reference. Behind the fence the hashes are
    // materialized rows (~8 B/shingle to shuffle — orders of magnitude
    // cheaper than re-hashing), and the K min-passes cost only integer
    // arithmetic.
    val hashed = SkewTools.spreadForCompute(docs
      // emptiness is decided on the CHEAP predicate (≥ n tokens), not
      // on size(xs): a size(xs) > 0 filter gets planned BELOW the
      // projection and re-evaluates the whole md5 shingle pipeline a
      // second time just to test emptiness (measured: q55 2x)
      .filter(size(split(col(textCol), " ")) >= 3))
      .select(col(idCol).as("id"), hashedShingles(col(textCol)).as("xs"))
      // the fence partition count is PINNED (r15): a bare
      // repartition(col) is REPARTITION_BY_COL, which AQE's partition
      // coalescing happily folds to ONE post-shuffle partition at this
      // data size — serializing the K signature min-passes + band-key
      // md5s, the pipeline's dominant compute (measured: q100's
      // signature stage ran 1118 ms on 1 task). defaultParallelism
      // scales with the session, so the pin is not a local-mode
      // constant.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("id"))
    hashed
      .select(col("id"), signature(col("xs")).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(bandKeys(col("sig"))).as(Seq("band", "key")))
  }

  /** Candidate near-duplicate pairs with estimated Jaccard.
    *
    * @param docs (id, text) DataFrame
    * @param maxBucketSize buckets larger than this are dropped (hot
    *   buckets are quadratic; see [[DefaultMaxBucket]])
    * @return (a_id, b_id, est_jaccard) for pairs sharing ≥1 band bucket
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     maxBucketSize: Int = DefaultMaxBucket): DataFrame =
    pairsFromBucketRows(bucketRows(docs, idCol, textCol), maxBucketSize)

  /** Pair enumeration over precomputed (id, sig, band, key) rows —
    * shared by [[candidatePairs]] and the budgeted variant (which must
    * reuse ONE materialized bucket pass for both the histogram and the
    * enumeration). */
  private def pairsFromBucketRows(rows: DataFrame, maxBucketSize: Int): DataFrame = {
    // One pass, one shuffle, no self-join: collect each (band, key)
    // bucket's members, then enumerate intra-bucket pairs with array
    // HOFs. A self-join formulation runs the signature pipeline (one
    // md5 per shingle — the expensive part) once per join side and
    // shuffles it twice; this shape computes it once, and the bucket
    // cap is a plain size filter (the round-1 formulation needed an
    // extra window for it). Members are sorted by id, so pair
    // orientation (a_id < b_id) falls out of the array order.
    val members = rows
      .groupBy("band", "key")
      .agg(array_sort(collect_list(struct(col("id"), col("sig")))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucketSize)
    // est_jaccard is computed inside the pair expansion, so the final
    // multi-band distinct shuffles (long, long, double) rows — never
    // two K-long signature arrays per candidate (round 1 measured the
    // array-carrying distinct at 12.8 s for 5k docs).
    val est = (sa: Column, sb: Column) =>
      aggregate(zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v) / lit(K.toDouble)
    members
      .select(explode(flatten(transform(col("ms"), (m, i) =>
        transform(slice(col("ms"), i + lit(2), size(col("ms"))), m2 =>
          struct(
            m.getField("id").as("a_id"),
            m2.getField("id").as("b_id"),
            est(m.getField("sig"), m2.getField("sig")).as("est_jaccard"))))))
        .as("p"))
      .select(col("p.a_id"), col("p.b_id"), col("p.est_jaccard"))
      .distinct()
  }

  /** Incremental near-dedup: candidate matches of a NEW batch against
    * an already-ingested corpus — the steady-state shape of a training
    * pipeline, where re-running all-pairs dedup per arrival would be
    * quadratic in corpus history. The history side's (band, key, id,
    * sig) rows are exactly what a persisted fingerprint store holds
    * (at scale: a snapshot table bucketed by key, appended per batch —
    * [[bucketRows]] run once per document ever); the batch side joins
    * against it on the band bucket, so the per-arrival cost is
    * O(batch + matched buckets), independent of corpus size.
    *
    * @return (new_id, hist_id, est_jaccard), distinct — only (long,
    *   long, double) rows cross the final shuffle, never signatures
    */
  def incrementalCandidates(history: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val h = bucketRows(history, idCol, textCol)
      .select(col("band"), col("key"), col("id").as("hist_id"), col("sig").as("hsig"))
    val b = bucketRows(batch, idCol, textCol)
      .select(col("band"), col("key"), col("id").as("new_id"), col("sig").as("nsig"))
    val est = aggregate(
      zip_with(col("nsig"), col("hsig"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v) / lit(K.toDouble)
    b.join(h, Seq("band", "key"))
      .select(col("new_id"), col("hist_id"), est.as("est_jaccard"))
      .distinct()
  }

  /** The buckets a capped [[candidatePairs]] run drops, as
    * (band, key, n) — coverage loss is observable, never silent. */
  def droppedBuckets(docs: DataFrame, idCol: String, textCol: String,
                     maxBucketSize: Int = DefaultMaxBucket): DataFrame =
    bucketRows(docs, idCol, textCol)
      .groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucketSize)

  /** Self-tuning bucket cap: the LARGEST cap from `caps` whose
    * admitted pair work Σ_{|b| ≤ cap} C(|b|, 2) fits `pairBudget`
    * (falling back to the smallest cap when even that overshoots).
    * At a 100×-duplicated corpus the fixed [[DefaultMaxBucket]] admits
    * quadratic pair blowup (BENCH_NOTES round-6 sf10: q55 154× at
    * 100× data); a budget-driven cap keeps the emitted-pair volume —
    * the true cost driver — bounded regardless of duplication rate.
    *
    * Cost: one extra pass over the bucket rows collapsed to a
    * SIZE HISTOGRAM (distinct bucket sizes × counts — tens of rows at
    * any corpus scale), so the driver decision is metadata-sized. The
    * selection is deterministic integer arithmetic, replayable by an
    * independent engine (q204's oracle). */
  def adaptiveCap(docs: DataFrame, idCol: String, textCol: String,
                  pairBudget: Long,
                  caps: Seq[Int] = Seq(4, 8, 16, 32, 64, 128, 256)): Int =
    capFromRows(bucketRows(docs, idCol, textCol), pairBudget, caps)

  private def capFromRows(rows: DataFrame, pairBudget: Long, caps: Seq[Int]): Int = {
    val hist = rows
      .groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .groupBy("n").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def work(c: Int): Long =
      hist.collect { case (n, cnt) if n <= c => cnt * (n * (n - 1) / 2) }.sum
    caps.sorted.reverse.find(c => work(c) <= pairBudget).getOrElse(caps.min)
  }

  /** [[adaptiveCap]] + [[candidatePairs]] fused over ONE bucket pass:
    * the (id, sig, band, key) rows — the md5 shingle pipeline's output,
    * the expensive part — are materialized once and serve both the
    * histogram the cap decision reads and the pair enumeration.
    * Returns (chosen cap, candidate pairs). */
  def candidatePairsBudgeted(docs: DataFrame, idCol: String, textCol: String,
                             pairBudget: Long,
                             caps: Seq[Int] = Seq(4, 8, 16, 32, 64, 128, 256)): (Int, DataFrame) = {
    val rows = bucketRows(docs, idCol, textCol).localCheckpoint(true)
    val cap = capFromRows(rows, pairBudget, caps)
    (cap, pairsFromBucketRows(rows, cap))
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: a 60-bit locality-sensitive hash
  * whose Hamming distance approximates token-multiset distance.
  *
  * Per token: a 60-bit hash (first 15 md5 hex digits — 15·4 = 60 bits,
  * always positive in int64). Per bit position j: sum ±1 over tokens
  * (+1 if bit set, −1 otherwise); the SimHash has bit j set iff the
  * balance is positive.
  *
  * Everything is a single whole-stage-codegen projection (higher-order
  * functions, no UDF, no shuffle): near-dup detection then needs only
  * `bit_count(a XOR b)` per candidate pair. Bit extraction uses
  * x div 2^j (powers of two are exact doubles up to 2^1023, and 2^j
  * < 2^63 casts exactly to long), which any oracle engine reproduces.
  */
object SimHash {

  val Bits = 60

  /** 60-bit token hash from md5 (cross-engine-stable). */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** SimHash of a token array → positive long (< 2^60).
    *
    * The token-hash array is bound ONCE through a HOF argument (lambda
    * variables are materialized values) — referencing the md5-mapping
    * expression inside the 60 per-bit lambdas would inline it into
    * each, hashing every token 60 times (measured ~6× on q56). */
  def simhash(tokens: Column): Column =
    aggregate(
      flatten(transform(array(transform(tokens, t => tokenHash(t))), hs => {
        val n = size(hs)
        // balance_j = 2 * (count of tokens with bit j set) - n
        transform(sequence(lit(0), lit(Bits - 1)), j => {
          val pow2 = pow(lit(2.0), j).cast("long")
          val ones = aggregate(hs, lit(0),
            (acc, x) => acc + when(x.bitwiseAND(pow2) =!= 0, 1).otherwise(0))
          when(ones * 2 > n, pow2).otherwise(lit(0L))
        })
      })),
      lit(0L), (acc, bit) => acc + bit)

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}

package graft.ingest

import java.nio.charset.StandardCharsets

/** Order-preserving Long encodings for non-INT64 column statistics.
  *
  * The snapshot manifest keeps one (min, max) Long pair per file and
  * column ([[Snapshots.FileStat]]); folding DOUBLE and STRING values
  * into that space through a monotone map lets the same pruning
  * machinery skip files on any column type — the Delta/Iceberg
  * data-skipping shape without a per-type stats format.
  *
  *  - doubles use the IEEE-754 sortable-bits transform (flip the low
  *    63 bits of negatives): total order of finite doubles = signed
  *    Long order of their keys;
  *  - strings use the first 8 UTF-8 bytes, big-endian, as an unsigned
  *    prefix: monotone NON-strictly (equal-prefix strings collide), so
  *    prefix-key ranges are conservative — they can only keep extra
  *    files, never skip a matching one. This matches Spark's binary
  *    UTF8String comparison (and parquet's unsigned byte stats order).
  */
private[graft] object SortKeys {

  /** Monotone bijection finite Double → Long (NaN must be handled by
    * the caller — parquet stats with NaNs are dropped upstream). */
  def doubleKey(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Monotone (non-strict) prefix key of a string under binary UTF-8
    * ordering. */
  def stringKey(s: String): Long =
    bytesKey(s.getBytes(StandardCharsets.UTF_8))

  /** First 8 bytes big-endian, zero-padded, shifted to signed range. */
  def bytesKey(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    acc ^ Long.MinValue
  }
}

package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composite stream positions (reference:
  * PerformanceConsumer.java:269-283): `"ledgerId:entryId"` strings
  * compared numerically component-wise — string comparison would order
  * "9:5" after "10:2".
  *
  * Spark-first: a position is a `struct(ledger, entry)` column; struct
  * ordering is native tuple ordering, so comparisons, MAX, and sorts
  * need no custom code. The scalar compare exists for driver-side
  * bookkeeping parity. */
object Positions {

  def parse(s: String): (Long, Long) = {
    val Array(l, e) = s.split(":", 2)
    (l.toLong, e.toLong)
  }

  /** Numeric component-wise compare (negative/zero/positive). */
  def compare(a: String, b: String): Int = {
    val (al, ae) = parse(a)
    val (bl, be) = parse(b)
    if (al != bl) java.lang.Long.compare(al, bl) else java.lang.Long.compare(ae, be)
  }

  /** Column form: `"l:e"` string → orderable struct(ledger, entry). */
  def posStruct(c: Column): Column = {
    val parts = split(c, ":", 2)
    struct(parts.getItem(0).cast("long").as("ledger"),
      parts.getItem(1).cast("long").as("entry"))
  }
}

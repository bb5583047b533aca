package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Batch-2 round-6 additions: readability, SMOTE oversampling,
  * scene cuts, streaming top-k.
  */
class PipelineAdditionsSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("q254: bucket histogram accounts for every document") {
    val total = SparkEntry.queries("q254_readability")(spark, sf01)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf01).count())
  }

  test("q254: formula matches a driver-side recomputation on one doc") {
    val text = Tables.documents(spark, sf01)
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val w = math.max(1, text.split(" ").count(_.nonEmpty))
    val syl = math.max(1, "[aeiouy]+".r.findAllIn(text.toLowerCase).length)
    val sent = 1 + (w - 1) / 20
    val fre = 206835L - (1015L * w) / sent - (84600L * syl) / w
    // recompute the same doc through the declared pipeline
    val d = Tables.documents(spark, sf01).filter(col("doc_id") === 0)
      .withColumn("rw", regexp_replace(col("text"), "[^ ]+", "#"))
      .withColumn("w", greatest(lit(1L),
        (length(col("rw")) - length(regexp_replace(col("rw"), "#", ""))).cast("long")))
      .withColumn("rs", regexp_replace(lower(col("text")), "[aeiouy]+", "#"))
      .withColumn("syl", greatest(lit(1L),
        (length(col("rs")) - length(regexp_replace(col("rs"), "#", ""))).cast("long")))
      .withColumn("sent", lit(1L) + expr("(w - 1) div 20"))
      .select(expr("206835 - (1015 * w) div sent - (84600 * syl) div w"))
      .collect()(0).getLong(0)
    assert(d == fre, s"engine $d != driver $fre")
  }

  test("q255: synthetic rows are same-label midpoints of real neighbors") {
    val out = SparkEntry.queries("q255_smote_oversample")(spark, sf01).collect()
    assert(out.nonEmpty)
    val e = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Double](2))).toMap
    out.foreach { r =>
      val (p, nn) = (r.getLong(0), r.getLong(1))
      val synth = r.getSeq[Long](2)
      assert(p != nn)
      assert(e(p)._1 == e(nn)._1, "neighbor must share the minority label")
      val (pv, nv) = (e(p)._2, e(nn)._2)
      synth.indices.foreach { i =>
        val expect = math.floor((pv(i) + nv(i)) * 0.5 * 1e6 + 0.5).toLong
        assert(synth(i) == expect)
        val (lo, hi) = (math.min(pv(i), nv(i)) * 1e6 - 1, math.max(pv(i), nv(i)) * 1e6 + 1)
        assert(synth(i) >= lo && synth(i) <= hi, "midpoint must lie between parents")
      }
    }
  }

  test("q256: hamming equals a driver-side recount from the real decode") {
    val out = SparkEntry.queries("q256_scene_cuts")(spark, sf01)
      .filter(col("doc_id") === 5).collect()
    val fp = Multimodal.clipFp(Multimodal.makeClip(5L))
    val frames = fp.grouped(64).toIndexedSeq
    assert(out.length == frames.length - 1)
    out.zipWithIndex.foreach { case (r, i) =>
      val expect = frames(i).zip(frames(i + 1)).count { case (a, b) => a != b }
      assert(r.getInt(2) == expect)
      assert(r.getInt(3) == (if (expect > 8) 1 else 0))
    }
  }

  test("q257: at most 3 ranked rows per closed window, ranks contiguous") {
    val rows = SparkEntry.queries("q257_stream_topk")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (_, ws) =>
      val ranks = ws.map(_.getInt(3)).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length))
      // ranked by count desc within the window
      val byRank = ws.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(byRank.sameElements(byRank.sorted(Ordering[Long].reverse)))
    }
  }
}

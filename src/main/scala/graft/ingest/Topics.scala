package graft.ingest

/** Topic fan-out naming (reference: PerformanceProducer.java:99-114,
  * duplicated at PerformanceConsumer.java:95-109): a prefix expands to
  * `prefix-0 … prefix-(n-1)`; n == 1 keeps the bare prefix.
  *
  * In the Spark rebuild a "topic" is a value of the `topic` partition
  * column of a parquet table rooted at `<root>/<prefix>` — partition
  * expansion on read is the free Spark analog of
  * `getPartitionsForTopic`. */
object Topics {
  def expand(prefix: String, n: Int, sep: String = "-"): Seq[String] =
    if (n <= 1) Seq(prefix) else (0 until n).map(i => s"$prefix$sep$i")

  def tableDir(root: String, prefix: String): String = s"$root/$prefix"
  def manifestPath(root: String, prefix: String): String = s"$root/$prefix.manifest.json"
  def progressPath(root: String, prefix: String): String = s"$root/$prefix.progress.json"
}

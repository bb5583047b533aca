package graft

/** Ad-hoc schema/read smoke check (not part of the driver contract). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { t =>
      try {
        val df = spark.read.parquet(Tables.path(dir, t))
        println(s"== $t  rows=${df.count()}")
        df.printSchema()
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.getMessage}")
      }
    }
    println("== events normalized")
    val ev = Tables.events(spark, dir)
    ev.printSchema()
    ev.show(5, truncate = false)
    spark.stop()
  }
}

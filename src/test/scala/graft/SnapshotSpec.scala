package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.{ProduceJob, Snapshots}

/** Versioned snapshot log: time travel, snapshot isolation, monotonic
  * versions. */
class SnapshotSpec extends SparkTestBase {

  test("append commits produce monotonic versions with time travel") {
    val root = Files.createTempDirectory("graft_snap").toString
    ProduceJob.produceBatch(spark, root, "s1", topics = 2, numMessages = 1000)
    ProduceJob.produceBatch(spark, root, "s1", topics = 2, numMessages = 500)
    assert(Snapshots.versions(root, "s1") == Seq(0, 1))
    // v0 sees only the first commit's files; latest sees both
    assert(Snapshots.read(spark, root, "s1", Some(0)).count() == 1000)
    assert(Snapshots.read(spark, root, "s1").count() == 1500)
    // watermark recorded per version
    assert(Snapshots.snapshot(root, "s1", Some(0)).get.maxPos == 999)
    assert(Snapshots.snapshot(root, "s1", Some(1)).get.maxPos == 499)
  }

  test("snapshot isolation: files appended after a commit stay invisible") {
    val root = Files.createTempDirectory("graft_snap").toString
    ProduceJob.produceBatch(spark, root, "s2", topics = 1, numMessages = 300)
    val v0 = Snapshots.read(spark, root, "s2", Some(0))
    // append WITHOUT a commit — raw directory read would see it
    ProduceJob.personProjection(spark.range(300, 600).toDF("cnt"), "cnt", "s2", 1)
      .write.mode("append").partitionBy("topic")
      .parquet(graft.ingest.Topics.tableDir(root, "s2"))
    assert(spark.read.parquet(graft.ingest.Topics.tableDir(root, "s2")).count() == 600)
    assert(v0.count() == 300) // the snapshot still pins the old file set
    // a new commit captures the appended files
    val v1 = Snapshots.commit(root, "s2", 599)
    assert(Snapshots.read(spark, root, "s2", Some(v1)).count() == 600)
  }

  test("partition column is recovered through the snapshot read") {
    val root = Files.createTempDirectory("graft_snap").toString
    ProduceJob.produceBatch(spark, root, "s3", topics = 3, numMessages = 300)
    val topics = Snapshots.read(spark, root, "s3")
      .select("topic").distinct().collect().map(_.getString(0)).sorted
    assert(topics.sameElements(Array("s3-0", "s3-1", "s3-2")))
  }

  test("schema evolution: appended columns merge; old rows read as null") {
    val root = Files.createTempDirectory("graft_snap").toString
    ProduceJob.produceBatch(spark, root, "s5", topics = 1, numMessages = 100)
    // producer upgrade: new optional column lands in later files
    ProduceJob.personProjection(spark.range(100, 200).toDF("cnt"), "cnt", "s5", 1)
      .withColumn("source", lit("v2"))
      .write.mode("append").partitionBy("topic")
      .parquet(graft.ingest.Topics.tableDir(root, "s5"))
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(graft.ingest.Topics.tableDir(root, "s5"))
    assert(merged.columns.contains("source"))
    assert(merged.filter(col("source").isNull).count() == 100)  // v1 rows
    assert(merged.filter(col("source") === "v2").count() == 100)
    assert(merged.count() == 200)
  }

  test("unknown version is refused") {
    val root = Files.createTempDirectory("graft_snap").toString
    ProduceJob.produceBatch(spark, root, "s4", topics = 1, numMessages = 10)
    intercept[RuntimeException] {
      Snapshots.read(spark, root, "s4", Some(99))
    }
  }
}

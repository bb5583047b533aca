package graft

import graft.ingest.AvroWire
import graft.model.{AmazonReview, Person, Student}

/** Avro binary wire format (A3/A13): round-trip fidelity, byte-level
  * determinism, and key parity with the reference's per-message key. */
class AvroWireSpec extends SparkTestBase {

  private def persons(n: Int) = {
    import spark.implicits._
    spark.range(0, n).map(i => Person(
      "hangc", ((18 + i) % 100).toInt, "GuangZhou", gender = true,
      (59.9 + i) % 150.0, i))
  }

  test("Person round-trips bit-exactly through Avro binary") {
    val src = persons(500)
    val back = AvroWire.decodePersons(AvroWire.encodePersons(src).map(_._2)(
      org.apache.spark.sql.Encoders.BINARY))
    // doubles included: Avro binary stores raw IEEE bits, no loss
    assert(back.collect().sortBy(_.ba).sameElements(src.collect().sortBy(_.ba)))
  }

  test("message key replays the reference's String.valueOf(position)") {
    import spark.implicits._
    val keys = AvroWire.encodePersons(persons(10)).map(_._1).collect().sorted
    val expected = (0 until 10).map(_.toString).sorted
    assert(keys.toSeq == expected)
  }

  test("encoding is deterministic: same row, same bytes") {
    val a = AvroWire.encodePersons(persons(50)).collect().sortBy(_._1).map(_._2)
    val b = AvroWire.encodePersons(persons(50)).collect().sortBy(_._1).map(_._2)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("wire shape: Pulsar nullable-union branch byte and Confluent framing") {
    import spark.implicits._
    // Person's first field (name) is a ["null","string"] union — the
    // first wire byte is the branch index 1 as a zigzag varint = 0x02
    val p = AvroWire.encodePersons(persons(1)).map(_._2).head()
    assert(p(0) == 0x02.toByte)
    // Student is Confluent-framed: magic 0x00 + 4-byte BE schema id
    val s = AvroWire.encodeStudents(
      Seq(Student("n", 1, "p", "a", 9L)).toDS()).head()
    assert(s.take(5).sameElements(
      Array[Byte](0, 0, 0, 0, AvroWire.StudentSchemaId.toByte)))
  }

  test("AmazonReview and Student round-trip") {
    import spark.implicits._
    val reviews = Seq(
      AmazonReview("1", "ok, I guess", "has, commas \"and quotes\""),
      AmazonReview("2", "great", "text")).toDS()
    assert(AvroWire.decodeReviews(AvroWire.encodeReviews(reviews))
      .collect().toSet == reviews.collect().toSet)
    val students = spark.range(0, 100).map(i =>
      Student(s"name$i", (i % 100).toInt, s"payload$i", s"address$i", i))
    assert(AvroWire.decodeStudents(AvroWire.encodeStudents(students))
      .collect().sortBy(_.number).sameElements(students.collect().sortBy(_.number)))
  }

  test("schema evolution: v1 bodies under reader v2 fill the defaults") {
    import spark.implicits._
    val v1 = AvroWire.encodeStudents(
      Seq(Student("n", 21, "p", "a", 7L)).toDS())
    val out = AvroWire.decodeStudentsAsV2(v1).collect()
    assert(out.toSeq == Seq(
      graft.model.StudentV2("n", 21, "p", "a", 7L, None, 0)))
  }

  test("schema evolution: v2 bodies under reader v1 drop the added fields") {
    import spark.implicits._
    val v2 = AvroWire.encodeStudentsV2(
      Seq(graft.model.StudentV2("n", 21, "p", "a", 7L, Some("e@x"), 4)).toDS())
    // frame carries the v2 registry id
    assert(v2.head().take(5).sameElements(
      Array[Byte](0, 0, 0, 0, AvroWire.StudentSchemaIdV2.toByte)))
    assert(AvroWire.decodeStudentsAsV1(v2).collect().toSeq ==
      Seq(Student("n", 21, "p", "a", 7L)))
  }

  test("schema evolution: a mixed-writer stream decodes per-frame by registry id") {
    import spark.implicits._
    val mixed = AvroWire.encodeStudents(
        Seq(Student("old", 1, "p", "a", 1L)).toDS())
      .unionAll(AvroWire.encodeStudentsV2(
        Seq(graft.model.StudentV2("new", 2, "p", "a", 2L, Some("e@x"), 9)).toDS()))
    val out = AvroWire.decodeStudentsAsV2(mixed).collect().sortBy(_.number)
    assert(out.toSeq == Seq(
      graft.model.StudentV2("old", 1, "p", "a", 1L, None, 0),
      graft.model.StudentV2("new", 2, "p", "a", 2L, Some("e@x"), 9)))
  }

  test("unknown registry id fails loudly, not with misdecoded rows") {
    import spark.implicits._
    val bogus = Seq(Array[Byte](0, 0, 0, 0, 99, 0x02, 0x00)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      AvroWire.decodeStudentsAsV2(bogus).collect()
    }
    assert(e.getMessage.contains("99") || Option(e.getCause).exists(_.getMessage.contains("99")))
  }
}

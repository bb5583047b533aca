package graft.model

import java.sql.Timestamp

/** The reference's record schemas as typed case classes (Dataset[T]
  * encoders carry the semantic content of `Schema.AVRO(...)` — the
  * container ships no spark-avro, so the wire format is parquet; see
  * SURVEY.md §7 risk (d)).
  */

/** reference: src/main/java/io/streamnative/lakehouse/Person.java:10-16 */
final case class Person(name: String, age: Int, address: String,
                        gender: Boolean, score: Double, ba: Long)

/** reference: src/main/java/io/streamnative/lakehouse/AmazonReview.java:10-14 */
final case class AmazonReview(polarity: String, title: String, text: String)

/** reference: src/main/resources/avro/Student.avsc:5-11 */
final case class Student(name: String, age: Int, payload: String,
                         address: String, number: Long)

/** Student after a registry-mediated schema evolution (writer v2):
  * adds a nullable `email` (default null) and `grade` (default 0) —
  * the add-column-with-default drift every long-lived lakehouse hits
  * (reference: the registry wiring at UrsaKafkaProducerOnCloud.java:39-41
  * is what lets old readers keep consuming). */
final case class StudentV2(name: String, age: Int, payload: String,
                           address: String, number: Long,
                           email: Option[String], grade: Int)

/** Driver testdata `events` row (FIXTURES.md §B). */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                       event_type: String, value: Double, props: String)

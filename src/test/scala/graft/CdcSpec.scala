package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** Golden CDC cases from FIXTURES.md §1: insert / update / delete +
  * tombstone / snapshot read / out-of-order version / duplicate delivery.
  * The changelog models the reference users stream (schema.avsc) keyed by
  * id with (partition, offset) as the version order.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, username, email, created_at µs, offset); username==null → tombstone
  private def changelog = Seq(
    (1, "ann", "a@x.io", 1000L, 0L),
    (2, "bob", "b@x.io", 2000L, 1L),
    (1, "ann2", "a2@x.io", 3000L, 2L), // update of key 1
    (3, "cat", "c@x.io", 4000L, 3L),
    (2, null.asInstanceOf[String], null.asInstanceOf[String], 0L, 4L), // delete key 2
    (3, "cat", "c@x.io", 4000L, 3L) // duplicate delivery of offset 3
  ).toDF("id", "username", "email", "created_at", "offset")

  test("latestByKey picks the highest-version row per key") {
    val got = Cdc.latestByKey(changelog.dropDuplicates("id", "offset"),
        Seq("id"), Seq(col("offset")))
      .select("id", "username").as[(Int, String)].collect().toMap
    assert(got === Map(1 -> "ann2", 2 -> null, 3 -> "cat"))
  }

  test("materialize drops keys whose latest record is a tombstone") {
    val state = Cdc.materialize(changelog.dropDuplicates("id", "offset"),
      Seq("id"), Seq(col("offset")), isTombstone = col("username").isNull)
    assert(state.select("id").as[Int].collect().sorted === Array(1, 3))
    // and the surviving rows are the latest images
    assert(state.filter($"id" === 1).select("email").as[String].head() === "a2@x.io")
  }

  test("materialize is redelivery-idempotent (at-least-once)") {
    val once = Cdc.materialize(changelog.dropDuplicates("id", "offset"),
      Seq("id"), Seq(col("offset")), col("username").isNull)
    val redelivered = Cdc.materialize(
      changelog.unionAll(changelog).dropDuplicates("id", "offset"),
      Seq("id"), Seq(col("offset")), col("username").isNull)
    assert(once.collect().toSet === redelivered.collect().toSet)
  }

  test("routeTombstones splits null-value records onto the delete branch") {
    val records = Seq((1, "v1"), (2, null.asInstanceOf[String]), (3, "v3"))
      .toDF("id", "value")
    val (upserts, deletes) = Cdc.routeTombstones(records, "value", Seq("id"))
    assert(upserts.select("id").as[Int].collect().sorted === Array(1, 3))
    assert(deletes.as[Int].collect() === Array(2))
  }

  test("unwrapEnvelope projects after-images and drops deletes") {
    val row = StructType(Seq(
      StructField("id", IntegerType), StructField("username", StringType)))
    val schema = Cdc.envelopeSchema(row)
    val data = Seq(
      Row(null, Row(1, "ann"), "c", 10L), // insert: before null
      Row(Row(1, "ann"), Row(1, "ann2"), "u", 20L), // update
      Row(Row(2, "bob"), null, "d", 30L), // delete: after null
      Row(null, Row(3, "cat"), "r", 40L)) // snapshot read
    val env = spark.createDataFrame(
      spark.sparkContext.parallelize(data), schema)
    val got = Cdc.unwrapEnvelope(env).as[(Int, String)].collect().toSet
    assert(got === Set((1, "ann"), (1, "ann2"), (3, "cat")))
  }

  test("microsToTs: MicroTimestamp long is µs since epoch, UTC") {
    val got = Seq(1700000000123456L).toDF("us")
      .select(Cdc.microsToTs(col("us")).cast("string")).as[String].head()
    assert(got === "2023-11-14 22:13:20.123456")
  }

  test("null created_at stays null through conversion (Avro union default)") {
    val got = Seq[(Int, Option[Long])]((1, None)).toDF("id", "us")
      .select(Cdc.microsToTs(col("us"))).collect()(0)
    assert(got.isNullAt(0))
  }

  test("cdc_order_inversions ≡ driver-side scan of the late-replay stream") {
    val base = Tables.events(spark, TestSpark.tiny)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val stream = base ++ base.filter(_._3 % 97 == 0)
      .map { case (u, t, id) => (u, t, id + 1000000000L) }
    val want = stream.groupBy(_._1).view.mapValues { es =>
      val ord = es.sortBy(_._3).map(_._2)
      val inv = ord.zip(ord.tail).filter { case (a, b) => b < a }
      (es.size.toLong, inv.size.toLong,
        if (inv.isEmpty) 0L else inv.map { case (a, b) => a - b }.max)
    }.toMap
    val got = Cdc.orderInversions.run(spark, TestSpark.tiny)
      .select("user_id", "n_events", "n_inversions", "max_backstep_us")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === want)
    // the synthesized late replays must produce real inversions
    assert(want.values.exists(_._2 > 0L))
  }
}

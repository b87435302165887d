package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Cdc

/** Property tests (SURVEY.md §5.1): CDC invariants over arbitrary
  * changelogs, checked against a driver-side reference model. */
object CdcProperties extends Properties("Cdc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15) // each case runs Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // changelog rows: (key, payload-or-null, offset); offsets unique
  private val changelogGen: Gen[List[(Int, Option[String], Long)]] = for {
    n <- Gen.choose(0, 25)
    keys <- Gen.listOfN(n, Gen.choose(1, 5))
    vals <- Gen.listOfN(n, Gen.option(Gen.alphaStr.map(_.take(6))))
  } yield keys.zip(vals).zipWithIndex.map { case ((k, v), i) =>
    (k, v, i.toLong)
  }

  private def model(rows: List[(Int, Option[String], Long)]): Map[Int, String] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val latest = rs.maxBy(_._3)
      latest._2.map(k -> _) // tombstone at head ⇒ key absent
    }

  private def run(rows: List[(Int, Option[String], Long)]): Map[Int, String] = {
    val df = rows.map { case (k, v, o) => (k, v.orNull, o) }
      .toDF("id", "payload", "offset")
    Cdc.materialize(df, Seq("id"), Seq(col("offset")),
        isTombstone = col("payload").isNull)
      .select("id", "payload").as[(Int, String)].collect().toMap
  }

  property("materialize == latest-non-tombstone-per-key model") =
    forAll(changelogGen) { rows => run(rows) == model(rows) }

  property("materialize is idempotent under duplicate delivery") =
    forAll(changelogGen) { rows => run(rows ++ rows) == model(rows) }

  property("materialize is order-insensitive (offset defines the winner)") =
    forAll(changelogGen) { rows => run(rows.reverse) == model(rows) }

  property("microsToTs roundtrips unix_micros for any µs in range") =
    forAll(Gen.choose(-62135596800000000L, 253402300799000000L)) { us =>
      val got = Seq(us).toDF("us")
        .select(unix_micros(Cdc.microsToTs(col("us")))).as[Long].head()
      got == us
    }

  property("shingles yields max(words-2, 0) windows (pre-dedup)") =
    forAll(Gen.listOf(Gen.identifier.map(_.take(4)))) { words =>
      val text = words.mkString(" ")
      val got = Seq(text).toDF("text")
        .select(graft.operators.Dedup.rawShingles(
          org.apache.spark.sql.functions.col("text")))
        .collect()(0).getSeq[String](0).size
      // same tokenization the operator uses: split(trim(text), " ")
      val wc = text.trim match {
        case "" => 1 // split of "" yields [""]
        case t  => t.split(" ", -1).length
      }
      got == math.max(wc - 2, 0)
    }

  property("routeTombstones partitions the changelog exactly") =
    forAll(changelogGen) { rows =>
      val df = rows.map { case (k, v, o) => (k, v.orNull, o) }
        .toDF("id", "payload", "offset")
      val (ups, dels) = Cdc.routeTombstones(df, "payload", Seq("id"))
      ups.count() + dels.count() == rows.size &&
        ups.filter(col("payload").isNull).count() == 0
    }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** hand-built corpus exercising the span-merge edge cases: an exact
    * cross-doc copy, overlapping duplicated windows that must merge into
    * ONE maximal span, a within-doc repeat, and a clean doc */
  private lazy val goldenDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    val run = (1 to 12).map(i => s"tok$i").mkString(" ") // 12-token run
    Seq(
      // doc 1 + 2: the same 12-token run embedded in different prefixes
      (1L, s"alpha beta $run gamma", "en", "srcA", 0L),
      (2L, s"delta $run epsilon zeta", "en", "srcA", 0L),
      // doc 3: the run appears TWICE (within-doc repeat → two spans)
      (3L, s"$run filler1 filler2 filler3 filler4 filler5 filler6 filler7 filler8 filler9 $run", "en", "srcB", 0L),
      // doc 4: unique text, no spans
      (4L, (1 to 20).map(i => s"uniq$i").mkString(" "), "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("span dedup merges overlapping k-windows into maximal spans " +
    "and counts within-doc repeats") {
    val out = Curation.spanExact.run(spark, goldenDir)
      .select("doc_id", "n_spans", "dup_tokens", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toMap2
    // a 12-token duplicated run = 5 overlapping 8-windows → ONE span of
    // 12 tokens, wherever it sits
    assert(out(1L) == (1L, 12L, 15L))
    assert(out(2L) == (1L, 12L, 15L))
    // doc 3 holds the run twice, separated by 9 unique fillers (< k
    // apart would merge; 9 ≥ k=8 keeps them apart) → two 12-token spans
    assert(out(3L) == (2L, 24L, 33L))
    assert(out(4L) == (0L, 0L, 20L))
  }

  test("span dedup matches a driver-side brute force on the tiny corpus") {
    val k = Curation.SpanK
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "text").as[(Long, String)].collect()
    val grams = docs.flatMap { case (id, t) =>
      val w = t.trim.split(" ")
      (0 to w.length - k).map(i => (id, i + 1, w.slice(i, i + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.length >= 2).keySet
    val expected = docs.map { case (id, t) =>
      val hits = grams.filter(g => g._1 == id && dup(g._3)).map(_._2).sorted
      // interval merge
      val spans = hits.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p <= e + 1 => (s, math.max(e, p + k - 1)) :: rest
        case (acc, p) => (p, p + k - 1) :: acc
      }
      id -> ((spans.size.toLong, spans.map(s => s._2 - s._1 + 1).sum.toLong,
        t.trim.split(" ").length.toLong))
    }.toMap
    val got = Curation.spanExact.run(spark, TestSpark.tiny)
      .select("doc_id", "n_spans", "dup_tokens", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(got === expected)
  }

  test("boilerplate coverage is source-scoped: the same 3-gram in two " +
    "docs of DIFFERENT sources is not boilerplate") {
    val dir = java.nio.file.Files.createTempDirectory("curation_bp").toString
    Seq(
      (1L, "header line one body x1 y1 z1", "en", "srcA", 0L),
      (2L, "header line one body x2 y2 z2", "en", "srcA", 0L),
      (3L, "header line one body x3 y3 z3", "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.boilerplate.run(spark, dir)
      .select("doc_id", "bp_tokens", "n_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // "header line one body" = 4 tokens covered by shared 3-grams in
    // srcA's two docs; srcB's lone doc shares text only cross-source
    assert(out(1L) == (4L, 7L))
    assert(out(2L) == (4L, 7L))
    assert(out(3L) == (0L, 7L))
  }

  test("semantic dedup matches the greedy-by-id rule brute-forced over " +
    "within-bucket cosine pairs") {
    val out = Curation.semantic.run(spark, TestSpark.tiny)
      .select("vec_id", "bucket", "keep")
      .as[(Long, Long, Boolean)].collect()
    val byBucket = Tables.embeddings(spark, TestSpark.tiny)
      .select(col("vec_id"),
        graft.operators.Similarity.lshSignature(col("embedding"), Curation.SemBits)
          .as("bucket"), col("embedding"))
      .as[(Long, Long, Seq[Float])].collect()
      .groupBy(_._2)
    // same sequential-fold arithmetic as the dot expression: float
    // elements widened one at a time, index order
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def fold(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p.toDouble * q.toDouble }
      fold(a, b) / (math.sqrt(fold(a, a)) * math.sqrt(fold(b, b)))
    }
    val expectedRemoved = byBucket.values.flatMap { vs =>
      for {
        (b, _, eb) <- vs
        if vs.exists { case (a, _, ea) => a < b && cos(ea, eb) >= Curation.SemThreshold }
      } yield b
    }.toSet
    assert(out.map(_._1).toSet === byBucket.values.flatten.map(_._1).toSet)
    assert(out.filter(r => !r._3).map(_._1).toSet === expectedRemoved)
    // bucket assignment in the output matches the signature expression
    val sigMap = byBucket.values.flatten.map(v => v._1 -> v._2).toMap
    assert(out.forall(r => sigMap(r._1) == r._2))
  }

  test("bpe merge candidates count adjacent character pairs per occurrence") {
    val dir = java.nio.file.Files.createTempDirectory("curation_bpe").toString
    Seq((1L, "abab ab", "en", "srcA", 0L), (2L, "ba x", "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.bpeMerges.run(spark, dir)
      .select("pair", "cnt", "rank").as[(String, Long, Long)].collect()
    // "abab": ab, ba, ab; "ab": ab; "ba": ba; "x": none → ab=3, ba=2
    assert(out.toList === List(("ab", 3L, 1L), ("ba", 2L, 2L)))
  }

  test("dedup inflation reconciles with the exact and component queries") {
    val perSource = Curation.dupInflation.run(spark, TestSpark.tiny)
      .select("source", "n_docs", "n_removed", "tokens_total", "tokens_removed")
      .as[(String, Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val exdupRemoved = docs.groupBy(_._3.trim.toLowerCase)
      .values.flatMap(g => g.map(_._1).sorted.drop(1)).toSet
    val ccRemoved = graft.operators.Dedup.components.run(spark, TestSpark.tiny)
      .select("id", "rep_id").as[(Long, Long)].collect()
      .filter(r => r._1 != r._2).map(_._1).toSet
    val removed = exdupRemoved ++ ccRemoved
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val rm = g.filter(d => removed(d._1))
      src -> ((g.length.toLong, rm.length.toLong,
        g.map(_._3.trim.split(" ").length.toLong).sum,
        rm.map(_._3.trim.split(" ").length.toLong).sum))
    }
    assert(perSource.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap === expected)
    // the report must see a non-trivial corpus: every source present
    assert(perSource.map(_._1).toSet === docs.map(_._2).toSet)
  }

  test("pack delta matches a driver-side two-pack diff on the tiny " +
    "corpus; the prefix before the first edit never appears") {
    val docs = Tables.documents(spark, TestSpark.tiny)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    def qualityBad(t: String): Boolean = {
      if (t == null) return false
      val ws = t.trim.split(" ", -1)
      !(ws.length >= 20 && ws.length <= 80 &&
        ws.distinct.length.toDouble / ws.length >= 0.3)
    }
    def pack(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long)] = {
      var cum = 0L
      val out = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
      for ((id, t) <- corpus if id % 50 != 0 && !qualityBad(t)) {
        val n = t.trim.split(" ", -1).length.toLong
        val prev = cum; cum += n
        out(id) = (n, prev / 2048, (cum - 1) / 2048, prev % 2048)
      }
      out.toMap
    }
    def edit(t: String, id: Long): String = {
      val tr = t.trim
      if (id % 14 == 3) tr.split(" ", -1).take(15).mkString(" ")
      else tr + " " + tr
    }
    val post = docs.map { case (id, t) =>
      (id, if (id % 7 == 3) edit(t, id) else t)
    }
    val oldP = pack(docs.toSeq); val newP = pack(post.toSeq)
    val expected = (oldP.keySet ++ newP.keySet).flatMap { id =>
      (oldP.get(id), newP.get(id)) match {
        case (Some(_), None) => Some(id -> "removed")
        case (None, Some(_)) => Some(id -> "added")
        case (Some(o), Some(n)) if o != n => Some(id -> "moved")
        case _ => None
      }
    }.toMap
    val got = Curation.packDelta.run(spark, TestSpark.tiny)
      .select("doc_id", "change").as[(Long, String)].collect()
    assert(got.map(r => r._1 -> r._2).toMap === expected)
    assert(got.nonEmpty)
    // prefix stability: nothing before the first edited doc id moves
    val firstEdit = docs.map(_._1).filter(_ % 7 == 3).min
    assert(got.forall(_._1 >= firstEdit))
    // both membership-flip directions present on the tiny corpus
    assert(got.map(_._2).toSet.contains("moved"))
  }

  test("curation plans: no cartesian/BNL, island windows partitioned by doc") {
    // curation_token_budget cross-attaches the one-row corpus budget —
    // the documented bounded scalar-attach BNL exemption (PlanShapeSpec
    // q70 / text_perplexity precedent)
    for (q <- Curation.all if q.name != "curation_token_budget") {
      val plan = q.run(spark, TestSpark.tiny).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"${q.name} plans a BNL:\n$plan")
    }
  }

  private implicit class Tup4Map(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}

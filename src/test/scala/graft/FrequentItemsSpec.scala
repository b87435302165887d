package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FrequentItems

class FrequentItemsSpec extends AnyFunSuite {

  test("exact regime: capacity above distinct count gives exact counts") {
    val agg = new FrequentItems(100)
    val stream = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq("a" -> 5L, "b" -> 3L, "c" -> 2L))
  }

  test("approximate regime: undercount bounded by N/capacity, heavy hitter survives") {
    val agg = new FrequentItems(4)
    val n = 1000
    // one item with 40% frequency among many singletons
    val stream = scala.util.Random.shuffle(
      Seq.fill(400)("hot") ++ (1 to 600).map(i => s"rare_$i"))
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf).toMap
    assert(out.contains("hot"))
    assert(out("hot") >= 400L - n / 4 && out("hot") <= 400L)
  }

  test("merge sums partial buffers and trims deterministically") {
    val agg = new FrequentItems(2)
    val b1 = Seq("a", "a", "b").foldLeft(agg.zero)(agg.reduce)
    val b2 = Seq("a", "c", "c", "c").foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(b1, b2))
    assert(merged.map(_._1) === Seq("a", "c")) // top-2 by (count, item)
    assert(merged.head === ("a" -> 3L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-diagnosis threshold: a query is `suspect` when its
  * FINAL (post-redo) time exceeds 3x its recorded prior AND 0.5s
  * absolute — the r11 q108 shape (12.87s vs a 0.17s prior under
  * sustained box contention) must flag; sub-second jitter and
  * queries without a prior must not. */
class BenchSpec extends AnyFunSuite {
  test("suspects flags >3x-prior over 0.5s, sorted; ignores jitter and new queries") {
    val prior = Map(
      "q108" -> 0.17, // the r11 contention victim
      "q_jitter" -> 0.05, // 10x but sub-0.5s absolute: jitter-class
      "q_slow" -> 4.0, // big but within 3x
      "q_edge" -> 0.2) // exactly 3x: not strict-greater
    val results = Seq(
      "q_new" -> 9.9, // no prior: never suspect
      "q108" -> 12.87,
      "q_jitter" -> 0.49,
      "q_slow" -> 11.9,
      "q_edge" -> 0.6,
      "a_also" -> 2.0)
    assert(Bench.suspects(results, prior) === Seq("q108"))
    assert(Bench.suspects(results :+ ("a_also2" -> 2.0),
      prior + ("a_also2" -> 0.1) + ("a_also" -> 0.1)) ===
      Seq("a_also", "a_also2", "q108"))
    assert(Bench.suspects(Nil, prior) === Nil)
    assert(Bench.suspects(results, Map.empty) === Nil)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Relational2, Relational3, Relational4, Relational5, Relational6, TextAnalysis3}

/** Plan-shape regression net over the relational surface: the scale
  * properties the engine promises must stay visible in the physical
  * plans, not just hold by accident.
  *
  * - No CartesianProduct anywhere.
  * - BroadcastNestedLoopJoin only where a one-row aggregate is attached
  *   (scalar attach — bounded by definition) — currently no relational
  *   query needs even that.
  * - Spot shapes: q02's filter reaches the parquet scan (PushedFilters),
  *   q08 plans the two-phase WindowGroupLimit, q41 plans
  *   TakeOrderedAndProject (k-row driver merge, no global sort).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val allRelational =
    // q10 attaches the one-row global n for the in-plan NTILE arithmetic
    // (r16 — removed the separate count() action) — the same one-row
    // scalar-attach exemption as q62/q70 below
    Relational.all.filterNot(_.name == "q10_rank_family") ++
      Relational2.all ++ Relational3.all ++ Relational4.all ++
      // q62 attaches the 1-row global exact-distinct to the 1-row
      // unioned-states estimate — the same one-row scalar-attach
      // exemption as q70 below
      Relational5.all.filterNot(_.name == "q62_hll_union") ++
      graft.operators.EventAnalytics.all ++
      // one-row broadcast scalar attaches (bounded by definition) are the
      // documented BNL exemption: q70's max side, perplexity's vocab size
      Relational6.all.filterNot(_.name == "q70_exchange_reuse") ++
      graft.operators.Relational7.all ++
      graft.operators.Relational8.all ++
      graft.operators.EventAnalytics2.all ++
      // cdc_gap_audit/cdc_freshness/text_length_filter attach one-row
      // aggregates (max id / head ts / percentile bounds) — the same
      // documented exemption
      graft.operators.Scd.all.filterNot(q =>
        Set("cdc_gap_audit", "cdc_freshness")(q.name)) ++
      TextAnalysis3.all.filterNot(_.name == "text_perplexity") ++
      // text_mixture_sample cross-attaches the one-row (Σk, target)
      // aggregate — the same bounded scalar-attach exemption
      graft.operators.TextAnalysis4.all.filterNot(q =>
        Set("text_length_filter", "text_mixture_sample")(q.name)) ++
      graft.operators.EventAnalytics3.all ++
      graft.operators.EventAnalytics4.all ++
      // kneser_ney/burstiness attach one-row aggregates (bigram type
      // count T / corpus doc count N) — the documented exemption
      graft.operators.TextAnalysis7.all.filterNot(q =>
        Set("text_kneser_ney", "text_burstiness")(q.name)) ++
      graft.operators.Multimodal3.all

  test("no relational query plans a cartesian product or BNL") {
    for (q <- allRelational) {
      val plan = q.run(spark, TestSpark.tiny)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"${q.name} plans a BNL:\n$plan")
    }
    // the scalar-attach exemptions above are BNL-only: those queries
    // must still never plan a true cartesian (r16 ADVICE — q10 had
    // silently left both nets when only the BNL needed exempting)
    for (q <- Relational.q10RankFamily +:
        (Relational5.all ++ Relational6.all)) {
      val plan = q.run(spark, TestSpark.tiny)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian:\n$plan")
    }
  }

  test("q02 filter is pushed to the parquet scan") {
    val formatted = Relational.q02FilterProject.run(spark, TestSpark.tiny)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: ["), formatted)
    assert(formatted.matches("(?s).*PushedFilters: \\[[^\\]].*"),
      s"empty pushdown:\n$formatted")
  }

  test("q08 top-k per group plans WindowGroupLimit") {
    val plan = Relational.q08TopkPerGroup.run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q70 dedupes the shared aggregation's exchange (ReuseExchange)") {
    val df = Relational6.q70ExchangeReuse.run(spark, TestSpark.tiny)
    df.collect() // AQE finalizes reuse at execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"aggregation exchange not reused:\n$plan")
  }

  test("q84 bucketed join is exchange-free on both join inputs") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    // disable broadcast so the join must use the bucketed layout
    spark.conf.set(key, "-1")
    try {
      val df = graft.operators.Relational8.q84BucketedJoin
        .run(spark, TestSpark.tiny)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the only shuffle is the 5-row post-join aggregation (+ the
      // ordered output); the join itself reads buckets directly
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join still shuffles its inputs:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("q79 sessionization hash-shuffles on user_id exactly once") {
    // LAG break-marking and running-SUM numbering both partition by
    // user_id — the doc promises one exchange feeds both windows
    val plan = graft.operators.EventAnalytics2.q79GapsIslands
      .run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    val hashShuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashShuffles == 1,
      s"expected 1 hash exchange (user_id), got $hashShuffles:\n$plan")
  }

  test("scd2 history hash-shuffles on the key exactly once") {
    val plan = graft.operators.Scd.scd2History
      .run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    val hashShuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashShuffles == 1,
      s"expected 1 hash exchange (user_id), got $hashShuffles:\n$plan")
  }

  test("q10/text_vocab_growth plan no single-partition window exchange") {
    // the r04 scale finding: `Window.orderBy` (no partition key) plans
    // Exchange SinglePartition → Window, serializing the corpus onto one
    // task. Both queries now use the two-pass range-partitioned shape
    // (ScalableWindows); any single-partition exchange creeping back in
    // is a regression. (The final presentation orderBy plans a RANGE
    // exchange — parallel — so a blanket assert is safe.)
    for (q <- Seq(Relational.q10RankFamily,
        graft.operators.TextAnalysis4.vocabGrowth,
        // r13: the packing map's global running token sum must also
        // ride the two-pass shape, not a single-task window
        graft.operators.Curation.packBins)) {
      val exec = q.run(spark, TestSpark.tiny)
        .queryExecution.executedPlan
      // r16: ScalableWindows' per-partition offset fold moved from a
      // separate driver collect action into an IN-PLAN window over the
      // ≤`parts`-row totals (bounded by construction), so exactly that
      // window's exchange is allowed; any OTHER single-partition
      // exchange is still the corpus-serializing regression this test
      // exists to catch. r17 (r16 ADVICE): the exemption walks the plan
      // TREE — the exchange's direct (codegen-unwrapped) child must BE
      // the `__pid`-keyed totals partial aggregate or a partial GLOBAL
      // aggregate (keys=[]) — instead of string-matching nearby explain
      // lines, which an unrelated sibling line could satisfy.
      import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      def unwrap(p: SparkPlan): SparkPlan = p match {
        case w: WholeStageCodegenExec => unwrap(w.child)
        case i: InputAdapter => unwrap(i.child)
        case other => other
      }
      def boundedTotalsAgg(p: SparkPlan): Boolean = unwrap(p) match {
        case a: BaseAggregateExec =>
          a.groupingExpressions.isEmpty ||
            a.groupingExpressions.forall(
              _.references.forall(_.name == "__pid"))
        case _ => false
      }
      // AdaptiveSparkPlanExec is a LEAF node — collect over it alone
      // sees nothing; walk its initial plan (inputPlan predates
      // EnsureRequirements and carries no exchanges at all)
      val roots = exec.collect {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.initialPlan
      } match { case Seq() => Seq(exec); case rs => rs }
      val singleParts = roots.flatMap(_.collect {
        case ex: ShuffleExchangeExec
            if ex.outputPartitioning.numPartitions == 1 => ex
      })
      // non-vacuity: q10's two-pass ranks guarantee at least one bounded
      // offsets exchange — if the walk stops seeing it, the net is blind
      if (q.name == "q10_rank_family")
        assert(singleParts.nonEmpty,
          "plan walk found no single-partition exchange in q10 — vacuous net")
      val offending = singleParts.filterNot(ex => boundedTotalsAgg(ex.child))
      assert(offending.isEmpty,
        s"${q.name} plans a single-partition exchange (not the bounded " +
          s"__pid-totals offsets window):\n$exec")
    }
  }

  test("q41 global top-k plans TakeOrderedAndProject") {
    val plan = Relational3.q41GlobalTopk.run(spark, TestSpark.tiny)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rollup/cube/grouping-sets plan ONE Expand pass, no union of " +
    "re-aggregations; q157 top-50 plans TakeOrderedAndProject") {
    for (q <- graft.operators.Relational13.all) {
      val df = q.run(spark, TestSpark.tiny)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Expand"),
        s"${q.name} lost the Expand grouping-analytics shape:\n$plan")
      assert(!plan.contains("Union"),
        s"${q.name} plans a union of re-aggregations:\n$plan")
    }
    val lp = graft.operators.GraphAnalytics.q157LinkPrediction
      .run(spark, TestSpark.tiny).queryExecution.executedPlan.toString
    assert(lp.contains("TakeOrderedAndProject"), lp)
  }

  test("text_bpe_merges top-30 plans TakeOrderedAndProject, no window") {
    // the r05 `weak`: a global rank window over the pair vocabulary is a
    // single task holding 10⁷⁺ rows on a multilingual corpus. The fixed
    // plan is per-partition top-k + 30-row rank recovery — zero WindowExec.
    val df = graft.operators.Curation.bpeMerges.run(spark, TestSpark.tiny)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"bpe_merges still plans a window:\n$plan")
  }

  test("sim_hamming_rerank bounds both stages with WindowGroupLimit") {
    // the shortlist and the rerank are both rank-filtered windows; if
    // either loses the WindowGroupLimit rewrite, a corpus-sized window
    // buffer materializes per query partition
    val plan = graft.operators.Similarity4.hammingRerank
      .run(spark, TestSpark.tiny).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("mm_jpeg_segments / mm_mp4_boxes are pure map-side walks (no " +
    "join, no hash shuffle — only the presentation sort's exchange)") {
    for (q <- graft.operators.Multimodal3.all) {
      val plan = q.run(spark, TestSpark.tiny)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"${q.name} plans a join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"${q.name} plans a hash shuffle:\n$plan")
    }
  }

  test("q94 maxIntersections shuffles on user_id only (sweep + final agg " +
    "share the partitioning)") {
    val plan = graft.operators.EventAnalytics4.q94MaxIntersections
      .run(spark, TestSpark.tiny).queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    // one shuffle to (user_id, pos, delta) for the collapse feeds the
    // user_id window and final agg; AQE may add at most one more for the
    // user_id regroup — anything beyond that means the sweep re-shuffles
    assert(hashExchanges <= 2, s"q94 plans $hashExchanges hash shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("unpartitioned windows appear only in documented bounded queries") {
    // Registry-wide net for the q10-class regression: a `Window.orderBy`
    // / `Window.partitionBy()` with no partition key serializes its whole
    // input onto one task. The allowed list enumerates the windows whose
    // input is a bounded aggregate (days / months / nations / sources —
    // NOT corpus-sized); any new unpartitioned window elsewhere fails.
    // (Checkpointed subplans collapse to LogicalRDD and are invisible to
    // this walk — the Dedup brute-force-equality specs cover those on
    // output instead.)
    val allowed = Map(
      "q80_ratio_to_report" -> "per-nation rows (25)",
      "q81_cumulative_distinct" -> "per-day rows (~366/yr)",
      "q86_period_over_period" -> "per-month rows (~12/yr)",
      "text_mixture_report" -> "per-(source,lang) cells (bounded)",
      "text_frequent_tokens" -> "Misra-Gries sketch output (≤ capacity 4096 rows)",
      "text_zipf_fit" -> "head-vocabulary rows (≤ 256 after limit)",
      "q124_activity_heatmap" -> "hour×weekday cells (≤ 168 rows)",
      "q134_cusum_changepoint" ->
        "per-event-type offset rows (≤ 5; the corpus-sized prefix sums ride ScalableWindows)",
      "q144_decile_lift" ->
        "score VALUE spine (bounded by distinct per-user view counts) and the ≤ 10-row decile table",
      "q152_pettitt_changepoint" ->
        "per-event-type offset rows (≤ 5; the corpus-sized rank prefix rides ScalableWindows — the q134 pattern)",
      "text_topk_coverage" ->
        "top-1000 types via TakeOrderedAndProject BEFORE the rank window (≤ 1000 rows; the vocabulary never enters a window)")
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for (q <- SparkEntry.registry) {
      val global = q.run(spark, TestSpark.tiny)
        .queryExecution.optimizedPlan.collect {
          // r16 structural exemption: a window ordered SOLELY by `__pid`
          // is ScalableWindows' offsets fold over the ≤`parts`-row
          // per-partition totals (bounded by construction — formerly a
          // separate driver collect action); every other unpartitioned
          // window still needs a per-query entry above.
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty &&
                !(w.orderSpec.nonEmpty && w.orderSpec
                  .flatMap(_.references.toSeq).forall(_.name == "__pid")) => w
        }
      if (global.nonEmpty && !allowed.contains(q.name))
        offenders += q.name
    }
    assert(offenders.isEmpty,
      s"new unpartitioned window(s) in: ${offenders.mkString(", ")} — " +
        "either repartition the window (ScalableWindows) or, if the input " +
        "is a bounded aggregate, add it to the allowed list with a reason")
  }
}

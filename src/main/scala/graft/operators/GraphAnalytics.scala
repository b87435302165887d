package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Graph-analytics tier over the co-purchase graph: parts are nodes,
  * and an edge joins two parts co-ordered in ≥2 distinct orders (the
  * support threshold is the graph-density knob — at 100 TB it is what
  * keeps the edge set candidate-bounded, exactly like the LSH band
  * caps in the dedup tier). Triangle counting / clustering
  * coefficients and a fixed-iteration PageRank, both in exact integer
  * arithmetic so Spark and the oracle agree bit-for-bit:
  * PageRank runs in 10⁻¹² "micro-rank" units with floor division —
  * deterministic regardless of execution order, unlike float masses.
  *
  * 100 TB shape: the base graph is materialized ONCE (localCheckpoint)
  * and reused by every downstream join — the order→pair explosion is
  * bounded by order size (≤C(7,2) per TPC-H order), the triangle join
  * by the thresholded edge list, the PageRank rounds by a fixed
  * iteration count of edge-partitioned shuffles. */
object GraphAnalytics {

  private val SupportThreshold = 2
  /** PageRank unit: ranks are BIGINTs in 10⁻¹² units. */
  private val U = 1000000000000L
  private val Iterations = 5

  // AS MATERIALIZED on both CTEs (r10): DuckDB inlines plain CTEs per
  // REFERENCE, and the unrolled-iteration oracles (q122's it_k chain)
  // reference e/und/deg once per round — without materialization the
  // order-pair self-join re-evaluates per iteration and the sf1 sweep
  // stalled >30 min inside q122 (the sim_pca_power lesson, §6 r07).
  private val EdgeSql =
    s"""op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |       FROM lineitem),
      |e AS MATERIALIZED (
      |  SELECT a.pk AS pa, b.pk AS pb
      |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= $SupportThreshold)""".stripMargin

  /** (pa < pb) support-thresholded edge list — materialized ONCE per
    * (session, corpus) through [[Dedup.sharedMat]] (r08: previously a
    * per-query localCheckpoint, so all four graph queries re-derived
    * the order→pair explosion — ~2–3 s each at sf2; now the first
    * consumer writes the `copurchase_edges` lake table and the rest
    * scan it, the `shingle_postings`/`dedup_pairs` pattern: at 100 TB
    * a co-purchase graph is materialized once per corpus snapshot, not
    * per query). */
  /** Count-annotated co-purchase pair table (pa < pb, c = distinct
    * orders containing both, c ≥ 2) — the r09 factoring: the
    * order→pair explosion is paid ONCE here; [[edges]] is a filtered
    * projection of it and `q116_assoc_rules` reads its counts
    * directly instead of re-running the self-join (4.6 s → a scan at
    * sf2). */
  private[graft] def pairCounts(s: SparkSession, d: String): DataFrame =
    Dedup.sharedMat(s, d, "copurchase_pairs") {
      val op = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      op.as("a")
        .join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= SupportThreshold)
    }

  private[graft] def edges(s: SparkSession, d: String): DataFrame =
    Dedup.sharedMat(s, d, "copurchase_edges") {
      pairCounts(s, d).select("pa", "pb")
    }

  /** Triangle census: per node its degree, the number of triangles it
    * participates in, and the local clustering coefficient
    * 2T/(deg·(deg−1)) — the "how clique-ish is this part's
    * neighborhood" number.
    *
    * Enumeration is DEGREE-ORDERED (the standard hub-skew hardening,
    * r07 advice): every edge is oriented low-degree → high-degree
    * (ties by id), wedges pivot at each triangle's minimum-(degree,id)
    * corner, and the closing edge — necessarily oriented the same way
    * by transitivity of the total order — is probed in the oriented
    * list. Per-pivot fan-out is then bounded by the oriented
    * out-degree (O(√m) worst case, arboricity-bounded on real graphs)
    * instead of the raw hub degree, so wedge volume is Σ outdeg² —
    * immune to the Σ deg² blowup a co-purchase hub node causes under
    * id-ordered enumeration. Each triangle is emitted exactly once and
    * credited to all three corners; the oracle keeps the id-ordered
    * a<b<c statement of the same census. */
  val q121Triangles: Q = Q(
    "q121_triangles",
    s"""WITH $EdgeSql,
      |und AS (SELECT pa AS x, pb AS y FROM e
      |        UNION ALL SELECT pb, pa FROM e),
      |deg AS (SELECT x AS node, COUNT(*)::BIGINT AS degree
      |        FROM und GROUP BY 1),
      |tri AS (
      |  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      |  FROM e e1 JOIN e e2 ON e2.pa = e1.pb
      |       JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
      |pt AS (
      |  SELECT node, COUNT(*)::BIGINT AS t FROM (
      |    SELECT a AS node FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY 1)
      |SELECT deg.node, deg.degree,
      |  COALESCE(pt.t, 0)::BIGINT AS n_triangles,
      |  CASE WHEN deg.degree >= 2 THEN
      |    2.0::DOUBLE * CAST(COALESCE(pt.t, 0) AS DOUBLE)
      |      / (CAST(deg.degree AS DOUBLE)
      |         * (CAST(deg.degree AS DOUBLE) - 1.0::DOUBLE))
      |  ELSE 0.0::DOUBLE END AS clustering
      |FROM deg LEFT JOIN pt ON pt.node = deg.node
      |ORDER BY deg.node""".stripMargin) { (s, d) =>
    val e = edges(s, d)
    val und = e.select(col("pa").as("x"), col("pb").as("y"))
      .unionByName(e.select(col("pb").as("x"), col("pa").as("y")))
    val deg = und.groupBy(col("x").as("node"))
      .agg(count(lit(1)).as("degree"))
    // orient low-degree → high-degree (ties: pa < pb already); carry
    // the destination's degree so the wedge self-join can order the
    // two out-neighbors by the same total order it oriented with
    val ew = e
      .join(deg.select(col("node").as("pa"), col("degree").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("degree").as("db")), "pb")
    val fwd = col("da") <= col("db")
    val oe = ew.select(
      when(fwd, col("pa")).otherwise(col("pb")).as("src"),
      when(fwd, col("pb")).otherwise(col("pa")).as("dst"),
      when(fwd, col("db")).otherwise(col("da")).as("ddeg"))
      .localCheckpoint()
    val tri = oe.as("w1")
      .join(oe.as("w2"),
        col("w2.src") === col("w1.src") &&
          (col("w1.ddeg") < col("w2.ddeg") ||
            (col("w1.ddeg") === col("w2.ddeg") &&
              col("w1.dst") < col("w2.dst"))))
      .join(oe.as("e3"),
        col("e3.src") === col("w1.dst") && col("e3.dst") === col("w2.dst"))
      .select(col("w1.src").as("a"), col("w1.dst").as("b"),
        col("w2.dst").as("c"))
    val pt = tri.select(col("a").as("node"))
      .unionByName(tri.select(col("b").as("node")))
      .unionByName(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("t"))
    val degD = col("degree").cast("double")
    deg.join(pt, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("t"), lit(0L)).cast("double") /
            (degD * (degD - 1.0)))
          .otherwise(0.0).as("clustering"))
      .orderBy("node")
  }

  /** Five-round PageRank (d = 0.85) on the undirected co-purchase
    * graph, entirely in integer micro-rank units: r₀ = U div N, each
    * round r'(u) = (15·U) div (100·N) + Σ_{v∼u} (85·r(v)) div
    * (100·deg(v)). Floor division leaks mass but is identical on both
    * engines, so the result is exact — the conventional float PageRank
    * would be order-dependent under parallel summation. */
  val q122Pagerank: Q = {
    val iterSql = (1 to Iterations).map { k =>
      s"""it$k AS (
         |  SELECT und.y AS node,
         |    (MAX(nn.base) + SUM((85 * p.r) // (100 * dg.degree)))::BIGINT
         |      AS r
         |  FROM it${k - 1} p
         |  JOIN deg dg ON dg.node = p.node
         |  JOIN und ON und.x = p.node
         |  CROSS JOIN nn
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    Q(
      "q122_pagerank",
      s"""WITH $EdgeSql,
        |und AS MATERIALIZED (SELECT pa AS x, pb AS y FROM e
        |        UNION ALL SELECT pb, pa FROM e),
        |deg AS MATERIALIZED (SELECT x AS node, COUNT(*)::BIGINT AS degree
        |        FROM und GROUP BY 1),
        |nn AS MATERIALIZED (SELECT COUNT(*)::BIGINT AS n,
        |         (15 * $U) // (100 * COUNT(*)) AS base FROM deg),
        |it0 AS (
        |  SELECT node, degree, $U // nn.n AS r FROM deg CROSS JOIN nn),
        |$iterSql
        |SELECT it$Iterations.node, deg.degree, it$Iterations.r AS rank_micro,
        |  CAST(it$Iterations.r AS DOUBLE) / 1e12::DOUBLE AS rank
        |FROM it$Iterations JOIN deg ON deg.node = it$Iterations.node
        |ORDER BY it$Iterations.node""".stripMargin) { (s, d) =>
      val e = edges(s, d)
      val und = e.select(col("pa").as("x"), col("pb").as("y"))
        .unionByName(e.select(col("pb").as("x"), col("pa").as("y")))
        .localCheckpoint()
      val deg = und.groupBy(col("x").as("node"))
        .agg(count(lit(1)).as("degree"))
        .localCheckpoint()
      // r17 note: carrying deg(x) ON THE EDGE LIST (one prep join +
      // checkpoint, rounds shed the deg re-join) measured 0.99 → 1.31 s
      // and was reverted — the per-round deg join attaches to the TINY
      // rank relation (broadcast, cheap), while the carried column
      // widened every edge row in all five round scans and the prep
      // join added an eager job. Guide §1.1: measured, kept the winner.
      val nn = broadcast(deg.agg(count(lit(1)).as("n"),
        expr(s"(15 * ${U}L) div (100 * count(1))").as("base")))
      var r = deg.crossJoin(nn)
        .select(col("node"), col("degree"),
          expr(s"${U}L div n").as("r"))
      for (_ <- 1 to Iterations) {
        r = und.join(r, col("x") === col("node"))
          .crossJoin(nn)
          .groupBy(col("y"))
          .agg((max("base") +
            sum(expr("(85 * r) div (100 * degree)"))).as("r"))
          .select(col("y").as("node"), col("r"))
          .join(deg, "node")
          .select(col("node"), col("degree"), col("r"))
      }
      r.select(col("node"), col("degree"), col("r").as("rank_micro"),
        (col("r").cast("double") / 1e12).as("rank"))
        .orderBy("node")
    }
  }

  private val CoreK = 2
  private val PeelRounds = 6

  /** [[CoreK]]-core of the co-purchase graph by [[PeelRounds]] rounds
    * of degree peeling: each round drops nodes whose degree WITHIN the
    * surviving subgraph is < k, the classic k-core algorithm. The
    * round count is FIXED and identical in both engines (the oracle
    * unrolls the same [[PeelRounds]] levels as chained CTEs), so the
    * semantics — "the survivor set after R peels" — is deterministic
    * whether or not the peel has converged; [[graft.GraphSpec]] asserts
    * convergence (round R ≡ round R−1) at the test SFs, and the peel
    * depth of a support-thresholded co-purchase graph grows with the
    * longest degree-cascade, not the corpus.
    *
    * 100 TB shape: R edge-semi-join + hash-agg rounds over the
    * materialized edge list — each round is one shuffle keyed by node,
    * and the surviving edge set only shrinks. Output is each
    * survivor's final in-core degree. */
  val q135Kcore: Q = {
    // every level references its predecessor TWICE (both edge
    // endpoints) — without MATERIALIZED, DuckDB inlines the chain and
    // re-evaluates the whole edge derivation 2^R times
    val lvls = (1 to PeelRounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT x AS node FROM (
         |    SELECT u.x, COUNT(*) AS dg
         |    FROM und u
         |    JOIN l${i - 1} a ON a.node = u.x
         |    JOIN l${i - 1} b ON b.node = u.y
         |    GROUP BY u.x)
         |  WHERE dg >= $CoreK)""".stripMargin
    }.mkString(",\n")
    Q("q135_kcore",
      s"""WITH $EdgeSql,
         |und AS MATERIALIZED (SELECT pa AS x, pb AS y FROM e
         |        UNION ALL SELECT pb, pa FROM e),
         |l0 AS MATERIALIZED (SELECT DISTINCT x AS node FROM und),
         |$lvls
         |SELECT u.x AS node, COUNT(*)::BIGINT AS core_degree
         |FROM und u
         |JOIN l$PeelRounds a ON a.node = u.x
         |JOIN l$PeelRounds b ON b.node = u.y
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val und0 = {
        val e = edges(s, d)
        e.select(col("pa").as("x"), col("pb").as("y"))
          .unionAll(e.select(col("pb").as("x"), col("pa").as("y")))
          .localCheckpoint()
      }
      def peel(survivors: org.apache.spark.sql.DataFrame) = und0
        .join(survivors.as("a"), col("a.node") === col("x"))
        .join(survivors.select(col("node").as("ynode")).as("b"),
          col("b.ynode") === col("y"))
        .groupBy(col("x"))
        .agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= CoreK)
        .select(col("x").as("node"))
      var survivors = und0.select(col("x").as("node")).distinct()
      // r17: checkpoint every SECOND peel instead of every peel — the
      // inner round's aggregate subtree appears twice in the outer
      // round's plan (both join sides), but the copies canonicalize
      // identically so the runtime reuses one exchange; job count per
      // query drops from R+1 to R/2+1 (guide §2.4/§5: the per-round
      // eager materialization was pure scheduling floor)
      for (_ <- 1 to PeelRounds / 2) {
        survivors = peel(peel(survivors)).localCheckpoint()
      }
      for (_ <- 1 to PeelRounds % 2) {
        survivors = peel(survivors).localCheckpoint()
      }
      und0
        .join(survivors.as("a"), col("a.node") === col("x"))
        .join(survivors.select(col("node").as("ynode")).as("b"),
          col("b.ynode") === col("y"))
        .groupBy(col("x").as("node"))
        .agg(count(lit(1)).cast("long").as("core_degree"))
        .orderBy("node")
    }
  }

  /** Modularity of the co-purchase graph against the BRAND partition:
    * for each brand community c, the Newman contribution
    * Q_c = e_c/m − (D_c/2m)² — "are co-purchases concentrated within
    * brands?" — with e_c = intra-brand edges, D_c = endpoint mass, m =
    * |edges|. A partition given by a node ATTRIBUTE needs no iterative
    * community detection, so the whole query is one pass over the
    * materialized edge list plus two broadcast joins against `part` —
    * the assortativity-style audit a recommender team runs before
    * trusting attribute-based candidate generation. Arithmetic is
    * exact: Q_c = (4·m·e_c − D_c²) / 4m², the numerator in
    * DECIMAL(38,0) ≡ HUGEINT (D_c² overflows BIGINT past D_c ≈ 3·10⁹
    * endpoints — the q101 rank-sum lesson), and both engines cast the
    * SAME exact integers to double for the one final division.
    *
    * 100 TB shape: edge list built once (localCheckpoint, shared with
    * the other graph queries' derivation), dimension-table joins
    * broadcast, per-brand output bounded by |brands|. */
  val q146BrandModularity: Q = Q(
    "q146_brand_modularity",
    s"""WITH $EdgeSql,
       |bp AS (SELECT p_partkey AS pk, p_brand AS brand FROM part),
       |eb AS (
       |  SELECT e.pa, e.pb, x.brand AS ba, y.brand AS bb
       |  FROM e JOIN bp x ON x.pk = e.pa JOIN bp y ON y.pk = e.pb),
       |m AS (SELECT COUNT(*)::BIGINT AS m FROM e),
       |deg AS (
       |  SELECT brand, COUNT(*)::BIGINT AS dmass,
       |    COUNT(DISTINCT node)::BIGINT AS n_nodes
       |  FROM (SELECT pa AS node, ba AS brand FROM eb
       |        UNION ALL SELECT pb, bb FROM eb)
       |  GROUP BY 1),
       |intra AS (
       |  SELECT ba AS brand, COUNT(*)::BIGINT AS ec FROM eb
       |  WHERE ba = bb GROUP BY 1)
       |SELECT d.brand, d.n_nodes,
       |  CAST(COALESCE(i.ec, 0) AS BIGINT) AS intra_edges,
       |  d.dmass AS degree_mass,
       |  CAST(CAST(4 AS HUGEINT) * m.m * COALESCE(i.ec, 0)
       |       - CAST(d.dmass AS HUGEINT) * d.dmass AS DOUBLE)
       |    / CAST(CAST(4 AS HUGEINT) * m.m * m.m AS DOUBLE) AS q_contrib
       |FROM deg d LEFT JOIN intra i ON i.brand = d.brand CROSS JOIN m
       |ORDER BY d.brand""".stripMargin) { (s, d) =>
    val e = edges(s, d)
    val bp = part(s, d).select(col("p_partkey").as("pk"),
      col("p_brand").as("brand"))
    val eb = e.join(broadcast(bp).as("x"), col("pa") === col("x.pk"))
      .select(col("pa"), col("pb"), col("x.brand").as("ba"))
      .join(broadcast(bp).as("y"), col("pb") === col("y.pk"))
      .select(col("pa"), col("pb"), col("ba"), col("y.brand").as("bb"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = eb.select(col("pa").as("node"), col("ba").as("brand"))
      .unionAll(eb.select(col("pb").as("node"), col("bb").as("brand")))
      .groupBy("brand")
      .agg(count(lit(1)).as("dmass"), countDistinct("node").as("n_nodes"))
    val intra = eb.filter(col("ba") === col("bb"))
      .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("ec"))
    deg.join(intra, Seq("brand"), "left").crossJoin(broadcast(m))
      .select(col("brand"), col("n_nodes"),
        coalesce(col("ec"), lit(0L)).cast("long").as("intra_edges"),
        col("dmass").as("degree_mass"),
        ((lit(4).cast("decimal(38,0)") * col("m") *
          coalesce(col("ec"), lit(0L)) -
          col("dmass").cast("decimal(38,0)") * col("dmass")).cast("double") /
          (lit(4).cast("decimal(38,0)") * col("m") * col("m")).cast("double"))
          .as("q_contrib"))
      .orderBy("brand")
  }

  /** Common-neighbor link prediction over the co-purchase graph: for
    * every NON-adjacent part pair with a common neighbor, the
    * neighborhood-Jaccard score cn / (deg_a + deg_b − cn); top 50 by
    * (score desc, pa, pb) — the "parts likely to be co-purchased next"
    * recommendation readout. The score is ONE division of exact
    * integers (correctly rounded identically on both engines), so the
    * ORDER BY is cross-engine stable.
    *
    * 100 TB shape: candidate enumeration is the standard wedge join
    * (Σ deg² over the SUPPORT-THRESHOLDED graph — the same density knob
    * that bounds the triangle count), the existing-edge exclusion is a
    * broadcast-able anti join against the thresholded edge list, and
    * the top-50 is TakeOrderedAndProject, never a global sort. The
    * oracle's edge CTE is MATERIALIZED — three consumers would
    * otherwise re-derive the order→pair explosion per reference (the
    * q135 lesson). */
  val q157LinkPrediction: Q = Q(
    "q157_link_prediction",
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |       FROM lineitem),
       |e AS MATERIALIZED (
       |  SELECT a.pk AS pa, b.pk AS pb
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $SupportThreshold),
       |adj AS (SELECT pa AS x, pb AS y FROM e
       |        UNION ALL SELECT pb, pa FROM e),
       |deg AS (SELECT x, COUNT(*)::BIGINT AS dg FROM adj GROUP BY 1),
       |cn AS (
       |  SELECT a.x AS pa, b.x AS pb, COUNT(*)::BIGINT AS cn
       |  FROM adj a JOIN adj b ON a.y = b.y AND a.x < b.x
       |  GROUP BY 1, 2),
       |nc AS (
       |  SELECT cn.pa, cn.pb, cn.cn FROM cn
       |  LEFT JOIN e ON e.pa = cn.pa AND e.pb = cn.pb
       |  WHERE e.pa IS NULL)
       |SELECT nc.pa, nc.pb, nc.cn, da.dg AS deg_a, db.dg AS deg_b,
       |  CAST(nc.cn AS DOUBLE) / CAST(da.dg + db.dg - nc.cn AS DOUBLE)
       |    AS score
       |FROM nc JOIN deg da ON da.x = nc.pa JOIN deg db ON db.x = nc.pb
       |ORDER BY score DESC, nc.pa, nc.pb LIMIT 50""".stripMargin) { (s, d) =>
    val e = edges(s, d)
    val adj = e.select(col("pa").as("x"), col("pb").as("y"))
      .unionAll(e.select(col("pb").as("x"), col("pa").as("y")))
    val deg = adj.groupBy("x").agg(count(lit(1)).as("dg"))
    val cn = adj.as("a").join(adj.as("b"),
        col("a.y") === col("b.y") && col("a.x") < col("b.x"))
      .groupBy(col("a.x").as("pa"), col("b.x").as("pb"))
      .agg(count(lit(1)).as("cn"))
    val nc = cn.join(e, Seq("pa", "pb"), "left_anti")
    nc.join(broadcast(deg.select(col("x").as("pa"), col("dg").as("deg_a"))),
        "pa")
      .join(broadcast(deg.select(col("x").as("pb"), col("dg").as("deg_b"))),
        "pb")
      .select(col("pa"), col("pb"), col("cn"), col("deg_a"), col("deg_b"),
        (col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn")).cast("double"))
          .as("score"))
      .orderBy(col("score").desc, col("pa"), col("pb"))
      .limit(50)
  }

  val all: Seq[Q] = Seq(q121Triangles, q122Pagerank, q135Kcore,
    q146BrandModularity, q157LinkPrediction)
}

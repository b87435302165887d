package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.functions.VectorFunctions

/** Tenth similarity batch: the FILTERED-ANN probe-depth tuning report —
  * `sim_ivf_tuning` with a selectivity axis. `sim_filtered_ivf`
  * composes the metadata predicate into the candidate relation before
  * the rank window; this table measures what that composition COSTS in
  * probe depth: a filter of selectivity 1/m prunes ~(m−1)/m of every
  * probed cell, so the in-category candidate pool shrinks m× and the
  * probe depth that saturated recall unfiltered no longer does — the
  * exact failure mode a filtered vector store hits on rare labels.
  * Reference scope: the ClickHouse side of `/root/reference/main.py:12-55`
  * owns arbitrary OLAP SQL over the replicated tables; this is the
  * index-tuning member of the extension surface (SURVEY §2.5 X2). */
object Similarity10 {

  private val EmbDim = 64
  /** Selectivity knob: the predicate `n_id % m = q_id % m` keeps ~1/m
    * of the corpus — deterministic in both engines and independent of
    * the (few, roughly uniform) label values, so the table sweeps
    * selectivities down to 1% that real labels don't expose. */
  private val Sels = Seq(2, 10, 100)
  private val Probes = Seq(1, 2, 4, 8, 16)
  /** Max probe depth = 2^IvfBits — the deepest prefix probes EVERY
    * cell, so its recall row must read 1.0 (a built-in sanity row:
    * at full depth the filtered IVF is the brute filtered scan). */
  private val MaxProbe = 16

  /** (selectivity × nProbe) decision table for the filtered IVF tier:
    * for each filter modulus m ∈ {2, 10, 100} and probe depth
    * p ∈ {1, 2, 4, 8, 16}, the in-category candidate volume and the
    * recall of the p-probe filtered top-k against the exact brute
    * filtered top-k. The whole 15-row sweep costs ONE corpus join at
    * the maximum probe depth ([[Similarity.ivfCandidates]] tags every
    * candidate with its cell's probe rank; each (m, p) answer is a
    * predicate + `prank ≤ p` prefix of that single relation) plus ONE
    * brute pass for the exact baselines. The recall denominator is the
    * per-m exact-result count, NOT |Q|·k — a 1%-selectivity filter can
    * leave fewer than k true mates, and a denominator that ignores
    * that undercounts recall exactly where the table matters most.
    * Deterministic end-to-end (sign-matrix quantizer, fold-double
    * cosine, fixed tiebreaks) → full hash oracle.
    *
    * 100 TB shape: the corpus is touched twice (candidates, brute
    * baseline — the baseline is the audit's point; production serves
    * from the candidate side alone), everything downstream is
    * (|Q| · n/2^bits · maxProbe)-bounded, and the report is 15 rows. */
  val filteredTuning: Q = {
    val bits = Similarity.IvfBits
    val projCols = (0 until bits)
      .map(b => s"${Similarity.duckProj(Similarity.IvfPlaneBase + b)} AS proj_$b")
      .mkString(",\n    ")
    val cellExpr = (0 until bits)
      .map(b => s"(CASE WHEN proj_$b >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $b)")
      .mkString(" | ")
    val penaltyExpr = (0 until bits)
      .map(b => s"(CASE WHEN ((q.q_cell >> $b) & 1) <> ((c.cell >> $b) & 1) THEN ABS(q.proj_$b) ELSE 0.0 END)")
      .mkString(" + ")
    val projNames = (0 until bits).map(b => s"proj_$b").mkString(", ")
    Q(
      "sim_filtered_tuning",
      s"""WITH proj AS (
         |  SELECT vec_id, embedding,
         |    $projCols
         |  FROM embeddings),
         |sig AS (SELECT vec_id, embedding, $cellExpr AS cell, $projNames
         |        FROM proj),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS qe, cell AS q_cell, $projNames
         |  FROM sig WHERE vec_id < ${Similarity.NumQueries}),
         |probes AS (
         |  SELECT q_id, qe, cell, prank FROM (
         |    SELECT q.q_id, q.qe, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id
         |        ORDER BY $penaltyExpr, c.cell) AS prank
         |    FROM q CROSS JOIN
         |      (SELECT UNNEST(RANGE(0, ${1 << bits})) AS cell) c)
         |  WHERE prank <= $MaxProbe),
         |cand AS (
         |  SELECT p.q_id, p.prank, s.vec_id AS n_id,
         |    ${VectorFunctions.duckCosine("p.qe", "s.embedding", EmbDim)} AS sim
         |  FROM probes p JOIN sig s ON s.cell = p.cell AND s.vec_id <> p.q_id),
         |ms AS (SELECT UNNEST(ARRAY[${Sels.mkString(", ")}]) AS m),
         |ps AS (SELECT UNNEST(ARRAY[${Probes.mkString(", ")}]) AS nprobe),
         |fc AS (
         |  SELECT ms.m, c.q_id, c.prank, c.n_id, c.sim
         |  FROM cand c JOIN ms ON (c.n_id % ms.m) = (c.q_id % ms.m)),
         |pc AS (
         |  SELECT ps.nprobe, f.m, f.q_id, f.n_id, f.sim
         |  FROM fc f JOIN ps ON f.prank <= ps.nprobe),
         |topk AS (
         |  SELECT m, nprobe, q_id, n_id FROM (
         |    SELECT m, nprobe, q_id, n_id,
         |      ROW_NUMBER() OVER (PARTITION BY m, nprobe, q_id
         |        ORDER BY sim DESC, n_id) AS rank
         |    FROM pc)
         |  WHERE rank <= ${Similarity.K}),
         |exactk AS (
         |  SELECT m, q_id, n_id FROM (
         |    SELECT ms.m, q.q_id, c.vec_id AS n_id,
         |      ROW_NUMBER() OVER (PARTITION BY ms.m, q.q_id
         |        ORDER BY ${VectorFunctions.duckCosine(
                  "q.qe", "c.embedding", EmbDim)} DESC, c.vec_id) AS rnk
         |    FROM q JOIN embeddings c ON c.vec_id <> q.q_id
         |    JOIN ms ON (c.vec_id % ms.m) = (q.q_id % ms.m))
         |  WHERE rnk <= ${Similarity.K}),
         |counts AS (SELECT m, nprobe, COUNT(*)::BIGINT AS n_cand
         |           FROM pc GROUP BY 1, 2),
         |nexact AS (SELECT m, COUNT(*)::BIGINT AS n_exact
         |           FROM exactk GROUP BY 1),
         |hits AS (
         |  SELECT t.m, t.nprobe, COUNT(*)::BIGINT AS n_matched
         |  FROM topk t JOIN exactk e
         |    ON e.m = t.m AND e.q_id = t.q_id AND e.n_id = t.n_id
         |  GROUP BY 1, 2),
         |grid AS (SELECT ms.m, ps.nprobe FROM ms CROSS JOIN ps)
         |SELECT CAST(g.m AS BIGINT) AS sel_mod,
         |  CAST(g.nprobe AS BIGINT) AS nprobe,
         |  CAST(COALESCE(c.n_cand, 0) AS BIGINT) AS n_cand,
         |  x.n_exact,
         |  CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
         |  CAST(COALESCE(h.n_matched, 0) AS DOUBLE)
         |    / CAST(x.n_exact AS DOUBLE) AS recall
         |FROM grid g
         |LEFT JOIN counts c ON c.m = g.m AND c.nprobe = g.nprobe
         |LEFT JOIN hits h ON h.m = g.m AND h.nprobe = g.nprobe
         |LEFT JOIN nexact x ON x.m = g.m
         |ORDER BY sel_mod, nprobe""".stripMargin) { (s, d) =>
      import s.implicits._
      val cand = Similarity.ivfCandidates(embeddings(s, d),
        Similarity.NumQueries, bits, MaxProbe)
        .localCheckpoint(true) // ONE max-depth corpus join feeds all 15 rows
      val mExpl = explode(array(Sels.map(m => lit(m)): _*)).as("m")
      val fc = cand
        .select(col("q_id"), col("prank"), col("n_id"), col("sim"), mExpl)
        .filter(col("n_id") % col("m") === col("q_id") % col("m"))
      val pExpl = explode(array(Probes.map(p => lit(p)): _*)).as("nprobe")
      val pc = fc
        .select(col("m"), col("q_id"), col("prank"), col("n_id"), col("sim"),
          pExpl)
        .filter(col("prank") <= col("nprobe"))
      val wr = Window.partitionBy("m", "nprobe", "q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val topk = pc
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= Similarity.K)
        .select("m", "nprobe", "q_id", "n_id")
      val counts = pc.groupBy("m", "nprobe").agg(count(lit(1)).as("n_cand"))
      // exact brute filtered baseline: one broadcast-queries corpus pass
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
        VectorFunctions.norm(col("embedding")).as("nrm"))
      val q = e.filter(col("vec_id") < Similarity.NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val we = Window.partitionBy("m", "q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val exactk = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          (VectorFunctions.dot(col("q_emb"), col("embedding")) /
            (col("q_nrm") * col("nrm"))).as("sim"), mExpl)
        .filter(col("n_id") % col("m") === col("q_id") % col("m"))
        .withColumn("rnk", row_number().over(we))
        .filter(col("rnk") <= Similarity.K)
        .select("m", "q_id", "n_id")
        .localCheckpoint(true) // ≤ |Sels|·|Q|·k rows; two consumers
      val nexact = exactk.groupBy("m").agg(count(lit(1)).as("n_exact"))
      val hits = topk.join(exactk, Seq("m", "q_id", "n_id"))
        .groupBy("m", "nprobe").agg(count(lit(1)).as("n_matched"))
      val grid = Sels.flatMap(m => Probes.map(p => (m, p)))
        .toDF("m", "nprobe")
      grid
        .join(counts, Seq("m", "nprobe"), "left")
        .join(hits, Seq("m", "nprobe"), "left")
        // LEFT: a selectivity modulus with zero exact in-category mates
        // (possible for m=100 on a tiny corpus) must stay VISIBLE as a
        // NULL-recall row, not silently vanish with its sanity tier
        .join(broadcast(nexact), Seq("m"), "left")
        .select(col("m").cast("long").as("sel_mod"),
          col("nprobe").cast("long").as("nprobe"),
          coalesce(col("n_cand"), lit(0L)).cast("long").as("n_cand"),
          col("n_exact"),
          coalesce(col("n_matched"), lit(0L)).cast("long").as("n_matched"),
          (coalesce(col("n_matched"), lit(0L)).cast("double") /
            col("n_exact").cast("double")).as("recall"))
        .orderBy("sel_mod", "nprobe")
    }
  }

  val all: Seq[Q] = Seq(filteredTuning)
}

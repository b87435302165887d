package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._
import graft.functions.VectorFunctions._

/** Similarity search over the embeddings table (SURVEY.md §2.5).
  *
  * Two tiers:
  *   - [[topkBruteForce]]: exact cosine top-k — the correctness baseline.
  *     The query side is small (broadcast), so at 100 TB this is one
  *     broadcast-nested-loop over the corpus with a per-partition top-k
  *     (window) — no corpus shuffle of embeddings, only of the k·|Q|
  *     survivors.
  *   - [[annLsh]]: random-hyperplane LSH — corpus is bucketed by a 16-bit
  *     sign signature (4 bands × 4 bits); candidates come from band-equal
  *     hash joins, then exact cosine re-ranks. This is the 100 TB path:
  *     candidate generation is a hash join on (band, sig), touching a
  *     ~2^-4 fraction of the corpus per query per band.
  */
object Similarity {

  private val EmbDim = 64
  val K = 5
  private[operators] val NumQueries = 10

  /** 16-bit sign signature packed as a long — one codegen'd single-pass
    * walk ([[graft.functions.SignMatrix.PackBits]]). Deterministic
    * pseudo-random hyperplanes: component (p, i) has sign from the
    * parity of xxhash64(p, i), reproducible across engines and runs
    * without any RNG state. Bit-parity with the interpreted
    * foldLeft-of-HOF shape it replaces (the r06 `weak`: 32 planes ×
    * 64 dims of interpreted lambda evals per row) is proven on real
    * data in SignMatrixSpec, which keeps an independent copy of the
    * original fold. */
  def lshSignature(emb: Column, bits: Int = 16): Column =
    graft.functions.SignMatrix.bitsCol(emb, 0, bits)

  /** Exact top-k cosine neighbors for the first [[NumQueries]] vectors.
    * Scores are sequential-fold doubles → bit-identical to the DuckDB
    * oracle, so rank order (score desc, id asc) matches exactly. */
  val topkBruteForce: Q = Q(
    "sim_topk_cosine",
    s"""SELECT q_id, n_id, rank, sim FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    ${duckCosine("q.embedding", "c.embedding", EmbDim)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCosine("q.embedding", "c.embedding", EmbDim)} DESC, c.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
      .join(broadcast(queries), col("n_id") =!= col("q_id"))
      .withColumn("sim",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= K)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  /** The ±1 sign matrix behind [[lshSignature]] — canonical copy lives in
    * [[graft.functions.SignMatrix]] (same xxhash64 parity derivation,
    * materialized once per JVM; planes 0..31: annLsh signature; 32..35:
    * IVF coarse quantizer; 36..51: PQ subspace codes; 52..67: JL sketch).
    * DuckDB cannot compute xxhash64 — but it doesn't have to: the
    * hyperplanes are corpus-independent constants, so the oracle INLINES
    * them, which turns the whole LSH pipeline (signature → bands →
    * candidate join → exact re-rank) into portable arithmetic. */
  private def signMatrixRow(p: Int): IndexedSeq[Double] =
    (0 until EmbDim).map(i => graft.functions.SignMatrix.sign(p, i))

  /** Plane-p projection over `expr`'s first `len` components in DuckDB:
    * the identical sequential fold as [[graft.functions.SignMatrix.Project]] (0.0 seed, index
    * order, float→double per element), with the plane's sign row inlined
    * as a literal list — DuckDB never computes xxhash64; the hyperplanes
    * are corpus-independent constants. */
  private[operators] def duckProjOver(p: Int, expr: String, len: Int): String = {
    val signs = signMatrixRow(p).take(len)
      .map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    s"LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, LIST_TRANSFORM(RANGE(1, ${len + 1}), i -> $expr[i]::DOUBLE * ($signs::DOUBLE[])[i])), (acc, x) -> acc + x)"
  }

  private[operators] def duckProj(p: Int): String =
    duckProjOver(p, "embedding", EmbDim)

  /** [[annTopk]] restated over DuckDB primitives with the sign matrix
    * inlined: 32 sequential-fold projections → packed sign bits → 8 × 4
    * band buckets → distinct candidates → exact cosine re-rank. Every
    * float op is the bit-exact portable form, so the driver hash-checks
    * the ANN output exactly (bucketing is deterministic, not sampled). */
  private lazy val duckAnnLsh: String = {
    val projCols = (0 until 32)
      .map(p => s"${duckProj(p)} AS proj_$p").mkString(",\n    ")
    val sigExpr = (0 until 32)
      .map(p => s"(CASE WHEN proj_$p >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $p)")
      .mkString(" | ")
    s"""WITH proj AS (
       |  SELECT vec_id, embedding,
       |    $projCols
       |  FROM embeddings),
       |sig AS (SELECT vec_id, embedding, $sigExpr AS sig FROM proj),
       |bands AS (
       |  SELECT vec_id, embedding, b, (sig >> (4 * b)) & 15 AS bsig
       |  FROM sig CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS b) r),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, q.embedding AS qe,
       |    c.vec_id AS n_id, c.embedding AS ce
       |  FROM bands q JOIN bands c ON q.b = c.b AND q.bsig = c.bsig
       |    AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT q_id, n_id, rank, sim FROM (
       |  SELECT q_id, n_id, ${duckCosine("qe", "ce", EmbDim)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ${duckCosine("qe", "ce", EmbDim)} DESC, n_id) AS rank
       |  FROM cand)
       |WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  /** ANN: LSH-bucketed candidate generation + exact re-rank. The
    * bucketing is DETERMINISTIC (fixed hyperplanes), so unlike the
    * seeded-k-means ANN variants this one is fully oracle-checked;
    * SimilaritySpec additionally measures recall vs [[topkBruteForce]]. */
  val annLsh: Q = Q("sim_ann_lsh", duckAnnLsh) { (s, d) =>
    annTopk(embeddings(s, d), numQueries = NumQueries, k = K)
  }

  /** LSH top-k: 8 bands × 4 bits of a 32-bit signature; candidates share
    * any band value with the query. More bands = higher recall at the
    * cost of more candidates (each 4-bit band passes ~1/16 of the
    * corpus) — tune bands/bits to the recall/throughput target. */
  def annTopk(emb: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val signed = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      lshSignature(col("embedding"), bits = 32).as("sig"))
    val banded = signed.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(array((0 until 8).map(b =>
        shiftrightunsigned(col("sig"), 4 * b).bitwiseAND(lit(0xFL))): _*))
        .as(Seq("band", "bsig")))
    val queries = banded.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("band"), col("bsig"))
    val cand = banded
      .join(queries,
        Seq("band", "bsig")) // hash join on bucket
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("vec_id").as("n_id"), col("embedding").as("c_emb"), col("nrm"))
      .distinct()
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    cand
      .withColumn("sim",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("nrm")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  /** Plane base for the IVF coarse quantizer — disjoint from the 32
    * [[annLsh]] signature planes, so cells and LSH bands are
    * independent partitions of the corpus. */
  private[operators] val IvfPlaneBase = 32
  private[operators] val IvfBits = 4
  /** Default probe depth: the query's own cell, its [[IvfBits]]
    * Hamming-1 neighbors, and one Hamming-2 cell — sign-LSH cells are
    * coarser than k-means cells, so multi-probe depth carries the
    * recall (probe fraction 6/16 of the corpus here; at scale, bits
    * grows with corpus size and the fraction shrinks). */
  private[operators] val IvfNProbe = 6

  /** IVF (inverted-file) ANN with a DETERMINISTIC coarse quantizer:
    * cells are [[IvfBits]]-bit hyperplane-LSH signatures (fixed
    * xxhash64-derived planes — no k-means, no RNG state), and probing is
    * query-directed multi-probe LSH (Lv et al., VLDB'07): each candidate
    * cell is scored by the sum of |projection| over the bits where it
    * differs from the query's own cell — the cells across hyperplanes
    * the query sits closest to are probed first, which is where the
    * boundary-straddling true neighbors live. Projections are
    * sequential-fold doubles and the penalty is a fixed-order expression
    * sum, so the whole pipeline is bit-reproducible cross-engine and
    * fully oracle-checked — the property the seeded-k-means variant
    * could never give.
    *
    * The 100 TB shape: cell assignment is one map-side signature pass;
    * the probe set is |queries|·2^bits scored rows (broadcast); the
    * corpus is touched only in the ~nProbe/2^bits probed fraction via a
    * hash join on cell — no corpus shuffle, no driver-side collect at
    * all (the old k-means variant collected the query vectors). */
  def ivfTopk(emb: DataFrame, numQueries: Int, k: Int,
      bits: Int = IvfBits, nProbe: Int = IvfNProbe): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    ivfCandidates(emb, numQueries, bits, nProbe)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  /** The IVF candidate relation BEFORE the top-k cut: every
    * (query, probed-cell member) pair with its exact cosine and the
    * probe rank (1 = the query's best cell) of the cell it came from —
    * [[ivfTopk]] windows this to the answer; `sim_ivf_tuning` sweeps
    * `prank ≤ p` prefixes of it to report the recall/candidate-volume
    * trade-off of the nProbe knob from ONE corpus join at the maximum
    * probe depth. */
  def ivfCandidates(emb: DataFrame, numQueries: Int,
      bits: Int, maxProbe: Int): DataFrame = {
    val spark = emb.sparkSession
    // raw projections once — ONE codegen'd single-pass walk produces all
    // `bits` projections (subexpression elimination shares the array
    // across the element_at picks); cell = packed sign bits
    val projArr = graft.functions.SignMatrix
      .projectCol(col("embedding"), IvfPlaneBase, bits)
    val p = emb.select(
      Seq(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm")) ++
        (0 until bits).map(b =>
          element_at(projArr, b + 1).as(s"proj_$b")): _*)
    val cellCol = (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(shiftleft(
        when(col(s"proj_$b") >= 0, lit(1L)).otherwise(lit(0L)), b))
    }
    val e = p.withColumn("cell", cellCol)
    val corpus = e.select("vec_id", "embedding", "nrm", "cell")
    val queries = e.filter(col("vec_id") < numQueries)
      .select(Seq(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell").as("q_cell")) ++
        (0 until bits).map(b => col(s"proj_$b").as(s"q_proj_$b")): _*)
    import spark.implicits._
    val cells = (0L until (1L << bits)).toDF("cell")
    // multi-probe penalty: Σ |q_proj_b| over differing bits, summed in
    // fixed expression order (b = 0..bits-1) — identical in the oracle
    val penalty = (0 until bits).map { b =>
      when(shiftrightunsigned(col("q_cell"), b).bitwiseAND(lit(1L)) =!=
        shiftrightunsigned(col("cell"), b).bitwiseAND(lit(1L)),
        abs(col(s"q_proj_$b")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val wp = Window.partitionBy("q_id").orderBy(col("penalty"), col("cell"))
    val probes = queries.crossJoin(broadcast(cells)) // |Q| × 2^bits rows
      .withColumn("penalty", penalty)
      .withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= maxProbe)
      .select("q_id", "q_emb", "q_nrm", "cell", "prank")
    corpus.join(broadcast(probes), Seq("cell")) // probed cells only
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
          .as("sim"),
        col("prank"))
  }

  /** [[ivfTopk]] restated over DuckDB primitives: 4 inlined-sign
    * projections → cell id → penalty-ranked multi-probe set → cell-join
    * candidates → exact cosine re-rank. Fully deterministic, so IVF gets
    * the full hash check (the r05 `no_oracle` row retired). */
  private lazy val duckAnnIvf: String = {
    val projCols = (0 until IvfBits)
      .map(b => s"${duckProj(IvfPlaneBase + b)} AS proj_$b")
      .mkString(",\n    ")
    val cellExpr = (0 until IvfBits)
      .map(b => s"(CASE WHEN proj_$b >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $b)")
      .mkString(" | ")
    // fixed-order expression sum b = 0..bits-1, as in [[ivfTopk]]
    val penaltyExpr = (0 until IvfBits)
      .map(b => s"(CASE WHEN ((q.q_cell >> $b) & 1) <> ((c.cell >> $b) & 1) THEN ABS(q.proj_$b) ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH proj AS (
       |  SELECT vec_id, embedding,
       |    $projCols
       |  FROM embeddings),
       |sig AS (SELECT vec_id, embedding, $cellExpr AS cell,
       |        ${(0 until IvfBits).map(b => s"proj_$b").mkString(", ")}
       |        FROM proj),
       |q AS (
       |  SELECT vec_id AS q_id, embedding AS qe, cell AS q_cell,
       |    ${(0 until IvfBits).map(b => s"proj_$b").mkString(", ")}
       |  FROM sig WHERE vec_id < $NumQueries),
       |probes AS (
       |  SELECT q_id, qe, cell FROM (
       |    SELECT q.q_id, q.qe, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id
       |        ORDER BY $penaltyExpr, c.cell) AS prank
       |    FROM q CROSS JOIN (SELECT UNNEST(RANGE(0, ${1 << IvfBits})) AS cell) c)
       |  WHERE prank <= $IvfNProbe),
       |cand AS (
       |  SELECT p.q_id, p.qe, s.vec_id AS n_id, s.embedding AS ce
       |  FROM probes p JOIN sig s ON s.cell = p.cell AND s.vec_id <> p.q_id)
       |SELECT q_id, n_id, rank, sim FROM (
       |  SELECT q_id, n_id, ${duckCosine("qe", "ce", EmbDim)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ${duckCosine("qe", "ce", EmbDim)} DESC, n_id) AS rank
       |  FROM cand)
       |WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  /** IVF ANN as a registered operator — deterministic LSH-cell coarse
    * quantizer → FULL oracle check; SimilaritySpec additionally measures
    * recall vs [[topkBruteForce]]. */
  val annIvf: Q = Q("sim_ann_ivf", duckAnnIvf) { (s, d) =>
    ivfTopk(embeddings(s, d), numQueries = NumQueries, k = K)
  }

  /** L2 normalization: embedding → unit vector (double components).
    * Per-element division by the per-row norm — deterministic per
    * element. The unit vector is exploded to (vec_id, pos, component)
    * scalar rows: the driver's pandas checker cannot sort raw array
    * columns, and the exploded form checks every component exactly. */
  val normalizeVectors: Q = Q(
    "sim_normalize",
    s"""SELECT vec_id, pos, u, nrm FROM (
       |  SELECT vec_id,
       |    UNNEST(RANGE(0, $EmbDim)) AS pos,
       |    UNNEST(LIST_TRANSFORM(embedding, x -> x::DOUBLE / ${duckNorm("embedding", EmbDim)})) AS u,
       |    ${duckNorm("embedding", EmbDim)} AS nrm
       |  FROM embeddings)
       |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
    // norm materialized as a column first — captured non-attribute
    // expressions are re-evaluated per array element in HOF lambdas.
    // No output sort: map-only at 100 TB (the gate sorts before hashing).
    embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .select(col("vec_id"), col("nrm"),
        posexplode(transform(col("embedding"), x => x.cast("double") / col("nrm")))
          .as(Seq("pos", "u")))
      .select(col("vec_id"), col("pos").cast("bigint").as("pos"),
        col("u"), col("nrm"))
  }

  /** Per-label corpus stats via order-independent aggregates (min/max are
    * safe on doubles; means go through exact folds per row only). */
  val embStats: Q = Q(
    "sim_emb_stats",
    s"""SELECT label, COUNT(*) AS n,
       |  MIN(${duckNorm("embedding", EmbDim)}) AS min_norm,
       |  MAX(${duckNorm("embedding", EmbDim)}) AS max_norm
       |FROM embeddings
       |GROUP BY label
       |ORDER BY label""".stripMargin) { (s, d) =>
    embeddings(s, d)
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(norm(col("embedding"))).as("min_norm"),
        max(norm(col("embedding"))).as("max_norm"))
      .orderBy("label")
  }

  /** SQ8 scalar quantization: per-vector min/max affine map to 8-bit
    * codes + dequantized reconstruction and absolute error — 4× memory
    * compression for ANN candidate stages. Quantization uses
    * floor(x+0.5) (identical IEEE ops on both engines — round() rounds
    * binary vs decimal differently and is NOT oracle-safe); exploded to
    * (vec_id, pos) scalar rows for the checker. Zero-range vectors
    * quantize to code 0 via the scale=1 guard. */
  val quantizeSq8: Q = Q(
    "sim_quantize_sq8",
    s"""WITH base AS (
       |  SELECT vec_id, LIST_MIN(embedding)::DOUBLE AS mn,
       |         LIST_MAX(embedding)::DOUBLE AS mx, embedding
       |  FROM embeddings),
       |s AS (SELECT vec_id, mn,
       |        CASE WHEN mx > mn THEN mx - mn ELSE 1.0::DOUBLE END AS scale,
       |        embedding FROM base),
       |e AS (SELECT vec_id, mn, scale,
       |  UNNEST(RANGE(0, $EmbDim)) AS pos,
       |  UNNEST(LIST_TRANSFORM(embedding,
       |    x -> FLOOR((x::DOUBLE - mn) * 255.0::DOUBLE / scale + 0.5::DOUBLE))) AS qf,
       |  UNNEST(LIST_TRANSFORM(embedding, x -> x::DOUBLE)) AS xv
       |  FROM s)
       |SELECT vec_id, pos, CAST(qf AS BIGINT) AS q,
       |  mn + ((qf * scale) / 255.0::DOUBLE) AS dequant,
       |  ABS(mn + ((qf * scale) / 255.0::DOUBLE) - xv) AS abs_err
       |FROM e
       |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
    val base = embeddings(s, d).select(col("vec_id"), col("embedding"),
        array_min(col("embedding")).cast("double").as("mn"),
        array_max(col("embedding")).cast("double").as("mx"))
      .withColumn("scale",
        when(col("mx") > col("mn"), col("mx") - col("mn")).otherwise(1.0))
    base
      .select(col("vec_id"), col("mn"), col("scale"),
        posexplode(transform(col("embedding"), x => struct(
          floor((x.cast("double") - col("mn")) * 255.0 / col("scale") + 0.5)
            .as("qf"),
          x.cast("double").as("xv")))).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos").cast("bigint").as("pos"),
        col("v.qf").as("q"),
        (col("mn") + ((col("v.qf").cast("double") * col("scale")) / 255.0))
          .as("dequant"),
        abs(col("mn") + ((col("v.qf").cast("double") * col("scale")) / 255.0)
          - col("v.xv")).as("abs_err"))
    // no output sort — map-only at 100 TB (the gate sorts before hashing)
  }

  /** Per-label centroids over SQ8 codes — the coarse-quantizer update
    * step of an IVF/PQ index build, done with exact arithmetic: codes
    * are BIGINTs (identical on both engines, see [[quantizeSq8]]), so
    * the cross-row Σq per (label, pos) is order-independent and the
    * centroid is one double division. At 100 TB this is a single
    * map-side-combined hash aggregation on (label, pos) — no vector
    * shuffles, 64 rows of state per label. */
  val labelCentroids: Q = Q(
    "sim_label_centroids",
    s"""WITH base AS (
       |  SELECT label, LIST_MIN(embedding)::DOUBLE AS mn,
       |         LIST_MAX(embedding)::DOUBLE AS mx, embedding
       |  FROM embeddings),
       |s AS (SELECT label, mn,
       |        CASE WHEN mx > mn THEN mx - mn ELSE 1.0::DOUBLE END AS scale,
       |        embedding FROM base),
       |e AS (SELECT label,
       |  UNNEST(RANGE(0, $EmbDim)) AS pos,
       |  UNNEST(LIST_TRANSFORM(embedding,
       |    x -> FLOOR((x::DOUBLE - mn) * 255.0::DOUBLE / scale + 0.5::DOUBLE))) AS qf
       |  FROM s)
       |SELECT CAST(label AS BIGINT) AS label, pos, COUNT(*) AS n,
       |  CAST(SUM(CAST(qf AS BIGINT)) AS BIGINT) AS q_sum,
       |  CAST(CAST(SUM(CAST(qf AS BIGINT)) AS BIGINT) AS DOUBLE) / COUNT(*) AS q_mean
       |FROM e
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val base = embeddings(s, d).select(col("label"), col("embedding"),
        array_min(col("embedding")).cast("double").as("mn"),
        array_max(col("embedding")).cast("double").as("mx"))
      .withColumn("scale",
        when(col("mx") > col("mn"), col("mx") - col("mn")).otherwise(1.0))
    base
      .select(col("label"),
        posexplode(transform(col("embedding"), x =>
          floor((x.cast("double") - col("mn")) * 255.0 / col("scale") + 0.5)))
          .as(Seq("pos", "qf")))
      .groupBy(col("label").cast("bigint").as("label"),
        col("pos").cast("bigint").as("pos"))
      .agg(count(lit(1)).as("n"), sum(col("qf")).as("q_sum"),
        (sum(col("qf")).cast("double") / count(lit(1))).as("q_mean"))
      .orderBy("label", "pos")
  }

  /** Matryoshka-style two-stage retrieval: shortlist by cosine over the
    * FIRST 16 dimensions (4× cheaper per comparison, the MRL trick of
    * prefix-truncated embeddings), then exact full-dimension re-rank of
    * the 20-candidate shortlist. Both stages are sequential-fold doubles
    * with total tie-breaks, so the result is deterministic and
    * oracle-exact — unlike LSH, the shortlist rule itself is exact, so
    * this variant gets a full hash check, not just a recall spec. */
  val matryoshka: Q = Q(
    "sim_matryoshka",
    s"""WITH s1 AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    q.embedding AS qe, c.embedding AS ce,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${duckCosine("q.embedding", "c.embedding", 16)} DESC,
       |        c.vec_id) AS prank
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT q_id, n_id, rank, sim FROM (
       |  SELECT q_id, n_id, ${duckCosine("qe", "ce", EmbDim)} AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ${duckCosine("qe", "ce", EmbDim)} DESC, n_id) AS rank
       |  FROM s1 WHERE prank <= 20)
       |WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
    val pre = 16
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"),
      norm(slice(col("embedding"), 1, pre)).as("pn"),
      norm(col("embedding")).as("fn"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("pn").as("q_pn"), col("fn").as("q_fn"))
    val wPre = Window.partitionBy("q_id").orderBy(col("psim").desc, col("n_id"))
    val wFull = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("embedding").as("c_emb"),
        col("pn").as("c_pn"), col("fn").as("c_fn"))
      .join(broadcast(queries), col("n_id") =!= col("q_id"))
      .withColumn("psim",
        dot(slice(col("q_emb"), 1, pre), slice(col("c_emb"), 1, pre)) /
          (col("q_pn") * col("c_pn")))
      .withColumn("prank", row_number().over(wPre))
      .filter(col("prank") <= 20)
      .withColumn("sim",
        dot(col("q_emb"), col("c_emb")) / (col("q_fn") * col("c_fn")))
      .withColumn("rank", row_number().over(wFull).cast("bigint"))
      .filter(col("rank") <= K)
      .select("q_id", "n_id", "rank", "sim")
      .orderBy("q_id", "rank")
  }

  private val JlDim = 16
  private val JlPlaneBase = 52

  /** Johnson–Lindenstrauss sketch: reduce 64-dim embeddings to 16 dims
    * with a ±1 sign-matrix projection y_j = (1/√16) · Σ_i x_i·s_ij —
    * Achlioptas' database-friendly projection (signs, no Gaussians),
    * the standard cheap shrink step BEFORE an ANN index or a pairwise
    * pass (4× less shuffle weight per vector at 100 TB; distances are
    * preserved to 1±ε in expectation). Deterministic planes 52..67 of
    * the shared [[signMatrix]], so the oracle inlines them like every
    * other LSH-family query; the 1/√16 = 0.25 scale is a power of two —
    * one exact float multiply, so sequential-fold bit-parity survives
    * scaling. Map-side only: no shuffle, no collect; the final orderBy
    * is presentation. SimilaritySpec measures the distortion the JL
    * bound promises on the corpus. */
  val randomProjection: Q = Q(
    "sim_random_projection",
    s"""SELECT vec_id, pos, y FROM (
       |  SELECT vec_id, UNNEST(RANGE(0, $JlDim)) AS pos,
       |    UNNEST([${(0 until JlDim).map(j =>
              s"${duckProj(JlPlaneBase + j)} * 0.25::DOUBLE")
              .mkString(", ")}]) AS y
       |  FROM embeddings)
       |ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
    // No output sort: at 100 TB a presentation orderBy of 16N rows would
    // be this map-only query's ONLY shuffle. The correctness gate sorts
    // rows before hashing (check_oracle.py: "sorts columns by name and
    // rows by all columns"), so order is the comparison layer's concern —
    // the plan here is scan → project → generate, zero exchanges.
    embeddings(s, d)
      .select(col("vec_id"),
        posexplode(graft.functions.SignMatrix
          .projectCol(col("embedding"), JlPlaneBase, JlDim, scale = 0.25))
          .as(Seq("pos", "y")))
      .select(col("vec_id"), col("pos").cast("bigint").as("pos"), col("y"))
  }

  /** Projected vector for one input vector, host-side (spec support). */
  private[graft] def jlProject(v: IndexedSeq[Float]): IndexedSeq[Double] =
    (0 until JlDim).map { j =>
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        acc += v(i).toDouble * graft.functions.SignMatrix.sign(JlPlaneBase + j, i)
        i += 1
      }
      acc * 0.25
    }

  val all: Seq[Q] = Seq(topkBruteForce, annLsh, annIvf, normalizeVectors,
    embStats, quantizeSq8, labelCentroids, matryoshka, randomProjection)
}

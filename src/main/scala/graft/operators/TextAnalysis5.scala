package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._
import graft.operators.TextAnalysis3.{duckRawShingles, FixScale}

/** Fifth text-curation batch: data-selection operators from the published
  * LLM-pretraining playbook —
  *
  *   - [[dsirSelect]]: DSIR-style importance resampling (Xie et al. 2023,
  *     "Data Selection for Language Models via Importance Resampling"):
  *     hashed-bigram bag-of-ngrams models of a target domain vs the raw
  *     pool, per-document average log importance ratio, top-N selection.
  *   - [[contaminationSpan]]: the span-level decontamination REPORT that
  *     complements [[TextAnalysis3]]'s doc-level `text_decontaminate`
  *     verdict — per contaminated document, how many holdout shingles hit
  *     and the longest CONSECUTIVE run of hits (a 1-shingle hit is noise;
  *     a 40-shingle run is a verbatim benchmark copy).
  *
  * Both reuse the round's established parity machinery: the base-31
  * polynomial hash ([[TextAnalysis.polyHash]] — engine-portable integer
  * fold), [[graft.functions.PortableLn]] for bit-identical ln, and
  * fixed-point 2^40 BIGINT sums so no cross-row double accumulation
  * exists anywhere.
  */
object TextAnalysis5 {

  /** hashed-ngram feature buckets for DSIR */
  private val DsirBuckets = 256
  /** documents to select */
  private val DsirTopN = 100

  /** DSIR-style data selection. The target domain is the `lang = 'en'`
    * slice (standing in for "high-quality reference corpus"); every
    * other document is the raw pool being scored.
    *
    * Model: word bigrams hashed into [[DsirBuckets]] buckets by the
    * portable base-31 poly hash; add-one-smoothed bucket probabilities
    * for target and raw; per-doc score = mean over the doc's bigram
    * occurrences of ln(p_target(b) / p_raw(b)); output the top
    * [[DsirTopN]] raw documents (score desc, doc_id tiebreak) — the
    * deterministic "take the most target-like pool documents" variant of
    * DSIR's Gumbel resampling (an RNG-free choice the oracle can mirror).
    *
    * 100 TB shape: bigram→bucket is the codegen'd
    * [[graft.functions.PolyHash]] evaluated INLINE on the exploded
    * stream (the earlier distinct-vocabulary detour existed only to
    * keep the then-interpreted fold off the corpus-sized stream; with
    * the compiled walker it cost two extra shuffles — vocab distinct +
    * attach join — for nothing: 22.0 s → measured post-change at sf2);
    * the per-bucket model is [[DsirBuckets]] rows from ONE map-combined
    * hash agg; scoring is one broadcast join (256 rows) + one hash agg
    * on doc_id; the final top-N plans as TakeOrderedAndProject (k-row
    * driver merge, no global sort). Determinism: each probability is
    * one double division of exact BIGINTs, ln is
    * [[graft.functions.PortableLn]], per-doc sums are fixed-point 2^40
    * BIGINTs. The oracle still buckets via its distinct-vocabulary CTE
    * — bkt is a pure function of the bigram, so the two shapes are
    * value-identical.
    */
  val dsirSelect: Q = Q(
    "text_dsir_select",
    s"""WITH ws AS (
       |  SELECT doc_id, lang = 'en' AS is_t, STRING_SPLIT(TRIM(text), ' ') AS w
       |  FROM documents),
       |bg AS (SELECT doc_id, is_t, UNNEST(${duckRawShingles(2)}) AS bigram FROM ws),
       |vb AS (
       |  SELECT bigram,
       |    LIST_REDUCE(LIST_PREPEND(0::BIGINT,
       |        LIST_TRANSFORM(RANGE(1, LENGTH(bigram) + 1), i -> ASCII(bigram[i])::BIGINT)),
       |      (acc, c) -> (acc * 31 + c) % 1000000007) % $DsirBuckets AS bkt
       |  FROM (SELECT DISTINCT bigram FROM bg)),
       |bgb AS (SELECT bg.doc_id, bg.is_t, vb.bkt FROM bg JOIN vb USING (bigram)),
       |cnt AS (
       |  SELECT bkt,
       |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
       |    CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS c_r
       |  FROM bgb GROUP BY bkt),
       |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS nt, CAST(SUM(c_r) AS BIGINT) AS nr FROM cnt),
       |ratio AS (
       |  SELECT bkt,
       |    (CAST(c_t + 1 AS DOUBLE) / CAST(nt + $DsirBuckets AS DOUBLE))
       |      / (CAST(c_r + 1 AS DOUBLE) / CAST(nr + $DsirBuckets AS DOUBLE)) AS x
       |  FROM cnt CROSS JOIN tot),
       |lw AS (${graft.functions.PortableLn.sqlStages("ratio", Seq("bkt"), "x", "lnx")}),
       |wq AS (SELECT bkt, CAST(FLOOR(lnx * $FixScale::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS t FROM lw),
       |sums AS (
       |  SELECT bgb.doc_id, CAST(SUM(wq.t) AS BIGINT) AS st, COUNT(*) AS n
       |  FROM bgb JOIN wq USING (bkt) WHERE NOT bgb.is_t GROUP BY bgb.doc_id)
       |SELECT doc_id, n AS n_bigrams,
       |  (CAST(st AS DOUBLE) / $FixScale::DOUBLE) / n AS score
       |FROM sums
       |ORDER BY score DESC, doc_id
       |LIMIT $DsirTopN""".stripMargin) { (s, d) =>
    val ws = documents(s, d).select(col("doc_id"),
      (col("lang") === "en").as("is_t"), split(trim(col("text")), " ").as("w"))
    val bg = ws.select(col("doc_id"), col("is_t"),
      explode(Dedup.shinglesFromWords(col("w"), 2)).as("bigram"))
    // bucket inline on the stream — the codegen'd walker makes the hash
    // cheaper than the shuffles a distinct-vocab attach would cost
    val bgb = bg.select(col("doc_id"), col("is_t"),
      (TextAnalysis.polyHash(col("bigram")) % DsirBuckets)
        .cast("bigint").as("bkt"))
    val cnt = bgb.groupBy("bkt").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("c_r"))
    val tot = cnt.agg(sum("c_t").as("nt"), sum("c_r").as("nr"))
    val ratio = cnt.crossJoin(broadcast(tot))
      .select(col("bkt"),
        (((col("c_t") + 1).cast("double") / (col("nt") + DsirBuckets).cast("double"))
          / ((col("c_r") + 1).cast("double") / (col("nr") + DsirBuckets).cast("double")))
          .as("x"))
    val wq = graft.functions.PortableLn.withLn(ratio, "x", "lnx")
      .select(col("bkt"),
        floor(col("lnx") * lit(FixScale) + lit(0.5)).cast("long").as("t"))
    bgb.filter(!col("is_t"))
      .join(broadcast(wq), "bkt")
      .groupBy("doc_id")
      .agg(sum("t").as("st"), count(lit(1)).as("n"))
      .select(col("doc_id"), col("n").as("n_bigrams"),
        ((col("st").cast("double") / lit(FixScale)) / col("n")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(DsirTopN)
  }

  /** shingle width for the contamination span report (matches
    * `text_decontaminate`'s 5-gram membership test) */
  private val ContamK = 5

  /** Span-level decontamination report: for every non-holdout document
    * with at least one holdout 5-gram hit, the number of hit shingle
    * positions, the longest consecutive-position run of hits, and where
    * that run starts. Doc-level membership (`text_decontaminate`) says
    * WHETHER a doc touches the holdout; this says HOW BADLY — a single
    * shared 5-gram is phrase-level noise, a long consecutive run is a
    * verbatim copy of benchmark text, and real pipelines set different
    * thresholds for the two.
    *
    * 100 TB shape: holdout shingles build the (small) side of one hash
    * join against the corpus-sized positional shingle stream — the same
    * holdout-always-build-side rule as `text_decontaminate`; islands
    * come from one window partitioned by doc_id over the HIT rows only
    * (hit-bounded, far below corpus scale); per-doc stats are one hash
    * agg. Gaps-islands arithmetic (pos − row_number) is exact integers.
    */
  val contaminationSpan: Q = Q(
    "text_contamination_span",
    s"""WITH ws AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, u.i AS pos, ARRAY_TO_STRING(w[u.i:u.i+${ContamK - 1}], ' ') AS s
       |  FROM ws, UNNEST(RANGE(1, GREATEST(LEN(w) - ${ContamK - 2}, 1))) u(i)),
       |hold AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
       |hits AS (
       |  SELECT sh.doc_id, sh.pos FROM sh JOIN hold USING (s)
       |  WHERE sh.doc_id % 50 <> 0),
       |isl AS (
       |  SELECT doc_id, pos,
       |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM hits),
       |runs AS (
       |  SELECT doc_id, grp, COUNT(*) AS run_len, MIN(pos) AS run_start
       |  FROM isl GROUP BY doc_id, grp),
       |best AS (
       |  SELECT doc_id, run_len, run_start,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY run_len DESC, run_start) AS rn,
       |    CAST(SUM(run_len) OVER (PARTITION BY doc_id) AS BIGINT) AS n_hits
       |  FROM runs)
       |SELECT doc_id, n_hits, CAST(run_len AS BIGINT) AS longest_run,
       |  CAST(run_start AS BIGINT) AS run_start
       |FROM best WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sh = documents(s, d).select(col("doc_id"),
        posexplode(Dedup.shinglesFromWords(split(trim(col("text")), " "), ContamK)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("s"))
    val hold = sh.filter(col("doc_id") % 50 === 0).select("s").distinct()
    val hits = sh.filter(col("doc_id") % 50 =!= 0).join(hold, "s")
      .select("doc_id", "pos")
    val isl = hits.withColumn("grp",
      col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
    val runs = isl.groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("run_len"), min("pos").as("run_start"))
    runs
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("run_len").desc, col("run_start"))))
      .withColumn("n_hits",
        sum("run_len").over(Window.partitionBy("doc_id")).cast("bigint"))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_hits"),
        col("run_len").cast("bigint").as("longest_run"),
        col("run_start").cast("bigint").as("run_start"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(dsirSelect, contaminationSpan)
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Seventh text-analysis batch — n-gram language-model statistics for
  * LM training corpora: interpolated Kneser–Ney bigram probabilities
  * (the count-based smoothing every n-gram LM data pipeline computes
  * before training) and per-word burstiness (variance-to-mean ratio of
  * per-document counts — the classic content-word vs function-word
  * discriminator, and a corpus-health signal: crawl dups inflate it).
  *
  * Both are pure hash-aggregation pipelines over token/bigram/vocab
  * keys — no windows, no joins beyond vocab-sized equi-joins — and all
  * score arithmetic is exact BIGINT products with ONE double division
  * at the end (the PMI convention), so the DuckDB oracles are
  * bit-exact restatements.
  */
object TextAnalysis7 {

  /** Interpolated Kneser–Ney with the textbook discount D = 3/4:
    *
    *   P_kn(w|v) = max(c(vw) − D, 0)/c(v) + D·N1+(v·)/c(v) · N1+(·w)/T
    *
    * where N1+(v·) / N1+(·w) are distinct right/left continuation type
    * counts and T the distinct bigram type count. With D = 3/4 the
    * whole expression is the single rational
    *
    *   ( max(4·c(vw) − 3, 0)·T + 3·N1+(v·)·N1+(·w) ) / ( 4·c(v)·T )
    *
    * — integer numerator and denominator (< 2^53 far beyond any test
    * corpus; the products go DECIMAL past ~10^15 tokens), ONE double
    * division, so both engines emit identical doubles with no ln/exp
    * anywhere.
    *
    * 100 TB shape: unigram counts, bigram counts, and the two
    * continuation-type counts are each one hash agg keyed by
    * token/bigram (map-side partial combine does the heavy lifting);
    * the final assembly joins vocab-sized sides only. Top-50 by bigram
    * count is the presentation bound. */
  val kneserNey: Q = Q(
    "text_kneser_ney",
    """WITH ws AS (SELECT STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
      |ug AS (SELECT UNNEST(w) AS tok FROM ws),
      |uc AS (SELECT tok, COUNT(*)::BIGINT AS c FROM ug GROUP BY tok),
      |bg AS (SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)),
      |         i -> w[i] || ' ' || w[i+1])) AS bigram FROM ws),
      |bc AS (SELECT bigram, COUNT(*)::BIGINT AS c_ab FROM bg GROUP BY bigram),
      |types AS (SELECT SPLIT_PART(bigram, ' ', 1) AS v,
      |                 SPLIT_PART(bigram, ' ', 2) AS w FROM bc),
      |rgt AS (SELECT v, COUNT(*)::BIGINT AS n1p_right FROM types GROUP BY v),
      |lft AS (SELECT w, COUNT(*)::BIGINT AS n1p_left FROM types GROUP BY w),
      |tt AS (SELECT COUNT(*)::BIGINT AS t FROM bc)
      |SELECT bc.bigram, bc.c_ab, a.c AS c_v, r.n1p_right, l.n1p_left,
      |  CAST(GREATEST(4 * bc.c_ab - 3, 0) * tt.t
      |       + 3 * r.n1p_right * l.n1p_left AS DOUBLE)
      |    / CAST(4 * a.c * tt.t AS DOUBLE) AS pkn
      |FROM bc
      |JOIN uc a ON a.tok = SPLIT_PART(bc.bigram, ' ', 1)
      |JOIN rgt r ON r.v = SPLIT_PART(bc.bigram, ' ', 1)
      |JOIN lft l ON l.w = SPLIT_PART(bc.bigram, ' ', 2)
      |CROSS JOIN tt
      |ORDER BY bc.c_ab DESC, bc.bigram
      |LIMIT 50""".stripMargin) { (s, d) =>
    val ws = documents(s, d).select(split(trim(col("text")), " ").as("w"))
    val ug = ws.select(explode(col("w")).as("tok"))
    val uc = ug.groupBy("tok").agg(count(lit(1)).as("c"))
    val bg = ws.select(
      explode(graft.functions.WordShingles(col("w"), 2)).as("bigram"))
    val bc = bg.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
    val types = bc.select(
      split_part(col("bigram"), lit(" "), lit(1)).as("v"),
      split_part(col("bigram"), lit(" "), lit(2)).as("w"))
    val rgt = types.groupBy("v").agg(count(lit(1)).as("n1p_right"))
    val lft = types.groupBy("w").agg(count(lit(1)).as("n1p_left"))
    val tt = bc.agg(count(lit(1)).as("t"))
    // uc/rgt/lft are vocab-sized (no broadcast hint); tt is one row
    bc
      .join(uc.as("a"),
        col("a.tok") === split_part(col("bigram"), lit(" "), lit(1)))
      .join(rgt, col("v") === split_part(col("bigram"), lit(" "), lit(1)))
      .join(lft, col("w") === split_part(col("bigram"), lit(" "), lit(2)))
      .crossJoin(broadcast(tt))
      .select(col("bigram"), col("c_ab"), col("a.c").as("c_v"),
        col("n1p_right"), col("n1p_left"),
        ((greatest(lit(4L) * col("c_ab") - 3L, lit(0L)) * col("t") +
          lit(3L) * col("n1p_right") * col("n1p_left")).cast("double") /
          (lit(4L) * col("a.c") * col("t")).cast("double")).as("pkn"))
      .orderBy(col("c_ab").desc, col("bigram"))
      .limit(50)
  }

  /** Per-word burstiness: population variance-to-mean ratio of the
    * per-document count of each top word, zeros included. With
    * c_tot = Σ_d c_d and s2 = Σ_d c_d² over N docs,
    *
    *   VMR = var/mean = (N·s2 − c_tot²) / (N·c_tot)
    *
    * — again integer numerator/denominator and ONE double division.
    * VMR ≈ 1 is Poisson (function words); VMR ≫ 1 is bursty (content
    * words, or duplicated boilerplate — which is why curation
    * pipelines chart it per source drop).
    *
    * 100 TB shape: one (doc, tok) hash agg (bounded by corpus token
    * count, shrunk by map-side combine), one vocab-keyed hash agg over
    * it, one single-row broadcast for N. Top-30 by total count is the
    * presentation bound. */
  val burstiness: Q = Q(
    "text_burstiness",
    """WITH dt AS (
      |  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS tok
      |  FROM documents),
      |pd AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS c FROM dt GROUP BY 1, 2),
      |n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
      |v AS (
      |  SELECT tok, SUM(c)::BIGINT AS c_tot, SUM(c * c)::BIGINT AS s2,
      |    COUNT(*)::BIGINT AS df
      |  FROM pd GROUP BY tok)
      |SELECT tok, c_tot, df,
      |  CAST(n.n_docs * v.s2 - v.c_tot * v.c_tot AS DOUBLE)
      |    / CAST(n.n_docs * v.c_tot AS DOUBLE) AS vmr
      |FROM v CROSS JOIN n
      |ORDER BY c_tot DESC, tok
      |LIMIT 30""".stripMargin) { (s, d) =>
    val dt = documents(s, d).select(col("doc_id"),
      explode(split(trim(col("text")), " ")).as("tok"))
    val pd = dt.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
    pd.groupBy("tok")
      .agg(sum(col("c")).as("c_tot"),
        sum(col("c") * col("c")).as("s2"),
        count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("tok"), col("c_tot"), col("df"),
        ((col("n_docs") * col("s2") - col("c_tot") * col("c_tot"))
          .cast("double") /
          (col("n_docs") * col("c_tot")).cast("double")).as("vmr"))
      .orderBy(col("c_tot").desc, col("tok"))
      .limit(30)
  }

  /** Out-of-vocabulary TRIGRAM rate of the holdout split against the
    * train split's trigram inventory — the n-gram-coverage health
    * metric an LM data pipeline charts before freezing a corpus
    * (rising holdout-trigram OOV on fresh batches means the train
    * distribution is stale; word-level OOV is inert on a closed
    * vocabulary, which is exactly why coverage is tracked at n-gram
    * granularity). Split rule is the house holdout predicate
    * (doc_id % 50 = 0, shared with the decontamination family).
    * Counts are exact BIGINTs with ONE double division per doc.
    *
    * 100 TB shape: the train trigram inventory is one distinct hash
    * agg over the codegen'd [[graft.functions.WordShingles]] explode
    * (n-gram-vocabulary-bounded); the 2% holdout side left-joins it
    * per trigram instance (null ⇒ OOV) and re-aggregates per doc. */
  val oovRate: Q = Q(
    "text_oov_rate",
    """WITH ws AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
      |tg AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w) - 1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM ws),
      |vocab AS (SELECT DISTINCT g FROM tg WHERE doc_id % 50 <> 0),
      |ho AS (SELECT doc_id, g FROM tg WHERE doc_id % 50 = 0)
      |SELECT ho.doc_id,
      |  COUNT(*)::BIGINT AS n_trigrams,
      |  CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS oov_rate
      |FROM ho LEFT JOIN vocab v ON v.g = ho.g
      |GROUP BY ho.doc_id
      |ORDER BY ho.doc_id""".stripMargin) { (s, d) =>
    val tg = documents(s, d).select(col("doc_id"),
      explode(graft.functions.WordShingles(
        split(trim(col("text")), " "), 3)).as("g"))
    val vocab = tg.filter(col("doc_id") % 50 =!= 0)
      .select("g").distinct().withColumn("known", lit(1))
    tg.filter(col("doc_id") % 50 === 0)
      .join(vocab, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).cast("bigint")
          .as("n_oov"))
      .select(col("doc_id"), col("n_trigrams"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_trigrams")).as("oov_rate"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(kneserNey, burstiness, oovRate)
}

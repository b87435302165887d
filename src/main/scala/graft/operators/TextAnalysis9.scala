package graft.operators

import org.apache.spark.sql.functions._

import graft.Q
import graft.Tables._

/** Ninth text batch — corpus-linguistics operators the battery still
  * lacked: per-document lexical-diversity indices beyond plain TTR
  * (hapax ratio, Simpson's D, Yule's K — the frequency-spectrum
  * statistics), a positional-postings phrase search (the inverted-
  * index primitive behind exact-phrase retrieval), and the source-pair
  * vocabulary-overlap matrix (corpus-mixture redundancy audit).
  *
  * Oracle parity: every index is a ratio of exact integer sums over
  * per-document frequency spectra; the phrase search joins integer
  * positions; overlap is one distinct-pair self-join — all mirrored
  * token for token in DuckDB. */
object TextAnalysis9 {

  /** Lexical diversity from the per-doc frequency spectrum: hapax
    * count (f=1 types), Simpson's D = Σf(f−1)/(N(N−1)) (repeat-draw
    * probability), Yule's K = 10⁴·(Σf²−N)/N² (the scale-free
    * repetitiousness characteristic). One explode + two hash aggs,
    * both keyed finer than doc only transiently. */
  val lexicalDiversity: Q = Q(
    "text_lexical_diversity",
    """WITH tf AS (
      |  SELECT doc_id, w, COUNT(*)::BIGINT AS f
      |  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |sp AS (
      |  SELECT doc_id, SUM(f)::BIGINT AS n, COUNT(*)::BIGINT AS types,
      |    SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
      |    SUM(f * (f - 1))::BIGINT AS sff1,
      |    SUM(f * f)::BIGINT AS sff
      |  FROM tf GROUP BY 1)
      |SELECT doc_id, n AS n_tokens, types AS n_types, hapax AS n_hapax,
      |  CAST(hapax AS DOUBLE) / CAST(types AS DOUBLE) AS hapax_ratio,
      |  CASE WHEN n >= 2 THEN
      |    CAST(sff1 AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
      |      - 1.0::DOUBLE)) ELSE 0.0::DOUBLE END AS simpson_d,
      |  10000.0::DOUBLE * CAST(sff - n AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS yule_k
      |FROM sp
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tf = documents(s, d)
      .select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("f"))
    val sp = tf.groupBy("doc_id").agg(
      sum("f").as("n"), count(lit(1)).as("types"),
      sum(when(col("f") === 1, 1L).otherwise(0L)).as("hapax"),
      sum(col("f") * (col("f") - 1)).as("sff1"),
      sum(col("f") * col("f")).as("sff"))
    val nD = col("n").cast("double")
    sp.select(col("doc_id"), col("n").as("n_tokens"),
      col("types").as("n_types"), col("hapax").as("n_hapax"),
      (col("hapax").cast("double") / col("types").cast("double"))
        .as("hapax_ratio"),
      when(col("n") >= 2,
        col("sff1").cast("double") / (nD * (nD - 1.0)))
        .otherwise(0.0).as("simpson_d"),
      (lit(10000.0) * (col("sff") - col("n")).cast("double") / (nD * nD))
        .as("yule_k"))
      .orderBy("doc_id")
  }

  /** fixed query phrases for [[phraseSearch]] — a deployment would
    * broadcast a query table the same way */
  private val Phrases = Seq("hash join", "table scan", "spark table",
    "fast join")

  /** Exact-phrase retrieval over positional postings: tokens exploded
    * WITH positions, each two-word phrase matched by joining adjacent
    * positions within a document — the inverted-index search
    * primitive. Per phrase: matching-doc count, total occurrences,
    * first matching doc.
    *
    * 100 TB shape: the phrase table broadcasts; the postings join is
    * equi-keyed on (doc, word) after a word-level prefilter, so only
    * postings of queried words shuffle — the full corpus never does. */
  val phraseSearch: Q = Q(
    "text_phrase_search",
    s"""WITH ph(phrase, w1, w2) AS (VALUES
       |  ${Phrases.map { p =>
            val Array(a, b) = p.split(' ')
            s"('$p', '$a', '$b')"
          }.mkString(", ")}),
       |toks AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS ws
       |         FROM documents),
       |pos AS (
       |  SELECT doc_id, i.i AS p, ws[i.i] AS w
       |  FROM toks, UNNEST(RANGE(1, LEN(ws) + 1)) i(i)),
       |hits AS (
       |  SELECT ph.phrase, a.doc_id
       |  FROM ph
       |  JOIN pos a ON a.w = ph.w1
       |  JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
       |             AND b.w = ph.w2)
       |SELECT ph.phrase,
       |  COALESCE(COUNT(DISTINCT h.doc_id), 0)::BIGINT AS n_docs,
       |  COUNT(h.doc_id)::BIGINT AS n_occurrences,
       |  MIN(h.doc_id) AS first_doc
       |FROM ph LEFT JOIN hits h ON h.phrase = ph.phrase
       |GROUP BY 1
       |ORDER BY ph.phrase""".stripMargin) { (s, d) =>
    import s.implicits._
    val ph = broadcast(Phrases.map { p =>
      val Array(a, b) = p.split(' ')
      (p, a, b)
    }.toDF("phrase", "w1", "w2"))
    val pos = documents(s, d)
      .select(col("doc_id"),
        posexplode(TextAnalysis.words(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("p"),
        col("col").as("w"))
    val hits = ph
      .join(pos.as("a"), col("a.w") === col("w1"))
      .join(pos.as("b"),
        col("b.doc_id") === col("a.doc_id") &&
          col("b.p") === col("a.p") + 1 && col("b.w") === col("w2"))
      .select(col("phrase"), col("a.doc_id").as("doc_id"))
    ph.select("phrase").join(hits, Seq("phrase"), "left")
      .groupBy("phrase")
      .agg(coalesce(countDistinct("doc_id"), lit(0L)).as("n_docs"),
        count("doc_id").as("n_occurrences"),
        min("doc_id").as("first_doc"))
      .orderBy("phrase")
  }

  /** Source-pair vocabulary overlap: Jaccard similarity of the type
    * sets of every source pair — the corpus-mixture redundancy audit
    * (two sources sharing most of their vocabulary add less diversity
    * than their token counts suggest). Distinct (source, type) pairs
    * self-join only on shared types; output is source-pair-bounded. */
  val sourceVocabOverlap: Q = Q(
    "text_source_vocab_overlap",
    """WITH sv AS (
      |  SELECT DISTINCT source, w
      |  FROM (SELECT source, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
      |        FROM documents)),
      |sc AS (SELECT source, COUNT(*)::BIGINT AS types FROM sv GROUP BY 1),
      |com AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    COUNT(*)::BIGINT AS n_common
      |  FROM sv a JOIN sv b ON b.w = a.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT com.source_a, com.source_b,
      |  ca.types AS types_a, cb.types AS types_b, com.n_common,
      |  CAST(com.n_common AS DOUBLE)
      |    / CAST(ca.types + cb.types - com.n_common AS DOUBLE) AS jaccard
      |FROM com JOIN sc ca ON ca.source = com.source_a
      |         JOIN sc cb ON cb.source = com.source_b
      |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
    val sv = documents(s, d)
      .select(col("source"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .distinct()
    val sc = sv.groupBy("source").agg(count(lit(1)).as("types"))
    val com = sv.as("a")
      .join(sv.as("b"),
        col("b.w") === col("a.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    com
      .join(broadcast(sc.select(col("source").as("source_a"),
        col("types").as("types_a"))), "source_a")
      .join(broadcast(sc.select(col("source").as("source_b"),
        col("types").as("types_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("types_a"),
        col("types_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("types_a") + col("types_b") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Tokenizer fertility per language: subword-ish tokens (the
    * `text_tokens` regex segmentation — letter runs / digit runs /
    * single punctuation) per whitespace word, aggregated per lang —
    * the metric multilingual-tokenizer owners track to spot languages
    * a vocabulary under-serves (fertility ≫ 1 means each word
    * fragments into many tokens, inflating sequence length and
    * training cost). Exact BIGINT sums per group; the ratio is one
    * double division. 100 TB shape: one map-combined hash agg. */
  val fertility: Q = Q(
    "text_fertility",
    """SELECT lang,
      |  COUNT(*)::BIGINT AS n_docs,
      |  SUM(LEN(STRING_SPLIT(TRIM(text), ' ')))::BIGINT AS n_words,
      |  SUM(LEN(REGEXP_EXTRACT_ALL(text, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1)))::BIGINT
      |    AS n_tokens,
      |  CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1)))
      |    AS DOUBLE)
      |    / SUM(LEN(STRING_SPLIT(TRIM(text), ' '))) AS fertility
      |FROM documents
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    documents(s, d)
      .select(col("lang"),
        size(TextAnalysis.words(col("text"))).cast("long").as("w"),
        size(expr("regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1)"))
          .cast("long").as("t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("w").as("n_words"), sum("t").as("n_tokens"),
        (sum("t").cast("double") / sum("w").cast("double")).as("fertility"))
      .orderBy("lang")
  }

  private val HashDims = 1024
  private val TopSlots = 3

  /** Hashing-trick feature vectorization: every token maps to slot
    * polyhash(w) mod 1024 (the portable base-31 hash — BOTH engines
    * compute the identical slot, so the whole feature map is
    * oracle-checked, not just its shape), per-document term
    * frequencies accumulate per slot, and the query emits each doc's
    * top-3 slots — the fixed-dimension, vocabulary-free featurization
    * (Weinberger et al.'s hashing trick) that a quality-classifier
    * pipeline feeds a linear model at corpus scale, where a
    * vocabulary dictionary would itself be a shuffle-sized artifact.
    *
    * 100 TB shape: slotting is map-side row work on the codegen'd
    * one-pass [[graft.functions.PolyHash]]; the only shuffle is the
    * (doc, slot) hash agg (map-combined); the top-k window partitions
    * by doc over ≤ 1024 slot rows each. */
  val hashingTrick: Q = Q(
    "text_hashing_trick",
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
       |  FROM documents),
       |sl AS (
       |  SELECT doc_id,
       |    (LIST_REDUCE(LIST_PREPEND(0::BIGINT,
       |       LIST_TRANSFORM(RANGE(1, LENGTH(w) + 1), i -> ASCII(w[i])::BIGINT)),
       |     (acc, c) -> (acc * 31 + c) % 1000000007)) % $HashDims AS slot
       |  FROM tok),
       |tf AS (SELECT doc_id, slot, COUNT(*)::BIGINT AS tf
       |       FROM sl GROUP BY 1, 2),
       |rk AS (
       |  SELECT doc_id, slot, tf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY tf DESC, slot) AS rank
       |  FROM tf)
       |SELECT doc_id, rank, slot, tf FROM rk
       |WHERE rank <= $TopSlots
       |ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tf").desc, col("slot"))
    documents(s, d)
      .select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .select(col("doc_id"),
        (graft.functions.PolyHash.full(col("w")) % HashDims).as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("tf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopSlots)
      .select("doc_id", "rank", "slot", "tf")
      .orderBy("doc_id", "rank")
  }

  /** Code-vs-prose detection profile: per document, the exact permille
    * of symbol characters (anything outside [A-Za-z0-9 ]) and of digit
    * characters, plus the classification flag a curation pipeline
    * filters on (is_code ⇔ symbol density ≥ 5%). Counting is by length
    * difference after class-targeted regexp_replace — one map-side
    * projection, no tokenization, no floats (Spark replaces all
    * matches by default; the oracle passes the 'g' flag for the same
    * semantics). The aggregate rollup (per source: docs flagged) rides
    * the same pass. */
  val codeDetect: Q = Q(
    "text_code_detect",
    """WITH m AS (
      |  SELECT doc_id, LENGTH(text)::BIGINT AS chars,
      |    (LENGTH(text) -
      |      LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')))::BIGINT
      |      AS n_sym,
      |    (LENGTH(text) -
      |      LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))::BIGINT
      |      AS n_digit
      |  FROM documents)
      |SELECT doc_id, chars,
      |  (1000 * n_sym) // chars AS sym_permille,
      |  (1000 * n_digit) // chars AS digit_permille,
      |  (1000 * n_sym) // chars >= 50 AS is_code
      |FROM m WHERE chars > 0
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val m = documents(s, d).select(col("doc_id"),
      length(col("text")).cast("long").as("chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")))
        .cast("long").as("n_sym"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", "")))
        .cast("long").as("n_digit"))
    m.filter(col("chars") > 0)
      .select(col("doc_id"), col("chars"),
        expr("(1000 * n_sym) div chars").as("sym_permille"),
        expr("(1000 * n_digit) div chars").as("digit_permille"),
        (expr("(1000 * n_sym) div chars") >= 50).as("is_code"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(lexicalDiversity, phraseSearch, sourceVocabOverlap,
    fertility, hashingTrick, codeDetect)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.Tables._

/** Span-level corpus curation (SURVEY.md §2.5 extensions): exact
  * repeated-substring detection and source-scoped boilerplate coverage.
  *
  * Both re-express a suffix-structure computation as POSITIONAL K-GRAM
  * POSTINGS — (doc_id, position, gram-hash) rows — followed by a per-doc
  * interval merge, the shape that distributes:
  *
  *  - the postings relation is produced by a codegen'd per-row shingle
  *    expression (zero shuffles to generate);
  *  - "duplicated gram" is ONE hash aggregation keyed on the 64-bit gram
  *    hash (linear in corpus size — no self-join, so a hot gram is a big
  *    COUNT, never a quadratic key);
  *  - marking hit positions is a keyed join postings ⋈ dup-grams (AQE
  *    broadcasts the dup side when small);
  *  - merging overlapping hits into maximal spans is a gaps-islands
  *    window PARTITIONED BY doc_id — thousands of rows per partition at
  *    any corpus size, never a global window.
  *
  * A suffix array (the single-node formulation of exact substring dedup
  * in the public literature) serializes on one sorted structure; the
  * postings formulation gives the same maximal-span output for spans
  * ≥ k tokens and is embarrassingly parallel. Gram equality is decided
  * on xxhash64 of the gram text (shuffle key 8 B instead of the k-word
  * string); collisions within a corpus vocabulary are ~|V|²/2⁶⁴ —
  * negligible, the same argument as the SHA-256 grouping in
  * [[Dedup.exact]].
  */
object Curation {

  /** minimum duplicated run length, in tokens: a span is reported iff a
    * k-token window repeats verbatim elsewhere in the corpus. 8 tokens ≈
    * the shortest run that is evidence of copying rather than chance
    * collocation on this corpus family. */
  val SpanK = 8

  /** boilerplate gram width + the within-source document-frequency
    * floor: a 3-gram is boilerplate for a source when ≥ 2 distinct docs
    * of that SAME source contain it (header/footer/template text repeats
    * across a source's docs; cross-source repeats are dedup's business,
    * not boilerplate's). */
  val BoilerplateK = 3
  val BoilerplateMinDocs = 2

  /** Merge hit positions (doc_id, pos), each covering [pos, pos+k-1],
    * into maximal spans: gaps-islands over the per-doc position order —
    * a new island starts when the previous hit's window cannot reach the
    * current one. Output: per-doc span count + tokens covered. */
  private def spanStats(hits: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, lit(0))
          .otherwise(lit(1)))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(k - 1)).as("e"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"))
  }

  /** positional k-gram postings: (doc_id [, extra], pos, h) with pos
    * 1-based to match the oracle's RANGE */
  private def posGrams(docs: DataFrame, k: Int, extra: Seq[String]): DataFrame =
    docs.select(col("doc_id") +: extra.map(col) :+
        posexplode(Dedup.shinglesFromWords(split(trim(col("text")), " "), k)): _*)
      .select(col("doc_id") +: extra.map(col) :+
        (col("pos") + 1).as("pos") :+ xxhash64(col("col")).as("h"): _*)

  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))

  /** Exact repeated-substring spans (the train-data "exact substring
    * dedup"): for every doc, the maximal token spans whose every
    * k-window occurs ≥ 2 times in the corpus (within- or cross-doc),
    * reported as span count + duplicated-token count per doc. */
  val spanExact: Q = Q(
    "dedup_span_exact",
    s"""WITH words AS (
       |  SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, u.i AS pos, ARRAY_TO_STRING(w[u.i:u.i+$SpanK-1], ' ') AS g
       |  FROM words, UNNEST(RANGE(1, GREATEST(LEN(w)-$SpanK+2, 1))) u(i)),
       |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
       |hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
       |gaps AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |      <= $SpanK THEN 0 ELSE 1 END AS brk
       |  FROM hits),
       |isl AS (
       |  SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS UNBOUNDED PRECEDING) AS island
       |  FROM gaps),
       |spans AS (
       |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos)+$SpanK-1 AS e
       |  FROM isl GROUP BY doc_id, island),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_spans, SUM(e-s+1) AS dup_tokens
       |  FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(LEN(STRING_SPLIT(TRIM(d.text), ' ')) AS BIGINT) AS n_tokens
       |FROM documents d LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    // one materialization, two consumers (dup-gram agg + hit join) —
    // the postings would otherwise be scanned+exploded twice
    val grams = posGrams(docs, SpanK, Nil).localCheckpoint(true)
    val dup = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("h")
    val hits = grams.join(dup, "h").select("doc_id", "pos")
    docTokens(docs)
      .join(spanStats(hits, SpanK), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Source-scoped boilerplate coverage: tokens of each doc covered by
    * 3-grams that repeat across ≥ 2 distinct docs of the SAME source
    * (template/header text), merged into spans exactly as above. The
    * boilerplate decision keys on (source, gram) — the agg and the hit
    * join both shuffle on that composite key, so one source's templates
    * never become a global hot key. */
  val boilerplate: Q = Q(
    "text_boilerplate",
    s"""WITH words AS (
       |  SELECT doc_id, source, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, source, u.i AS pos,
       |    ARRAY_TO_STRING(w[u.i:u.i+$BoilerplateK-1], ' ') AS g
       |  FROM words, UNNEST(RANGE(1, GREATEST(LEN(w)-$BoilerplateK+2, 1))) u(i)),
       |bp AS (
       |  SELECT source, g FROM grams GROUP BY source, g
       |  HAVING COUNT(DISTINCT doc_id) >= $BoilerplateMinDocs),
       |hits AS (SELECT doc_id, pos FROM grams JOIN bp USING (source, g)),
       |gaps AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |      <= $BoilerplateK THEN 0 ELSE 1 END AS brk
       |  FROM hits),
       |isl AS (
       |  SELECT doc_id, pos, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS UNBOUNDED PRECEDING) AS island
       |  FROM gaps),
       |spans AS (
       |  SELECT doc_id, island, MIN(pos) AS s, MAX(pos)+$BoilerplateK-1 AS e
       |  FROM isl GROUP BY doc_id, island),
       |perdoc AS (SELECT doc_id, SUM(e-s+1) AS bp_tokens FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(p.bp_tokens, 0) AS BIGINT) AS bp_tokens,
       |  CAST(LEN(STRING_SPLIT(TRIM(d.text), ' ')) AS BIGINT) AS n_tokens
       |FROM documents d LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val grams = posGrams(docs, BoilerplateK, Seq("source")).localCheckpoint(true)
    val bp = grams.groupBy("source", "h")
      .agg(count_distinct(col("doc_id")).as("dd"))
      .filter(col("dd") >= BoilerplateMinDocs)
      .select("source", "h")
    val hits = grams.join(bp, Seq("source", "h")).select("doc_id", "pos")
    docTokens(docs)
      .join(spanStats(hits, BoilerplateK)
        .withColumnRenamed("dup_tokens", "bp_tokens"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bp_tokens"), lit(0L)).as("bp_tokens"),
        col("n_tokens"))
      .orderBy("doc_id")
  }

  /** semantic-dedup bucket width: 2⁸ = 256 clusters at test SF. The
    * bucket ASSIGNMENT is part of the operator's semantics (pairs are
    * only compared within a bucket), so unlike [[Dedup.embeddingCosine]]
    * — whose cell pruning is exact and bits-independent — this constant
    * must be FIXED for oracle parity. Production sets bits ≈
    * log₂(n/target-bucket-size): buckets scale with the corpus, keeping
    * the within-bucket quadratic bounded; the [[SemBucketCap]] guard
    * (mirrored in the oracle, [[Dedup.BandBucketCap]] pattern) bounds
    * the damage of any residual hot bucket. */
  val SemBits = 8
  val SemBucketCap: Int = Dedup.BandBucketCap
  val SemThreshold: Double = Dedup.CosineThreshold

  private val EmbDim = 64

  /** Semantic dedup over embeddings (the SemDeDup recipe from the public
    * literature, deterministic form): cluster vectors, then within each
    * cluster drop every vector that is near-duplicate (cosine ≥ τ) of a
    * kept one. Clusters here are deterministic hyperplane-LSH buckets
    * ([[Similarity.lshSignature]]) standing in for SemDeDup's k-means —
    * reproducible across engines, so the WHOLE pipeline is
    * oracle-checked (the seeded-k-means variants can't be). The keep
    * rule is greedy-by-id: v is removed iff some lower-id vector in its
    * bucket sits within the threshold — the public result that a random
    * exemplar works as well as the centroid-nearest one makes lowest-id
    * a faithful deterministic stand-in. */
  val semantic: Q = {
    import graft.functions.VectorFunctions
    val projCols = (0 until SemBits)
      .map(p => s"${Similarity.duckProj(p)} AS proj_$p").mkString(",\n    ")
    val sigExpr = (0 until SemBits)
      .map(p => s"(CASE WHEN proj_$p >= 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << $p)")
      .mkString(" | ")
    Q(
      "dedup_semantic",
      s"""WITH proj AS (
         |  SELECT vec_id, embedding,
         |    $projCols
         |  FROM embeddings),
         |sig AS (SELECT vec_id, embedding, $sigExpr AS bucket FROM proj),
         |capped AS (
         |  SELECT vec_id, embedding, bucket FROM sig
         |  QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= $SemBucketCap),
         |rm AS (
         |  SELECT DISTINCT b.vec_id AS rm
         |  FROM capped a JOIN capped b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${VectorFunctions.duckCosine("a.embedding", "b.embedding", EmbDim)} >= $SemThreshold)
         |SELECT s.vec_id, s.bucket, (rm.rm IS NULL) AS keep
         |FROM sig s LEFT JOIN rm ON s.vec_id = rm.rm
         |ORDER BY s.vec_id""".stripMargin) { (s, d) =>
      import VectorFunctions.{dot, norm}
      val sig = embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          Similarity.lshSignature(col("embedding"), SemBits).as("bucket"))
        .localCheckpoint(true) // three consumers: cap, pair join ×2, output
      val w = Window.partitionBy("bucket")
      val capped = sig.withColumn("bn", count(lit(1)).over(w))
        .filter(col("bn") <= SemBucketCap)
        .select(col("vec_id"), col("bucket"),
          col("embedding"), norm(col("embedding")).as("nrm"))
      val removed = capped.as("a").join(capped.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")) >= SemThreshold)
        .select(col("b.vec_id").as("rm"))
        .distinct()
      sig.join(removed, sig("vec_id") === removed("rm"), "left")
        .select(col("vec_id"), col("bucket"), col("rm").isNull.as("keep"))
        .orderBy("vec_id")
    }
  }

  /** BPE merge candidates, iteration zero: corpus-wide frequencies of
    * adjacent character pairs within words — the statistic the first BPE
    * merge maximizes (tokenizer-training prep). One explode + one hash
    * agg. The global top-30 is `orderBy().limit(30)` — planned as
    * TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
    * NOT a rank window: on a CJK/multilingual corpus the character-bigram
    * vocabulary reaches 10⁷⁺ rows, and `Window.orderBy` would serialize
    * all of them onto one task. Ranks are then recovered from the 30
    * surviving rows via one collect_list→sort_array→posexplode (a normal
    * two-phase global aggregate — no WindowExec in the plan at all). */
  val bpeMerges: Q = Q(
    "text_bpe_merges",
    """WITH words AS (
      |  SELECT UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w FROM documents),
      |pairs AS (
      |  SELECT SUBSTRING(w, u.i, 2) AS pair
      |  FROM words, UNNEST(RANGE(1, GREATEST(LEN(w), 1))) u(i)
      |  WHERE LEN(w) >= 2),
      |c AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair)
      |SELECT pair, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
      |FROM c QUALIFY rank <= 30 ORDER BY rank""".stripMargin) { (s, d) =>
    val counts = documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w)-1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    counts
      .orderBy(col("cnt").desc, col("pair"))
      .limit(30)
      // rank without a window: 30 rows → one sorted array → posexplode.
      // Sort key (-cnt, pair) gives cnt DESC, pair ASC via the default
      // ascending lexicographic struct order.
      .agg(sort_array(collect_list(struct(
        (-col("cnt")).as("nc"), col("pair"), col("cnt")))).as("xs"))
      .select(posexplode(col("xs")).as(Seq("pos", "x")))
      .select(col("x.pair").as("pair"), col("x.cnt").as("cnt"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("rank")
  }

  /** Per-source dedup-inflation report: how much of each source exact +
    * near dedup would remove. A doc is removed when it is a
    * non-representative exact copy (same normalized text as a lower-id
    * doc) or a non-representative member of a near-dup component
    * ([[Dedup.sharedLabels]] — materialized once per session/corpus and
    * shared with the other four component consumers, so this report adds
    * one broadcast-sized join, not a components recompute). The rollup
    * itself is one groupBy(source) over doc-grain rows.
    *
    * Oracle note: `removed` dedupes with an explicit DISTINCT over UNION
    * ALL, not a plain UNION — DuckDB 1.0.0 loses the cross-branch dedup
    * of a plain UNION in a NON-recursive CTE that sits inside a `WITH
    * RECURSIVE` list (repro: `WITH RECURSIVE t(x) AS (SELECT 1 UNION
    * SELECT 2), u AS (SELECT 1 AS x UNION SELECT x FROM t) SELECT
    * count(*) FROM u` → 3, not 2). The sf0.01 gate could not see it (no
    * doc was both an exact copy AND a near-dup member there); the sf0.1
    * sweep caught docs in the overlap joining twice and inflating every
    * per-source count. The other recursive oracles are immune: their
    * only plain UNIONs are `edges` (branches disjoint by a_id < b_id)
    * and `reach` (genuinely recursive, standard semantics). */
  val dupInflation: Q = Q(
    "dedup_inflation",
    s"""WITH RECURSIVE jp AS (${Dedup.duckJaccardPairs}),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM jp
       |  UNION SELECT b_id, a_id FROM jp),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS id, LEAST(src, MIN(dst)) AS rep
       |  FROM reach GROUP BY src),
       |exdup AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      MIN(doc_id) OVER (PARTITION BY LOWER(TRIM(text))) AS keep
       |    FROM documents)
       |  WHERE doc_id <> keep),
       |removed AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id FROM exdup
       |    UNION ALL SELECT id FROM labels WHERE id <> rep))
       |SELECT d.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(r.doc_id) AS BIGINT) AS n_removed,
       |  CAST(SUM(LEN(STRING_SPLIT(TRIM(d.text), ' '))) AS BIGINT) AS tokens_total,
       |  CAST(COALESCE(SUM(CASE WHEN r.doc_id IS NOT NULL
       |    THEN LEN(STRING_SPLIT(TRIM(d.text), ' ')) END), 0) AS BIGINT)
       |    AS tokens_removed
       |FROM documents d LEFT JOIN removed r USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    // shuffle key = content hash, not the raw normalized text — the
    // same 10×-smaller-exchange argument as [[Dedup.exact]]
    val exdup = docs
      .withColumn("keep",
        min(col("doc_id")).over(Window.partitionBy(
          sha2(encode(lower(trim(col("text"))), "UTF-8"), 256))))
      .filter(col("doc_id") =!= col("keep"))
      .select("doc_id")
    val neardup = Dedup.sharedLabels(s, d)
      .filter(col("id") =!= col("rep_id"))
      .select(col("id").as("doc_id"))
    val removed = exdup.union(neardup).distinct()
      .withColumn("rm", lit(1))
    docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      .join(removed, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("rm")).as("n_removed"),
        sum(col("n_tokens")).as("tokens_total"),
        coalesce(sum(when(col("rm").isNotNull, col("n_tokens"))), lit(0L))
          .as("tokens_removed"))
      .orderBy("source")
  }

  /** Token-budget curation pack: the greedy selection a training-data
    * pipeline runs when the next training stage has a fixed token
    * budget — rank documents by an integer quality score (type-token
    * ratio in permille: distinct tokens per token, the cheapest
    * redundancy proxy), take documents in (score desc, doc_id) order
    * while the running token total fits, budget = ¼ of the corpus's
    * tokens. Everything is exact integers; the kept set is a PREFIX of
    * a total order, so the output is deterministic at any scale.
    *
    * 100 TB shape: the global ordered running sum rides ONE
    * [[ScalableWindows.globalRunningSum]] two-pass (range partition +
    * per-partition offsets) — no single-task global window — and the
    * budget is a 1-row broadcast. */
  val tokenBudget: Q = Q(
    "curation_token_budget",
    """WITH tk AS (
      |  SELECT doc_id,
      |    LEN(STRING_SPLIT(TRIM(text), ' '))::BIGINT AS n_tok,
      |    LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' ')))::BIGINT
      |      AS n_uniq
      |  FROM documents),
      |sc AS (SELECT doc_id, n_tok,
      |         (1000 * n_uniq) // n_tok AS score FROM tk),
      |b AS (SELECT SUM(n_tok) // 4 AS budget FROM sc),
      |r AS (
      |  SELECT doc_id, n_tok, score,
      |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn,
      |    SUM(n_tok) OVER (ORDER BY score DESC, doc_id) AS cum
      |  FROM sc)
      |SELECT rn, doc_id, n_tok, score, CAST(cum AS BIGINT) AS cum
      |FROM r CROSS JOIN b WHERE cum <= budget
      |ORDER BY rn""".stripMargin) { (s, d) =>
    val ws = split(trim(col("text")), " ")
    val sc = documents(s, d)
      .select(col("doc_id"), size(ws).cast("long").as("n_tok"),
        size(array_distinct(ws)).cast("long").as("n_uniq"))
      .withColumn("score", expr("(1000 * n_uniq) div n_tok"))
      .select("doc_id", "n_tok", "score")
      // r17: the budget agg, the range partitioner's sampling pass and
      // its shuffle each re-tokenized the corpus (split per doc ×3);
      // the narrow (doc_id, n_tok, score) spine materializes once
      .localCheckpoint(true)
    val budget = broadcast(sc.agg(expr("sum(n_tok) div 4").as("budget")))
    ScalableWindows.globalRunningSum(sc,
        Seq(col("score").desc, col("doc_id")), col("n_tok"), "rn", "cum")
      // one-row scalar attach — the documented BNL exemption (q70 /
      // text_perplexity pattern; CurationSpec exempts this query)
      .crossJoin(budget)
      .filter(col("cum") <= col("budget"))
      .select(col("rn"), col("doc_id"), col("n_tok"), col("score"),
        col("cum"))
      .orderBy("rn")
  }

  /** Sequence packing for training (the GPT-style concat-and-chunk
    * prep): documents that pass the cheap per-row gates (holdout
    * excluded, quality window) are concatenated in doc_id order and
    * chunked into fixed 2048-token context windows; each doc's
    * placement — first/last chunk index, chunks spanned, offset inside
    * its first chunk — falls out of the exclusive running token sum.
    * This is the shard-order packing map a data loader consumes (and
    * the n_chunks > 1 rows are exactly the documents a
    * cross-document-attention mask must handle).
    *
    * NULL semantics match [[TextAnalysis3.qualityBad]] exactly: a NULL
    * text yields a NULL quality predicate, which COALESCEs to not-bad
    * on BOTH sides (keepList's contract) — a corpus with missing text
    * cannot shift the cumulative sums on one side only.
    *
    * Everything is exact integer arithmetic on a deterministic total
    * order. 100 TB shape: the ONLY non-map-side work is one
    * [[ScalableWindows.globalRunningSum]] two-pass (range partition +
    * per-partition offsets — no single-task global window); chunk
    * indices are per-row divisions after that. */
  val packBins: Q = {
    val cap = 2048L
    Q(
      "curation_pack_bins",
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    LEN(STRING_SPLIT(TRIM(text), ' '))::BIGINT AS n_tok,
         |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS DOUBLE)
         |      / LEN(STRING_SPLIT(TRIM(text), ' ')) AS ttr
         |  FROM documents),
         |keep AS (
         |  SELECT doc_id, n_tok FROM tk
         |  WHERE doc_id % 50 <> 0
         |    AND NOT COALESCE(NOT (n_tok BETWEEN 20 AND 80 AND ttr >= 0.3),
         |                     FALSE)),
         |r AS (
         |  SELECT doc_id, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM keep)
         |SELECT doc_id, n_tok,
         |  (cum - n_tok) // $cap AS first_chunk,
         |  (cum - 1) // $cap AS last_chunk,
         |  ((cum - 1) // $cap) - ((cum - n_tok) // $cap) + 1 AS n_chunks,
         |  (cum - n_tok) % $cap AS chunk_offset
         |FROM r
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      placement(documents(s, d), cap)
        .select(col("doc_id"), col("n_tok"),
          col("first_chunk"), col("last_chunk"),
          (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks"),
          col("chunk_offset"))
        .orderBy("doc_id")
    }
  }

  /** CDC × curation composition (r13 VERDICT task 2 — "the production
    * loop the whole topology exists for"): after a CDC batch of
    * document edits, which documents' curation verdicts CHANGED vs the
    * prior epoch snapshot?
    *
    * The change stream: every doc_id ≡ 3 (mod 7) is edited — half
    * truncated to their first 15 words (doc_id ≡ 3 mod 14), half
    * doubled (≡ 10 mod 14) — and delivered AT-LEAST-ONCE: the batch
    * carries the v2 edit plus a stale v1 re-delivery per key, which
    * [[Cdc.latestByKey]] (the ST2 primitive, reused unchanged)
    * collapses to the v2 row. Truncation drives kept/dup verdicts →
    * 'quality' (too short); doubling flips BOTH ways (short gibberish
    * enters the [20, 80] window → 'quality' becomes 'kept'/'near_dup';
    * diffuse text halves its type-token ratio → the reverse), so the
    * delta relation is exercised in both directions.
    *
    * Gate adjudication (which gates update incrementally): `holdout`
    * (key-derived) and `quality_bad` (pure per-row text function)
    * recompute from the batch alone — O(|batch|). The relational gates
    * (`exact_dup`, `near_dup`, `contaminated`) are functions of the
    * WHOLE corpus and stay FROZEN to the epoch's materialized
    * [[TextAnalysis3.curationFlags]] snapshot, rebuilding at the next
    * epoch — the standing lake-pipeline contract (their incremental
    * index twins live in [[graft.streaming.Streams.curationIncrementalBatch]],
    * which maintains arriving-doc exact/contamination state per batch).
    * Old verdict = the epoch flag row as-is; new verdict = same flags
    * with quality_bad recomputed on the post-CDC text.
    *
    * 100 TB shape: batch compaction is one shuffle on the key
    * ([[Cdc.latestByKey]]); the epoch flags are a linear join pruned to
    * batch keys; nothing rescans the corpus. Reference grounding: the
    * stream fully determines table state (debezium.json:18), so
    * verdict deltas are derivable from it. */
  val recurationDelta: Q = Q(
    "cdc_recuration_delta",
    s"""WITH chg AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 14 = 3
       |         THEN ARRAY_TO_STRING((STRING_SPLIT(TRIM(text), ' '))[1:15], ' ')
       |         ELSE TRIM(text) || ' ' || TRIM(text) END AS new_text
       |  FROM documents WHERE doc_id % 7 = 3),
       |w AS (
       |  SELECT doc_id,
       |    LEN(STRING_SPLIT(TRIM(text), ' ')) AS n_words,
       |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS DOUBLE)
       |      / LEN(STRING_SPLIT(TRIM(text), ' ')) AS ttr
       |  FROM documents),
       |nw AS (
       |  SELECT doc_id,
       |    LEN(STRING_SPLIT(TRIM(new_text), ' ')) AS n_words,
       |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(new_text), ' '))) AS DOUBLE)
       |      / LEN(STRING_SPLIT(TRIM(new_text), ' ')) AS ttr
       |  FROM chg),
       |ex AS (SELECT LOWER(TRIM(text)) AS norm, MIN(doc_id) AS keep_id
       |       FROM documents GROUP BY 1),
       |exd AS (SELECT d.doc_id FROM documents d
       |        JOIN ex ON LOWER(TRIM(d.text)) = ex.norm
       |        WHERE d.doc_id <> ex.keep_id),
       |jp AS (${Dedup.duckJaccardPairs}),
       |nd AS (SELECT DISTINCT b_id AS doc_id FROM jp),
       |ws5 AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents),
       |sh5 AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, UNNEST(${TextAnalysis3.duckRawShingles(5)}) AS s FROM ws5)),
       |hold AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 50 = 0),
       |cont AS (SELECT DISTINCT sh5.doc_id FROM sh5 JOIN hold USING (s)
       |         WHERE sh5.doc_id % 50 <> 0),
       |fl AS (
       |  SELECT w.doc_id,
       |    w.doc_id % 50 = 0 AS holdout,
       |    COALESCE(NOT (w.n_words BETWEEN 20 AND 80 AND w.ttr >= 0.3),
       |             FALSE) AS quality_bad,
       |    w.doc_id IN (SELECT doc_id FROM exd) AS exact_dup,
       |    w.doc_id IN (SELECT doc_id FROM nd) AS near_dup,
       |    w.doc_id IN (SELECT doc_id FROM cont) AS contaminated,
       |    w.n_words AS old_n
       |  FROM w),
       |v AS (
       |  SELECT fl.doc_id,
       |    CASE WHEN holdout THEN 'holdout'
       |         WHEN quality_bad THEN 'quality'
       |         WHEN exact_dup THEN 'exact_dup'
       |         WHEN near_dup THEN 'near_dup'
       |         WHEN contaminated THEN 'contaminated'
       |         ELSE 'kept' END AS old_reason,
       |    CASE WHEN holdout THEN 'holdout'
       |         WHEN COALESCE(NOT (nw.n_words BETWEEN 20 AND 80
       |                            AND nw.ttr >= 0.3), FALSE) THEN 'quality'
       |         WHEN exact_dup THEN 'exact_dup'
       |         WHEN near_dup THEN 'near_dup'
       |         WHEN contaminated THEN 'contaminated'
       |         ELSE 'kept' END AS new_reason,
       |    CAST(fl.old_n AS BIGINT) AS old_n_tok,
       |    CAST(nw.n_words AS BIGINT) AS new_n_tok
       |  FROM fl JOIN nw ON nw.doc_id = fl.doc_id)
       |SELECT doc_id, old_reason, new_reason, old_n_tok, new_n_tok
       |FROM v WHERE old_reason <> new_reason
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = documents(s, d)
    val trimmed = trim(col("text"))
    // concat (not concat_ws): NULL text must stay NULL on both sides —
    // the oracle's || is NULL-propagating, concat_ws is NULL-swallowing
    val edited = when(col("doc_id") % 14 === 3,
        array_join(slice(split(trimmed, " "), 1, 15), " "))
      .otherwise(concat(trimmed, lit(" "), trimmed))
    val touched = docs.filter(col("doc_id") % 7 === 3)
    // the at-least-once CDC batch: v2 edit + stale v1 re-delivery
    val batch = touched
      .select(col("doc_id"), edited.as("text"), lit(2L).as("version"))
      .unionByName(touched
        .select(col("doc_id"), col("text"), lit(1L).as("version")))
    val compacted = Cdc.latestByKey(batch, Seq("doc_id"), Seq(col("version")))
      .select(col("doc_id"), col("text").as("new_text"))
    val newQualityBad = TextAnalysis3.qualityBad(col("new_text"))
    docs.select(col("doc_id"), col("text"))
      .join(compacted, "doc_id")
      .join(TextAnalysis3.curationFlags(s, d), "doc_id") // frozen epoch
      .select(col("doc_id"),
        TextAnalysis3.curationReason.as("old_reason"),
        when(col("holdout"), "holdout")
          .when(newQualityBad, "quality")
          .when(col("exact_dup"), "exact_dup")
          .when(col("near_dup"), "near_dup")
          .when(col("contaminated"), "contaminated")
          .otherwise("kept").as("new_reason"),
        size(split(trim(col("text")), " ")).cast("bigint").as("old_n_tok"),
        size(split(trim(col("new_text")), " ")).cast("bigint").as("new_n_tok"))
      .filter(col("old_reason") =!= col("new_reason"))
      .orderBy("doc_id")
  }

  /** Pack placement for one corpus snapshot — the [[packBins]] pipeline
    * up to the chunk arithmetic, reused by the epoch query and the
    * delta query below. */
  private def placement(docs: DataFrame, cap: Long): DataFrame = {
    val ws = split(trim(col("text")), " ")
    val keep = docs
      .filter(!TextAnalysis3.isHoldout(col("doc_id")) &&
        !TextAnalysis3.qualityBad(col("text")))
      .select(col("doc_id"), size(ws).cast("long").as("n_tok"))
      // r17: tokenize once — the two-pass sampling pass re-split every
      // doc's text before this checkpoint existed
      .localCheckpoint(true)
    ScalableWindows.globalRunningSum(keep,
        Seq(col("doc_id")), col("n_tok"), "rn", "cum")
      .select(col("doc_id"), col("n_tok"),
        expr(s"(cum - n_tok) div $cap").as("first_chunk"),
        expr(s"(cum - 1) div $cap").as("last_chunk"),
        expr(s"(cum - n_tok) % $cap").as("chunk_offset"))
  }

  /** The SQL face of [[placement]] over a (doc_id, text) relation named
    * `src`, emitting doc_id/n_tok/first_chunk/last_chunk/chunk_offset. */
  private def duckPlacement(src: String, cap: Long): String =
    s"""SELECT doc_id, n_tok,
       |    (cum - n_tok) // $cap AS first_chunk,
       |    (cum - 1) // $cap AS last_chunk,
       |    (cum - n_tok) % $cap AS chunk_offset
       |  FROM (
       |    SELECT doc_id, n_tok,
       |      CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum
       |    FROM (
       |      SELECT doc_id,
       |        LEN(STRING_SPLIT(TRIM(text), ' '))::BIGINT AS n_tok,
       |        CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS DOUBLE)
       |          / LEN(STRING_SPLIT(TRIM(text), ' ')) AS ttr
       |      FROM $src)
       |    WHERE doc_id % 50 <> 0
       |      AND NOT COALESCE(NOT (n_tok BETWEEN 20 AND 80 AND ttr >= 0.3),
       |                       FALSE))""".stripMargin

  /** Incremental PACK delta (r14 VERDICT task 6) — one composition step
    * past [[recurationDelta]]: when a CDC batch of document edits flips
    * curation verdicts (and token counts), WHICH context windows of the
    * epoch's packing map ([[packBins]]) change? This is the
    * chunk-invalidation set an incremental training-data refresh ships
    * to its data loader instead of a full re-pack.
    *
    * The edit stream is [[recurationDelta]]'s, delivered at-least-once
    * and compacted by [[Cdc.latestByKey]] (the ST2 primitive) — the
    * same CDC provenance, composed one stage further. Placement deltas
    * come from a full-outer join of the pre- and post-edit packing
    * maps: `removed` (verdict flipped out of the pack), `added`
    * (flipped in), `moved` (placement or token count changed). The
    * exclusive-running-sum construction makes the PREFIX exact: every
    * doc wholly before the first edit keeps its placement and never
    * appears here (the spec asserts it); after the first edit the
    * suffix is invalidated except where token corrections happen to
    * cancel exactly — which the join detects per doc instead of
    * over-invalidating the whole suffix.
    *
    * 100 TB shape: two [[ScalableWindows.globalRunningSum]] two-passes
    * (range partition + per-partition offsets — the same cost class as
    * the epoch pack this query patches) plus one key-partitioned
    * full-outer join; no all-pairs, no driver loop. When the edit
    * fraction is tiny, the post-edit prefix sum is further reducible to
    * an as-of join against the running sum of per-edit token
    * corrections (O(edits) instead of O(corpus)) — documented as the
    * scale path; at the registered corpus the edit stream touches 1/7
    * of all docs, so the two-pass IS the right plan. */
  val packDelta: Q = {
    val cap = 2048L
    Q(
      "curation_pack_delta",
      s"""WITH chg AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 14 = 3
         |         THEN ARRAY_TO_STRING((STRING_SPLIT(TRIM(text), ' '))[1:15], ' ')
         |         ELSE TRIM(text) || ' ' || TRIM(text) END AS new_text
         |  FROM documents WHERE doc_id % 7 = 3),
         |post AS (
         |  SELECT d.doc_id, COALESCE(c.new_text, d.text) AS text
         |  FROM documents d LEFT JOIN chg c ON c.doc_id = d.doc_id),
         |oldp AS (${duckPlacement("documents", cap)}),
         |newp AS (${duckPlacement("post", cap)})
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       ELSE 'moved' END AS change,
         |  o.first_chunk AS old_first_chunk,
         |  n.first_chunk AS new_first_chunk,
         |  o.chunk_offset AS old_chunk_offset,
         |  n.chunk_offset AS new_chunk_offset
         |FROM oldp o FULL JOIN newp n ON o.doc_id = n.doc_id
         |WHERE o.doc_id IS NULL OR n.doc_id IS NULL
         |   OR o.first_chunk <> n.first_chunk OR o.last_chunk <> n.last_chunk
         |   OR o.chunk_offset <> n.chunk_offset OR o.n_tok <> n.n_tok
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val trimmed = trim(col("text"))
      val edited = when(col("doc_id") % 14 === 3,
          array_join(slice(split(trimmed, " "), 1, 15), " "))
        .otherwise(concat(trimmed, lit(" "), trimmed))
      val touched = docs.filter(col("doc_id") % 7 === 3)
      val batch = touched
        .select(col("doc_id"), edited.as("text"), lit(2L).as("version"))
        .unionByName(touched
          .select(col("doc_id"), col("text"), lit(1L).as("version")))
      val compacted = Cdc.latestByKey(batch, Seq("doc_id"),
          Seq(col("version")))
        .select(col("doc_id"), col("text").as("new_text"))
      val post = docs.join(compacted, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("new_text"), col("text")).as("text"))
      val o = placement(docs, cap).select(col("doc_id").as("o_id"),
        col("n_tok").as("o_n"), col("first_chunk").as("o_fc"),
        col("last_chunk").as("o_lc"), col("chunk_offset").as("o_off"))
      val n2 = placement(post, cap).select(col("doc_id").as("n_id"),
        col("n_tok").as("n_n"), col("first_chunk").as("n_fc"),
        col("last_chunk").as("n_lc"), col("chunk_offset").as("n_off"))
      o.join(n2, col("o_id") === col("n_id"), "full_outer")
        .filter(col("o_id").isNull || col("n_id").isNull ||
          col("o_fc") =!= col("n_fc") || col("o_lc") =!= col("n_lc") ||
          col("o_off") =!= col("n_off") || col("o_n") =!= col("n_n"))
        .select(coalesce(col("o_id"), col("n_id")).as("doc_id"),
          when(col("o_id").isNull, "added")
            .when(col("n_id").isNull, "removed")
            .otherwise("moved").as("change"),
          col("o_fc").as("old_first_chunk"),
          col("n_fc").as("new_first_chunk"),
          col("o_off").as("old_chunk_offset"),
          col("n_off").as("new_chunk_offset"))
        .orderBy("doc_id")
    }
  }

  val all: Seq[Q] = Seq(spanExact, boilerplate, semantic, bpeMerges,
    dupInflation, tokenBudget, packBins, recurationDelta, packDelta)
}

package graft.operators

import graft.Tables
import graft.functions.Texts._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the training-data
  * pipeline surface: wordcount, token stats, quality scoring,
  * language-ID heuristic, canonical fingerprinting, shingle profile,
  * exact dedup.
  *
  * Everything is `functions._` (codegen'd); ratios are computed as a
  * single double division of exact integer counts, so the DuckDB
  * oracle reproduces values bit-for-bit without rounding games.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** [[graft.Tables.fanned]] documents — used by the operators whose
    * per-row kernel work (gram explodes over every document) dominates
    * the scan stage; map-only/scan-speed operators keep the bare scan
    * (the fan-out exchange would be their whole cost). */
  private def fannedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.fanned(spark, dir, "documents")

  /** The WindowedWordCountSolace core: global word count. */
  def wordCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  val wordCountSql: String =
    """SELECT word, count(*) AS cnt FROM (
      | SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> '' GROUP BY word""".stripMargin

  /** Windowed word count: messages (events) carry document payloads
    * (deterministic doc_id = event_id % |documents|); words counted in
    * tumbling 1-hour windows — the full WindowedWordCountSolace
    * pipeline shape as a batch query. */
  def windowedWordCount(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // Algebraic form: count(ws, word) = Σ_doc n_events(ws, doc) · n_word(doc, word).
    // Both inputs are pre-aggregated, so the join carries |hours|·|docs| and
    // |docs|·|vocab_per_doc| rows instead of |events|·~80 exploded tokens —
    // the shuffle no longer scales with the event stream's token volume.
    // |documents| enters the plan as a broadcast 1-row aggregate (no eager
    // driver-side count()).
    val nd = d.agg(count(lit(1)).as("n_docs"))
    val evc = Tables(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("ws"), col("event_id"))
      .crossJoin(broadcast(nd))
      .select(col("ws"), (col("event_id") % col("n_docs")).as("did"))
      .groupBy(col("ws"), col("did"))
      .agg(count(lit(1)).as("n_ev"))
    val wc = d
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("n_word"))
    evc.join(wc, col("did") === col("doc_id"))
      .groupBy(col("ws"), col("word"))
      .agg(sum(col("n_ev") * col("n_word")).as("cnt"))
  }

  val windowedWordCountSql: String =
    """SELECT ws, word, count(*) AS cnt FROM (
      | SELECT date_trunc('hour', e.ts) AS ws,
      |        unnest(string_split(d.text, ' ')) AS word
      | FROM events e
      | JOIN documents d ON d.doc_id = e.event_id % (SELECT count(*) FROM documents))
      |WHERE word <> '' GROUP BY ws, word""".stripMargin

  /** Exact dedup with a synthesized redelivered tail (every 20th doc
    * duplicated under a shifted id): group identical texts, keep the
    * smallest id. Hash-groupBy on the full text — at 100 TB you'd
    * group on md5(text) first (same result, 16-byte shuffle keys);
    * we group on the fingerprint here for exactly that reason. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select("doc_id", "text")
    val dup = d.filter(col("doc_id") % 20 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    d.unionAll(dup)
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
  }

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM (
      | SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0)
      |GROUP BY md5(text)""".stripMargin

  /** Token counting: whitespace tokens and regex word tokens. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("n_re_tokens"),
      length(col("text")).cast("long").as("n_chars_seen"))

  val tokenCountSql: String =
    """SELECT doc_id,
      | len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
      | len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
      | length(text) AS n_chars_seen
      |FROM documents""".stripMargin

  /** Sequence-PACKING assignment — the pretraining concatenation
    * layout: documents within a stratum are laid end-to-end in
    * doc_id order and every [[packSeqLen]]-token window of the
    * concatenation becomes one training sequence, so each doc gets
    * (start_off, seq_id, off_in_seq) — the sequence its first token
    * lands in and where (docs straddle boundaries exactly as packed
    * pretraining batches do; a tokenizer-side writer consumes these
    * offsets verbatim). Pure window arithmetic: one cumulative sum
    * per stratum ordered by doc_id — deterministic (doc_id is
    * unique), integer-exact (`div`/`%`, no doubles), one shuffle.
    * Strata pack independently and in parallel; within a stratum the
    * running sum is the one inherently sequential piece — the same
    * per-partition window class as q_cumulative, range-partitioned
    * by the window key at scale. */
  val packSeqLen = 256

  def docPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr(s"start_off div $packSeqLen"))
      .withColumn("off_in_seq", col("start_off") % packSeqLen)
  }

  val docPackSequencesSql: String =
    s"""WITH t AS (
       | SELECT doc_id, source,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |       AS BIGINT) AS n_tokens
       | FROM documents),
       |c AS (
       | SELECT doc_id, source, n_tokens,
       |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
       |       - n_tokens AS BIGINT) AS start_off
       | FROM t)
       |SELECT doc_id, source, n_tokens, start_off,
       | start_off // $packSeqLen AS seq_id,
       | start_off % $packSeqLen AS off_in_seq
       |FROM c""".stripMargin

  /** Sliding-window CHUNKING — the retrieval/pretraining splitter
    * [[docPackSequences]] is the concatenating dual of: long
    * documents are cut into [[chunkTokens]]-token windows advancing
    * by [[chunkStride]] (overlap = chunkTokens − chunkStride keeps
    * boundary-straddling context retrievable — the standard RAG
    * chunker shape), each chunk emitted as (doc_id, chunk_idx,
    * start_tok, n_tok_chunk, md5 digest of the space-joined window).
    * Window count is INTEGER-exact (1 + ⌈(n − chunk)/stride⌉ via
    * div arithmetic — no doubles), the digest is md5 of a
    * deterministic token slice, and the whole operator is one
    * map-side projection + posexplode — ZERO shuffles, scan speed at
    * any corpus size (the mm_frame_sample shape over tokens instead
    * of bytes). */
  val chunkTokens = 64
  val chunkStride = 48

  def docChunkWindows(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("n_chunks",
        when(col("n_tok") <= chunkTokens, lit(1L))
          .otherwise(lit(1L) + expr(
            s"(n_tok - $chunkTokens + $chunkStride - 1) div $chunkStride")))
      .select(col("doc_id"), col("tk"), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * chunkStride)
      .select(
        col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(chunkTokens.toLong), col("n_tok") - col("start_tok"))
          .as("n_tok_chunk"),
        md5(concat_ws(" ",
          slice(col("tk"), (col("start_tok") + 1).cast("int"), lit(chunkTokens)))
          .cast("binary")).as("chunk_digest"))

  val docChunkWindowsSql: String =
    s"""WITH t AS (
       | SELECT doc_id,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS tk
       | FROM documents),
       |n AS (
       | SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok,
       |  CASE WHEN len(tk) <= $chunkTokens THEN 1
       |   ELSE 1 + (len(tk) - $chunkTokens + $chunkStride - 1) // $chunkStride
       |  END AS n_chunks
       | FROM t WHERE len(tk) > 0),
       |c AS (
       | SELECT doc_id, tk, n_tok,
       |  unnest(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) AS chunk_idx
       | FROM n)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       | CAST(chunk_idx * $chunkStride AS BIGINT) AS start_tok,
       | CAST(least($chunkTokens, n_tok - chunk_idx * $chunkStride) AS BIGINT)
       |  AS n_tok_chunk,
       | md5(array_to_string(
       |  tk[CAST(chunk_idx * $chunkStride + 1 AS BIGINT) :
       |     CAST(chunk_idx * $chunkStride + $chunkTokens AS BIGINT)], ' '))
       |  AS chunk_digest
       |FROM c""".stripMargin

  /** Corpus-frequency QUALITY PROXY — the CCNet idea (rank documents
    * by how typical their vocabulary is) reduced to exact integer
    * arithmetic so it cross-engine gates: `commonness` is the mean
    * DOCUMENT FREQUENCY share of the doc's token instances
    * (Σ df(tok) as one long, divided ONCE by n_inst · n_docs — a
    * single IEEE division of exact integers, no order-dependent
    * float sums, no log()), and `hapax_frac` the corpus-unique
    * instance fraction. High commonness = templated/boilerplate-ish
    * text stitched from ubiquitous tokens; high hapax = garbage or
    * OCR noise — both tails are what curation drops. `keep` flags
    * commonness < [[commonnessKeepMax]] (sized to the test corpus's
    * median; real corpora sit far lower and set their own policy).
    * Scale shape = [[tfidfTopTerm]]'s: explode → vocabulary-sized df
    * aggregate → instance join (AQE broadcasts a small vocab; a
    * 10⁸-token one shuffles on the token key) → per-doc re-agg. */
  val commonnessKeepMax = 0.778

  def docTermCommonness(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val nd = d.agg(count(lit(1)).as("n_docs"))
    val inst = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dfreq = inst.distinct().groupBy(col("tok")).agg(count(lit(1)).as("df"))
    inst.join(dfreq, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_inst"),
        sum(col("df")).as("df_sum"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), col("n_inst"),
        (col("df_sum").cast("double") / (col("n_inst") * col("n_docs")))
          .as("commonness"),
        (col("n_hapax").cast("double") / col("n_inst")).as("hapax_frac"))
      .withColumn("keep", col("commonness") < commonnessKeepMax)
  }

  val docTermCommonnessSql: String =
    s"""WITH t AS (
       | SELECT doc_id,
       |  unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
       | FROM documents),
       |nd AS (SELECT count(*) AS n_docs FROM documents),
       |df AS (
       | SELECT tok, count(*) AS df
       | FROM (SELECT DISTINCT doc_id, tok FROM t) GROUP BY tok),
       |s AS (
       | SELECT doc_id, count(*) AS n_inst,
       |  CAST(sum(df) AS BIGINT) AS df_sum,
       |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
       | FROM t JOIN df USING (tok) GROUP BY doc_id)
       |SELECT doc_id, n_inst,
       | CAST(df_sum AS DOUBLE) / (n_inst * n_docs) AS commonness,
       | CAST(n_hapax AS DOUBLE) / n_inst AS hapax_frac,
       | (CAST(df_sum AS DOUBLE) / (n_inst * n_docs) < $commonnessKeepMax) AS keep
       |FROM s, nd""".stripMargin

  /** Corpus-trained BIGRAM language-model score per document — the
    * declarative form of the perplexity-filter stage (CCNet-style
    * "score each doc under a model of the corpus"): train the n-gram
    * model and apply it in ONE logical plan, no model file, no
    * driver round-trip.
    *
    * Two scores per document (docs with < 2 tokens have no bigrams
    * and are absent, like every bigram-defined metric):
    *  - `novelty` — fraction of the doc's bigram INSTANCES whose
    *    corpus count is 1 (nothing else in the corpus ever makes
    *    this transition): high = gibberish or genuinely unique text;
    *  - `cond_pred` — pooled conditional predictability
    *    Σc(w₁w₂) / Σc(w₁·): how strongly the corpus model predicts
    *    this doc's transitions from their contexts. The POOLED ratio
    *    (ratio of exact integer sums, ONE double division) is chosen
    *    over the textbook mean-of-log-probabilities deliberately:
    *    log() is libm-dependent and a mean of per-bigram divisions is
    *    summation-order-dependent — either would break the
    *    bit-identical DuckDB gate (the [[tfidfTopTerm]] rule).
    *
    * Plan, corpus-scale pieces only: bigram extraction is narrow
    * map-side work ([[graft.functions.Texts.kGrams]] k=2); the model
    * (`groupBy(bg)`) is one shuffle with map-side partial counts; the
    * context table derives from the MODEL (vocab-sized, not
    * corpus-sized) and is folded into it before the corpus ever joins
    * — so the instance stream shuffles once for the model attach
    * (co-partitioned with the model's own exchange) and once for the
    * per-doc reduce. Thresholding is intentionally NOT here: the
    * score distribution tightens as the corpus grows (measured:
    * median cond_pred 0.0345 at 500 docs → 0.0334 at 5 000), so any
    * fixed keep-constant would be scale-dependent — rank-based
    * keeping is [[docLmAdaptive]]'s job. */
  def docLmScore(spark: SparkSession, dir: String): DataFrame = {
    // ONE bigram-keyed exchange (r17) shared by the model aggregate
    // and the attach join: the attach join must shuffle the instance
    // stream by bg anyway, so training the model off that same
    // exchange (partition-local final aggregate) deletes the model
    // branch's separate scan + tokenize + explode pass and its
    // partial-count shuffle — same corpus shuffle bytes, one corpus
    // scan instead of two (three with the ctx re-plan).
    val bg = fannedDocs(spark, dir)
      .select(col("doc_id"), explode(kGrams(tokens(col("text")), 2)).as("bg"))
      .repartition(col("bg"))
    val model = bg.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val ctx = model.groupBy(substring_index(col("bg"), " ", 1).as("ctx"))
      .agg(sum(col("c_bg")).as("c_ctx"))
    val model2 = model
      .withColumn("ctx", substring_index(col("bg"), " ", 1))
      .join(ctx, "ctx")
      .select(col("bg"), col("c_bg"), col("c_ctx"))
    bg.join(model2, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c_bg")).as("fm"),
        sum(col("c_ctx")).as("cm"),
        sum(when(col("c_bg") === 1, 1L).otherwise(0L)).as("nn"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("nn").cast("double") / col("n_bigrams")).as("novelty"),
        (col("fm").cast("double") / col("cm")).as("cond_pred"))
  }

  /** Keep fraction for [[docLmAdaptive]]'s conditional-predictability
    * rank rule: the bottom quartile of each source — docs the corpus
    * LM finds least predictable relative to their own source — is the
    * drop band (the [[qualityKeepQuantile]] convention). */
  val lmKeepQuantile = 0.25

  /** Novelty ceiling for [[docLmAdaptive]]: docs in a source's top-5%
    * unseen-bigram fraction are gibberish-shaped (every bigram
    * corpus-unique) and drop regardless of predictability rank. */
  val lmNoveltyMaxQuantile = 0.95

  /** Rank-based keeping over [[docLmScore]] — the thresholding stage
    * the scorer's scaladoc delegates (a fixed cond_pred constant would
    * be scale-dependent; a PER-SOURCE RANK is not): keep docs at or
    * above the [[lmKeepQuantile]] predictability rank within their
    * source AND outside the top-[[lmNoveltyMaxQuantile]] novelty tail,
    * with the [[docQualityAdaptive]] tiny-strata guard (a source below
    * [[qualityMinStratum]] docs keeps everything — quantiles over a
    * handful of rows are noise, same measured rationale).
    *
    * Plan shape: the scorer's two corpus-key shuffles, one doc_id join
    * to attach source, then ONE shuffle on source for both
    * percent_rank windows and the stratum count (same partitioning →
    * one exchange, three window functions). Deterministic (rank ties
    * broken by doc_id) → full DuckDB hash gate.
    *
    * Docs with no score row (< 2 tokens — no bigrams) are absent here
    * by construction; [[TrainingPipeline]] composes this as an
    * ANTI-join on the keep=false rows, so unscored docs pass through
    * to the quality stage rather than being silently dropped by a
    * filter that never measured them. */
  def docLmAdaptive(spark: SparkSession, dir: String): DataFrame =
    docLmAdaptiveFrom(spark, dir, docLmScore(spark, dir))

  /** [[docLmAdaptive]] over an ALREADY-COMPUTED [[docLmScore]] frame —
    * the clusters-overload precedent (DedupOps.clustersKeepBestFrom):
    * a composed pipeline that consumes both the scores and the keep
    * decision hands the SAME frame (persisted, or checkpointed to its
    * own table) to both consumers and pays the scorer's two corpus-key
    * shuffles once, instead of re-planning the whole bigram-model
    * subtree per consumer. Spec-pinned ≡ the inline form. */
  def docLmAdaptiveFrom(spark: SparkSession, dir: String,
                        lmScored: DataFrame): DataFrame = {
    val scored = lmScored
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
    val wPred = Window.partitionBy(col("source")).orderBy(col("cond_pred"), col("doc_id"))
    val wNov = Window.partitionBy(col("source")).orderBy(col("novelty"), col("doc_id"))
    val wn = Window.partitionBy(col("source"))
    scored
      .withColumn("pred_pct", percent_rank().over(wPred))
      .withColumn("nov_pct", percent_rank().over(wNov))
      .withColumn("keep",
        count(lit(1)).over(wn) < qualityMinStratum ||
          (col("pred_pct") >= lmKeepQuantile && col("nov_pct") <= lmNoveltyMaxQuantile))
      .select(col("doc_id"), col("source"), col("cond_pred"), col("novelty"),
        col("pred_pct"), col("nov_pct"), col("keep"))
  }

  // lazy: composes docLmScoreSql, which initializes later in the object
  lazy val docLmAdaptiveSql: String =
    s"""WITH lm AS ($docLmScoreSql),
       |scored AS (
       | SELECT l.doc_id, d.source, l.cond_pred, l.novelty
       | FROM lm l JOIN documents d USING (doc_id)),
       |r AS (
       | SELECT doc_id, source, cond_pred, novelty,
       |  percent_rank() OVER (PARTITION BY source
       |                       ORDER BY cond_pred, doc_id) AS pred_pct,
       |  percent_rank() OVER (PARTITION BY source
       |                       ORDER BY novelty, doc_id) AS nov_pct,
       |  count(*) OVER (PARTITION BY source) AS n_src
       | FROM scored)
       |SELECT doc_id, source, cond_pred, novelty, pred_pct, nov_pct,
       | (n_src < $qualityMinStratum OR
       |  (pred_pct >= $lmKeepQuantile AND nov_pct <= $lmNoveltyMaxQuantile)) AS keep
       |FROM r""".stripMargin

  val docLmScoreSql: String =
    """WITH toks AS (
      | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      | FROM documents),
      |bg AS (
      | SELECT doc_id, unnest(CASE WHEN len(w) >= 2
      |   THEN [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
      |   ELSE [] END) AS bg
      | FROM toks),
      |model AS (SELECT bg, count(*) AS c_bg FROM bg GROUP BY bg),
      |ctx AS (SELECT split_part(bg, ' ', 1) AS ctx,
      |        CAST(sum(c_bg) AS BIGINT) AS c_ctx FROM model GROUP BY 1),
      |j AS (
      | SELECT b.doc_id, m.c_bg, c.c_ctx
      | FROM bg b JOIN model m USING (bg)
      | JOIN ctx c ON split_part(b.bg, ' ', 1) = c.ctx),
      |s AS (
      | SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(c_bg) AS BIGINT) AS fm, CAST(sum(c_ctx) AS BIGINT) AS cm,
      |  CAST(sum(CASE WHEN c_bg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nn
      | FROM j GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      | CAST(nn AS DOUBLE) / n_bigrams AS novelty,
      | CAST(fm AS DOUBLE) / cm AS cond_pred
      |FROM s""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "data", "value")

  /** SHARD assignment for the packed-batch writer — which of
    * [[shardCount]] output shards each document's tokens land in,
    * balanced by TOKEN MASS, not doc count (shards feed data-parallel
    * trainer ranks; a token-skewed shard is a straggler rank). Within
    * each source stratum docs are ranked by descending token count
    * (doc_id tiebreak) and dealt SERPENTINE (snake-draft: each
    * [[shardCount]]-doc cycle reverses direction) — plain round-robin
    * systematically hands shard 0 every cycle's largest doc (measured
    * 1.6× heaviest-to-lightest at sf0.01; the snake's direction flip
    * cancels the within-cycle bias to 1.1×), while keeping the same
    * provable bound: any two shard sums differ by at most one largest
    * doc per stratum, summed across strata. One window shuffle per
    * stratum (the [[docPackSequences]] scale class: range-partitioned
    * by the window key at scale), no global sort, no driver state,
    * and the assignment is pure rank arithmetic so the DuckDB oracle
    * gates it row-for-row. */
  val shardCount = 8

  def docShardPlan(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val rk = row_number().over(w).cast("long") - 1
    val pos = pmod(rk, lit(shardCount.toLong))
    // cycle parity without integer division: rk % 2N < N ⟺ even cycle
    val evenCycle = pmod(rk, lit(2L * shardCount)) < shardCount
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard",
        when(evenCycle, pos).otherwise(lit(shardCount.toLong - 1) - pos))
  }

  val docShardPlanSql: String =
    s"""WITH t AS (
       | SELECT doc_id, source,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |       AS BIGINT) AS n_tokens
       | FROM documents),
       |r AS (
       | SELECT doc_id, source, n_tokens,
       |  row_number() OVER (PARTITION BY source
       |                     ORDER BY n_tokens DESC, doc_id) - 1 AS rk
       | FROM t)
       |SELECT doc_id, source, n_tokens,
       | CASE WHEN rk % ${2 * shardCount} < $shardCount THEN rk % $shardCount
       |      ELSE ${shardCount - 1} - (rk % $shardCount) END AS shard
       |FROM r""".stripMargin

  /** Per-source ADAPTIVE quality filter: keep a doc iff its quality
    * clears its OWN source's [[qualityKeepQuantile]] — the curation
    * rule that survives heterogeneous corpora, where one global
    * threshold would gut a uniformly-low-scoring source and pass
    * everything from a high-scoring one. Exact mode ranks within each
    * source (`percent_rank`, doc_id tiebreak — deterministic, and the
    * rank arithmetic is integer-derived so the DuckDB twin matches
    * bit-for-bit); one window shuffle per stratum.
    *
    * `approx = true` is the 100 TB path when strata are too large or
    * skewed to sort: per-source thresholds from `percentile_approx`
    * (one map-side-partial aggregate, sources × 1 rows) broadcast
    * back as a filter — no per-source ordering of the corpus at all.
    * Boundary semantics differ only AT the threshold value (the
    * approx rule keeps quality == threshold; the exact rule asks for
    * rank ≥ quantile), so the spec gates agreement away from the
    * boundary rather than a hash. That "flips only boundary docs"
    * claim is scoped to strata of at least [[qualityMinStratum]]
    * docs: below it the two rules have no shared boundary to agree
    * on (a singleton's percent_rank is 0 while its quality IS its own
    * approx percentile, so exact would always drop what approx always
    * keeps — and a 2-doc stratum's flipped doc can sit arbitrarily
    * far from any quantile). Both modes therefore KEEP tiny strata
    * whole: a quantile of a handful of docs is noise, not a
    * threshold, and dropping a source's only documents on it would
    * be indefensible curation. The guard is the same integer
    * predicate in both engines, so the exact mode stays hash-gated. */
  val qualityKeepQuantile = 0.25

  /** Strata smaller than this keep every doc in BOTH adaptive-filter
    * modes (⌈1/[[qualityKeepQuantile]]⌉ — below it the quantile rule
    * cannot even drop one doc without overshooting its own target
    * rate, and exact/approx boundary semantics diverge arbitrarily). */
  val qualityMinStratum = 4

  def docQualityAdaptive(spark: SparkSession, dir: String,
                         approx: Boolean = false): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val totTokChars = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val nChars = length(col("text")).cast("double")
    // same expression order as textQuality, so the scores agree bit-for-bit
    val scored = docs(spark, dir)
      .filter(size(tokens(col("text"))) > 0)
      .select(col("doc_id"), col("source"),
        (lit(1.0) - (nStop / nTok) * 0.5
          - ((nChars - totTokChars) / nChars) * 0.2).as("quality"))
    if (!approx) {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality"), col("doc_id"))
      val wn = Window.partitionBy(col("source"))
      scored.withColumn("src_pct", percent_rank().over(w))
        .withColumn("keep",
          count(lit(1)).over(wn) < qualityMinStratum ||
            col("src_pct") >= qualityKeepQuantile)
    } else {
      val thr = scored.groupBy(col("source").as("tsrc"))
        .agg(percentile_approx(col("quality"), lit(qualityKeepQuantile),
          lit(10000)).as("thr"),
          count(lit(1)).as("n_src"))
      scored.join(broadcast(thr), col("source") === col("tsrc"))
        .select(col("doc_id"), col("source"), col("quality"),
          (col("n_src") < qualityMinStratum ||
            col("quality") >= col("thr")).as("keep"))
    }
  }

  val docQualityAdaptiveSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (
       | SELECT doc_id, source, length(text) AS n_chars,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |m AS (
       | SELECT doc_id, source, n_chars, len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> list_contains($stopList, x))) AS n_stop,
       |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars
       | FROM t WHERE len(toks) > 0),
       |s AS (
       | SELECT doc_id, source,
       |  CAST(1.0 AS DOUBLE) - (CAST(n_stop AS DOUBLE)/n_tokens)*0.5
       |   - ((CAST(n_chars AS DOUBLE)-tok_chars)/n_chars)*0.2 AS quality
       | FROM m),
       |r AS (
       | SELECT doc_id, source, quality,
       |  percent_rank() OVER (PARTITION BY source
       |                       ORDER BY quality, doc_id) AS src_pct,
       |  count(*) OVER (PARTITION BY source) AS n_src
       | FROM s)
       |SELECT doc_id, source, quality, src_pct,
       | (n_src < $qualityMinStratum OR src_pct >= $qualityKeepQuantile) AS keep
       |FROM r""".stripMargin
  }

  /** [[docQualityAdaptive]] stratified by (source, PREDICTED
    * LANGUAGE) — the consumption pattern [[sourceLanguageReport]]'s
    * dashboard scaladoc promises: a per-source quantile POOLS
    * languages, and because the stopword lists are per-language the
    * scores are not comparable across them — in a mixed source the
    * systematically lower-scoring language eats the entire drop
    * quota while the dominant one sails through. Ranking each
    * language against itself is the multilingual-curation fix.
    *
    * The quality score and the marker-vote classifier both compute
    * INLINE on one corpus scan (the sourceLanguageReport lesson — no
    * doc_id join, no second pass), then the [[docQualityAdaptive]]
    * machinery runs over the composite (source, pred_lang) key:
    * exact mode = percent_rank window per stratum (deterministic →
    * full hash gate); `approx = true` = percentile_approx thresholds
    * broadcast back, the 100 TB path. The finer key only makes
    * strata SMALLER, so the [[qualityMinStratum]] keep-whole guard
    * matters more here, not less — both modes keep tiny
    * (source, lang) strata intact. */
  def docQualityByLang(spark: SparkSession, dir: String,
                       approx: Boolean = false): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val totTokChars = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val nChars = length(col("text")).cast("double")
    val langs = markers.map(_._1)
    val counts = markers.map { case (lang, ws) =>
      size(filter(toks, t => t.isin(ws: _*))).as(s"c_$lang")
    }
    val maxC = greatest(langs.map(l => col(s"c_$l")): _*)
    val pred = langs.foldRight[Column](lit("und")) { (l, els) =>
      when(col(s"c_$l") === maxC, lit(l)).otherwise(els)
    }
    val scored = docs(spark, dir)
      .filter(size(tokens(col("text"))) > 0)
      .select(Seq(col("doc_id"), col("source"),
        (lit(1.0) - (nStop / nTok) * 0.5
          - ((nChars - totTokChars) / nChars) * 0.2).as("quality")) ++ counts: _*)
      .withColumn("pred_lang", when(maxC > 0, pred).otherwise(lit("und")))
      .select("doc_id", "source", "pred_lang", "quality")
    if (!approx) {
      val w = Window.partitionBy(col("source"), col("pred_lang"))
        .orderBy(col("quality"), col("doc_id"))
      val wn = Window.partitionBy(col("source"), col("pred_lang"))
      scored.withColumn("src_pct", percent_rank().over(w))
        .withColumn("keep",
          count(lit(1)).over(wn) < qualityMinStratum ||
            col("src_pct") >= qualityKeepQuantile)
    } else {
      val thr = scored.groupBy(col("source").as("tsrc"), col("pred_lang").as("tlang"))
        .agg(percentile_approx(col("quality"), lit(qualityKeepQuantile),
          lit(10000)).as("thr"),
          count(lit(1)).as("n_src"))
      scored.join(broadcast(thr),
          col("source") === col("tsrc") && col("pred_lang") === col("tlang"))
        .select(col("doc_id"), col("source"), col("pred_lang"), col("quality"),
          (col("n_src") < qualityMinStratum ||
            col("quality") >= col("thr")).as("keep"))
    }
  }

  // lazy: `markers` is declared further down the object; a strict val
  // here would initialize against a null forward reference
  lazy val docQualityByLangSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val cnt = markers.map { case (lang, ws) =>
      val l = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($l, x))) AS c_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val maxExpr = "greatest(" + langs.map(l => s"c_$l").mkString(", ") + ")"
    val pred = langs.foldRight("'und'") { (l, els) =>
      s"CASE WHEN c_$l = m THEN '$l' ELSE $els END"
    }
    s"""WITH t AS (
       | SELECT doc_id, source, length(text) AS n_chars,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |m AS (
       | SELECT doc_id, source, n_chars, len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> list_contains($stopList, x))) AS n_stop,
       |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars,
       |  $cnt
       | FROM t WHERE len(toks) > 0),
       |g AS (SELECT *, $maxExpr AS m FROM m),
       |s AS (
       | SELECT doc_id, source,
       |  CASE WHEN m > 0 THEN $pred ELSE 'und' END AS pred_lang,
       |  CAST(1.0 AS DOUBLE) - (CAST(n_stop AS DOUBLE)/n_tokens)*0.5
       |   - ((CAST(n_chars AS DOUBLE)-tok_chars)/n_chars)*0.2 AS quality
       | FROM g),
       |r AS (
       | SELECT doc_id, source, pred_lang, quality,
       |  percent_rank() OVER (PARTITION BY source, pred_lang
       |                       ORDER BY quality, doc_id) AS src_pct,
       |  count(*) OVER (PARTITION BY source, pred_lang) AS n_src
       | FROM s)
       |SELECT doc_id, source, pred_lang, quality, src_pct,
       | (n_src < $qualityMinStratum OR src_pct >= $qualityKeepQuantile) AS keep
       |FROM r""".stripMargin
  }

  /** Quality scoring: stopword ratio, mean token length, space ratio,
    * and a fixed linear score — all exact-int division. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val totTokChars = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val nChars = length(col("text")).cast("double")
    docs(spark, dir)
      .filter(size(tokens(col("text"))) > 0)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (nStop / nTok).as("stop_ratio"),
        (totTokChars / nTok).as("mean_tok_len"),
        ((nChars - totTokChars) / nChars).as("space_ratio"))
      .withColumn("quality",
        lit(1.0) - col("stop_ratio") * 0.5 - col("space_ratio") * 0.2)
  }

  val textQualitySql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH t AS (
       | SELECT doc_id, length(text) AS n_chars,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |m AS (
       | SELECT doc_id, n_chars, len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> list_contains($stopList, x))) AS n_stop,
       |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars
       | FROM t WHERE len(toks) > 0),
       |s AS (
       | SELECT doc_id, n_tokens,
       |  CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
       |  CAST(tok_chars AS DOUBLE)/n_tokens AS mean_tok_len,
       |  (CAST(n_chars AS DOUBLE)-tok_chars)/n_chars AS space_ratio
       | FROM m)
       |SELECT doc_id, n_tokens, stop_ratio, mean_tok_len, space_ratio,
       | CAST(1.0 AS DOUBLE) - stop_ratio*0.5 - space_ratio*0.2 AS quality
       |FROM s""".stripMargin
  }

  /** FUSED per-document signals table — every MAP-SIDE curation
    * signal the suite computes, in ONE scan of the corpus: char/token
    * counts ([[tokenCount]]), quality ratios ([[textQuality]]),
    * language vote ([[langId]]), content fingerprint
    * ([[docFingerprint]]), and repetition stats ([[docRepetition]]).
    * A real curation run wants ALL of these per doc; computing them
    * as five separate queries costs five corpus scans — at 100 TB the
    * scan IS the cost, so the fused entry is the shape a pipeline
    * should run (the signals-table idiom of public curation stacks:
    * one pass emits a wide signals row per doc, filters consume the
    * table afterwards).
    *
    * Semantics per signal are the COMPONENT's (same expressions, same
    * exact-integer-then-one-division arithmetic, spec-pinned equal on
    * the component's population); the one deliberate difference is
    * population: the fused table emits EVERY document, with the
    * token-dependent signals NULL for token-less docs (the component
    * entries FILTER those out — a signals table that silently drops
    * rows would make absence ambiguous downstream).
    *
    * Plan shape: tokenization lands in its OWN projection level (the
    * mm_media_decode CaseWhen-CSE lesson — ~10 signal columns each
    * reference the token array; one level = one tokenize per row),
    * then exact integer stats, then the ratio arithmetic. ZERO
    * shuffles, zero joins — the whole operator is scan + two
    * codegen'd projections, so it scales exactly as the scan does. */
  def docSignals(spark: SparkSession, dir: String): DataFrame = {
    val w = col("toks")
    val g2 = kGrams(w, 2)
    val g3 = kGrams(w, 3)
    val langCounts = markers.map { case (l, ws) =>
      size(filter(w, t => t.isin(ws: _*))).as(s"c_$l")
    }
    val base = docs(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        tokens(col("text")).as("toks"))
      .select(Seq(
        col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars"),
        size(w).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long")
          .as("n_re_tokens"),
        fingerprint(w).as("fp"),
        size(filter(w, t => t.isin(stopwords: _*))).cast("long").as("n_stop"),
        aggregate(w, lit(0), (acc, t) => acc + length(t)).cast("long")
          .as("tok_chars"),
        topWordCount(w).cast("long").as("top_cnt"),
        size(g2).cast("long").as("n2"),
        size(array_distinct(g2)).cast("long").as("u2"),
        size(g3).cast("long").as("n3"),
        size(array_distinct(g3)).cast("long").as("u3")) ++ langCounts: _*)
    // argmax with the fixed priority order — the [[langId]] vote on
    // the shared [[markers]] list (one source of truth for the sets)
    val langs = markers.map(_._1)
    val maxC = greatest(langs.map(l => col(s"c_$l")): _*)
    val pred = langs.foldRight[Column](lit("und")) { (l, els) =>
      when(col(s"c_$l") === maxC, lit(l)).otherwise(els)
    }
    val hasToks = col("n_ws_tokens") > 0
    val nTokD = col("n_ws_tokens").cast("double")
    val stopRatio = col("n_stop").cast("double") / nTokD
    val spaceRatio =
      (col("n_chars").cast("double") - col("tok_chars")) / col("n_chars").cast("double")
    base.select(
      col("doc_id"), col("source"), col("n_chars"),
      col("n_ws_tokens"), col("n_re_tokens"), col("fp"),
      when(maxC > 0, pred).otherwise(lit("und")).as("pred_lang"),
      when(hasToks, stopRatio).as("stop_ratio"),
      when(hasToks, col("tok_chars").cast("double") / nTokD).as("mean_tok_len"),
      when(hasToks, spaceRatio).as("space_ratio"),
      when(hasToks, lit(1.0) - stopRatio * 0.5 - spaceRatio * 0.2).as("quality"),
      when(hasToks, col("top_cnt").cast("double") / nTokD).as("top_word_share"),
      when(col("n2") > 0, (col("n2") - col("u2")).cast("double") / col("n2").cast("double"))
        .as("dup_2gram_frac"),
      when(col("n3") > 0, (col("n3") - col("u3")).cast("double") / col("n3").cast("double"))
        .as("dup_3gram_frac"))
  }

  /** DuckDB twin of [[docSignals]] — the component twins' expressions
    * verbatim, joined into one CTE chain over a single tokenize.
    * lazy: composes [[markers]], which initializes later in the
    * object (the [[docLmAdaptiveSql]] precedent). */
  lazy val docSignalsSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val cnt = markers.map { case (lang, ws) =>
      val l = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($l, x))) AS c_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val maxExpr = "greatest(" + langs.map(l => s"c_$l").mkString(", ") + ")"
    val pred = langs.foldRight("'und'") { (l, els) =>
      s"CASE WHEN c_$l = m THEN '$l' ELSE $els END"
    }
    s"""WITH t AS (
       | SELECT doc_id, source, text, length(text) AS n_chars,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |topc AS (
       | SELECT doc_id, max(c) AS top_cnt FROM (
       |  SELECT doc_id, word, count(*) AS c
       |  FROM (SELECT doc_id, unnest(toks) AS word FROM t)
       |  GROUP BY doc_id, word)
       | GROUP BY doc_id),
       |m AS (
       | SELECT doc_id, source, n_chars, toks,
       |  len(toks) AS n_tokens,
       |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
       |  md5(array_to_string(toks, ' ')) AS fp,
       |  len(list_filter(toks, x -> list_contains($stopList, x))) AS n_stop,
       |  CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT)
       |    AS tok_chars,
       |  CASE WHEN len(toks) >= 2
       |   THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
       |   ELSE [] END AS g2,
       |  CASE WHEN len(toks) >= 3
       |   THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |         FOR i IN range(1, len(toks)-1)]
       |   ELSE [] END AS g3,
       |  $cnt
       | FROM t),
       |g AS (SELECT *, $maxExpr AS m FROM m),
       |s AS (
       | SELECT doc_id, source, n_chars, n_tokens, n_re_tokens, fp,
       |  CASE WHEN m > 0 THEN $pred ELSE 'und' END AS pred_lang,
       |  CASE WHEN n_tokens > 0
       |   THEN CAST(n_stop AS DOUBLE)/n_tokens END AS stop_ratio,
       |  CASE WHEN n_tokens > 0
       |   THEN CAST(tok_chars AS DOUBLE)/n_tokens END AS mean_tok_len,
       |  CASE WHEN n_tokens > 0
       |   THEN (CAST(n_chars AS DOUBLE)-tok_chars)/n_chars END AS space_ratio,
       |  g2, g3, top_cnt
       | FROM g LEFT JOIN topc USING (doc_id))
       |SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       | CAST(n_tokens AS BIGINT) AS n_ws_tokens,
       | CAST(n_re_tokens AS BIGINT) AS n_re_tokens, fp, pred_lang,
       | stop_ratio, mean_tok_len, space_ratio,
       | CASE WHEN n_tokens > 0
       |  THEN CAST(1.0 AS DOUBLE) - stop_ratio*0.5 - space_ratio*0.2 END AS quality,
       | CASE WHEN n_tokens > 0
       |  THEN CAST(top_cnt AS DOUBLE)/n_tokens END AS top_word_share,
       | CASE WHEN len(g2) > 0
       |  THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)/len(g2)
       |  END AS dup_2gram_frac,
       | CASE WHEN len(g3) > 0
       |  THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)/len(g3)
       |  END AS dup_3gram_frac
       |FROM s""".stripMargin
  }

  /** (doc_id, quality) as an embeddable CTE chain (terminal CTE name
    * `quality`) — the score other oracles compose (dedup_cluster_best).
    * Expressions are verbatim [[textQualitySql]]'s, so the composed
    * oracle cannot drift from the hash-gated standalone one. */
  private[graft] val qualityCtes: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""qt AS (
       | SELECT doc_id, length(text) AS n_chars,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |qm AS (
       | SELECT doc_id, n_chars, len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> list_contains($stopList, x))) AS n_stop,
       |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars
       | FROM qt WHERE len(toks) > 0),
       |qs AS (
       | SELECT doc_id,
       |  CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
       |  (CAST(n_chars AS DOUBLE)-tok_chars)/n_chars AS space_ratio
       | FROM qm),
       |quality AS (
       | SELECT doc_id,
       |  CAST(1.0 AS DOUBLE) - stop_ratio*0.5 - space_ratio*0.2 AS quality
       | FROM qs)""".stripMargin
  }

  /** Language-ID by marker-token voting (n-gram-heuristic shape:
    * count hits per language-specific marker set, argmax with a fixed
    * priority order on ties). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("order", "sort", "fast"),
    "de" -> Seq("scan", "merge", "batch"),
    "fr" -> Seq("stream", "window", "row"),
    "zh" -> Seq("query", "group", "join"))

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val counts = markers.map { case (lang, ws) =>
      size(filter(toks, t => t.isin(ws: _*))).as(s"c_$lang")
    }
    val withCounts = docs(spark, dir).select(col("doc_id") +: counts: _*)
    // argmax with fixed priority: en > es > de > fr > zh on ties
    val langs = markers.map(_._1)
    val maxC = greatest(langs.map(l => col(s"c_$l")): _*)
    val pred = langs.foldRight[Column](lit("und")) { (l, els) =>
      when(col(s"c_$l") === maxC, lit(l)).otherwise(els)
    }
    withCounts.withColumn("pred_lang", when(maxC > 0, pred).otherwise(lit("und")))
  }

  val langIdSql: String = {
    val cnt = markers.map { case (lang, ws) =>
      val l = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($l, x))) AS c_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val maxExpr = "greatest(" + langs.map(l => s"c_$l").mkString(", ") + ")"
    val pred = langs.foldRight("'und'") { (l, els) =>
      s"CASE WHEN c_$l = m THEN '$l' ELSE $els END"
    }
    s"""WITH t AS (
       | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |c AS (SELECT doc_id,
       |  $cnt
       | FROM t),
       |g AS (SELECT *, $maxExpr AS m FROM c)
       |SELECT doc_id, c_en, c_es, c_de, c_fr, c_zh,
       | CASE WHEN m > 0 THEN $pred ELSE 'und' END AS pred_lang
       |FROM g""".stripMargin
  }

  /** Per-source LANGUAGE-MIX dashboard — [[langId]] composed the way a
    * multilingual-corpus curation report consumes it ("what fraction
    * of each source is which language" drives mixture weights and
    * per-language quality thresholds): the marker-vote classifier
    * computes INLINE on the same scan that carries `source` (the
    * [[sourceQualityReport]] lesson — no doc_id join, no second
    * corpus pass), then one corpus-scale aggregate to (source,
    * pred_lang) counts, then a window over the SOURCES-sized result
    * for the within-source share. Counts are exact integers, share is
    * ONE IEEE division → full hash gate. */
  def sourceLanguageReport(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val counts = markers.map { case (lang, ws) =>
      size(filter(toks, t => t.isin(ws: _*))).as(s"c_$lang")
    }
    val langs = markers.map(_._1)
    val base = docs(spark, dir).select(col("source") +: counts: _*)
    val maxC = greatest(langs.map(l => col(s"c_$l")): _*)
    val pred = langs.foldRight[Column](lit("und")) { (l, els) =>
      when(col(s"c_$l") === maxC, lit(l)).otherwise(els)
    }
    base.withColumn("pred_lang", when(maxC > 0, pred).otherwise(lit("und")))
      .groupBy(col("source"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share", col("n_docs").cast("double") /
        sum(col("n_docs")).over(Window.partitionBy(col("source"))))
  }

  val sourceLanguageReportSql: String = {
    val cnt = markers.map { case (lang, ws) =>
      val l = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($l, x))) AS c_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val maxExpr = "greatest(" + langs.map(l => s"c_$l").mkString(", ") + ")"
    val pred = langs.foldRight("'und'") { (l, els) =>
      s"CASE WHEN c_$l = m THEN '$l' ELSE $els END"
    }
    s"""WITH t AS (
       | SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |c AS (SELECT source,
       |  $cnt
       | FROM t),
       |g AS (SELECT *, $maxExpr AS m FROM c),
       |d AS (SELECT source,
       |  CASE WHEN m > 0 THEN $pred ELSE 'und' END AS pred_lang FROM g),
       |a AS (SELECT source, pred_lang, count(*) AS n_docs
       |      FROM d GROUP BY source, pred_lang)
       |SELECT source, pred_lang, CAST(n_docs AS BIGINT) AS n_docs,
       | CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY source) AS share
       |FROM a""".stripMargin
  }

  /** Canonical md5 fingerprint per document. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      fingerprint(tokens(col("text"))).as("fp"))

  val docFingerprintSql: String =
    """SELECT doc_id,
      | md5(array_to_string(list_filter(string_split(text, ' '), x -> x <> ''), ' ')) AS fp
      |FROM documents""".stripMargin

  /** TF-IDF-shape distinctive-term extraction: the term of each doc
    * with the highest tf/df ratio (term frequency over corpus document
    * frequency). The full distributed pattern a training-data pipeline
    * needs: explode to occurrences, aggregate corpus statistics, join
    * them back, re-aggregate per document.
    *
    * Ordering is deterministic cross-engine: tf and df are exact
    * integers, score = ONE double division (correctly rounded IEEE, so
    * bit-identical in Spark and DuckDB), ties broken lexicographically.
    * No log() anywhere — libm log differs between engines. */
  def tfidfTopTerm(spark: SparkSession, dir: String): DataFrame = {
    val ex = docs(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = ex.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok").asc)
    tf.join(dfT, "tok")
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("tok").as("top_tok"), col("tf"), col("df"), col("score"))
  }

  val tfidfTopTermSql: String =
    """WITH ex AS (
      | SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      | FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM ex GROUP BY doc_id, tok),
      |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |s AS (
      | SELECT doc_id, tok, tf, df,
      |  CAST(tf AS DOUBLE)/CAST(df AS DOUBLE) AS score,
      |  row_number() OVER (PARTITION BY doc_id
      |    ORDER BY CAST(tf AS DOUBLE)/CAST(df AS DOUBLE) DESC, tok ASC) AS rk
      | FROM tf JOIN dft USING (tok))
      |SELECT doc_id, tok AS top_tok, CAST(tf AS BIGINT) AS tf,
      | CAST(df AS BIGINT) AS df, score
      |FROM s WHERE rk = 1""".stripMargin

  /** Deterministic stratified sampling — how a training-data pipeline
    * downsamples: strata get different keep-rates and membership is a
    * pure function of the id (Knuth multiplicative hash, integer
    * arithmetic only), so the sample is reproducible on any cluster,
    * any partitioning, any engine — no RNG state, no sampleBy
    * nondeterminism. Short docs keep 10%, long docs 50%. */
  val sampleHashMul = 2654435761L
  val sampleMod = 1000L
  // fold the id below 2^20 BEFORE the multiply: id·mul must not exceed
  // int64 — Spark would wrap silently while ANSI engines raise, so the
  // "identical on any engine" claim requires staying in range
  val sampleFold = 1000003L

  /** Shared sampling columns — [[docSample]] and the composed
    * TrainingPipeline consume these SAME definitions, so the two can
    * never drift apart (the pipeline's "agrees with docSample
    * doc-for-doc" invariant is structural, not a comment). */
  def stratumCol: Column =
    when(length(col("text")) < 100, lit("short")).otherwise(lit("long"))
  def sampleHashCol: Column =
    pmod((col("doc_id") % sampleFold) * sampleHashMul, lit(sampleMod))
  def sampleKeep(stratum: Column, h: Column): Column =
    (stratum === "short" && h < 100) || (stratum === "long" && h < 500)

  def docSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), stratumCol.as("stratum"), sampleHashCol.as("h"),
        length(col("text")).cast("long").as("n_chars"))
      .filter(sampleKeep(col("stratum"), col("h")))
      .select("doc_id", "stratum", "n_chars")

  val docSampleSql: String =
    s"""WITH t AS (
       | SELECT doc_id,
       |  CASE WHEN length(text) < 100 THEN 'short' ELSE 'long' END AS stratum,
       |  ((doc_id % $sampleFold) * $sampleHashMul) % $sampleMod AS h,
       |  CAST(length(text) AS BIGINT) AS n_chars
       | FROM documents)
       |SELECT doc_id, stratum, n_chars FROM t
       |WHERE (stratum = 'short' AND h < 100) OR (stratum = 'long' AND h < 500)""".stripMargin

  /** Exact sample size per source stratum for [[docSampleExactK]]. */
  val exactKPerStratum = 10

  /** EXACT-SIZE deterministic stratified sample: the k docs with the
    * smallest (hash, doc_id) per source — "exactly k examples per
    * source" is how eval/calibration sets are actually specified,
    * and rate-based sampling ([[docSample]]) can only hit a size in
    * expectation. Selection is by the same multiplicative integer
    * hash (no RNG — identical sample on any cluster, any
    * partitioning), with doc_id breaking hash ties so the choice is
    * total.
    *
    * Scale shape: the obvious formulation — `row_number() OVER
    * (PARTITION BY source ORDER BY h)` — shuffles and SORTS every
    * row of every stratum to keep k of them. This one aggregates
    * with the k-bounded heap ([[graft.functions.TopKStructs]], the
    * q_topk_agg kernel): map-side partials keep ≤ k rows per
    * (mapper, source), the one shuffle carries those partial heaps,
    * and nothing ever sorts more than k retained entries — the same
    * plan at 25 docs per source or 10⁹. Heap retains the LARGEST
    * structs, so the sort key is negated on the way in (h is
    * mod-bounded and doc_id nonnegative — negation cannot
    * overflow); a stratum smaller than k keeps whole, exactly as
    * the rank filter would. */
  def docSampleExactK(spark: SparkSession, dir: String,
                      k: Int = exactKPerStratum): DataFrame = {
    import graft.functions.TopKColumns.topKStructs
    docs(spark, dir)
      .select(col("source"), col("doc_id"), sampleHashCol.as("h"))
      .groupBy(col("source"))
      .agg(topKStructs(
        struct((-col("h")).as("s1"), (-col("doc_id")).as("s2")), k).as("sel"))
      .select(col("source"), explode(col("sel")).as("e"))
      .select(col("source"), (-col("e.s2")).as("doc_id"), (-col("e.s1")).as("h"))
  }

  val docSampleExactKSql: String =
    s"""WITH t AS (
       | SELECT source, doc_id,
       |  ((doc_id % $sampleFold) * $sampleHashMul) % $sampleMod AS h
       | FROM documents),
       |r AS (
       | SELECT source, doc_id, h,
       |  row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
       | FROM t)
       |SELECT source, doc_id, h FROM r WHERE rk <= $exactKPerStratum""".stripMargin

  /** Benchmark decontamination — the overlap check every serious
    * training pipeline runs before training: find documents that share
    * any long n-gram with a held-out evaluation set, so eval answers
    * don't leak into the training corpus. Here the held-out set is the
    * `'$decontamBenchSource'` source and the overlap unit is an
    * 8-token gram (real pipelines use 8-13; 3-grams would flag
    * commonplace phrases).
    *
    * Shape at scale: gram extraction is narrow map-side work; the
    * overlap is ONE equi-join on the gram key. Benchmark suites are
    * tiny relative to a 100 TB corpus, so AQE turns the join's bench
    * side into a broadcast at runtime; the corpus side never shuffles
    * more than its (doc, gram) pairs, and the per-doc distinct-gram
    * count is a map-side-combinable aggregate. A deployment would key
    * the join on xxhash64(gram) to shuffle 8 bytes instead of strings;
    * the gate keeps raw grams so the count is exactly the oracle's. */
  val decontamBenchSource = "src0"
  val decontamGram = 8

  /** Source-weighted mixture sampling — the data-MIXING step of a
    * training run: given per-source mixture weights, emit a
    * deterministic sample whose per-source volumes approach
    * `budget · w_s / Σw`, bounded by availability. Unlike
    * [[docSample]]'s fixed per-stratum rates, the keep thresholds here
    * are DERIVED FROM CORPUS COUNTS inside the plan (per-source count
    * aggregate + a 1-row total, both dimension-sized and broadcast
    * back) — no driver collect, no precomputed rates to drift out of
    * sync with the corpus.
    *
    * The demo weight rule: the bench source ([[decontamBenchSource]])
    * gets 0 (eval data never mixes into training), even-numbered
    * sources 3, odd 1 — a deployment passes its own weights table.
    * All integer arithmetic (`div`, 64-bit; MOD-granular thresholds,
    * multiplicative-hash keep test) so DuckDB reproduces the sample
    * bit-for-bit. */
  /** The demo per-source weight rule. A source name without a numeric
    * tail TRY-CASTS TO NULL and falls through to the ELSE weight (1)
    * — try_cast on BOTH sides (Spark 4 runs ANSI mode, where a plain
    * cast would THROW on the first non-'srcN' name; the DuckDB oracle
    * uses TRY_CAST for the same reason), so both engines degrade
    * identically on any corpus. Spec-pinned on synthetic names. */
  private[graft] val mixtureWeight: Column =
    when(col("source") === decontamBenchSource, lit(0L))
      .otherwise(when(
        expr("try_cast(substring(source, 4, 10) AS BIGINT)") % 2 === 0,
        lit(3L)).otherwise(lit(1L)))

  /** LANGUAGE-rebalancing mixture sampler — the consumption pattern
    * [[sourceLanguageReport]]'s shares feed into sampling (the
    * [[docQualityByLang]] symmetry on the mixture side): an
    * equal-LANGUAGE target mix via inverse-share rates. Keep ~half
    * the corpus, allocated EQUALLY across the predicted languages,
    * each language sampled uniformly at
    * `rate_l = (n_total/2 / n_langs) / n_l` — a dominant language
    * downsamples toward the per-language budget, a rare one keeps
    * everything (thresh capped at the modulus; the cap is the
    * integer-exact "can't upsample what isn't there" floor). The
    * classifier computes INLINE on the one corpus scan; rates come
    * back as a languages-sized broadcast; the keep decision is the
    * [[docMixtureSample]] deterministic hash — reproducible on any
    * cluster/partitioning. All-integer arithmetic → full hash gate. */
  def docMixtureByLang(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val langs = markers.map(_._1)
    val counts = markers.map { case (lang, ws) =>
      size(filter(toks, t => t.isin(ws: _*))).as(s"c_$lang")
    }
    val maxC = greatest(langs.map(l => col(s"c_$l")): _*)
    val pred = langs.foldRight[Column](lit("und")) { (l, els) =>
      when(col(s"c_$l") === maxC, lit(l)).otherwise(els)
    }
    val tagged = docs(spark, dir)
      .select(Seq(col("doc_id"), col("source")) ++ counts: _*)
      .withColumn("pred_lang", when(maxC > 0, pred).otherwise(lit("und")))
      .select("doc_id", "source", "pred_lang")
    val byLang = tagged.groupBy("pred_lang").agg(count(lit(1)).as("n_l"))
    val totals = byLang.agg(sum(col("n_l")).as("n_total"),
      count(lit(1)).as("n_langs"))
    val rates = byLang.crossJoin(broadcast(totals))
      .withColumn("thresh", least(lit(sampleMod),
        expr(s"(((n_total div 2) div n_langs) * $sampleMod) div n_l")))
      .select("pred_lang", "thresh")
    tagged.join(broadcast(rates), "pred_lang")
      .filter(pmod((col("doc_id") % sampleFold) * sampleHashMul,
        lit(sampleMod)) < col("thresh"))
      .select("doc_id", "source", "pred_lang")
  }

  lazy val docMixtureByLangSql: String = {
    val cnt = markers.map { case (lang, ws) =>
      val l = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($l, x))) AS c_$lang"
    }.mkString(",\n  ")
    val langList = markers.map(_._1)
    val maxExpr = "greatest(" + langList.map(l => s"c_$l").mkString(", ") + ")"
    val pred = langList.foldRight("'und'") { (l, els) =>
      s"CASE WHEN c_$l = m THEN '$l' ELSE $els END"
    }
    s"""WITH t AS (
       | SELECT doc_id, source,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents),
       |c AS (SELECT doc_id, source, $cnt FROM t),
       |g AS (SELECT *, $maxExpr AS m FROM c),
       |tg AS (
       | SELECT doc_id, source,
       |  CASE WHEN m > 0 THEN $pred ELSE 'und' END AS pred_lang
       | FROM g),
       |bl AS (SELECT pred_lang, count(*) AS n_l FROM tg GROUP BY pred_lang),
       |tot AS (SELECT sum(n_l) AS n_total, count(*) AS n_langs FROM bl),
       |r AS (SELECT pred_lang,
       |   least($sampleMod, (((n_total // 2) // n_langs) * $sampleMod) // n_l) AS thresh
       |  FROM bl, tot)
       |SELECT tg.doc_id, tg.source, tg.pred_lang
       |FROM tg JOIN r USING (pred_lang)
       |WHERE ((tg.doc_id % $sampleFold) * $sampleHashMul) % $sampleMod < r.thresh""".stripMargin
  }

  def docMixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val bySrc = d.groupBy("source").agg(count(lit(1)).as("n_s"))
      .withColumn("w", mixtureWeight)
    val totals = bySrc.agg(sum(col("n_s")).as("n_total"), sum(col("w")).as("sum_w"))
    val rates = bySrc.crossJoin(broadcast(totals))
      .withColumn("thresh", least(lit(sampleMod),
        expr(s"((n_total div 2) * w * $sampleMod) div (sum_w * n_s)")))
      .select("source", "thresh")
    d.select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .filter(pmod((col("doc_id") % sampleFold) * sampleHashMul,
        lit(sampleMod)) < col("thresh"))
      .select("doc_id", "source")
  }

  val docMixtureSampleSql: String =
    s"""WITH w AS (
       |  SELECT source, count(*) AS n_s,
       |    CASE WHEN source = '$decontamBenchSource' THEN 0
       |         -- TRY_CAST + the 10-char window mirror the Spark twin
       |         -- (substring(source, 4, 10).cast("long")): a corpus
       |         -- whose source names aren't 'srcN' degrades to the
       |         -- ELSE weight in BOTH engines instead of erroring here
       |         WHEN TRY_CAST(substr(source, 4, 10) AS BIGINT) % 2 = 0 THEN 3
       |         ELSE 1 END AS w
       |  FROM documents GROUP BY source),
       |t AS (SELECT sum(n_s) AS n_total, sum(w) AS sum_w FROM w),
       |r AS (SELECT source,
       |        least($sampleMod, ((n_total // 2) * w * $sampleMod) // (sum_w * n_s)) AS thresh
       |      FROM w, t)
       |SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
       |WHERE ((d.doc_id % $sampleFold) * $sampleHashMul) % $sampleMod < r.thresh""".stripMargin

  /** `hashGrams = true` is the deployment mode: the join/distinct
    * keys become xxhash64(gram) — 8-byte shuffle keys instead of
    * ~50-byte strings, the dominant shuffle-volume win at 100 TB. A
    * 64-bit collision between two distinct grams in the same doc (or
    * between a corpus gram and a bench gram) could perturb a count
    * with probability ~n²/2⁶⁴ — negligible in practice but nonzero,
    * so the raw-gram mode keeps the cross-engine oracle and the
    * hashed mode is spec-gated by equality against it. */
  def decontamination(spark: SparkSession, dir: String,
                      hashGrams: Boolean = false): DataFrame = {
    val n = decontamGram
    val grams = kGrams(tokens(col("text")), n)
    val key = if (hashGrams) xxhash64(col("gram")) else col("gram")
    val g = fannedDocs(spark, dir)
      .select(col("doc_id"), col("source"), explode(grams).as("gram"))
      .select(col("doc_id"), col("source"), key.as("gk"))
    val bench = g.filter(col("source") === decontamBenchSource)
      .select("gk").distinct()
    g.filter(col("source") =!= decontamBenchSource)
      .join(bench, Seq("gk"))
      .select("doc_id", "source", "gk").distinct()
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_hits"))
  }

  val decontaminationSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, source, unnest(CASE WHEN len(w) >= $decontamGram
       |    THEN [array_to_string(w[i:i+${decontamGram - 1}], ' ')
       |          FOR i IN range(1, len(w)-${decontamGram - 2})]
       |    ELSE [] END) AS gram
       |  FROM toks),
       |bench AS (SELECT DISTINCT gram FROM g WHERE source = '$decontamBenchSource')
       |SELECT g.doc_id, g.source, count(DISTINCT g.gram) AS n_hits
       |FROM g JOIN bench USING (gram)
       |WHERE g.source <> '$decontamBenchSource'
       |GROUP BY 1, 2""".stripMargin

  /** Materialize the held-out source's distinct gram set to parquet —
    * the static side a STREAMING decontamination probe joins against
    * ([[graft.streaming.Pipelines.decontaminationSink]]); built once,
    * like the minhash index. Benchmark suites are tiny, so the table
    * broadcast-joins onto every micro-batch. */
  def benchGramBuild(spark: SparkSession, dir: String, outDir: String): Unit =
    docs(spark, dir)
      .filter(col("source") === decontamBenchSource)
      .select(explode(kGrams(tokens(col("text")), decontamGram)).as("gram"))
      .distinct()
      .write.mode("overwrite").parquet(outDir)

  /** Bloom-prefiltered decontamination — the 100 TB plan shape. The
    * raw/hashed modes shuffle every corpus (doc, gram) pair into the
    * overlap join; at 100 TB that shuffle IS the job. Here a bloom
    * filter over the bench grams' xxhash64 keys is built by a
    * distributed aggregate (a scalar subquery — never collected to the
    * driver as data) and applied as a map-side filter on the corpus
    * scan, so only grams that might be bench grams reach the join.
    * Benchmark suites are ~10⁻⁶ of a training corpus, so the filter
    * passes roughly (bench-gram share + fpp) of corpus rows — the
    * join shuffle collapses by orders of magnitude.
    *
    * Bloom filters have no false negatives and the exact gram join
    * still runs on the survivors, so the result is bit-identical to
    * [[decontamination]] — this entry shares its DuckDB oracle (full
    * hash gate), and the equality is also spec-pinned.
    *
    * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
    * (the runtime-join-filter kernels, codegen'd) registered as SQL
    * functions by [[graft.GraftFunctions]].
    *
    * `estimatedBenchGrams` sizes the bloom filter (the aggregate
    * requires a FOLDABLE estimate — it cannot be a subquery — and a
    * derive-by-counting pass would re-scan the corpus for the bench
    * source, doubling the scan this operator exists to keep single).
    * Size it at or above the suite's distinct gram count: an estimate
    * far under the true cardinality inflates the false-positive rate
    * and silently erodes the prefilter's selectivity — correctness
    * holds either way (the exact join verifies survivors), but the
    * shuffle-collapse claim is the whole point. The default covers
    * 10⁶ grams ≈ a 100k-question suite. */
  def decontaminationBloom(spark: SparkSession, dir: String,
                           estimatedBenchGrams: Long = 1000L * 1000): DataFrame = {
    graft.GraftFunctions.register(spark)
    val n = decontamGram
    val grams = kGrams(tokens(col("text")), n)
    // unique per-call view name (concurrent callers in one session must
    // not clobber each other's plan); spark.sql analyzes eagerly, so the
    // view can be dropped as soon as the DataFrame is built
    val view = "graft_decontam_grams_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    fannedDocs(spark, dir)
      .select(col("doc_id"), col("source"), explode(grams).as("gram"))
      .select(col("doc_id"), col("source"), col("gram"),
        xxhash64(col("gram")).as("gh"))
      .createOrReplaceTempView(view)
    try spark.sql(
      s"""WITH bench AS (
         |  SELECT DISTINCT gram, gh FROM $view
         |  WHERE source = '$decontamBenchSource')
         |SELECT c.doc_id, c.source, count(DISTINCT c.gram) AS n_hits
         |FROM $view c
         |JOIN bench b ON c.gram = b.gram
         |WHERE c.source <> '$decontamBenchSource'
         |  AND graft_might_contain(
         |        (SELECT graft_bloom_agg(gh, CAST($estimatedBenchGrams AS BIGINT)) FROM bench),
         |        c.gh)
         |GROUP BY c.doc_id, c.source""".stripMargin)
    finally spark.catalog.dropTempView(view)
  }

  /** Per-source corpus QUALITY REPORT — the dashboard a corpus owner
    * reads before mixing sources into a training run, composing four
    * operators into one grouped view: how many docs each source
    * contributes, how many fail the quality bar, how many are
    * repetition-flagged, how many leak bench content, and how many
    * participate in a near-dup pair. Every metric is an integer COUNT
    * of deterministic per-doc flags (no averaged doubles — a mean of
    * per-doc doubles would be summation-order-dependent and break the
    * cross-engine hash), so the report is hash-gated like everything
    * else.
    *
    * Shape at scale: ONE corpus scan carries every per-doc map-side
    * flag — the quality score ([[textQuality]] is pure projection
    * math) and the full repetition rule (gram fractions + the
    * one-pass hash-counting [[topWordCount]] kernel) are computed
    * INLINE on the same projection as (doc_id, source), so neither
    * costs a second corpus scan or a doc_id join. Only the genuinely relational components join on:
    * the decontamination gram overlap and the near-dup pair flag
    * (whose subtree reuses the shared docSets exchange — PlanSpec-
    * pinned ReusedExchange). The flag expressions are the component
    * operators' own, so the report stays bit-identical to composing
    * them — the hash gate pins it. */
  def sourceQualityReport(spark: SparkSession, dir: String): DataFrame = {
    // inline [[textQuality]]: same expressions, same doubles, zero
    // extra scans. A doc with no tokens has no quality row upstream —
    // mirrored by the size(toks) > 0 conjunct (flag stays null).
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val totTokChars = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
    val nChars = length(col("text")).cast("double")
    val quality = lit(1.0) - (nStop / nTok) * 0.5 -
      ((nChars - totTokChars) / nChars) * 0.2
    // inline [[docRepetition]]: same stats, same keep rule (null dup
    // fraction → keep 0); a token-less doc is unflagged, exactly as
    // it is absent from docRepetition's output
    val g2 = kGrams(toks, 2)
    val n2 = size(g2)
    val u2 = size(array_distinct(g2))
    val keep = when(
      (topWordCount(toks).cast("double") / size(toks).cast("long").cast("double"))
        <= repTopWordMax
        && when(n2 > 0, (n2 - u2).cast("double") / n2.cast("double"))
          <= repDup2gramMax, lit(1L)).otherwise(lit(0L))
    val d = docs(spark, dir).select(
      col("doc_id"), col("source"),
      when(size(toks) > 0 && quality < TrainingPipeline.qualityMin, lit(1))
        .as("low_q"),
      when(size(toks) > 0 && keep === 0, lit(1)).as("repet"))
    val cont = decontamination(spark, dir)
      .select(col("doc_id"), lit(1).as("contam"))
    val pairs = DedupOps.ngramJaccard(spark, dir)
    val dup = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .select(col("doc_id"), lit(1).as("dup"))
    d.join(cont, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("low_q")).as("n_low_quality"),
        count(col("repet")).as("n_repetitive"),
        count(col("contam")).as("n_contaminated"),
        count(col("dup")).as("n_near_dup"))
  }

  lazy val sourceQualityReportSql: String =
    s"""WITH q AS ($textQualitySql),
       |r AS ($docRepetitionSql),
       |c AS ($decontaminationSql),
       |p AS (${DedupOps.jaccardSql}),
       |dup AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b FROM p)),
       |lowq AS (SELECT doc_id FROM q WHERE quality < ${TrainingPipeline.qualityMin}),
       |rep AS (SELECT doc_id FROM r WHERE keep = 0)
       |SELECT d.source, count(*) AS n_docs,
       |  count(lowq.doc_id) AS n_low_quality,
       |  count(rep.doc_id) AS n_repetitive,
       |  count(c.doc_id) AS n_contaminated,
       |  count(dup.doc_id) AS n_near_dup
       |FROM documents d
       |LEFT JOIN lowq ON lowq.doc_id = d.doc_id
       |LEFT JOIN rep ON rep.doc_id = d.doc_id
       |LEFT JOIN c ON c.doc_id = d.doc_id
       |LEFT JOIN dup ON dup.doc_id = d.doc_id
       |GROUP BY d.source""".stripMargin

  /** PII-shaped patterns for [[docPiiScrub]]. Simple ASCII character
    * classes on purpose: Java (Spark) and RE2 (DuckDB) regex dialects
    * agree on them exactly, so the scrubbed text hash-matches
    * cross-engine. A deployment swaps in its jurisdiction's pattern
    * pack; the plumbing (codegen regexp over the scan, no shuffle)
    * is what this operator pins. */
  val piiEmailPat = "[a-z0-9._]+@[a-z0-9.]+"
  val piiPhonePat = "555-[0-9]{4}"

  /** Contact-info redaction — the PII-scrub pass a training pipeline
    * runs before anything leaves the ingest zone. The corpus is
    * synthetic (no real contact strings), so the operator PLANTS
    * deterministic ones first ([[dedupExact]]'s synthesized-tail
    * idiom): every doc_id ≡ 3 (mod 10) gains an email, ≡ 6 a phone
    * number — both derived from doc_id, so DuckDB plants the identical
    * corpus. Then the scrub: count matches, replace with typed tags,
    * emit md5 of the cleaned text. Pure map-side codegen (regexp over
    * the scan, zero shuffles) — at 100 TB this runs at scan speed. */
  def docPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      when(pmod(col("doc_id"), lit(10)) === 3,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com for details")))
        .when(pmod(col("doc_id"), lit(10)) === 6,
          concat(lit(" call 555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" now")))
        .otherwise(lit("")))
    docs(spark, dir).select(col("doc_id"), planted.as("raw"))
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(raw, '$piiEmailPat', 0)"))
          .cast("long").as("n_emails"),
        size(expr(s"regexp_extract_all(raw, '$piiPhonePat', 0)"))
          .cast("long").as("n_phones"),
        md5(piiRedact(col("raw")).cast("binary")).as("clean_md5"))
  }

  /** The redaction projection alone — typed tags over contact
    * patterns, pure map-side regexp. Factored out so composed
    * pipelines can scrub text as a STAGE (redact what is written)
    * rather than running [[docPiiScrub]]'s report shape; the
    * training pipeline applies it to the survivors' payload
    * ([[TrainingPipeline.run]] `piiScrub = true`). */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, piiEmailPat, "<EMAIL>"),
      piiPhonePat, "<PHONE>")

  val docPiiScrubSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    text || CASE
       |      WHEN doc_id % 10 = 3 THEN ' contact user' || doc_id || '@example.com for details'
       |      WHEN doc_id % 10 = 6 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
       |      ELSE '' END AS raw
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(raw, '$piiEmailPat')) AS n_emails,
       |  len(regexp_extract_all(raw, '$piiPhonePat')) AS n_phones,
       |  md5(regexp_replace(regexp_replace(raw, '$piiEmailPat', '<EMAIL>', 'g'),
       |      '$piiPhonePat', '<PHONE>', 'g')) AS clean_md5
       |FROM t""".stripMargin

  // ---- HTML / boilerplate extraction -----------------------------------

  /** Minimum visible characters for a block to count as content — the
    * published jusText/trafilatura short-block heuristic (boilerplate
    * fragments are short; body prose is not). Integer chars, so the
    * keep decision is exact cross-engine. */
  val htmlMinBlockChars = 25

  /** Block-boundary tags: splitting on these (open or close, any
    * attributes) turns the page into candidate text blocks; inline
    * markup (<a>, <b>, <span>) stays INSIDE its block so the
    * link-density measure can see it. */
  private val htmlBlockTagPat =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|nav|br|body|html|head|title|table|tr|td|footer|header|article|section)[^>]*>"

  /** Non-content elements dropped wholesale before block splitting.
    * RE2-compatible on purpose (non-greedy + (?s)(?i), no lookaround,
    * no backrefs) — the Java (Spark) and RE2 (DuckDB) dialects agree
    * exactly, the [[piiEmailPat]] stance. */
  private val htmlDropPats = Seq(
    "(?s)(?i)<script[^>]*>.*?</script>",
    "(?s)(?i)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  private val htmlAnchorPat = "(?s)(?i)<a[^>]*>.*?</a>"
  private val htmlTagPat = "<[^>]*>"

  /** Numeric character references (`&#NNN;` / `&#xHH;`) decoded to
    * their code points — the crawl-reality complement to the named
    * entity set (real pages are full of `&#8217;`-class refs): split
    * on the literal "&#", decode a leading valid reference body per
    * fragment ([[graft.functions.TextKernels.codePointChar]] — the
    * builtin `chr` is mod-256 and cannot emit Unicode), re-emit
    * anything malformed or out of range verbatim (no digits, bad hex,
    * > 7 digits, code point 0, beyond U+10FFFF, surrogates). Pure
    * map-side split/regexp/transform, RE2-compatible patterns so the
    * DuckDB twin agrees byte-for-byte. */
  private def decodeNumericRefs(c: Column): Column = {
    def piece(p: Column): Column = {
      val dec = regexp_extract(p, "^([0-9]{1,7});", 1)
      val hx = regexp_extract(p, "^[xX]([0-9a-fA-F]{1,6});", 1)
      val v = when(dec =!= "", dec.cast("long"))
        .when(hx =!= "", conv(hx, 16, 10).cast("long"))
      val ok = v.isNotNull && v >= 1L && v <= 0x10FFFFL &&
        !(v >= 0xD800L && v <= 0xDFFFL)
      val rest = when(dec =!= "", substr(p, length(dec) + 2, length(p)))
        .otherwise(substr(p, length(hx) + 3, length(p)))
      when(ok, concat(graft.functions.TextKernels.codePointChar(v), rest))
        .otherwise(concat(lit("&#"), p))
    }
    array_join(
      transform(split(c, "&#", -1),
        (p, i) => when(i === 0, p).otherwise(piece(p))), "")
  }

  /** Visible text of a block: inline tags stripped to spaces,
    * whitespace collapsed, the common entities decoded (&amp; LAST,
    * so a double-escaped entity decodes exactly one level — the HTML
    * rule, and `&amp;#65;` stays the literal `&#65;` because no "&#"
    * substring exists until the amp decodes; &nbsp; first, before any
    * entity can synthesize one; numeric refs with the named set,
    * before the amp pass). */
  private def htmlVisible(b: Column): Column = {
    val stripped = trim(regexp_replace(
      regexp_replace(b, htmlTagPat, " "), "\\s+", " "))
    val named = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"")
      .foldLeft(stripped) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    replace(decodeNumericRefs(named), lit("&amp;"), lit("&"))
  }

  /** Per-block (visible, visible-without-anchors) structs for an HTML
    * string — the shared stem of the clean text, the block counts and
    * the keep predicate. Scalar-only, map-side: scripts/styles/
    * comments drop, block tags split, each block scored in place. */
  private def htmlScoredBlocks(html: Column): Column = {
    val noHidden = htmlDropPats.foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    transform(split(noHidden, htmlBlockTagPat), b =>
      struct(htmlVisible(b).as("v"),
        htmlVisible(regexp_replace(b, htmlAnchorPat, "")).as("w")))
  }

  /** The jusText-style keep rule: enough visible text AND link
    * density ≤ 1/2 — computed in INTEGER arithmetic
    * (2·linkChars ≤ chars, linkChars = chars − chars-without-anchors)
    * so there is no float to disagree about. */
  private def htmlKeep(s: Column): Column =
    length(s.getField("v")) >= htmlMinBlockChars &&
      (length(s.getField("v")) - length(s.getField("w"))) * 2 <=
        length(s.getField("v"))

  /** Boilerplate-removed main text of an HTML string column — the
    * composable stage form ([[piiRedact]]'s role for the scrub):
    * kept blocks joined by newline. Plain text without tags passes
    * through as one block (whitespace-normalized; dropped entirely
    * only when shorter than [[htmlMinBlockChars]]). */
  def htmlExtractClean(html: Column): Column = {
    val sc = htmlScoredBlocks(html)
    array_join(transform(filter(sc, htmlKeep _), s => s.getField("v")), "\n")
  }

  /** The planted-HTML gate page (the [[docPiiScrub]] synthesized-
    * corpus idiom): the document's text becomes the main <p> content
    * wrapped in a deterministic page whose boilerplate varies by
    * doc_id mod 4 — a nav menu (link density 1 → dropped), a short
    * heading/tag line (length → dropped), a mixed prose+link block
    * (density below the bar → kept), a majority-anchor long block
    * (density → dropped), an entity-bearing paragraph (decode path),
    * a comment + script + style (dropped wholesale), a link-heavy
    * footer. DuckDB builds the identical page, so every branch of
    * the extractor is hash-gated. */
  private def htmlPayload: Column = {
    val id = col("doc_id")
    val idS = id.cast("string")
    val txt = col("text")
    concat(
      lit("<html><head><title>doc "), idS, lit(" title</title>"),
      when(pmod(id, lit(4)) === 2,
        lit("<style>p{color:red;font-size:14px}</style>")).otherwise(lit("")),
      lit("</head><body>"),
      when(pmod(id, lit(4)) === 0,
        lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about us</a>" +
          " <a href=\"/contact\">contact page</a></nav>")).otherwise(lit("")),
      lit("<h1>doc "), idS, lit(" heading</h1>"),
      lit("<p>"), txt, lit("</p>"),
      lit("<p>tag "), pmod(id, lit(7)).cast("string"), lit("</p>"),
      lit("<div><p>"), substring(txt, 1, 80),
      lit(" see <a href=\"/more\">more item "), pmod(id, lit(5)).cast("string"),
      lit("</a> for the remaining details</p></div>"),
      lit("<p><a href=\"/l\">"), substring(txt, 1, 40), lit("</a> ok</p>"),
      when(pmod(id, lit(4)) === 1,
        concat(lit("<p>alpha &amp; beta &lt;tag&gt; &quot;quoted&quot;" +
          " &#39;s&#39; x&nbsp;y &#233;e em&#8212;dash &#x27;q&#x27;" +
          " smile &#x1F600; amp-escaped &amp;#65; "),
          substring(txt, 1, 30), lit("</p>")))
        .otherwise(lit("")),
      when(pmod(id, lit(4)) === 1,
        concat(lit("<!-- hidden note "), idS, lit(" -->"))).otherwise(lit("")),
      when(pmod(id, lit(4)) === 3,
        concat(lit("<p>bad refs &#; &#xZZ; &#99999999; &#xD800; &#0; tail "),
          substring(txt, 1, 40), lit("</p>"))).otherwise(lit("")),
      lit("<script>var x = "), idS, lit(";</script>"),
      when(pmod(id, lit(4)) =!= 3,
        concat(lit("<div><a href=\"/terms\">terms</a>" +
          " <a href=\"/privacy\">privacy</a> &copy; "),
          pmod(id, lit(100)).cast("string"), lit("</div>"))).otherwise(lit("")),
      lit("</body></html>"))
  }

  /** HTML → main-text extraction — the ingest stage between "what a
    * crawl delivers" and the clean-text corpus every other curation
    * operator assumes (cf. the reference pipelines' text mappers,
    * SolaceIO.Read.mapRecord → text, which presume decoded payloads).
    * Tag-aware but parser-free: script/style/comment blocks drop
    * wholesale, block-level tags split the page into candidate
    * blocks, and each block survives by the published
    * jusText/trafilatura heuristics — visible length ≥
    * [[htmlMinBlockChars]] AND link density ≤ 1/2 (both integer
    * tests). Pure map-side codegen'd regexp/array expressions over
    * one scan, zero shuffles — at 100 TB this runs at scan speed,
    * exactly like [[docPiiScrub]]. Emits per-doc counts + md5 of the
    * extracted text; the composable column form is
    * [[htmlExtractClean]] (the `training_pipeline` ingest stage). */
  def docHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), htmlPayload.as("html"))
    val sc = htmlScoredBlocks(col("html"))
    val clean = array_join(transform(filter(sc, htmlKeep _), s => s.getField("v")), "\n")
    d.select(
      col("doc_id"),
      regexp_extract(col("html"), "<title>([^<]*)</title>", 1).as("title"),
      size(filter(sc, s => length(s.getField("v")) > 0)).cast("long").as("n_blocks"),
      size(filter(sc, htmlKeep _)).cast("long").as("n_kept"),
      length(col("html")).cast("long").as("chars_raw"),
      length(clean).cast("long").as("chars_clean"),
      md5(clean.cast("binary")).as("clean_md5"))
  }

  val docHtmlExtractSql: String = {
    // the identical page, DuckDB-side
    val page =
      """'<html><head><title>doc ' || doc_id || ' title</title>' ||
        |    CASE WHEN doc_id % 4 = 2 THEN '<style>p{color:red;font-size:14px}</style>' ELSE '' END ||
        |    '</head><body>' ||
        |    CASE WHEN doc_id % 4 = 0 THEN '<nav><a href="/">home</a> <a href="/about">about us</a> <a href="/contact">contact page</a></nav>' ELSE '' END ||
        |    '<h1>doc ' || doc_id || ' heading</h1>' ||
        |    '<p>' || text || '</p>' ||
        |    '<p>tag ' || doc_id % 7 || '</p>' ||
        |    '<div><p>' || substr(text, 1, 80) || ' see <a href="/more">more item ' || doc_id % 5 || '</a> for the remaining details</p></div>' ||
        |    '<p><a href="/l">' || substr(text, 1, 40) || '</a> ok</p>' ||
        |    CASE WHEN doc_id % 4 = 1 THEN '<p>alpha &amp; beta &lt;tag&gt; &quot;quoted&quot; &#39;s&#39; x&nbsp;y &#233;e em&#8212;dash &#x27;q&#x27; smile &#x1F600; amp-escaped &amp;#65; ' || substr(text, 1, 30) || '</p>' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 1 THEN '<!-- hidden note ' || doc_id || ' -->' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 3 THEN '<p>bad refs &#; &#xZZ; &#99999999; &#xD800; &#0; tail ' || substr(text, 1, 40) || '</p>' ELSE '' END ||
        |    '<script>var x = ' || doc_id || ';</script>' ||
        |    CASE WHEN doc_id % 4 <> 3 THEN '<div><a href="/terms">terms</a> <a href="/privacy">privacy</a> &copy; ' || doc_id % 100 || '</div>' ELSE '' END ||
        |    '</body></html>'""".stripMargin
    // visible-text chain (tags → spaces, collapse, trim, entities in
    // the htmlVisible order: &nbsp; first, numeric refs with the named
    // set, &amp; last)
    def numRef(y: String): String = {
      val dec = "regexp_extract(p, '^([0-9]{1,7});', 1)"
      val hx = "regexp_extract(p, '^[xX]([0-9a-fA-F]{1,6});', 1)"
      val vd = s"CAST($dec AS BIGINT)"
      val vh = s"CAST('0x' || $hx AS BIGINT)"
      s"""array_to_string(list_transform(string_split($y, '&#'), (p, i) ->
         |  CASE WHEN i = 1 THEN p
         |   WHEN $dec <> '' AND $vd BETWEEN 1 AND 1114111
         |        AND $vd NOT BETWEEN 55296 AND 57343
         |     THEN chr(CAST($vd AS INT)) || substr(p, len($dec) + 2)
         |   WHEN $hx <> '' AND $vh BETWEEN 1 AND 1114111
         |        AND $vh NOT BETWEEN 55296 AND 57343
         |     THEN chr(CAST($vh AS INT)) || substr(p, len($hx) + 3)
         |   ELSE '&#' || p END), '')""".stripMargin
    }
    def visFull(x: String): String = {
      val named = "replace(replace(replace(replace(" +
        s"trim(regexp_replace(regexp_replace($x, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))" +
        ", '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"')"
      s"replace(${numRef(named)}, '&amp;', '&')"
    }
    s"""WITH h AS (
       |  SELECT doc_id, $page AS html FROM documents),
       |s AS (SELECT doc_id, html,
       |  regexp_replace(regexp_replace(regexp_replace(html,
       |    '(?s)(?i)<script[^>]*>.*?</script>', ' ', 'g'),
       |    '(?s)(?i)<style[^>]*>.*?</style>', ' ', 'g'),
       |    '(?s)<!--.*?-->', ' ', 'g') AS noh FROM h),
       |v AS (SELECT doc_id, html,
       |  list_transform(string_split_regex(noh, '$htmlBlockTagPat'),
       |    b -> struct_pack(v := ${visFull("b")},
       |      w := ${visFull("regexp_replace(b, '" + htmlAnchorPat + "', '', 'g')")})) AS sc
       |  FROM s),
       |k AS (SELECT doc_id, html, sc,
       |  array_to_string(list_transform(list_filter(sc,
       |    s -> len(struct_extract(s, 'v')) >= $htmlMinBlockChars
       |     AND 2*(len(struct_extract(s, 'v')) - len(struct_extract(s, 'w')))
       |         <= len(struct_extract(s, 'v'))),
       |    s -> struct_extract(s, 'v')), chr(10)) AS clean
       |  FROM v)
       |SELECT doc_id,
       |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       |  CAST(len(list_filter(sc, s -> len(struct_extract(s, 'v')) > 0)) AS BIGINT) AS n_blocks,
       |  CAST(len(list_filter(sc,
       |    s -> len(struct_extract(s, 'v')) >= $htmlMinBlockChars
       |     AND 2*(len(struct_extract(s, 'v')) - len(struct_extract(s, 'w')))
       |         <= len(struct_extract(s, 'v')))) AS BIGINT) AS n_kept,
       |  CAST(len(html) AS BIGINT) AS chars_raw,
       |  CAST(len(clean) AS BIGINT) AS chars_clean,
       |  md5(clean) AS clean_md5
       |FROM k""".stripMargin
  }

  /** Repetition-quality thresholds (Gopher-rule shape: drop documents
    * dominated by a single token or by repeated n-grams). Chosen to
    * split the test corpus non-trivially (312/500 kept at sf0.01);
    * a deployment tunes them per corpus. */
  val repTopWordMax = 0.1
  val repDup2gramMax = 0.3

  /** Max per-token occurrence count of a token array — the codegen'd
    * [[graft.functions.TextKernels.topTokenCount]] kernel (one
    * hash-counting pass per doc, map-side, stays inside whole-stage
    * codegen). Integer-exact — interchangeable with the explode +
    * count + max aggregate, minus its two exchanges. */
  private def topWordCount(w: Column): Column =
    graft.functions.TextKernels.topTokenCount(w)

  /** [[docRepetition]]'s keep rule as ONE fused kernel call over the
    * text column — for composing pipelines that filter on repetition.
    * Two composable forms were measured and rejected: semi-joining
    * the [[docRepetition]] frame invites Catalyst to push and
    * DUPLICATE the heavy per-doc gram expressions across several
    * operators (a 4× re-evaluation inside training_pipeline), and a
    * conjunction of column expressions re-tokenizes once per conjunct
    * because FilterExec codegen doesn't share subexpressions across
    * split predicates (3× the kernel's cost on the pipeline's corpus
    * scan — the r6 sf0.1 pipeline creep). The kernel keeps the exact
    * composed-predicate semantics, spec-pinned against
    * [[docRepetition]]'s keep flag row-for-row. */
  private[graft] def repetitionKeep(text: Column): Column =
    graft.functions.TextKernels.repetitionKeep(text, repTopWordMax, repDup2gramMax)

  /** Gopher-style repetition metrics per document — the second family
    * of quality filters a training-data pipeline runs (alongside the
    * [[textQuality]] ratio rules): top-word share (what fraction of
    * the doc is its single most frequent token) and duplicate 2-/
    * 3-gram fractions (how much of the doc is n-grams it already
    * used). A `keep` flag applies the thresholds.
    *
    * Shape at scale: EVERYTHING is map-side array math — zero
    * shuffles, the operator runs at scan speed. The gram stats are
    * size / array_distinct on per-doc arrays, and the top-word count
    * is a codegen'd one-pass hash-counting kernel over the token
    * array (integer-exact and order-independent — no explode +
    * two-level aggregate shuffling (doc, word) pairs as a naive plan
    * would, and no interpreted higher-order fold breaking the
    * projection out of whole-stage codegen). Per-doc cost is O(n)
    * in-memory, which beats shipping the token volume through an
    * exchange at any corpus size. Ratios are ONE double division of
    * exact ints (bit-identical cross-engine); `keep` is pure
    * integer/boolean logic on those. */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    val w = tokens(col("text"))
    val g2 = kGrams(w, 2)
    val g3 = kGrams(w, 3)
    docs(spark, dir)
      // mirror the old inner join on the per-doc word aggregate: a
      // token-less doc had no top-word row and thus no output row
      .filter(size(w) > 0)
      .select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        topWordCount(w).as("top_cnt"),
        size(g2).as("n2"), size(array_distinct(g2)).as("u2"),
        size(g3).as("n3"), size(array_distinct(g3)).as("u3"))
      .select(
        col("doc_id"), col("n_tokens"), col("top_cnt"),
        (col("top_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("top_word_share"),
        when(col("n2") > 0,
          (col("n2") - col("u2")).cast("double") / col("n2").cast("double"))
          .as("dup_2gram_frac"),
        when(col("n3") > 0,
          (col("n3") - col("u3")).cast("double") / col("n3").cast("double"))
          .as("dup_3gram_frac"))
      // null dup fraction (degenerate doc) -> not kept, same as SQL's
      // CASE WHEN null THEN .. ELSE 0
      .withColumn("keep",
        when(col("top_word_share") <= repTopWordMax
          && col("dup_2gram_frac") <= repDup2gramMax, lit(1L)).otherwise(lit(0L)))
  }

  val docRepetitionSql: String =
    s"""WITH t AS (
       | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       | FROM documents),
       |m AS (SELECT doc_id, unnest(w) AS word FROM t),
       |topc AS (
       | SELECT doc_id, max(c) AS top_cnt FROM (
       |  SELECT doc_id, word, count(*) AS c FROM m GROUP BY doc_id, word)
       | GROUP BY doc_id),
       |g AS (
       | SELECT doc_id, len(w) AS n_tokens,
       |  CASE WHEN len(w) >= 2
       |   THEN [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
       |   ELSE [] END AS g2,
       |  CASE WHEN len(w) >= 3
       |   THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]
       |   ELSE [] END AS g3
       | FROM t),
       |s AS (
       | SELECT g.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(top_cnt AS BIGINT) AS top_cnt,
       |  CAST(top_cnt AS DOUBLE)/n_tokens AS top_word_share,
       |  CASE WHEN len(g2) > 0
       |   THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)/len(g2)
       |   END AS dup_2gram_frac,
       |  CASE WHEN len(g3) > 0
       |   THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)/len(g3)
       |   END AS dup_3gram_frac
       | FROM g JOIN topc ON g.doc_id = topc.doc_id)
       |SELECT *,
       | CAST(CASE WHEN top_word_share <= $repTopWordMax
       |   AND dup_2gram_frac <= $repDup2gramMax THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM s""".stripMargin

  /** Per-document n-gram novelty — a data-curation signal: what
    * fraction of a doc's distinct 3-shingles appear here FIRST (the
    * corpus-wide minimum doc_id owning the shingle is this doc)?
    * Boilerplate-heavy or near-duplicate documents score low; the
    * first copy of duplicated content keeps its score — which is
    * exactly the ordering a keep-first dedup policy wants.
    *
    * Shape at scale: explode distinct shingles (map-side kernel), ONE
    * shuffle on the shingle key for the min-owner aggregate, join
    * back, re-aggregate per doc. Both consumers of the exploded
    * shingle set reference the SAME subplan, so the exchange is
    * reused rather than re-scanning the corpus. Novelty is one double
    * division of exact ints. Docs with no 3-shingles (<3 tokens) have
    * no rows to aggregate and are absent, same as the oracle. */
  def docNovelty(spark: SparkSession, dir: String): DataFrame = {
    val ex = docs(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextKernels.distinctShingles3(col("text"))).as("s"))
    val first = ex.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    ex.join(first, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  val docNoveltySql: String =
    """WITH toks AS (
      | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      | FROM documents),
      |sh AS (
      | SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
      |   THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]
      |   ELSE [] END) AS shs
      | FROM toks),
      |ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      |f AS (SELECT s, min(doc_id) AS first_doc FROM ex GROUP BY s),
      |a AS (
      | SELECT ex.doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN ex.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel
      | FROM ex JOIN f USING (s) GROUP BY ex.doc_id)
      |SELECT doc_id, n_shingles, n_novel,
      | CAST(n_novel AS DOUBLE)/n_shingles AS novelty
      |FROM a""".stripMargin

  /** Shingle-set profile per document (feeds the dedup suite). */
  def shingleStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val sh = shingles3(toks)
    docs(spark, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(sh).cast("long").as("n_shingles"),
      size(array_distinct(sh)).cast("long").as("n_distinct"),
      when(size(sh) > 0,
        size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
        .otherwise(lit(null).cast("double")).as("distinct_ratio"))
  }

  val shingleStatsSql: String =
    """WITH t AS (
      | SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
      | FROM documents),
      |s AS (
      | SELECT doc_id, len(w) AS n_tokens,
      |  CASE WHEN len(w) >= 3
      |   THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]
      |   ELSE [] END AS sh
      | FROM t)
      |SELECT doc_id, n_tokens, len(sh) AS n_shingles,
      | len(list_distinct(sh)) AS n_distinct,
      | CASE WHEN len(sh) > 0
      |  THEN CAST(len(list_distinct(sh)) AS DOUBLE)/len(sh)
      |  ELSE NULL END AS distinct_ratio
      |FROM s""".stripMargin
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end training-data job — the thing a user of
  * this library actually runs at 100 TB: ingest → near-dup dedup
  * (pure-LSH scale mode) → benchmark decontamination (hashed-gram
  * scale mode) → quality filter (ratio rules + the fused Gopher
  * repetition kernel) → deterministic stratified sample → optional
  * PII redaction of the shipped text → partitioned parquet write,
  * one DataFrame program.
  *
  * Composition is where a pipeline wins or loses at scale, not the
  * individual stages:
  *  - The drop-sets (near-dup pairs, contaminated doc ids) are
  *    corpus-scale aggregates, but they JOIN the corpus as left-anti
  *    equi-joins on doc_id — the corpus streams through, nothing is
  *    collected or broadcast except what AQE measures as small.
  *  - The dedup stage is the pure-LSH mode ([[DedupOps.minhashLsh]]
  *    with `exactRecallUnion = false`): one band-hash shuffle, no
  *    inverted index — the 100 TB candidate generator. Within it the
  *    shared per-doc shingle aggregate is planned once and reused
  *    (ReusedExchange, pinned by the dedup plan specs).
  *  - Every per-doc predicate (quality score, stratum, sample hash)
  *    is a narrow codegen'd projection — no stage adds a shuffle
  *    beyond the aggregates that define it.
  *  - The sample is a pure function of doc_id (Knuth multiplicative
  *    hash, same constants as [[TextOps.docSample]]), so the output
  *    is reproducible on any cluster, any partitioning.
  *
  * Dedup keep-rule: the SMALLER doc_id of each near-dup pair
  * survives; any doc appearing as the larger side of some pair is
  * dropped. (Cluster-exact resolution — keep one per connected
  * component — ships separately as [[DedupOps.dupClusters]]; the
  * greedy pair rule is the standard streaming-friendly choice and
  * can only over-drop, never leak a duplicate pair into the output.)
  *
  * LSH recall < 1 by construction → no DuckDB oracle (rows-gated);
  * the ScalaTest spec instead re-derives every predicate from the
  * component operators and asserts the output satisfies all of them.
  */
object TrainingPipeline {

  /** Minimum quality score (see [[TextOps.textQuality]]'s fixed
    * linear score) a surviving document must reach. */
  val qualityMin = 0.55

  /** Surviving documents with their per-doc pipeline columns.
    * `exactDedup = false` (the scale mode) draws the near-dup drop-set
    * from the pure-LSH candidates; `true` draws it from the exact
    * prefix-filtered join, which makes the WHOLE pipeline
    * deterministic and therefore DuckDB-oracle-able — that variant
    * ships as the hash-gated `training_pipeline_exact` entry.
    *
    * `scaleMode = true` (the default — this is the entry a 100 TB user
    * runs) also draws the decontamination drop-set from the
    * HASHED-gram mode: 8-byte xxhash64 shuffle keys instead of
    * ~50-byte gram strings, measured 1.9× cheaper at sf1, bit-equal
    * output on any corpus where no 64-bit gram collision lands in the
    * overlap (spec-pinned both standalone and composed here). The
    * exact twin pins `scaleMode = false` so every stage keeps its
    * cross-engine oracle.
    *
    * `commonnessFilter = true` adds the [[TextOps.docTermCommonness]]
    * stage (drop the templated high-commonness tail) as a left-semi
    * join on its keep set — one more vocabulary-sized aggregate
    * joined back on doc_id, the same composition class as the
    * quality stage. Off by default so the established gate entries
    * keep their oracles; the composition spec pins predicate-exact
    * equality with the standalone operator.
    *
    * `lmScoreFilter = true` adds the [[TextOps.docLmAdaptive]] stage
    * (corpus-LM rank keeping: drop each source's least-predictable
    * quartile and its top-novelty gibberish tail) as a left-ANTI join
    * on the keep=false rows — anti on the measured-bad set rather
    * than semi on the keep set, so docs the scorer never saw (< 2
    * tokens, no bigram rows) fall through to the quality stage
    * instead of being dropped by a filter that never measured them.
    * Same opt-in contract as `commonnessFilter`.
    *
    * `qualityByLang = true` adds the [[TextOps.docQualityByLang]]
    * stage (per-(source, predicted-language) quality-rank keeping —
    * the multilingual fix for the pooled per-source quantile) with
    * the same measured-bad ANTI polarity: zero-token docs the
    * stratifier never scored are the absolute quality stage's call,
    * not this one's. The approx (percentile-threshold broadcast)
    * mode is the one composed here — this is the 100 TB entry. */
  /** `imageDupFilter = true` adds the [[MultimodalOps.imagePhash]]
    * stage — the pipeline's first MULTIMODAL filter: docs whose
    * binary payload is a perceptual near-duplicate of a
    * smaller-doc_id payload are dropped, the text-dedup keep-rule
    * (smaller id survives, anti-join on the pair set's doc_b side)
    * applied to the image signature pairs. Non-decodable payloads
    * never appear in the pair set and fall through untouched — the
    * lmScoreFilter polarity rationale: a filter only drops what it
    * measured. Opt-in like the other extra stages so the established
    * gate entries keep their oracles; the composition spec pins
    * predicate-exact equality with the standalone operator.
    *
    * `videoDupFilter = true` is the same stage one perceptual rung
    * up ([[MultimodalOps.videoPhash]]): docs whose payload demuxes to
    * ≥ 2 sample instants matching a smaller-doc_id video at Hamming
    * ≤ 6 are dropped — identical polarity, anti-join on doc_b,
    * non-demuxable payloads fall through untouched.
    *
    * `audioDupFilter = true` (r17) completes the perceptual trio
    * ([[MultimodalOps.audioPhash]]): docs whose WAV payload's
    * energy-contour signature matches a smaller-doc_id audio at
    * Hamming ≤ 6 are dropped — same polarity and fall-through. */
  def survivors(spark: SparkSession, dir: String,
                exactDedup: Boolean = false,
                scaleMode: Boolean = true,
                withText: Boolean = false,
                commonnessFilter: Boolean = false,
                lmScoreFilter: Boolean = false,
                qualityByLang: Boolean = false,
                imageDupFilter: Boolean = false,
                videoDupFilter: Boolean = false,
                audioDupFilter: Boolean = false): DataFrame = {
    val d = Tables(spark, dir, "documents")

    // near-dup drop-set: larger id of every near-dup pair
    val pairSource =
      if (exactDedup) DedupOps.ngramJaccard(spark, dir)
      else DedupOps.minhashLsh(spark, dir, exactRecallUnion = false)
    val nearDup = pairSource
      .select(col("doc_b").as("doc_id")).distinct()

    // eval-leak drop-set: docs sharing an 8-gram with the bench source
    val contaminated = TextOps.decontamination(spark, dir, hashGrams = scaleMode)
      .select("doc_id").distinct()

    // per-doc quality metrics (narrow projection + filter)
    val quality = TextOps.textQuality(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality"))

    // repetition filter (Gopher-rule stage): drop docs dominated by a
    // repeated token or n-gram — exact integer metrics, so both
    // pipeline modes stay deterministic in this stage. ONE inline
    // predicate on the corpus stream, not a semi-join against the
    // docRepetition frame (see TextOps.repetitionKeep: the join form
    // duplicated the per-doc gram expressions 4× through pushdown)

    // deterministic stratified sample — the SAME column definitions
    // TextOps.docSample uses, so the two agree doc-for-doc by
    // construction
    val outCols = Seq(col("doc_id"), col("source"), col("stratum"),
      col("n_tokens"), col("quality")) ++
      (if (withText) Seq(col("text")) else Nil)
    val base = d.filter(col("source") =!= TextOps.decontamBenchSource)
      .join(nearDup, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(quality.filter(col("quality") >= qualityMin), Seq("doc_id"))
      .filter(TextOps.repetitionKeep(col("text")))
    val afterCommon =
      if (commonnessFilter)
        base.join(TextOps.docTermCommonness(spark, dir)
          .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
      else base
    val afterLm =
      if (lmScoreFilter)
        afterCommon.join(TextOps.docLmAdaptive(spark, dir)
          .filter(!col("keep")).select("doc_id"), Seq("doc_id"), "left_anti")
      else afterCommon
    val afterQbl =
      if (qualityByLang)
        afterLm.join(TextOps.docQualityByLang(spark, dir, approx = true)
          .filter(!col("keep")).select("doc_id"), Seq("doc_id"), "left_anti")
      else afterLm
    val afterImg =
      if (imageDupFilter)
        afterQbl.join(MultimodalOps.imagePhash(spark, dir)
          .select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      else afterQbl
    val afterVid =
      if (videoDupFilter)
        afterImg.join(MultimodalOps.videoPhash(spark, dir)
          .select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      else afterImg
    // audioDupFilter (r17): the fifth perceptual rung, identical
    // polarity — docs whose WAV payload matches a smaller-doc_id
    // audio at Hamming <= 6 drop; non-WAV payloads fall through
    val filtered =
      if (audioDupFilter)
        afterVid.join(MultimodalOps.audioPhash(spark, dir)
          .select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      else afterVid
    filtered
      .withColumn("stratum", TextOps.stratumCol)
      .withColumn("h", TextOps.sampleHashCol)
      .filter(TextOps.sampleKeep(col("stratum"), col("h")))
      .select(outCols: _*)
  }

  /** Run the pipeline: write the surviving docs as stratum-partitioned
    * parquet (the training-shard layout) and return the per-
    * (source, stratum) summary a pipeline report wants. The summary
    * reads the WRITTEN SHARDS, not the pipeline subplan — re-running
    * the composed plan for the report would be a second full corpus
    * pass, a 2× cost at 100 TB; the shards are the sample's size.
    * (The fully-planned composed query is separately audited and
    * hash-gated as `training_pipeline_exact`.)
    *
    * `piiScrub = true` carries the surviving docs' TEXT into the
    * shards with [[TextOps.piiRedact]] applied — redaction as a
    * pipeline stage (scrub what ships, never drop the doc), the shape
    * a real training-shard writer runs. Off by default only because
    * the benched entry's summary doesn't need the text payload;
    * the scrub itself is a zero-shuffle projection on the write.
    *
    * Downstream, [[TextOps.docPackSequences]] assigns the written
    * survivors their packed-sequence offsets (per-stratum cumulative
    * token windows) — the batch-writer handoff after the shards. */
  def run(spark: SparkSession, dir: String, outDir: String = "",
          piiScrub: Boolean = false): DataFrame = {
    val out =
      if (outDir.nonEmpty) outDir
      else sys.props("java.io.tmpdir") + "/graft-train-" + Tables.dirKey(dir) +
        (if (piiScrub) "-pii" else "")
    val s = survivors(spark, dir, withText = piiScrub)
    val shards =
      if (piiScrub) s.withColumn("text", TextOps.piiRedact(col("text"))) else s
    shards.write.mode("overwrite").partitionBy("stratum").parquet(out)
    summarize(spark.read.parquet(out))
  }

  /** Crawl-ingest materialization pass — the stage between "what a
    * crawl delivers" (HTML) and the clean-text corpus every other
    * stage assumes: each document's text is replaced by its
    * [[TextOps.htmlExtractClean]] extraction (script/style/comment
    * drop, block split, jusText length + link-density keep rules),
    * documents with no extractable content are dropped, and the
    * result is written as a `documents.parquet` under `outDir` that
    * [[Tables]] (and therefore every pipeline stage) reads directly.
    *
    * Deliberately a SEPARATE pass, not a `survivors()` flag: at
    * 100 TB extraction is a scan-speed map over the raw crawl that
    * every downstream stage (dedup shingles, quality ratios, LM
    * grams) must consume — materializing once and curating the clean
    * corpus is the published two-pass shape (CommonCrawl WARC → WET,
    * then curation over WET), where fusing extraction into each of
    * the pipeline's 5+ corpus scans would re-pay the regexp walk per
    * stage. The composition spec pins the contract end to end: a
    * page-wrapped corpus run through extractCorpus + the pipeline
    * reproduces the clean-corpus pipeline bit-for-bit. All other
    * columns (source, ids, timestamps) pass through unchanged. */
  def extractCorpus(spark: SparkSession, dir: String, outDir: String): Long = {
    Tables(spark, dir, "documents")
      .withColumn("text", TextOps.htmlExtractClean(col("text")))
      .filter(length(col("text")) > 0)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }

  /** Deterministic twin of [[run]]: exact-Jaccard dedup, raw-gram
    * decontamination, no write — every stage reproduces bit-for-bit
    * in DuckDB, so the COMPOSED pipeline is hash-gated end to end,
    * not just its components. */
  def runExact(spark: SparkSession, dir: String): DataFrame =
    summarize(survivors(spark, dir, exactDedup = true, scaleMode = false))

  private def summarize(s: DataFrame): DataFrame =
    s.groupBy(col("source"), col("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        min(col("quality")).as("min_quality"))

  /** DuckDB oracle for [[runExact]] — the component oracles composed
    * into one query: exact pairs, contaminated ids, quality, sample. */
  val runExactSql: String =
    s"""WITH pairs AS (${DedupOps.jaccardSql}),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM (${TextOps.decontaminationSql})),
       |quality AS (${TextOps.textQualitySql}),
       |nonrep AS (
       |  SELECT doc_id FROM (${TextOps.docRepetitionSql}) WHERE keep = 1),
       |sample AS (${TextOps.docSampleSql}),
       |surv AS (
       |  SELECT d.doc_id, d.source, smp.stratum, q.n_tokens, q.quality
       |  FROM documents d
       |  JOIN quality q ON q.doc_id = d.doc_id
       |  JOIN sample smp ON smp.doc_id = d.doc_id
       |  WHERE d.source <> '${TextOps.decontamBenchSource}'
       |    AND q.quality >= $qualityMin
       |    AND d.doc_id NOT IN (SELECT doc_b FROM pairs)
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
       |    AND d.doc_id IN (SELECT doc_id FROM nonrep))
       |SELECT source, stratum, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
       |  min(quality) AS min_quality
       |FROM surv
       |GROUP BY source, stratum""".stripMargin
}

package graft.streaming

import graft.functions.BinRecordColumns.decodeRecord
import graft.functions.Texts
import graft.model.{DedupedMsg, GraftBytesRecord, GraftStructRecord, GraftTextRecord}
import graft.sources.GraftQueueSource
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQueryListener}
import org.apache.spark.sql.Row

/** Streaming pipelines over the graft queue source — the Spark
  * re-expression of the reference's sample pipelines:
  *  - message mappers ≙ InboundMessageMapper / StringMessageMapper
  *    (solace-apache-beam-samples/.../common/StringMessageMapper.java),
  *    except they are Catalyst projections producing typed Datasets;
  *  - windowedWordCount ≙ WindowedWordCountSolace.java:120-150
  *    (fixed windows + CountWords), with an event-time watermark on
  *    the sender timestamp (the useSenderTimestamp option);
  *  - fileSinkPerWindow ≙ common/WriteOneFilePerWindow.java — one
  *    parquet directory partition per window via partitionBy;
  *  - QueueStatsListener ≙ SolaceReaderStats.java — per-batch row /
  *    backlog accounting surfaced through the engine's listener bus.
  */
object Pipelines {

  /** readStream from the queue broker (SolaceIO.read equivalent). */
  def readQueues(
      spark: SparkSession,
      brokerDir: String,
      queues: Seq[String],
      maxRecordsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(GraftQueueSource.FORMAT)
      .option("brokerDir", brokerDir)
      .option("queues", queues.mkString(","))
    maxRecordsPerTrigger.foreach(n => r.option("maxRecordsPerTrigger", n.toString))
    r.load()
  }

  /** Bounded (batch) read of the same queues — maxNumRecords mode. */
  def readQueuesBounded(
      spark: SparkSession,
      brokerDir: String,
      queues: Seq[String],
      maxNumRecords: Option[Long] = None): DataFrame = {
    val r = spark.read
      .format(GraftQueueSource.FORMAT)
      .option("brokerDir", brokerDir)
      .option("queues", queues.mkString(","))
    maxNumRecords.foreach(n => r.option("maxNumRecords", n.toString))
    r.load()
  }

  /** StringMessageMapper: payload bytes → UTF-8 text. */
  def mapToText(messages: DataFrame): Dataset[String] = {
    import messages.sparkSession.implicits._
    messages.select(col("payload").cast("string")).as[String]
  }

  /** SolaceTextRecord mapper: full metadata + text payload. */
  def mapToTextRecord(messages: DataFrame): Dataset[GraftTextRecord] = {
    import messages.sparkSession.implicits._
    messages.select(
      col("queue"), col("destination"), col("message_id"),
      col("sender_ts"), col("receive_ts"), col("priority"),
      col("redelivered"), col("reply_to"), col("sequence_number"),
      col("time_to_live"), col("payload").cast("string").as("text"))
      .as[GraftTextRecord]
  }

  /** SolaceByteBuffRecord mapper: raw bytes view. */
  def mapToBytes(messages: DataFrame): Dataset[GraftBytesRecord] = {
    import messages.sparkSession.implicits._
    messages.select(col("queue"), col("message_id"), col("payload")).as[GraftBytesRecord]
  }

  /** Protobuf-sample equivalent: payloads carry GR binary records,
    * decoded by the custom DecodeBinRecord expression (a codegen'd
    * projection, not a per-record callback). */
  def mapToStructRecord(messages: DataFrame): Dataset[GraftStructRecord] = {
    import messages.sparkSession.implicits._
    messages
      .select(col("queue"), col("message_id"), decodeRecord(col("payload")).as("rec"))
      .select(col("queue"), col("message_id"),
        col("rec.id").as("id"), col("rec.value").as("value"), col("rec.tag").as("tag"))
      .as[GraftStructRecord]
  }

  /** Exactly-once projection of an at-least-once stream: stateful
    * message-id dedup via flatMapGroupsWithState. A broker that
    * redelivers unacked messages (SolaceCheckpointMark semantics)
    * yields duplicate (queue, message_id) rows; state remembers seen
    * ids. Pass a TTL to bound state on long-running deployments —
    * note that any processing-time timeout makes the engine schedule
    * continuous no-data micro-batches to fire expirations. */
  def statefulDedup(
      messages: DataFrame, stateTtlMs: Option[Long] = None): Dataset[DedupedMsg] = {
    import messages.sparkSession.implicits._
    val typed = messages
      .select(col("queue"), col("message_id"), col("payload").cast("string").as("text"))
      .as[(String, Long, String)]
    val timeoutConf = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    typed
      .groupByKey { case (q, id, _) => (q, id) }
      .flatMapGroupsWithState[Boolean, DedupedMsg](OutputMode.Append, timeoutConf) {
        case ((q, id), rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // duplicate delivery
          else {
            state.update(true)
            stateTtlMs.foreach(state.setTimeoutDuration)
            rows.take(1).map { case (_, _, t) => DedupedMsg(q, id, t) }
          }
      }
  }

  /** Exactly-once dedup with WATERMARK-bounded state — the built-in
    * alternative to [[statefulDedup]]: `dropDuplicatesWithinWatermark`
    * keeps a (queue, message_id) key only until the event-time
    * watermark passes it, so state is bounded by the redelivery
    * horizon instead of by total key cardinality (or by a processing-
    * time TTL that needs no-data micro-batches to fire). The contract
    * matches real broker redelivery: a duplicate arrives within the
    * redelivery window or not at all; a copy later than `watermark`
    * past the original MAY be re-emitted — that is the documented
    * trade for O(window) state at 100 TB key volumes. */
  def watermarkDedup(messages: DataFrame, watermark: String = "1 minute"): DataFrame =
    messages
      .withWatermark("sender_ts", watermark)
      .dropDuplicatesWithinWatermark("queue", "message_id")

  /** Stream-stream interval join: correlate messages from two queues
    * by payload key within ± `tolerance` of event time. Watermarks on
    * both sides bound the join state — the cross-stream enrichment
    * pattern (e.g. clicks ⋈ purchases) the reference leaves to
    * downstream Beam transforms.
    *
    * `joinType` supports the outer variants ("left_outer",
    * "right_outer", "full_outer"): an unmatched row is held in state
    * until the other side's watermark proves no match can still
    * arrive, then emitted with nulls — the correct streaming answer to
    * "clicks that never converted", which an inner join silently
    * drops. */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame, tolerance: String = "30 seconds",
      watermark: String = "1 minute", joinType: String = "inner"): DataFrame = {
    val l = left
      .select(col("payload").cast("string").as("k"),
        col("sender_ts").as("lt"), col("message_id").as("left_id"))
      .withWatermark("lt", watermark)
    val r = right
      .select(col("payload").cast("string").as("k2"),
        col("sender_ts").as("rt"), col("message_id").as("right_id"))
      .withWatermark("rt", watermark)
    l.join(r, expr(
      s"k = k2 AND rt BETWEEN lt - INTERVAL $tolerance AND lt + INTERVAL $tolerance"),
      joinType)
      // coalesce: an unmatched RIGHT row (right/full outer) has a null
      // left-side k — the join key must still be populated from k2
      .select(coalesce(col("k"), col("k2")).as("k"),
        col("left_id"), col("right_id"), col("lt"), col("rt"))
  }

  /** Fixed-window word count over message text with an event-time
    * watermark on the chosen timestamp (sender_ts ↔ useSenderTimestamp,
    * receive_ts otherwise). Works on both batch and streaming frames. */
  def windowedWordCount(
      messages: DataFrame,
      windowLength: String = "1 minute",
      useSenderTimestamp: Boolean = true,
      watermark: String = "2 minutes"): DataFrame = {
    val tsCol = if (useSenderTimestamp) "sender_ts" else "receive_ts"
    val withTs =
      if (messages.isStreaming) messages.withWatermark(tsCol, watermark) else messages
    withTs
      .select(col(tsCol).as("ts"), col("payload").cast("string").as("text"))
      .select(col("ts"), explode(Texts.tokens(col("text"))).as("word"))
      .groupBy(window(col("ts"), windowLength), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("word"), col("cnt"))
  }

  /** Wildcard topic routing ON THE STREAM: match each message's
    * destination against Solace-style subscriptions (single-level `*`
    * and multi-level `>` wildcards) with the codegen TopicMatches
    * expression and tag it with every
    * matching subscription — the broker's subscription fan-out as a
    * stream-static broadcast join (subscriptions are tiny and static;
    * the stream never shuffles). */
  def routeByTopic(messages: DataFrame, subscriptions: Seq[String]): DataFrame = {
    import messages.sparkSession.implicits._
    val subs = broadcast(subscriptions.toDF("sub"))
    messages.crossJoin(subs)
      .filter(graft.functions.TopicMatches.topicMatches(col("sub"), col("destination")))
      .select(col("sub"), col("queue"), col("message_id"), col("destination"))
  }

  /** Stream-static enrichment: broadcast-join a static dimension onto
    * the message stream (the lookup-then-land step of the table-sink
    * pipelines). The stream side never shuffles; the dimension is
    * re-planned per micro-batch, so a dimension backed by a mutable
    * table picks up changes between triggers. */
  def enrich(messages: DataFrame, dim: DataFrame, key: String): DataFrame =
    messages.join(broadcast(dim), Seq(key), "left_outer")

  /** Per-queue SESSION windows over message event time: activity
    * bursts separated by `gap` of silence collapse into one session
    * (Spark's merge-on-shuffle session_window — no per-key sort).
    * Works on both streaming and batch frames, so the spec can assert
    * stream ≡ batch directly. */
  def sessionCounts(
      messages: DataFrame,
      gap: String = "30 seconds",
      useSenderTimestamp: Boolean = true,
      watermark: String = "2 minutes"): DataFrame = {
    val tsCol = if (useSenderTimestamp) "sender_ts" else "receive_ts"
    val withWm =
      if (messages.isStreaming) messages.withWatermark(tsCol, watermark) else messages
    withWm
      .groupBy(col("queue"), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("queue"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_msgs"))
  }

  /** WriteOneFilePerWindow: append parquet partitioned by window start
    * so each window lands in its own directory partition. */
  def fileSinkPerWindow(counts: DataFrame, outDir: String): DataStreamWriter[Row] =
    counts
      .withColumn("window_part", date_format(col("ws"), "yyyyMMdd_HHmmss"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", outDir + "/_checkpoint")
      .partitionBy("window_part")

  /** SolaceBigQuery.java:63 equivalent: stream mapped records into a
    * queryable partitioned parquet table with exactly-once rows.
    *
    * The reference maps messages to TableRows and leans on the sink
    * for dedup; here each micro-batch is merged idempotently — an
    * anti-join on the (queue, message_id) key drops rows already in
    * the table before appending. That makes the sink safe under BOTH
    * broker redelivery (at-least-once upstream) and micro-batch replay
    * after a crash (the same batch re-runs and every row anti-joins
    * away). The table is partitioned by (queue, kb) — queue for the
    * consumer-facing layout, kb (the key-hash bucket) so the key
    * lookup prunes to the batch's buckets WITHIN each queue instead
    * of growing with that queue's history (the
    * [[decontaminationSink]] bounded-check rule). */
  def tableSink(records: Dataset[GraftTextRecord], tablePath: String): DataStreamWriter[GraftTextRecord] = {
    val dataPath = tablePath + "/data"
    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", tablePath + "/_checkpoint")
      .foreachBatch { (batch: Dataset[GraftTextRecord], _: Long) =>
        val spark = batch.sparkSession
        // redelivery can land BOTH copies of a message in one trigger —
        // dedup inside the batch before the anti-join against the
        // table. localCheckpoint (eager) so the SOURCE is read and the
        // dedup shuffle runs ONCE per trigger: the queue list, the
        // bucket list, and the write below all reuse the materialized
        // batch instead of re-reading the source three times (the
        // decontaminationSink convention).
        val fresh = batch.toDF().dropDuplicates("queue", "message_id")
          .withColumn("kb",
            graft.operators.DedupOps.keyBucket(col("queue"), col("message_id")))
          .localCheckpoint(true)
        // the batch touches a handful of queues and ≤ keyBuckets hash
        // buckets; filtering the existing table by both is a STATIC
        // partition predicate, so the key lookup prunes to the batch's
        // (queue, bucket) directories instead of scanning the whole
        // table every trigger. Both lists are dimension-bounded driver
        // collects (queue count, ≤ 64 bucket values) off the
        // checkpointed batch.
        val batchQueues = fresh.select("queue").distinct()
          .collect().map(_.getString(0)).toSeq
        val batchBuckets = bucketsOf(fresh.select("kb"))
        // explicit existence probe, the prunedKeys rule: a catch-all
        // here would read a pre-kb table as "absent" and append
        // duplicates forever
        val tablePath0 = new org.apache.hadoop.fs.Path(dataPath)
        val tableFs = tablePath0.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existingKeys =
          if (!tableFs.exists(tablePath0) || !hasParquetData(tableFs, tablePath0))
            // first batch: no table (or no data) yet
            spark.emptyDataFrame.select(lit("").as("queue"), lit(0L).as("message_id")).limit(0)
          else {
            val t = spark.read.parquet(dataPath)
            // A pre-kb table must FAIL FAST, not degrade: the check
            // side could read it unpruned, but this trigger's append
            // would write partitionBy(queue, kb) directories into the
            // queue-only tree, and the NEXT trigger's read of the
            // mixed-depth directory structure throws and wedges the
            // stream — with the first trigger's rows already
            // committed. Refuse before writing anything.
            if (!t.columns.contains("kb"))
              throw new IllegalStateException(
                s"$dataPath holds a pre-kb (queue-only) tableSink layout; " +
                  "appending would mix partition depths and wedge the stream " +
                  "on its next trigger. Run Pipelines.migrateTableToKb(spark, " +
                  "tablePath) once (stream stopped) and resume.")
            t.filter(col("queue").isin(batchQueues: _*))
              .filter(col("kb").isin(batchBuckets: _*))
              .select(col("queue"), col("message_id"))
          }
        fresh
          .join(existingKeys, Seq("queue", "message_id"), "left_anti")
          .write.mode("append").partitionBy("queue", "kb").parquet(dataPath)
        ()
      }
  }

  /** One-time migration of a pre-kb [[tableSink]] table (queue-only
    * partitioning, written before the kb layout) into the current
    * (queue, kb) layout — the rewrite [[tableSink]] refuses to run
    * without. Run with the stream STOPPED: rewrite to a sibling
    * directory, then swap. The swap is delete-then-rename — if the
    * process dies between the two, the rewritten tree survives at
    * `<tablePath>/data.migrating` and the migration is re-runnable
    * (it re-reads whichever of the two directories still holds the
    * data); nothing is lost, exactly like any offline table rewrite. */
  def migrateTableToKb(spark: SparkSession, tablePath: String): Unit = {
    val dataPath = tablePath + "/data"
    val tmpPath = dataPath + ".migrating"
    val fs = new org.apache.hadoop.fs.Path(dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataP = new org.apache.hadoop.fs.Path(dataPath)
    val tmpP = new org.apache.hadoop.fs.Path(tmpPath)
    val srcP = if (fs.exists(dataP)) dataP else tmpP
    val old = spark.read.parquet(srcP.toString)
    if (old.columns.contains("kb")) {
      // already migrated (or a re-run after a crash mid-swap): just
      // finish the swap if the data sits in the temp directory
      if (srcP == tmpP) { require(fs.rename(tmpP, dataP), s"rename $tmpP -> $dataP failed") }
      return
    }
    old.withColumn("kb",
        graft.operators.DedupOps.keyBucket(col("queue"), col("message_id")))
      .write.mode("overwrite").partitionBy("queue", "kb").parquet(tmpPath)
    require(fs.delete(dataP, true), s"delete of pre-kb $dataPath failed")
    require(fs.rename(tmpP, dataP), s"rename $tmpPath -> $dataPath failed")
  }

  /** Read back the table written by [[tableSink]]. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath + "/data")
      .drop("kb") // layout detail, not consumer schema

  // ---- bounded idempotency machinery for the foreachBatch sinks ----
  //
  // The sinks' exactly-once contract must survive CHECKPOINT LOSS
  // (the specs replay the whole spool from a fresh checkpoint), so
  // seen-keys cannot live in the state store — they live in the
  // output table itself. To keep that check O(batch buckets) instead
  // of O(table history), every sink table is Hive-partitioned by
  // kb = pmod(xxhash64(key…), DedupOps.keyBuckets) and the per-
  // trigger read is pruned to the buckets the batch actually hashes
  // into: equal keys always share a bucket, so pruning never misses
  // a duplicate, and a trigger touching k distinct keys reads at
  // most min(k, keyBuckets)/keyBuckets of the key history.
  //
  // Migration note: a table written before the kb layout is REFUSED
  // (fail-fast in tableSink and prunedKeys) rather than degraded-over:
  // an unpruned check read would be correct, but the same trigger's
  // append writes kb-partitioned directories into the unbucketed tree
  // and the NEXT trigger's read of the mixed-depth structure throws —
  // a wedged stream with one trigger already committed. The one-time
  // rewrite is [[migrateTableToKb]] (run with the stream stopped).

  /** The ≤ [[graft.operators.DedupOps.keyBuckets]] bucket values
    * present in a batch — a dimension-bounded driver list (the
    * [[tableSink]] queue-list convention), never O(batch) rows. */
  private[graft] def bucketsOf(batchKeyed: DataFrame): Seq[Int] =
    batchKeyed.select("kb").distinct().collect().map(_.getInt(0)).toSeq

  /** Keys already present in a kb-partitioned sink table, read pruned
    * to `buckets` (a static partition predicate — the scan lists only
    * those directories). First trigger: no table yet → empty frame
    * with the right (long-typed) key schema. The absent-table case is
    * an explicit EXISTENCE check, not a caught AnalysisException — a
    * catch-all would also swallow a schema problem (e.g. resuming
    * over a table written in a pre-kb layout) and silently disable
    * the idempotency check; a legacy layout instead degrades to the
    * UNPRUNED key read, which is correct, just not bounded. */
  /** Does the directory hold any parquet DATA? An existing dir with
    * only markers (an all-empty first append leaves `_SUCCESS` and no
    * footers) is still an absent table — but only this case is: a dir
    * WITH data and an unexpected schema must fail loudly, not be
    * silently treated as empty. */
  private def hasParquetData(fs: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path): Boolean = {
    val it = fs.listFiles(p, true)
    var found = false
    while (!found && it.hasNext)
      found = it.next().getPath.getName.endsWith(".parquet")
    found
  }

  private[graft] def prunedKeys(spark: SparkSession, path: String,
                                keyCols: Seq[String], buckets: Seq[Int]): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !hasParquetData(fs, p))
      spark.range(0).select(keyCols.map(k => col("id").as(k)): _*)
    else {
      val t = spark.read.parquet(path)
      // the tableSink fail-fast rule: the caller is about to APPEND a
      // kb-partitioned tree; degrading the read over an unbucketed
      // table would let that append mix partition depths and wedge
      // the stream one trigger later
      if (!t.columns.contains("kb"))
        throw new IllegalStateException(
          s"$path holds a pre-kb (unbucketed) sink table; appending would " +
            "mix partition depths and wedge the stream on its next trigger. " +
            "Rewrite it into the kb layout once (stream stopped) before resuming.")
      t.filter(col("kb").isin(buckets: _*)).select(keyCols.map(col): _*)
    }
  }

  /** One deterministic row per doc_id within a trigger: the latest
    * sender timestamp wins, ties broken by sequence number and then
    * payload text — a redelivered EDITED document resolves
    * identically on every run and every partitioning (a bare
    * `dropDuplicates` would keep whichever copy a partition race
    * happens to deliver first). Emits (doc_id, text, kb). */
  private def latestDocVersion(batch: Dataset[Row]): DataFrame =
    batch
      .select(col("message_id").as("doc_id"),
        struct(col("sender_ts"), col("sequence_number"),
          col("payload").cast("string").as("text")).as("v"))
      .groupBy("doc_id").agg(max(col("v")).as("v"))
      .select(col("doc_id"), col("v.text").as("text"),
        graft.operators.DedupOps.keyBucket(col("doc_id")).as("kb"))

  /** Ingestion-time DECONTAMINATION on the stream: every micro-batch
    * of incoming documents (message_id = doc_id, payload = UTF-8
    * text) is checked for [[graft.operators.TextOps.decontamGram]]-
    * token overlap with the held-out bench gram set (built once to
    * parquet — [[graft.operators.TextOps.benchGramBuild]]) and SPLIT:
    * clean docs append to `<tablePath>/clean`, contaminated ones to
    * `<tablePath>/quarantine` with their distinct-gram hit counts —
    * auditable and reversible, never silently dropped. The bench side
    * is tiny, so it broadcast-joins onto each trigger's gram stream;
    * per-trigger cost is gram extraction over the new docs only.
    *
    * Idempotent under redelivery and replay like [[tableSink]], with
    * a BOUNDED key check: both tables are [[graft.operators.DedupOps
    * .keyBucket]]-partitioned and each trigger's anti-join reads only
    * the buckets its docs hash into — per-trigger read work is
    * bounded by the batch's bucket span, not by stream history (the
    * tables themselves stay append-only audit logs). The split is
    * per-table: if an EDITED redelivery of an already-clean doc_id
    * later quarantines, both tables hold the id — consumers read the
    * corpus via [[readDecontaminated]], where quarantine wins. */
  def decontaminationSink(messages: DataFrame, benchGramsDir: String,
                          tablePath: String): DataStreamWriter[Row] = {
    messages.writeStream
      .outputMode("append")
      .option("checkpointLocation", tablePath + "/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        import graft.functions.Texts.{kGrams, tokens}
        val bench = spark.read.parquet(benchGramsDir)
        // referenced four times below (bucket list, hits, both splits)
        // — localCheckpoint so the version-resolve shuffle runs once
        val docs = latestDocVersion(batch).localCheckpoint(true)
        val buckets = bucketsOf(docs)
        // referenced by BOTH writes below — localCheckpoint so the gram
        // explode + bench join runs once per trigger, not per sink
        val hits = docs
          .select(col("doc_id"), explode(
            kGrams(tokens(col("text")), graft.operators.TextOps.decontamGram)).as("gram"))
          .join(bench, Seq("gram"))
          .groupBy(col("doc_id"))
          .agg(count_distinct(col("gram")).as("n_hits"))
          .localCheckpoint(true)
        val dirty = docs.join(hits, Seq("doc_id"))
        val clean = docs.join(hits, Seq("doc_id"), "left_anti")
        dirty.join(prunedKeys(spark, tablePath + "/quarantine", Seq("doc_id"), buckets),
            Seq("doc_id"), "left_anti")
          .write.mode("append").partitionBy("kb").parquet(tablePath + "/quarantine")
        clean.join(prunedKeys(spark, tablePath + "/clean", Seq("doc_id"), buckets),
            Seq("doc_id"), "left_anti")
          .write.mode("append").partitionBy("kb").parquet(tablePath + "/clean")
        ()
      }
  }

  /** The decontaminated corpus as consumers should read it: the clean
    * table MINUS anything ever quarantined — so a doc_id whose edited
    * redelivery flipped its verdict is excluded even though its
    * earlier clean version remains in the append-only audit log. */
  def readDecontaminated(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath + "/clean")
      .join(spark.read.parquet(tablePath + "/quarantine").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .drop("kb") // layout detail, not consumer schema

  /** Streaming ANN-index ingestion — the vector twin of
    * [[incrementalDedupSink]]: every micro-batch of embedding
    * messages (message_id = vec_id, payload = comma-joined float
    * text; a deployment swaps its own codec projection, the
    * [[mapToTextRecord]] seam) appends to a parquet IVF index via
    * [[graft.operators.VectorOps.ivfAppend]] — frozen-quantizer
    * assignment, batch × k work per trigger, never a corpus pass or
    * rebuild. Before this sink a streaming embedding ingester had
    * incremental DEDUP but had to full-rebuild the vector index per
    * batch; now both indexes take the same per-trigger append, and
    * both reconcile drift with their periodic rebuild
    * ([[graft.operators.VectorOps.ivfBuildIndex]]).
    *
    * Exactly-once shape under redelivery and replay: intra-batch
    * duplicates collapse via dropDuplicates, replayed/redelivered
    * vec_ids are skipped by ivfAppend's anti-join membership guard,
    * and even an unguarded duplicate append is RESULT-safe (every
    * IVF search path collapses duplicate candidates) — the guard
    * bounds index growth, correctness never depended on it.
    *
    * Malformed payloads are REJECTED, not indexed: the text→float
    * decode is a TRY_CAST (under default ANSI mode a plain cast
    * would THROW on the first corrupt token and wedge the stream on
    * that trigger forever), and rows whose decoded embedding is
    * null, contains a null element, or has the wrong width (vs the
    * index's centroid dim) are filtered before
    * [[graft.operators.VectorOps.ivfAppend]] — otherwise a corrupt
    * message would be indexed under null-poisoned distances.
    * Dropping (rather than failing the trigger) mirrors the queue
    * source's permissive parse mode.
    *
    * Like [[incrementalDedupSink]], the sink self-maintains its file
    * layout: each trigger runs the SNAPSHOT-ISOLATED size-tiered
    * threshold check ([[graft.operators.Snapshot.compactTiered]])
    * over `invlist`, so per-trigger listing cost stays bounded
    * instead of growing with trigger history — and because merges
    * commit through generation manifests (sources retired, collected
    * only after `graceMs`), a SEPARATE serving process reading this
    * index through [[graft.operators.Snapshot.read]] (as
    * [[graft.operators.VectorOps.annIvfQuery]] does) stays
    * bit-identical while maintenance runs live; `maintain = false`
    * is now an opt-out, not a serving requirement.
    *
    * `driftEvery = N` (0 = off) additionally runs
    * [[graft.operators.VectorOps.ivfDriftReport]] over every N-th
    * trigger's decoded batch and APPENDS the report row (tagged with
    * the batch id) to `<indexDir>/driftlog` — the monitoring feed
    * that schedules the periodic rebuild; an ingestion stream whose
    * arrivals have drifted off the frozen quantizer erodes recall
    * silently otherwise. Indexes without the diststats baseline
    * (built before it existed) skip the log rather than wedging the
    * trigger — rebuild to start monitoring. foreachBatch is
    * at-least-once, so a trigger replayed after a crash re-appends
    * its report row under the SAME batch_id (deterministically
    * identical values — the report depends only on the batch, the
    * frozen centroids, and the membership total, which the replay
    * leaves unchanged because its own append was either not yet or
    * already committed): read the log through [[driftLog]], which
    * collapses those duplicates. With `maintain = true` the log
    * joins the per-trigger [[graft.operators.Maintenance
    * .compactTiered]] sweep — a monitoring feed written once per N
    * triggers must not itself become the unbounded small-file store
    * the sweep exists to prevent.
    *
    * Two tail-latency bounds keep single triggers near the median
    * (the measured sf10 spikes: 10-12s vector / 23-29s vector-drift
    * against ~4s / ~5.5s medians): `maxMergeJobs` caps merge JOBS per
    * trigger (the ids store's 64 leaves hash into maxFiles/2 jitter
    * offsets, so ~8 leaves can cross the threshold on one trigger —
    * deferred leaves drain most-overgrown-first on following
    * triggers), and maintenance SKIPS drift-report triggers when the
    * cadence allows it (driftEvery > 1) — the report and the merge
    * sweep are the two heavyweight per-trigger extras, and there is
    * no reason to ever stack them on the same trigger.
    *
    * `codebooks = true` targets a composed IVF-PQ index
    * ([[graft.operators.VectorOps.ivfpqBuildIndex]]) instead: each
    * trigger runs [[graft.operators.VectorOps.ivfpqAppend]] — coarse
    * assignment against the frozen centroids AND PQ encoding against
    * the frozen per-subspace codebooks — and maintenance sweeps the
    * `codes` store in place of `invlist`. Everything else (decode
    * guard, exactly-once membership anti-join, drift monitoring off
    * the shared diststats baseline, per-trigger bounds) is identical:
    * the serving-layout lifecycle is symmetric across both index
    * families. */
  def vectorIndexSink(messages: DataFrame, indexDir: String,
                      maintain: Boolean = true,
                      driftEvery: Int = 0,
                      graceMs: Long = graft.operators.Snapshot.DefaultGraceMs,
                      maxMergeJobs: Int = 3,
                      codebooks: Boolean = false)
      : DataStreamWriter[Row] = {
    // the embedding width is a property of the index's frozen
    // centroids — immutable for the life of the directory (a rebuild
    // re-trains positions, never the dimension) — so resolve it ONCE
    // at sink construction instead of a per-trigger parquet read +
    // driver head on the hot path
    val dim = graft.operators.Snapshot
      .read(messages.sparkSession, s"$indexDir/centroids")
      .select(size(col("cv"))).head.getInt(0)
    // running membership total for the drift report's size signal:
    // seeded from the store once (first drift trigger), advanced by
    // each append's genuinely-new count — so the per-trigger report
    // never pays the ids-store count whose file-listing cost grows
    // with trigger history (the measured sf1 vector-drift climb)
    var memberCount = -1L
    messages.writeStream
      .outputMode("append")
      .option("checkpointLocation", indexDir + "/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val decoded = batch
          .select(col("message_id").as("vec_id"),
            expr("try_cast(split(cast(payload AS string), ',') AS array<float>)")
              .as("embedding"))
          .filter(col("embedding").isNotNull &&
            size(col("embedding")) === dim &&
            !exists(col("embedding"), e => e.isNull))
          .dropDuplicates("vec_id")
        // materialize once only when BOTH the drift report and the
        // append will consume the decode
        val vecs =
          if (driftEvery > 0) decoded.localCheckpoint(true) else decoded
        val reporting = driftEvery > 0 && batchId % driftEvery == 0 && !vecs.isEmpty &&
          graft.operators.VectorOps.hasDistStats(spark, indexDir)
        if (reporting) {
          if (memberCount < 0)
            memberCount = graft.operators.VectorOps.idsCount(spark, indexDir)
          graft.operators.VectorOps
            .ivfDriftReport(spark, "", indexDir, vecs, memberCount = memberCount)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$indexDir/driftlog")
        }
        val appended =
          if (codebooks) graft.operators.VectorOps.ivfpqAppend(spark, vecs, indexDir)
          else graft.operators.VectorOps.ivfAppend(spark, vecs, indexDir)
        if (memberCount >= 0) memberCount += appended
        // drift-report triggers skip the sweep when the cadence leaves
        // maintenance-only triggers between reports — never stack the
        // two heavyweight extras on one trigger (sf10 tail-latency
        // finding); at driftEvery <= 1 every trigger reports, so
        // skipping would starve maintenance entirely
        if (maintain && (!reporting || driftEvery <= 1)) {
          graft.operators.Snapshot.compactTiered(
            batch.sparkSession,
            s"$indexDir/${if (codebooks) "codes" else "invlist"}",
            graceMs = graceMs, maxMergeJobs = maxMergeJobs)
          graft.operators.Snapshot.compactTieredPartitioned(
            batch.sparkSession, s"$indexDir/ids", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
          // the drift log is append-only and its reader ([[driftLog]])
          // dedups by batch_id, so it tolerates the compactor's
          // crash-window duplicate rows like the index stores do
          if (driftEvery > 0)
            graft.operators.Snapshot.compactTiered(
              batch.sparkSession, s"$indexDir/driftlog", graceMs = graceMs,
              maxMergeJobs = maxMergeJobs)
        }
        ()
      }
  }

  /** An index's drift-report feed (`<indexDir>/driftlog`), with
    * replayed-trigger duplicates collapsed: foreachBatch is
    * at-least-once, so a crash between the report append and the
    * checkpoint commit re-appends the SAME batch_id's
    * (deterministically identical) row on replay — one row per
    * batch_id survives here. Works for any sink writing the shared
    * driftlog row shape (batch_id + per-signal columns + `drifted`). */
  def driftLog(spark: SparkSession, indexDir: String): DataFrame =
    graft.operators.Snapshot.read(spark, s"$indexDir/driftlog")
      .dropDuplicates("batch_id")

  /** Ingestion-time dedup ON THE STREAM: every micro-batch of incoming
    * documents (message_id = doc_id, payload = UTF-8 text) is first
    * FOLDED INTO the parquet minhash index
    * ([[graft.operators.DedupOps.incrementalIndexUpdate]] — the write
    * half of the lifecycle) and then probed against it
    * ([[graft.operators.DedupOps.probeIndex]], the pure-LSH scale
    * mode); the verified near-dup pairs land in an idempotently-merged
    * parquet table. Update-BEFORE-probe is what makes the sink
    * complete: two brand-new near-identical docs in the same trigger
    * pair up (the probe sees both in the index), and a doc pairs with
    * every earlier trigger's docs without rebuilding anything. This is
    * the online shape of the batch `dedup_incremental` entry: corpus
    * cost stays index reads; per-trigger cost is shingling + signing
    * the new docs only.
    *
    * Exactly-once pairs under redelivery AND micro-batch replay, the
    * [[tableSink]] contract: a pair legitimately derives twice (probing
    * A emits (A,B); probing B later re-emits it), and a replayed
    * trigger re-appends its batch to the index (tolerated — the probe
    * path collapses duplicate index rows), so each batch's pairs
    * anti-join the existing table on (doc_a, doc_b) before appending.
    * Both per-trigger key checks are BOUNDED: the already-indexed
    * check prunes the index's kb-partitioned `ids` table to the
    * batch's buckets ([[graft.operators.DedupOps.indexedIds]]), and
    * the pair table is kb-partitioned on (doc_a, doc_b) so its
    * anti-join reads only the buckets the batch's pairs hash into —
    * neither read grows with stream history.
    *
    * Self-maintaining file layout (`maintain = true`, the default):
    * row-level work per trigger is batch-bounded by the pruned checks
    * above, but each trigger also APPENDS a handful of parquet files
    * to `bands`/`sets`/`ids`, and every later trigger's probe re-LISTS
    * and re-opens them — an O(triggers) per-file cost that showed up
    * as a 1.7× climbing tail over 455 triggers at sf1 (SINKBENCH).
    * Each trigger therefore runs the snapshot-isolated size-tiered
    * threshold check ([[graft.operators.Snapshot.compactTiered]])
    * over the index stores (driver-side listing, merge only when a
    * store crosses its threshold — amortized O(rows appended), never
    * a corpus rewrite). Merges commit through generation manifests,
    * so an external probe reading the index through
    * [[graft.operators.Snapshot.read]] keeps its pinned snapshot for
    * `graceMs` while maintenance runs live.
    * The pair table itself is NOT auto-compacted: duplicate pair rows
    * would surface to consumers, so its maintenance stays the offline
    * [[graft.operators.Maintenance.compactPartitioned]] (stream
    * stopped), and it accretes only ~1 file per trigger.
    *
    * `driftEvery = N` (0 = off) additionally runs
    * [[graft.operators.DedupOps.minhashDriftReport]] over every N-th
    * trigger's batch and appends the report row (tagged with the
    * batch id) to `<indexDir>/driftlog` — the same monitoring feed
    * the vector sink writes (read through [[driftLog]], which
    * collapses replayed batch_ids; the report runs BEFORE the index
    * update, and a replay's re-derived row is deterministically
    * identical either way because the frozen universe never changes
    * between rebuilds and membership totals cancel). A minhash index
    * without the vocabstats baseline (built before it existed) skips
    * the log rather than wedging the trigger — rebuild to start
    * monitoring. The driftlog joins the maintain sweep like the
    * index stores. */
  def incrementalDedupSink(messages: DataFrame, indexDir: String,
                           tablePath: String,
                           maintain: Boolean = true,
                           driftEvery: Int = 0,
                           graceMs: Long = graft.operators.Snapshot.DefaultGraceMs,
                           maxMergeJobs: Int = 3)
      : DataStreamWriter[Row] = {
    val dataPath = tablePath + "/data"
    // running membership total for the drift report's size signal —
    // the vectorIndexSink idiom (seed once, advance per fold)
    var memberCount = -1L
    messages.writeStream
      .outputMode("append")
      .option("checkpointLocation", tablePath + "/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // deterministic within-trigger winner; localCheckpoint: docs is
        // referenced by the bucket list, the membership anti-join, and
        // the probe — and the anti-join reads the ids path the update
        // below appends to, so the frame must be materialized before
        // any write plan could scan its own output path
        val docs = latestDocVersion(batch).localCheckpoint(true)
        // drift report BEFORE the index update (frozen universe + the
        // whole batch — redelivery is not drift, the vector sink's rule)
        if (driftEvery > 0 && batchId % driftEvery == 0 && !docs.isEmpty &&
            graft.operators.DedupOps.hasVocabStats(spark, indexDir)) {
          if (memberCount < 0)
            memberCount = graft.operators.Snapshot
              .read(spark, s"$indexDir/ids").count()
          graft.operators.DedupOps
            .minhashDriftReport(spark, "", indexDir,
              docs.select("doc_id", "text"), memberCount = memberCount)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(s"$indexDir/driftlog")
        }
        // only genuinely new doc_ids are folded in: CROSS-trigger
        // broker redelivery would otherwise append an identical index
        // row per redelivery, growing the index without bound. First
        // version wins for an edited re-ingest — the index keeps one
        // deterministic copy per doc_id until a periodic rebuild.
        val newDocs = docs.join(
          graft.operators.DedupOps.indexedIds(spark, indexDir, bucketsOf(docs)),
          Seq("doc_id"), "left_anti").select("doc_id", "text").localCheckpoint(true)
        if (!newDocs.isEmpty) {
          graft.operators.DedupOps.incrementalIndexUpdate(spark, newDocs, indexDir)
          if (memberCount >= 0) memberCount += newDocs.count()
        }
        // pairs feed the bucket list AND the anti-joined write —
        // localCheckpoint so the probe's verify join runs once
        val pairs = graft.operators.DedupOps
          .probeIndex(spark, docs.select("doc_id", "text"), indexDir)
          .withColumn("kb",
            graft.operators.DedupOps.keyBucket(col("doc_a"), col("doc_b")))
          .localCheckpoint(true)
        pairs.join(
            prunedKeys(spark, dataPath, Seq("doc_a", "doc_b"), bucketsOf(pairs)),
            Seq("doc_a", "doc_b"), "left_anti")
          .write.mode("append").partitionBy("kb").parquet(dataPath)
        // same per-trigger tail-latency bound as vectorIndexSink:
        // merge JOBS capped so a multi-store wave never stalls one
        // trigger on sequential merges (deferred leaves drain
        // most-overgrown-first on following triggers)
        if (maintain) {
          graft.operators.Snapshot.compactTiered(
            spark, s"$indexDir/bands", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
          graft.operators.Snapshot.compactTiered(
            spark, s"$indexDir/sets", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
          graft.operators.Snapshot.compactTieredPartitioned(
            spark, s"$indexDir/ids", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
          if (driftEvery > 0)
            graft.operators.Snapshot.compactTiered(
              spark, s"$indexDir/driftlog", graceMs = graceMs,
              maxMergeJobs = maxMergeJobs)
        }
        ()
      }
  }

  /** Ingestion-time IMAGE dedup on the stream — the
    * [[incrementalDedupSink]] pattern at the image-signature
    * granularity, closing the minhash(text)/vector(embedding)/
    * phash(image) symmetry: every micro-batch's decodable payloads
    * are signed ([[graft.operators.MultimodalOps.imagePhashSigsOf]] —
    * bit-identical to the batch operator's signatures), FOLDED into
    * the banded signature index
    * ([[graft.operators.MultimodalOps.phashIndexUpdate]], ids-last
    * crash ordering), then PROBED against it
    * ([[graft.operators.MultimodalOps.phashProbeIndex]]); verified
    * Hamming-≤6 pairs land in an idempotently-merged parquet table.
    * Update-before-probe: two near-identical images in one trigger
    * pair up, and each image pairs against all earlier triggers
    * without a rebuild.
    *
    * Unlike the minhash sink there is no frozen-universe drift (the
    * signature kernel is corpus-independent), so no driftlog seat —
    * incremental folds never decay and rebuilds are purely a
    * compaction concern. Exactly-once pairs under redelivery and
    * replay, the [[tableSink]] contract: the already-indexed check
    * prunes the kb-partitioned `ids` table to the batch's buckets
    * ([[graft.operators.DedupOps.indexedIds]] — the stores share the
    * minhash layout), the pair table is kb-partitioned on
    * (doc_a, doc_b) and anti-joined before each append, and a
    * replayed fold's duplicate band rows collapse in the probe's
    * distinct. Per-trigger row work is batch-bounded; the file-count
    * tail is held flat by the same snapshot-isolated tiered
    * compaction as the other index sinks (`maintain = true`). */
  def phashIndexSink(messages: DataFrame, indexDir: String,
                     tablePath: String,
                     maintain: Boolean = true,
                     graceMs: Long = graft.operators.Snapshot.DefaultGraceMs,
                     maxMergeJobs: Int = 3): DataStreamWriter[Row] =
    sigIndexSink(messages,
      graft.operators.MultimodalOps.imagePhashSigsOf,
      graft.operators.MultimodalOps.imagePhashPopulation,
      indexDir, tablePath, maintain, graceMs, maxMergeJobs)

  /** Ingestion-time AUDIO dedup on the stream — the FIFTH signature
    * family's batch/stream symmetry (r17): [[phashIndexSink]]'s exact
    * composition with [[graft.operators.MultimodalOps.audioPhashSigsOf]]
    * as the per-batch signer. Audio signatures share the image
    * family's (doc_id, sig) shape, so the fold/probe/idempotency
    * machinery is literally the same code under the audio population
    * marker; like the image and video sinks there is no driftlog seat
    * (the energy-contour kernel is corpus-independent — folds never
    * decay, rebuilds are a compaction concern). */
  def audioPhashIndexSink(messages: DataFrame, indexDir: String,
                          tablePath: String,
                          maintain: Boolean = true,
                          graceMs: Long = graft.operators.Snapshot.DefaultGraceMs,
                          maxMergeJobs: Int = 3): DataStreamWriter[Row] =
    sigIndexSink(messages,
      graft.operators.MultimodalOps.audioPhashSigsOf,
      graft.operators.MultimodalOps.audioPhashPopulation,
      indexDir, tablePath, maintain, graceMs, maxMergeJobs)

  /** The shared (doc_id, sig)-granularity signature-ingestion sink the
    * image and audio families instantiate with their signer +
    * population marker. */
  private def sigIndexSink(messages: DataFrame,
                           signer: DataFrame => DataFrame,
                           population: String,
                           indexDir: String, tablePath: String,
                           maintain: Boolean, graceMs: Long,
                           maxMergeJobs: Int): DataStreamWriter[Row] = {
    val dataPath = tablePath + "/data"
    messages.writeStream
      .outputMode("append")
      .option("checkpointLocation", tablePath + "/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        // deterministic within-trigger winner, then sign; materialized
        // because the sigs feed the membership anti-join, the fold,
        // and the probe — and the fold appends to paths the probe
        // reads (the incrementalDedupSink self-scan rule)
        val sigs = signer(latestDocVersion(batch))
          .withColumn("kb", graft.operators.DedupOps.keyBucket(col("doc_id")))
          .localCheckpoint(true)
        val newSigs = sigs.join(
          graft.operators.DedupOps.indexedIds(spark, indexDir, bucketsOf(sigs)),
          Seq("doc_id"), "left_anti").select("doc_id", "sig").localCheckpoint(true)
        if (!newSigs.isEmpty)
          graft.operators.MultimodalOps.phashIndexUpdate(
            spark, newSigs, indexDir, population)
        val pairs = graft.operators.MultimodalOps
          .phashProbeIndex(spark, sigs.select("doc_id", "sig"), indexDir, population)
          .withColumn("kb",
            graft.operators.DedupOps.keyBucket(col("doc_a"), col("doc_b")))
          .localCheckpoint(true)
        pairs.join(
            prunedKeys(spark, dataPath, Seq("doc_a", "doc_b"), bucketsOf(pairs)),
            Seq("doc_a", "doc_b"), "left_anti")
          .write.mode("append").partitionBy("kb").parquet(dataPath)
        if (maintain) {
          graft.operators.Snapshot.compactTiered(
            spark, s"$indexDir/bands", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
          graft.operators.Snapshot.compactTieredPartitioned(
            spark, s"$indexDir/ids", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
        }
        ()
      }
  }

  /** Ingestion-time VIDEO dedup on the stream — the [[phashIndexSink]]
    * composition at the video granularity, closing the batch/stream
    * symmetry for the fourth signature family: every micro-batch's
    * demuxable payloads are signed per sample instant
    * ([[graft.operators.MultimodalOps.videoPhashSigsOf]] — the one
    * shared demux sampler, bit-identical to the batch operator's
    * (doc_id, slot, sig) rows), FOLDED into the slot-keyed banded
    * index ([[graft.operators.MultimodalOps.videoPhashIndexUpdate]],
    * ids-last crash ordering), then PROBED against it
    * ([[graft.operators.MultimodalOps.videoPhashProbeIndex]]); pairs
    * matching on ≥ 2 instants at Hamming ≤ 6 land in the
    * idempotently-merged parquet table. Update-before-probe: a
    * video's slots all travel with its payload, so a pair's
    * frames_matched is complete in whichever trigger sees the second
    * member — no cross-trigger pair re-aggregation, and the pair
    * table's (doc_a, doc_b) anti-join stays the whole idempotency
    * story (the image sink's contract, slot-keyed). No driftlog seat:
    * the signature kernel is corpus-independent, like the image one. */
  def videoPhashIndexSink(messages: DataFrame, indexDir: String,
                          tablePath: String,
                          maintain: Boolean = true,
                          graceMs: Long = graft.operators.Snapshot.DefaultGraceMs,
                          maxMergeJobs: Int = 3): DataStreamWriter[Row] = {
    val dataPath = tablePath + "/data"
    messages.writeStream
      .outputMode("append")
      .option("checkpointLocation", tablePath + "/_checkpoint")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        // deterministic within-trigger winner, then demux+sign;
        // materialized for the same three-consumer/self-scan reasons
        // as the image sink
        val sigs = graft.operators.MultimodalOps
          .videoPhashSigsOf(latestDocVersion(batch))
          .withColumn("kb", graft.operators.DedupOps.keyBucket(col("doc_id")))
          .localCheckpoint(true)
        val newSigs = sigs.join(
          graft.operators.DedupOps.indexedIds(spark, indexDir, bucketsOf(sigs)),
          Seq("doc_id"), "left_anti")
          .select("doc_id", "slot", "sig").localCheckpoint(true)
        if (!newSigs.isEmpty)
          graft.operators.MultimodalOps.videoPhashIndexUpdate(spark, newSigs, indexDir)
        val pairs = graft.operators.MultimodalOps
          .videoPhashProbeIndex(spark, sigs.select("doc_id", "slot", "sig"), indexDir)
          .withColumn("kb",
            graft.operators.DedupOps.keyBucket(col("doc_a"), col("doc_b")))
          .localCheckpoint(true)
        pairs.join(
            prunedKeys(spark, dataPath, Seq("doc_a", "doc_b"), bucketsOf(pairs)),
            Seq("doc_a", "doc_b"), "left_anti")
          .write.mode("append").partitionBy("kb").parquet(dataPath)
        if (maintain) {
          graft.operators.Snapshot.compactTiered(
            spark, s"$indexDir/bands", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
          graft.operators.Snapshot.compactTieredPartitioned(
            spark, s"$indexDir/ids", graceMs = graceMs,
            maxMergeJobs = maxMergeJobs)
        }
        ()
      }
  }

  /** SolaceIO withMaxReadTime equivalent: start the query with
    * Trigger.AvailableNow — the source freezes the backlog snapshot
    * and the query self-terminates once it is drained — and stop early
    * if the wall-clock deadline passes first. Returns after the query
    * has terminated either way; rows consumed so far are committed. */
  def startWithMaxReadTime(
      writer: DataStreamWriter[_], maxReadTimeMs: Long): Unit = {
    val q = writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      if (!q.awaitTermination(maxReadTimeMs)) q.stop()
    } finally if (q.isActive) q.stop()
  }

  /** SolaceReaderStats equivalent: accumulate per-batch input rows,
    * batch count, and the queue BACKLOG gauge (spool high-water mark
    * minus consumed offset, per queue — the reference's
    * SolaceReaderStats backlog metric) from the listener bus. The
    * engine feeds `latestOffset` from the source's
    * `reportLatestOffset` and `endOffset` from the batch plan; both
    * are this source's {"queue":count} JSON. */
  class QueueStatsListener extends StreamingQueryListener {
    @volatile var batches: Long = 0L
    @volatile var totalRows: Long = 0L
    @volatile var maxBatchRows: Long = 0L
    @volatile var backlog: Map[String, Long] = Map.empty
    @volatile var maxBacklog: Long = 0L

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val rows = e.progress.numInputRows
      if (rows > 0) {
        batches += 1
        totalRows += rows
        maxBatchRows = math.max(maxBatchRows, rows)
      }
      e.progress.sources.foreach { s =>
        try {
          val end = Option(s.endOffset).map(GraftQueueSource.offsetsFromJson).getOrElse(Map.empty)
          val latest = Option(s.latestOffset).map(GraftQueueSource.offsetsFromJson).getOrElse(Map.empty)
          if (latest.nonEmpty) {
            backlog = latest.map { case (q, n) => q -> math.max(0L, n - end.getOrElse(q, 0L)) }
            maxBacklog = math.max(maxBacklog, backlog.values.foldLeft(0L)(_ + _))
          }
        } catch { case _: Exception => () } // non-graft source in the query
      }
    }
  }
}

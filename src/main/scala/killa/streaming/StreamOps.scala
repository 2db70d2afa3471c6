package killa.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import killa.Conf
import killa.maintain.IndexMaintainer

/** Structured Streaming operators.
  *
  *  - [[windowedEventCounts]]: event-time windowed aggregation with a
  *    watermark over the events table — the standard streaming-analytics op.
  *  - [[ingestTranscripts]]: continuous index maintenance — the Spark
  *    re-architecture of the reference's FileSystemWatcher ingestion
  *    (FileAnalyzer.cs:144-168): each micro-batch of new/changed transcript
  *    rows is applied through IndexMaintainer (Update-diff semantics),
  *    arrival-order per batch = the reference's per-folder FIFO
  *    (BackgroundTaskQueue.cs:43-49); Trigger.AvailableNow = pull-based
  *    micro-batching, no watermark because semantics are arrival-time like
  *    the watcher's.
  */
object StreamOps {

  /** 1-hour tumbling-window counts/sums per event_type with a 10-minute
    * watermark, run to completion over the (bounded) events table via an
    * in-memory sink. Output: (window_start, event_type, n, sum_value).
    */
  def windowedEventCounts(spark: SparkSession, eventsPath: String,
      queryName: String = "killa_stream_window"): DataFrame = {
    val schema: StructType = spark.read.parquet(eventsPath).schema
    // the streaming file source wants a directory: stream the parent dir with
    // a glob filter when given a single-file table
    val p = new org.apache.hadoop.fs.Path(eventsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dir, glob) =
      if (fs.getFileStatus(p).isDirectory) (eventsPath, None)
      else (p.getParent.toString, Some(p.getName))
    val reader0 = spark.readStream.schema(schema)
    val events = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g)).parquet(dir)
      // driver parquet stores TIMESTAMP_NTZ; event-time semantics need TIMESTAMP
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Per-user sessionization via session windows (gap-based, the
    * `flatMapGroupsWithState`-class stateful op expressed with the built-in
    * `session_window` so state management, watermark eviction, and session
    * merging stay inside the streaming engine): events of one user within
    * `gap` of each other merge into one session (touching windows coalesce,
    * so a spacing of exactly `gap` still merges — boundary pinned in
    * StreamingSpec). Run to completion over the bounded
    * events table via an in-memory sink (complete mode needs no watermark);
    * the production shape streams the same aggregation in append mode with
    * a watermark, exactly like [[windowedEventCountsToPath]].
    * Output: (user_id, session_start, n, sum_value).
    *
    * State scales with OPEN sessions only (the watermark closes and evicts
    * sessions `gap` behind the stream), partitioned by user_id — never
    * whole-corpus state on any executor at any size.
    */
  def sessionizedUserStats(spark: SparkSession, eventsPath: String,
      gap: String = "10 minutes",
      queryName: String = "killa_stream_sessions"): DataFrame = {
    val schema: StructType = spark.read.parquet(eventsPath).schema
    val p = new org.apache.hadoop.fs.Path(eventsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dir, glob) =
      if (fs.getFileStatus(p).isDirectory) (eventsPath, None)
      else (p.getParent.toString, Some(p.getName))
    val reader0 = spark.readStream.schema(schema)
    val events = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g)).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("sum_value"))
  }

  /** Streaming exact-dedup diagnosis (the training-pipeline dedup step run
    * THROUGH the streaming engine): micro-batches of documents fold into
    * per-content-digest groups — (text_md5, cnt, rep_id = min id), the
    * streaming twin of [[killa.dedup.Dedup.exactGroups]] with the identical
    * digest ([[killa.text.TextOps.fingerprintMd5]]), so results are
    * engine-equal by construction. Complete mode over the bounded table for
    * the oracle query; state is one (digest, count, min) triple per DISTINCT
    * document — at unbounded-corpus scale use [[dedupStreamToPath]], whose
    * state the watermark bounds.
    */
  def streamExactGroups(spark: SparkSession, docsPath: String,
      queryName: String = "killa_stream_dedup"): DataFrame = {
    val schema: StructType = spark.read.parquet(docsPath).schema
    val p = new org.apache.hadoop.fs.Path(docsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dir, glob) =
      if (fs.getFileStatus(p).isDirectory) (docsPath, None)
      else (p.getParent.toString, Some(p.getName))
    val reader0 = spark.readStream.schema(schema)
    val docs = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g)).parquet(dir)
    val agg = docs
      .groupBy(killa.text.TextOps.fingerprintMd5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("rep_id"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Production shape of streaming dedup: keep each content digest's FIRST
    * arrival within the watermark horizon (`dropDuplicatesWithinWatermark`
    * on the digest — state holds a digest only until the watermark passes
    * it, so memory is bounded by the horizon's distinct-digest count, never
    * the corpus), appended straight to parquet. The exactly-once-per-digest
    * guarantee is scoped to the horizon: a re-crawl a week later re-admits —
    * the standard streaming-dedup contract; whole-corpus exactness is the
    * batch [[killa.dedup.Dedup.dropExactDuplicates]]'s job.
    */
  def dedupStreamToPath(spark: SparkSession, docsPath: String,
      outPath: String, checkpoint: String,
      horizon: String = "1 hour",
      tsExpr: String =
        "timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, doc_id)"): Unit = {
    val schema: StructType = spark.read.parquet(docsPath).schema
    val p = new org.apache.hadoop.fs.Path(docsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dir, glob) =
      if (fs.getFileStatus(p).isDirectory) (docsPath, None)
      else (p.getParent.toString, Some(p.getName))
    val reader0 = spark.readStream.schema(schema)
    val docs = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g)).parquet(dir)
      // the documents table carries no event time; the corpus's
      // deterministic derivation (arrival order = doc_id) stands in
      .withColumn("ts", expr(tsExpr).cast("timestamp"))
      .withColumn("text_md5", killa.text.TextOps.fingerprintMd5(col("text")))
    val kept = docs
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_md5")
    val q = kept.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Production shape of [[windowedEventCounts]]: the same watermarked
    * windowed aggregation in APPEND mode streamed to a parquet table —
    * state is bounded by the watermark and finalized windows flow straight
    * to files; nothing ever materializes on the driver (the
    * complete+in-memory form above exists only for the bounded oracle
    * query). Append semantics: a window is emitted once the watermark
    * passes its end, so trailing windows of a bounded input stay pending —
    * exactly the contract a continuously-running pipeline wants.
    */
  def windowedEventCountsToPath(spark: SparkSession, eventsPath: String,
      outPath: String, checkpoint: String): Unit = {
    val schema: StructType = spark.read.parquet(eventsPath).schema
    val p = new org.apache.hadoop.fs.Path(eventsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dir, glob) =
      if (fs.getFileStatus(p).isDirectory) (eventsPath, None)
      else (p.getParent.toString, Some(p.getName))
    val reader0 = spark.readStream.schema(schema)
    val events = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g)).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Production shape of [[sessionizedUserStats]]: the same gap-based
    * session_window aggregation in APPEND mode streamed to a parquet table
    * with a watermark — the sibling of [[windowedEventCountsToPath]]. A
    * session is emitted exactly once, when the watermark passes its end
    * (last event + gap); open sessions (those the watermark hasn't closed)
    * stay pending — the contract a continuously-running pipeline wants.
    * State is bounded by OPEN sessions only, partitioned by user_id.
    */
  def sessionizedToPath(spark: SparkSession, eventsPath: String,
      outPath: String, checkpoint: String, gap: String = "10 minutes",
      watermark: String = "10 minutes"): Unit = {
    val schema: StructType = spark.read.parquet(eventsPath).schema
    val p = new org.apache.hadoop.fs.Path(eventsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dir, glob) =
      if (fs.getFileStatus(p).isDirectory) (eventsPath, None)
      else (p.getParent.toString, Some(p.getName))
    val reader0 = spark.readStream.schema(schema)
    val events = glob.fold(reader0)(g => reader0.option("pathGlobFilter", g)).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Stream transcript batches from a directory into an existing index:
    * every micro-batch runs one IndexMaintainer.applyChanges (one atomic
    * manifest version per batch — read-your-writes after
    * processAllAvailable, the DelayedSearch analog, FileAnalyzer.cs:51-60).
    * Returns the number of batches applied.
    *
    * Ingest contract: each arriving file must carry the FULL new content of
    * every conversation it touches (one file = one conversation version, the
    * analog of the watcher re-reading the whole changed file,
    * FileAnalyzer.cs:69-78). applyChanges treats a batch as a whole-document
    * replacement, so a conversation's turns split across two files/batches
    * would have the second batch REPLACE the first, not extend it.
    */
  /** Streaming percolate (the Elasticsearch alerting pattern): every
    * arriving transcript batch probes the registered-query table BEFORE
    * anything merges into an index — matched (conv_id, query_id, batch_id)
    * alert rows append to `alertsDir`. Same ingest contract as
    * [[ingestTranscripts]]: one arriving file carries the FULL content of
    * every conversation it touches, so a conjunctive query sees the whole
    * document in one batch. The query table broadcasts inside each batch
    * (killa.query.Percolate), so the stream's per-batch cost is one
    * tokenize+join scan of the batch — no index, no state store.
    *
    * @return number of non-empty batches processed.
    */
  def percolateTranscripts(spark: SparkSession, transcriptsDir: String,
      queries: DataFrame, alertsDir: String, checkpointDir: String): Long = {
    val schema = spark.read.parquet(transcriptsDir).schema
    val stream = spark.readStream.schema(schema).parquet(transcriptsDir)
    var batches = 0L
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          killa.query.Percolate.percolate(batch, queries)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(alertsDir)
          batches += 1
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
    q.processAllAvailable()
    q.stop()
    batches
  }

  def ingestTranscripts(spark: SparkSession, transcriptsDir: String, indexRoot: String,
      conf: Conf = Conf.default, source: String = "stream",
      masks: Seq[String] = Seq("*")): Long = {
    val schema = spark.read.parquet(transcriptsDir).schema
    val stream0 = spark.readStream.schema(schema).parquet(transcriptsDir)
    // subscription masks filter the stream at ingest (glob over conv_id —
    // the reference's per-watcher file masks, FileAnalyzer.cs:125-127)
    val maskPred = masks.map(m => col("conv_id").rlike(killa.util.Glob.toRegex(m)))
      .reduceOption(_ || _).getOrElse(lit(true))
    val stream = stream0.where(maskPred)
    val maintainer = new IndexMaintainer(spark, indexRoot, conf)
    var batches = 0L
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          maintainer.applyChanges(batch, source = source, batchId = s"stream-$batchId")
          batches += 1
        }
        ()
      }
      .option("checkpointLocation", s"$indexRoot/stream-checkpoint")
      .start()
    q.processAllAvailable()
    q.stop()
    batches
  }

  /** Continuous ingestion into a ROLLOVER GROUP ([[killa.maintain.Rollover]])
    * instead of a single root: each micro-batch routes through
    * `Rollover.ingest`, so the active root stays capped and the write alias
    * flips mid-stream when a batch crosses the cap — the ES "data stream"
    * shape (a stream of append-only documents behind a rolling index
    * pattern). Checkpointed under the group root; AvailableNow semantics
    * like [[ingestTranscripts]], so repeated calls resume where they left
    * off and only new files index.
    */
  def ingestRollover(spark: SparkSession, transcriptsDir: String,
      groupRoot: String, conf: Conf, maxDocsPerRoot: Long,
      source: String = "stream"): Long = {
    val schema = spark.read.parquet(transcriptsDir).schema
    val stream = spark.readStream.schema(schema).parquet(transcriptsDir)
    var batches = 0L
    val q = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          killa.maintain.Rollover.ingest(spark, groupRoot, conf, batch,
            maxDocsPerRoot, s"stream-$batchId", source)
          batches += 1
        }
        ()
      }
      .option("checkpointLocation", s"$groupRoot/stream-checkpoint")
      .start()
    q.processAllAvailable()
    q.stop()
    batches
  }
}

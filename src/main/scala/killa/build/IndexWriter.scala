package killa.build

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.codec.{Delta, Varint}
import killa.model._
import killa.store.{Manifest, SegmentStore}
import killa.tokenize.Tokenize
import killa.util.Hashing

/** Batch index build: transcripts → forward index (doc → term/tf) → salted
  * two-phase posting aggregation → delta+varint posting blocks → bucketed
  * segment store with manifest snapshots.
  *
  * This is the Spark re-architecture of the reference's Subscribe backfill
  * (FileAnalyzer.cs:91-142: enumerate files → per-file ParseTokens →
  * Indexer.Add) — same invariant (the inverted index is a pure function of
  * the forward index, Indexer.cs:117-123), enforced by construction as a
  * deterministic batch dataflow instead of mutation events.
  *
  * Scale design (SURVEY.md §3.2): three shuffles — (1) groupBy(conv_id, term)
  * tf with map-side partial aggregation, (2) salted phase-1 posting runs
  * keyed (term, docId % nSalts) so a hot term ("the" in half of 10^12 turns)
  * never lands on one task, (3) phase-2 per-term merge of the S sorted runs
  * (associative: docIds are globally unique, so salted and unsalted builds
  * are byte-identical — property-tested). Build work is wave-partitioned by
  * term bucket: each wave commits segments + ledger rows + a new manifest
  * version, giving kill/resume at bucket grain and reference-style partial
  * visibility mid-build (FileAnalyzerTests.cs:289-317).
  */
final class IndexWriter(spark: SparkSession, root: String, conf: Conf = Conf.default) {
  import IndexWriter._

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build (or resume) a full index over `turns`. Returns the final manifest.
    *
    * @param maxWaves test hook for kill/resume: stop after N waves (the build
    *                 is then incomplete; calling fullBuild again resumes from
    *                 the ledger and produces byte-identical final segments).
    */
  def fullBuild(
      turns: DataFrame,
      buildId: String,
      source: String = "default",
      maxWaves: Int = Int.MaxValue): Option[Manifest] = {
    val desc = prepareForward(turns, buildId, source)
    val done = Ledger.doneBuckets(spark, root, buildId, "segments")
    val pending = (0 until conf.nBuckets).filterNot(done)
    var manifest = SegmentStore.latest(spark, root)
    val waves = pending.grouped(conf.waveBuckets).toSeq.take(maxWaves)
    waves.foreach { wave =>
      val t0 = System.nanoTime()
      val commitDir = s"$root/data/$buildId-w${wave.head}"
      val fwd = spark.read.parquet(desc.forwardDir)
        .where(col("bkt_p").isin(wave.map(Integer.valueOf): _*))
      val blocks = buildBlocks(spark, fwd, conf)
      writeBlocks(blocks, commitDir)
      val wallMs = (System.nanoTime() - t0) / 1000000L
      val metrics = bucketMetrics(spark, commitDir, wave)
      Ledger.append(spark, root, wave.map { b =>
        val (tc, pc, bc, by) = metrics.getOrElse(b, (0L, 0L, 0L, 0L))
        LedgerRow(buildId, "segments", b, "done", tc, pc, bc, by, wallMs, desc.forwardDir)
      })
      val base = manifest.getOrElse(
        Manifest(0, conf.nBuckets, Map.empty, Seq(desc.docsDir), Seq(desc.forwardDir),
          desc.numDocs, desc.totalTokens, desc.avgdl, desc.maxDocId, 0L))
      manifest = Some(SegmentStore.commit(spark, root,
        base.copy(buckets = base.buckets ++ wave.map(_ -> commitDir))))
    }
    manifest
  }

  /** Step A (idempotent, ledgered): tokenize, docId dictionary, doc stats,
    * forward index write. Reused untouched on resume.
    */
  private def prepareForward(turns: DataFrame, buildId: String, source: String): BuildDesc = {
    val descPath = new Path(s"$root/builds/$buildId.json")
    if (fs.exists(descPath)) return readDesc(spark, descPath)

    import spark.implicits._
    val docsDir = s"$root/docs/$buildId"
    val forwardDir = s"$root/forward/$buildId"

    val toks = turns.select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
    val tf = toks.groupBy("conv_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("conv_id").agg(sum(col("tf")).as("dl"))
    val (dict, cleanup) = Dict.assign(turns.select("conv_id").distinct())

    // docs table: every conv (even token-less ones, analog of an unreadable
    // file indexed to an empty set, FileAnalyzer.cs:80-83) gets an entry.
    val docs = dict.join(dl, Seq("conv_id"), "left")
      .na.fill(0L, Seq("dl"))
      .select(col("docId"), col("conv_id").as("convId"), col("dl"),
        lit(source).as("source"), lit(true).as("alive"), lit(0L).as("batchSeq"))
    docs.write.mode("overwrite").parquet(docsDir)

    val nb = conf.nBuckets
    val fwd = tf.join(dl, "conv_id").join(dict, "conv_id")
      .select(col("term"), col("docId"), col("tf"), col("dl"),
        bucketUdf(nb)(col("term")).as("bkt"), lit(0L).as("batchSeq"))
      .withColumn("bkt_p", col("bkt"))
    fwd.repartition(col("bkt_p")).sortWithinPartitions("term", "docId")
      .write.partitionBy("bkt_p").mode("overwrite").parquet(forwardDir)
    cleanup()

    val st = spark.read.parquet(docsDir)
      .agg(count(lit(1)), sum(col("dl")), max(col("docId"))).collect()(0)
    val numDocs = st.getLong(0)
    val totalTokens = if (st.isNullAt(1)) 0L else st.getLong(1)
    val maxDocId = if (st.isNullAt(2)) -1L else st.getLong(2)
    val avgdl = if (numDocs == 0) 0.0 else totalTokens.toDouble / numDocs
    val desc = BuildDesc(forwardDir, docsDir, numDocs, totalTokens, avgdl, maxDocId, source)
    writeDesc(spark, descPath, desc)
    Ledger.append(spark, root, Seq(
      LedgerRow(buildId, "forward", -1, "done", 0L, 0L, 0L, 0L, 0L, forwardDir)))
    desc
  }
}

object IndexWriter {
  /** Build descriptor: the frozen inputs of the wave loop (lineage root). */
  final case class BuildDesc(
      forwardDir: String, docsDir: String, numDocs: Long, totalTokens: Long,
      avgdl: Double, maxDocId: Long, source: String)

  private val mapper = new ObjectMapper()

  def bucketUdf(nb: Int) = udf((t: String) => Hashing.termBucket(t, nb))

  def writeDesc(spark: SparkSession, p: Path, d: BuildDesc): Unit = {
    val node = mapper.createObjectNode()
    node.put("forwardDir", d.forwardDir); node.put("docsDir", d.docsDir)
    node.put("numDocs", d.numDocs); node.put("totalTokens", d.totalTokens)
    node.put("avgdl", d.avgdl); node.put("maxDocId", d.maxDocId)
    node.put("source", d.source)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  def readDesc(spark: SparkSession, p: Path): BuildDesc = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val n = try mapper.readTree(in) finally in.close()
    BuildDesc(n.get("forwardDir").asText(), n.get("docsDir").asText(),
      n.get("numDocs").asLong(), n.get("totalTokens").asLong(),
      n.get("avgdl").asDouble(), n.get("maxDocId").asLong(), n.get("source").asText())
  }

  /** The two-phase salted posting aggregation (SURVEY.md §4.2 skew row).
    * Input: forward rows (term, docId, tf, dl, bkt). Output: posting blocks.
    * Deterministic: output is a pure function of the input row *set* —
    * any partitioning/arrival order yields identical bytes (property-tested).
    */
  def buildBlocks(spark: SparkSession, fwd: DataFrame, conf: Conf): Dataset[PostingBlock] = {
    import spark.implicits._
    val nSalts = conf.nSalts
    val td = fwd.select("term", "docId", "tf", "dl", "bkt").as[TermDoc]
    // Phase 1: bounded-size salted runs — no task ever holds a full hot-term
    // posting list.
    val runs: Dataset[PostingRun] = td
      .groupByKey(t => (t.term, java.lang.Math.floorMod(t.docId, nSalts.toLong).toInt))
      .mapGroups { (key: (String, Int), it: Iterator[TermDoc]) =>
        val (term, salt) = key
        val arr = it.toArray.sortBy(_.docId)
        PostingRun(term, salt, arr.length,
          Delta.encode(arr.map(_.docId)),
          Varint.encode(arr.map(_.tf)),
          Varint.encode(arr.map(_.dl)))
      }
    // Phase 2: per-term merge of ≤ nSalts runs → globally docId-sorted blocks.
    val bs = conf.blockSize
    val nb = conf.nBuckets
    runs.groupByKey(_.term).flatMapGroups { (term, it) =>
      val runArr = it.toArray
      val total = runArr.map(_.n).sum
      val merged = new Array[(Long, Long, Long)](total)
      var off = 0
      runArr.foreach { r =>
        val ds = Delta.decode(r.docsBin, r.n)
        val ts = Varint.decode(r.tfsBin, r.n)
        val ls = Varint.decode(r.dlsBin, r.n)
        var i = 0
        while (i < r.n) { merged(off) = (ds(i), ts(i), ls(i)); off += 1; i += 1 }
      }
      val sorted = merged.sortBy(_._1) // docIds globally unique ⇒ total order
      val df = total.toLong
      val bkt = Hashing.termBucket(term, nb)
      (0 until total by bs).iterator.map { start =>
        val end = math.min(start + bs, total)
        val n = end - start
        val docs = new Array[Long](n); val tfs = new Array[Long](n); val dls = new Array[Long](n)
        var i = 0
        while (i < n) {
          val t3 = sorted(start + i); docs(i) = t3._1; tfs(i) = t3._2; dls(i) = t3._3; i += 1
        }
        PostingBlock(term, start / bs, df, n, docs(0), docs(n - 1),
          tfs.max, dls.min, Delta.encode(docs), Varint.encode(tfs), Varint.encode(dls), bkt)
      }
    }
  }

  /** Segment layout: one dir per commit, hive-partitioned by bkt_p for
    * directory pruning; `bkt` kept as a data column too so cross-commit
    * global reads don't need a shared basePath. Sorted (term, blockId) within
    * each bucket ⇒ parquet row-group min/max stats prune term lookups — the
    * columnar stand-in for the reference's O(1) hash lookup
    * (StringIndex.cs:19-24).
    */
  def writeBlocks(blocks: Dataset[PostingBlock], commitDir: String): Unit =
    blocks.toDF().withColumn("bkt_p", col("bkt"))
      .repartition(col("bkt_p"))
      .sortWithinPartitions("term", "blockId")
      .write.partitionBy("bkt_p").mode("overwrite").parquet(commitDir)

  /** Read-back per-bucket metrics for the ledger (exact, no plan recompute). */
  def bucketMetrics(spark: SparkSession, commitDir: String, wave: Seq[Int])
      : Map[Int, (Long, Long, Long, Long)] = {
    val p = new Path(commitDir)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(p)) return Map.empty
    // a delta that removed a bucket's every posting writes an empty dir
    // (_SUCCESS only) — no schema to infer, no metrics to report
    if (!fsys.listStatus(p).exists(_.getPath.getName.startsWith("bkt_p="))) return Map.empty
    spark.read.parquet(commitDir)
      .groupBy(col("bkt_p").cast("int").as("b"))
      .agg(
        countDistinct(col("term")).as("terms"),
        sum(col("n")).as("postings"),
        count(lit(1)).as("blocks"),
        sum(length(col("docsBin")) + length(col("tfsBin")) + length(col("dlsBin"))).as("bytes"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }
}

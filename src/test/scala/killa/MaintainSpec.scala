package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, lit, regexp_replace}
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.model.Turn
import killa.query.{BruteForce, IndexReader}
import killa.store.SegmentStore
import killa.synth.Synth

/** Delta scenarios (FIXTURES.md §2.4): update / delete / rename / swap /
  * unsubscribe, pinned against the reference semantics (Indexer.cs:37-115,
  * FileAnalyzer.cs:199-328) and the relational oracle over the FINAL corpus
  * state — incremental maintenance must land exactly where a fresh build
  * over the final corpus would (modulo docId assignment, which queries never
  * expose).
  */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, i, txt) =>
      Turn(c, i, "user", txt, "", new Timestamp(epoch + i * 1000L))
    }.toDS().toDF()

  /** fresh index over `corpus` in a new root; returns root. */
  private def build(corpus: DataFrame): String = {
    val root = TestSpark.freshDir("maint")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    root
  }

  private def reader(root: String) = new IndexReader(spark, root, conf)

  private def members(df: DataFrame): Set[String] = df.collect().map(_.getString(0)).toSet

  /** assert the live index answers exactly like the oracle over finalCorpus. */
  private def assertParity(root: String, finalCorpus: DataFrame, terms: Seq[String]): Unit = {
    val r = reader(root)
    terms.foreach { t =>
      assert(members(r.membership(t)) == members(BruteForce.membership(finalCorpus, t)), s"membership($t)")
    }
    val got = r.bm25TopK(terms, 20).collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    val exp = BruteForce.bm25(finalCorpus, terms, 20).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(got == exp, s"bm25($terms): $got vs $exp")
  }

  test("update: minimal diff re-index (Indexer.cs:74-91; IndexerTests.cs:219-262)") {
    val v1 = mkTurns(("a", 0, "x y z"), ("a", 1, "x common"), ("b", 0, "w common"))
    val root = build(v1)
    // change conv a: drop z, add q, keep x/y; dl changes
    val aNew = mkTurns(("a", 0, "x y q"), ("a", 1, "x common"))
    new IndexMaintainer(spark, root, conf).applyChanges(aNew, batchId = "d1")
    val finalCorpus = mkTurns(("a", 0, "x y q"), ("a", 1, "x common"), ("b", 0, "w common"))
    assertParity(root, finalCorpus, Seq("x", "common"))
    val r = reader(root)
    assert(members(r.membership("z")).isEmpty, "removed term evicted")
    assert(members(r.membership("q")) == Set("a"))
    assert(members(r.membership("w")) == Set("b"), "untouched doc intact")
  }

  test("create: new conversations get fresh docIds and are searchable") {
    val root = build(mkTurns(("a", 0, "alpha shared"), ("b", 0, "beta shared")))
    val add = mkTurns(("c", 0, "gamma shared"), ("d", 0, "delta shared gamma"))
    new IndexMaintainer(spark, root, conf).applyChanges(add, batchId = "d1")
    val fin = mkTurns(("a", 0, "alpha shared"), ("b", 0, "beta shared"),
      ("c", 0, "gamma shared"), ("d", 0, "delta shared gamma"))
    assertParity(root, fin, Seq("shared", "gamma"))
    assert(members(reader(root).membership("shared")) == Set("a", "b", "c", "d"))
  }

  test("delete: doc leaves every posting; emptied terms vanish (StringIndex.cs:59-74)") {
    val root = build(mkTurns(("a", 0, "only_a shared"), ("b", 0, "only_b shared")))
    new IndexMaintainer(spark, root, conf).remove(Seq("a"))
    val fin = mkTurns(("b", 0, "only_b shared"))
    assertParity(root, fin, Seq("shared", "only_b"))
    val r = reader(root)
    assert(!r.contains("only_a"), "emptied term evicted from segments")
    assert(members(r.membership("shared")) == Set("b"))
    // stats shrink with the corpus
    assert(SegmentStore.latest(spark, root).get.numDocs == 1)
  }

  test("removeTerms: term subset leaves the doc (Indexer.cs:65-72, op 7)") {
    val root = build(mkTurns(("a", 0, "x y z x"), ("b", 0, "x q")))
    new IndexMaintainer(spark, root, conf).removeTerms("a", Seq("x", "z"))
    val r = reader(root)
    assert(members(r.membership("x")) == Set("b"), "a removed from x")
    assert(!r.contains("z"), "emptied term evicted")
    assert(members(r.membership("y")) == Set("a"), "remaining terms intact")
    // BM25 consistency with the final state (dl of a shrank to 1)
    val fin = mkTurns(("a", 0, "y"), ("b", 0, "x q"))
    assertParity(root, fin, Seq("x", "y", "q"))
    // no-op discipline: unknown doc
    val v = SegmentStore.latest(spark, root).get.version
    new IndexMaintainer(spark, root, conf).removeTerms("nope", Seq("x"))
    assert(SegmentStore.latest(spark, root).get.version == v)
  }

  test("rename: identical results modulo id (Indexer.Switch rename case)") {
    val root = build(mkTurns(("a", 0, "ra rb"), ("b", 0, "rb")))
    new IndexMaintainer(spark, root, conf).rename("a", "zz")
    val r = reader(root)
    assert(members(r.membership("ra")) == Set("zz"))
    assert(members(r.membership("rb")) == Set("b", "zz"))
    val fin = mkTurns(("zz", 0, "ra rb"), ("b", 0, "rb"))
    assertParity(root, fin, Seq("ra", "rb"))
  }

  test("update to empty content keeps the doc registered with dl=0 — stats/BM25 stay exact") {
    val root = build(mkTurns(("a", 0, "x y"), ("b", 0, "x q")))
    new IndexMaintainer(spark, root, conf).applyChanges(mkTurns(("a", 0, "")), batchId = "d1")
    val r = reader(root)
    assert(members(r.membership("y")).isEmpty, "emptied doc's postings evicted")
    assert(members(r.membership("x")) == Set("b"))
    val m = SegmentStore.latest(spark, root).get
    assert(m.numDocs == 2 && m.totalTokens == 2, s"a must stay registered with dl=0: $m")
    assertParity(root, mkTurns(("a", 0, ""), ("b", 0, "x q")), Seq("x", "q"))
  }

  test("brand-new empty conv is registered, like fullBuild registers dl=0 docs (FileAnalyzer.cs:80-83)") {
    val root = build(mkTurns(("a", 0, "x")))
    new IndexMaintainer(spark, root, conf).applyChanges(mkTurns(("c", 0, "")), batchId = "d1")
    val m = SegmentStore.latest(spark, root).get
    assert(m.numDocs == 2 && m.totalTokens == 1, s"empty conv missing from dictionary: $m")
    // identical registration to a fresh build over the same final corpus
    val root2 = build(mkTurns(("a", 0, "x"), ("c", 0, "")))
    assert(SegmentStore.latest(spark, root2).get.numDocs == 2)
  }

  test("rename from-unindexed to-live: unconditional Switch — to's content moves under from (Indexer.cs:37-54)") {
    val root = build(mkTurns(("b", 0, "tok_b"), ("k", 0, "keep")))
    new IndexMaintainer(spark, root, conf).rename("a", "b")
    val r = reader(root)
    assert(members(r.membership("tok_b")) == Set("a"), "b's content now lives under key a")
    assert(members(r.membership("keep")) == Set("k"))
  }

  test("switch: two live docs swap contents (Indexer.cs:37-54; IndexerTests.cs:108-185)") {
    val root = build(mkTurns(("a", 0, "tok_a"), ("b", 0, "tok_b")))
    new IndexMaintainer(spark, root, conf).applyChanges(
      mkTurns().limit(0), renames = Map("a" -> "b"), batchId = "swap")
    val r = reader(root)
    assert(members(r.membership("tok_a")) == Set("b"), "b now owns a's old content")
    assert(members(r.membership("tok_b")) == Set("a"))
  }

  test("unsubscribe: all docs of a source de-indexed (FileAnalyzerTests.cs:1026-1049)") {
    val root = TestSpark.freshDir("unsub")
    val w = new IndexWriter(spark, root, conf)
    w.fullBuild(mkTurns(("s1a", 0, "common uniq1"), ("s1b", 0, "common uniq2")), "b0", source = "src1")
    val maint = new IndexMaintainer(spark, root, conf)
    maint.applyChanges(mkTurns(("s2a", 0, "common uniq3")), source = "src2", batchId = "add2")
    assert(members(reader(root).membership("common")) == Set("s1a", "s1b", "s2a"))
    maint.removeSource("src1")
    val r = reader(root)
    assert(members(r.membership("common")) == Set("s2a"))
    assert(!r.contains("uniq1") && !r.contains("uniq2"))
    assert(r.contains("uniq3"))
  }

  test("unsubscribe is join-based: no literal conv-id list in any executed plan (100 TB discipline)") {
    val convs = (0 until 300).map(i => (f"conv$i%06d", 0, s"tokn$i common"))
    val root = build(mkTurns(convs: _*))
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        plans.add(qe.executedPlan.toString); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      new IndexMaintainer(spark, root, conf).removeSource("default")
      // QueryExecutionListener delivery is async — give the bus a moment
      val deadline = System.currentTimeMillis() + 15000
      while (plans.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      Thread.sleep(1500)
    } finally spark.listenerManager.unregister(listener)
    assert(!plans.isEmpty, "listener captured no plans")
    // a collect+isin implementation embeds conv ids as plan literals; the
    // join-based one never lets them reach the driver or the plan
    val offending = plans.toArray(Array.empty[String]).filter(_.contains("conv000199"))
    assert(offending.isEmpty,
      s"literal conv-id list leaked into a plan:\n${offending.headOption.getOrElse("").take(2000)}")
    assert(members(reader(root).membership("common")).isEmpty, "docs must be de-indexed")
  }

  test("empty delta is suppressed: no new manifest version (BaseIndex.cs:36-40)") {
    val root = build(mkTurns(("a", 0, "x")))
    val v0 = SegmentStore.latest(spark, root).get.version
    new IndexMaintainer(spark, root, conf).applyChanges(mkTurns().limit(0), batchId = "noop")
    assert(SegmentStore.latest(spark, root).get.version == v0)
    // idempotent no-op re-apply of identical content is also suppressed
    new IndexMaintainer(spark, root, conf).applyChanges(mkTurns(("a", 0, "x")), batchId = "same")
    val vAfter = SegmentStore.latest(spark, root).get.version
    assert(vAfter == v0, "re-adding identical content must not touch postings")
  }

  test("delete wins over change for the same conv within a batch (FIFO last-write-wins)") {
    val root = build(mkTurns(("a", 0, "x"), ("b", 0, "y")))
    new IndexMaintainer(spark, root, conf).applyChanges(
      mkTurns(("a", 0, "x2")), deletes = Seq("a"), batchId = "d1")
    val r = reader(root)
    assert(!r.contains("x2") && !r.contains("x"))
    assert(members(r.membership("y")) == Set("b"))
  }

  test("compaction folds the logs without changing any answer (BackgroundTaskQueue.cs:86-93 analog)") {
    val root = build(mkTurns(("a", 0, "ca shared"), ("b", 0, "cb shared")))
    val maint = new IndexMaintainer(spark, root, conf)
    maint.applyChanges(mkTurns(("c", 0, "cc shared")), batchId = "d1")
    maint.applyChanges(mkTurns(("a", 0, "ca2 shared")), deletes = Seq("b"), batchId = "d2")
    val before = reader(root)
    val beforeTop = before.bm25TopK(Seq("shared"), 10).collect().map(_.toSeq).toSeq
    val m = maint.compact()
    assert(m.docsDirs.size == 1 && m.forwardDirs.size == 1)
    val after = reader(root)
    assert(after.bm25TopK(Seq("shared"), 10).collect().map(_.toSeq).toSeq == beforeTop)
    assert(members(after.membership("ca2")) == Set("a"))
    assert(members(after.membership("cb")).isEmpty)
    // further maintenance works on the compacted log
    maint.applyChanges(mkTurns(("d", 0, "cd shared")), batchId = "d3")
    assert(members(reader(root).membership("shared")) == Set("a", "c", "d"))
    val fin = mkTurns(("a", 0, "ca2 shared"), ("c", 0, "cc shared"), ("d", 0, "cd shared"))
    assertParity(root, fin, Seq("shared"))
  }

  test("positional index: maintained through content batches; deletes lazy; order-only edits detected") {
    val root = build(mkTurns(("a", 0, "p q r"), ("b", 0, "p q z"), ("c", 0, "q p")))
    val w = new killa.build.IndexWriter(spark, root, conf)
    w.buildPositions(mkTurns(("a", 0, "p q r"), ("b", 0, "p q z"), ("c", 0, "q p")), "pos1")
    val maint = new IndexMaintainer(spark, root, conf)
    assert(members(reader(root).phrase(Seq("p", "q"))) == Set("a", "b"))
    // delete-only: positions untouched, dead doc drops out of phrase hits
    maint.remove(Seq("b"))
    assert(members(reader(root).phrase(Seq("p", "q"))) == Set("a"))
    // content batch: affected position buckets rewrite — phrase stays live
    // and reflects the new content ("c" gains the phrase)
    maint.applyChanges(mkTurns(("c", 0, "p q now")), batchId = "upd")
    assert(members(reader(root).phrase(Seq("p", "q"))) == Set("a", "c"))
    assert(members(reader(root).phrase(Seq("q", "now"))) == Set("c"))
    // token-order-only edit: every tf/dl is unchanged (empty posting delta)
    // but positions MOVE — the staleness probe must bypass empty-batch
    // suppression and rewrite ("a" loses the phrase, gains the reverse)
    maint.applyChanges(mkTurns(("a", 0, "q p r")), batchId = "ord")
    assert(members(reader(root).phrase(Seq("p", "q"))) == Set("c"))
    assert(members(reader(root).phrase(Seq("q", "p"))) == Set("a"))
    // re-adding byte-identical content is still a suppressed no-op
    val vBefore = killa.store.SegmentStore.latest(spark, root).get.version
    maint.applyChanges(mkTurns(("a", 0, "q p r")), batchId = "noop")
    assert(killa.store.SegmentStore.latest(spark, root).get.version == vBefore)
    // a brand-new conv flows into positions through the same step
    maint.applyChanges(mkTurns(("d", 0, "p q fresh")), batchId = "add")
    assert(members(reader(root).phrase(Seq("p", "q"))) == Set("c", "d"))
  }

  test("auto-compaction bounds log-dir growth across a 20-batch run (VERDICT r3 missing #1)") {
    // tight threshold so the policy triggers several times in 20 batches
    val acConf = conf.copy(compactLogDirs = 4)
    val root = TestSpark.freshDir("autocompact")
    new IndexWriter(spark, root, acConf).fullBuild(
      mkTurns(("seed", 0, "base shared")), "b0")
    val maint = new IndexMaintainer(spark, root, acConf)
    var maxDocsDirs = 0
    var maxFwdDirs = 0
    (1 to 20).foreach { i =>
      maint.applyChanges(mkTurns((s"c$i", 0, s"tok$i shared")), batchId = s"d$i")
      val m = SegmentStore.latest(spark, root).get
      maxDocsDirs = math.max(maxDocsDirs, m.docsDirs.size)
      maxFwdDirs = math.max(maxFwdDirs, m.forwardDirs.size)
    }
    // the committed state NEVER exceeds threshold dirs: the batch that
    // crosses it compacts before returning, so every post-batch read merges
    // a bounded dir set no matter how long the maintenance history runs
    assert(maxDocsDirs <= acConf.compactLogDirs,
      s"docs log grew unbounded: $maxDocsDirs dirs")
    assert(maxFwdDirs <= acConf.compactLogDirs,
      s"forward log grew unbounded: $maxFwdDirs dirs")
    // answers identical to a fresh build over the final corpus
    val fin = mkTurns((("seed", 0, "base shared") +:
      (1 to 20).map(i => (s"c$i", 0, s"tok$i shared"))): _*)
    val r = new IndexReader(spark, root, acConf)
    assert(members(r.membership("shared")) ==
      members(BruteForce.membership(fin, "shared")))
    val got = r.bm25TopK(Seq("shared"), 25).collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    val exp = BruteForce.bm25(fin, Seq("shared"), 25).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(got == exp)
    // disabled policy (compactLogDirs = 0) never auto-compacts
    val root2 = TestSpark.freshDir("autocompact0")
    val offConf = conf.copy(compactLogDirs = 0)
    new IndexWriter(spark, root2, offConf).fullBuild(mkTurns(("seed", 0, "x")), "b0")
    val m2 = new IndexMaintainer(spark, root2, offConf)
    (1 to 6).foreach(i => m2.applyChanges(mkTurns((s"c$i", 0, s"y$i")), batchId = s"d$i"))
    assert(SegmentStore.latest(spark, root2).get.docsDirs.size == 7)
  }

  test("compact reclaims dead-doc position rows; phrase parity holds (VERDICT r3 missing #2)") {
    val posRows: String => Long = { root =>
      val m = SegmentStore.latest(spark, root).get
      val paths = m.posBuckets.keys.toSeq.flatMap(m.posPath).filter { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
      }
      if (paths.isEmpty) 0L else spark.read.parquet(paths: _*).count()
    }
    val corpus = (0 until 12).map(i => (f"pc$i%02d", 0, s"ph$i q r shared"))
    val root = build(mkTurns(corpus: _*))
    new IndexWriter(spark, root, conf).buildPositions(mkTurns(corpus: _*), "pos1")
    val maint = new IndexMaintainer(spark, root, conf)
    val rowsBefore = posRows(root)
    assert(rowsBefore > 0)
    // delete half the corpus: positions stay (lazy), phrase filters via alive
    val dead = (0 until 6).map(i => f"pc$i%02d")
    maint.remove(dead, "del-half")
    assert(posRows(root) == rowsBefore, "deletes must stay lazy for positions")
    val phraseBefore = members(reader(root).phrase(Seq("q", "r")))
    assert(phraseBefore == (6 until 12).map(i => f"pc$i%02d").toSet)
    // compact: dead rows fold out, answers unchanged
    maint.compact("c1")
    val rowsAfter = posRows(root)
    assert(rowsAfter < rowsBefore && rowsAfter > 0,
      s"dead position rows not reclaimed: $rowsBefore -> $rowsAfter")
    assert(members(reader(root).phrase(Seq("q", "r"))) == phraseBefore)
    assert(members(reader(root).phrase(Seq("ph7", "q"))) == Set("pc07"))
    assert(members(reader(root).phrase(Seq("ph2", "q"))).isEmpty, "dead doc gone")
    // idempotent: a second compact with nothing to fold is a suppressed no-op
    val v = SegmentStore.latest(spark, root).get.version
    maint.compact("c2")
    assert(SegmentStore.latest(spark, root).get.version == v,
      "clean compact must not bump the version")
    // maintenance continues to work over reclaimed positions
    maint.applyChanges(mkTurns(("pcnew", 0, "q r fresh")), batchId = "add")
    assert(members(reader(root).phrase(Seq("q", "r"))) == phraseBefore + "pcnew")
  }

  test("snapshot isolation: a pinned reader never sees later batches (defensive-copy Get, StringIndex.cs:19-24)") {
    val root = build(mkTurns(("a", 0, "iso")))
    val pinned = reader(root) // pins the current latest version
    new IndexMaintainer(spark, root, conf).remove(Seq("a"))
    assert(members(pinned.membership("iso")) == Set("a"), "pinned snapshot unchanged")
    assert(members(reader(root).membership("iso")).isEmpty, "fresh reader sees the delete")
  }

  test("incremental sequence converges to oracle on synthetic corpus (stress)") {
    val base = Synth.transcripts(spark, 30, 4, seed = 11L).toDF()
    val root = build(base)
    val maint = new IndexMaintainer(spark, root, conf)
    // update 5 convs with new content, add 3 convs, delete 2, rename 1
    val updates = Synth.transcripts(spark, 8, 4, seed = 99L).toDF()
      .where(col("conv_id") < "conv000005")
    val adds = Synth.transcripts(spark, 3, 4, seed = 55L).toDF()
      .withColumn("conv_id", concat(lit("newc"), col("conv_id")))
    maint.applyChanges(updates.unionByName(adds), deletes = Seq("conv000010", "conv000029"),
      renames = Map("conv000020" -> "renamed020"), batchId = "d1")
    // oracle: final corpus assembled relationally
    val fin = base
      .where(!col("conv_id").isin("conv000010", "conv000029"))
      .where(col("conv_id") >= "conv000005" || col("conv_id").startsWith("newc"))
      .withColumn("conv_id", regexp_replace(col("conv_id"), "^conv000020$", "renamed020"))
      .unionByName(updates).unionByName(adds)
    assertParity(root, fin, Seq("the", "query"))
    assertParity(root, fin, Seq("shared_0", "filter"))
  }
}

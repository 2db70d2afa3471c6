package killa

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{IndexWriter, Ledger}
import killa.query.{BruteForce, IndexReader}
import killa.store.SegmentStore
import killa.synth.Synth

/** End-to-end fixture tests mirroring the reference's FileAnalyzerTests
  * (subscribe/backfill counts, membership parity, quiescent visibility) plus
  * the baseline additions (BM25 rank identity, salted-build byte identity,
  * kill/resume equivalence) — FIXTURES.md §2.
  */
class EndToEndSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val turns = Synth.transcripts(spark, nConvs = 60, turnsPerConv = 6, seed = 7L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("e2e")
    new IndexWriter(spark, r, Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16))
      .fullBuild(turns, "b0")
    r
  }

  private def reader = new IndexReader(spark, root, Conf(nBuckets = 8, blockSize = 16))

  private def collectMembers(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  test("membership parity: unique token returns exactly its owner (FileAnalyzerTests.cs:292-317)") {
    val r = reader
    // every conversation owns its uniq<conv>_<i> tokens
    Seq(0, 7, 59).foreach { conv =>
      val term = s"uniq${conv}_0"
      val oracle = collectMembers(BruteForce.membership(turns, term))
      val got = collectMembers(r.membership(term))
      assert(got == oracle, s"term=$term")
      if (oracle.nonEmpty) assert(got == Set(f"conv$conv%06d"))
    }
  }

  test("membership parity: shared + hot terms return all owners") {
    val r = reader
    Seq("shared_0", "shared_3", "the", "query").foreach { term =>
      assert(collectMembers(r.membership(term)) ==
        collectMembers(BruteForce.membership(turns, term)), s"term=$term")
    }
    // hot term reaches (nearly) the whole corpus — the skew fixture is real
    assert(collectMembers(r.membership("the")).size > 50)
  }

  test("membership: miss → empty; null/empty query → empty without store access (SearcherTests.cs:13-25)") {
    val r = reader
    assert(r.membership("absent_token_xyz").isEmpty)
    assert(r.membership(null).isEmpty)
    assert(r.membership("").isEmpty)
    assert(!r.contains("absent_token_xyz"))
    assert(r.contains("the"))
  }

  test("prefix + wildcard search: parity with tokenized oracle (reference README.md:56-58 TODO)") {
    import org.apache.spark.sql.functions.{col, explode}
    val r = reader
    def oracle(cond: org.apache.spark.sql.Column): Set[String] =
      turns.select(col("conv_id"),
          explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("term"))
        .where(cond).select("conv_id").distinct().collect().map(_.getString(0)).toSet
    assert(collectMembers(r.membershipPrefix("uniq5")) == oracle(col("term").startsWith("uniq5")))
    assert(collectMembers(r.membershipPrefix("quer")) == oracle(col("term").startsWith("quer")))
    assert(collectMembers(r.membershipPrefix("zz_absent")).isEmpty)
    assert(collectMembers(r.membershipWildcard("uniq?_0")) == oracle(col("term").rlike("^uniq._0$")))
    assert(collectMembers(r.membershipWildcard("sh*_1")) == oracle(col("term").rlike("^sh.*_1$")))
    assert(collectMembers(r.membershipWildcard("query")) == oracle(col("term") === "query"),
      "wildcard-free mask degrades to exact membership")
    assert(r.membershipPrefix("").isEmpty && r.membershipPrefix(null).isEmpty)
    assert(r.membershipWildcard("").isEmpty && r.membershipWildcard(null).isEmpty)
  }

  test("phrase search ≡ positional oracle, incl. duplicate terms; single term degrades to membership") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, desc, posexplode, row_number}
    new IndexWriter(spark, root, Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16))
      .buildPositions(turns, "pos1")
    val r = reader
    val ppos = turns.select(col("conv_id"), col("turn_idx"),
        posexplode(killa.tokenize.Tokenize.termsCol(col("text"))).as(Seq("tp", "term")))
      .withColumn("pos",
        row_number().over(Window.partitionBy("conv_id").orderBy("turn_idx", "tp")).cast("long") - 1L)
      .persist()
    def oracle(ts: Seq[String]): Set[String] =
      ts.zipWithIndex.map { case (t, i) =>
        ppos.where(col("term") === t).select(col("conv_id"), (col("pos") - i).as("start"))
      }.reduce((a, b) => a.join(b, Seq("conv_id", "start")))
        .select("conv_id").distinct().collect().map(_.getString(0)).toSet
    // most frequent real bigram of the corpus
    val big = ppos.as("a").join(ppos.as("b"),
        col("a.conv_id") === col("b.conv_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.term").as("t1"), col("b.term").as("t2")).count()
      .orderBy(desc("count")).limit(1).collect()(0)
    val (t1, t2) = (big.getString(0), big.getString(1))
    val exp2 = oracle(Seq(t1, t2))
    assert(exp2.nonEmpty, "fixture has no adjacent bigram — vacuous")
    assert(collectMembers(r.phrase(Seq(t1, t2))) == exp2, s"phrase [$t1 $t2]")
    assert(collectMembers(r.phrase(Seq(t1, t1))) == oracle(Seq(t1, t1)), s"dup phrase [$t1 $t1]")
    assert(collectMembers(r.phrase(Seq("the", "absent_zz"))).isEmpty)
    assert(collectMembers(r.phrase(Seq("query"))) == collectMembers(r.membership("query")))
    ppos.unpersist()
    ()
  }

  test("BM25 rank identity: WAND path ≡ relational oracle, ids AND scores — both query paths (FIXTURES.md §3)") {
    // same queries through the adaptive driver-side path (small posting
    // volume → local DAAT) and the distributed range fan-out (forced via
    // localQueryBlocks = 0): both must match the oracle bit for bit
    val readers = Seq(
      "local" -> reader,
      "localpar" -> new IndexReader(spark, root,
        Conf(nBuckets = 8, blockSize = 16, localParBlocks = 1)),
      "distributed" -> new IndexReader(spark, root,
        Conf(nBuckets = 8, blockSize = 16, localQueryBlocks = 0)))
    val queries = Seq(
      (Seq("the"), 10, false),
      (Seq("query"), 5, false),
      (Seq("shared_1"), 100, false),
      (Seq("uniq3_1"), 3, false),
      (Seq("query", "filter"), 10, false),
      (Seq("the", "query", "join"), 7, false),
      (Seq("query", "filter"), 10, true),
      (Seq("the", "shared_0"), 15, true),
      (Seq("query", "absent_zz"), 5, false), // missing term contributes nothing
      (Seq("query", "absent_zz"), 5, true)   // conjunctive with missing term → empty
    )
    readers.foreach { case (path, r) =>
      queries.foreach { case (terms, k, conj) =>
        val got = r.bm25TopK(terms, k, conj).collect().map(x => (x.getString(0), x.getDouble(1)))
        val exp = BruteForce.bm25(turns, terms, k, conj).collect()
          .map(x => (x.getString(0), x.getDouble(1)))
        assert(got.length == exp.length, s"[$path] q=$terms k=$k conj=$conj")
        got.zip(exp).zipWithIndex.foreach { case (((gc, gs), (ec, es)), i) =>
          assert(gc == ec, s"[$path] q=$terms k=$k conj=$conj rank=$i ids differ: $gc vs $ec")
          assert(gs == es, s"[$path] q=$terms k=$k conj=$conj rank=$i scores differ: $gs vs $es")
        }
      }
    }
  }

  test("BM25 top-k ⊇ reference exact-match set for k ≥ |result| (SURVEY.md intro contract)") {
    val r = reader
    val term = "uniq5_0"
    val refSet = collectMembers(BruteForce.membership(turns, term))
    val topk = collectMembers(r.bm25TopK(Seq(term), 1000).drop("score"))
    assert(topk == refSet)
  }

  test("BM25: null/empty/duplicate query terms collapse; empty query → empty") {
    val r = reader
    assert(r.bm25TopK(Seq.empty, 10).isEmpty)
    assert(r.bm25TopK(Seq(null, ""), 10).isEmpty)
    val a = r.bm25TopK(Seq("query", "query"), 5).collect().map(_.toSeq)
    val b = r.bm25TopK(Seq("query"), 5).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("range-salted build decodes to identical posting content for any rangeDocs (FIXTURES.md §2.5 skew property)") {
    // rangeDocs = 2^40 ⇒ a single range (the unsalted build); rangeDocs = 8 ⇒
    // 8-doc slices. Block boundaries align to ranges so segment BYTES differ,
    // but the decoded per-term posting sequence and global df must be equal.
    val dirs = Seq(8L, 1L << 40).map { rd =>
      val d = TestSpark.freshDir(s"rd$rd")
      new IndexWriter(spark, d, Conf(nBuckets = 8, rangeDocs = rd, blockSize = 16))
        .fullBuild(turns, "b0")
      d
    }
    val contents = dirs.map(decodedFingerprint)
    assert(contents(0) == contents(1))
  }

  test("skew bound: no block (hence no emit task) spans more than one docId range, even for a 100%-df term") {
    // "the" hits nearly all 60 docs; with rangeDocs = 8 its postings must be
    // built as ≥ 4 independent per-range slices, each ≤ 8 postings — the
    // structural witness that no task materialized the full hot-term list.
    val rd = 8L
    val d = TestSpark.freshDir("skewbound")
    new IndexWriter(spark, d, Conf(nBuckets = 8, rangeDocs = rd, blockSize = 16))
      .fullBuild(turns, "b0")
    val m = SegmentStore.latest(spark, d).get
    import spark.implicits._
    val paths = m.buckets.keys.toSeq.sorted.flatMap(m.bucketPath)
    val blocks = spark.read.parquet(paths: _*).as[killa.model.PostingBlock]
      .collect().filter(_.term == "the")
    assert(blocks.nonEmpty)
    blocks.foreach { b =>
      assert(b.firstDoc / rd == b.lastDoc / rd,
        s"block ${b.blockId} spans ranges ${b.firstDoc / rd}..${b.lastDoc / rd}")
    }
    val perRange = blocks.groupBy(_.firstDoc / rd).view.mapValues(_.map(_.n.toLong).sum)
    assert(perRange.size >= 4, s"hot term built in only ${perRange.size} ranges")
    assert(perRange.values.forall(_ <= rd), s"a range holds > rangeDocs postings: $perRange")
    // df stays global despite per-range construction
    assert(blocks.forall(_.df == blocks.map(_.n.toLong).sum))
  }

  test("build is a pure function of the input row SET: any partitioning/order → identical segments (FIXTURES.md §2)") {
    import org.apache.spark.sql.functions.{col, desc}
    val conf = Conf(nBuckets = 8, rangeDocs = 16, blockSize = 16)
    val variants = Seq(
      turns.repartition(7),
      turns.orderBy(desc("conv_id"), desc("turn_idx")),
      turns.coalesce(1),
      turns.repartition(col("turn_idx")))
    val prints = variants.zipWithIndex.map { case (v, i) =>
      val d = TestSpark.freshDir(s"perm$i")
      new IndexWriter(spark, d, conf).fullBuild(v, "b0")
      blocksFingerprint(d)
    }
    assert(prints.forall(_ == prints.head), "segment bytes differ across input partitionings")
    assert(prints.head == blocksFingerprint(root), "differs from the baseline build")
  }

  test("fresh build over a populated root REPLACES the old index — no stale-manifest merge") {
    import org.apache.spark.sql.functions.col
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    val d = TestSpark.freshDir("rebuild")
    new IndexWriter(spark, d, conf).fullBuild(turns, "b0")
    // rebuild (new buildId) over the LAST 10 convs only: their fresh docIds
    // 0..9 collide with the old dictionary's conv000000..09 — a stale docs
    // log would return those wrong conv_ids
    val corpusB = turns.where(col("conv_id") >= "conv000050")
    new IndexWriter(spark, d, conf).fullBuild(corpusB, "b1")
    val r = new IndexReader(spark, d, conf)
    assert(r.manifest.get.numDocs == 10, "stats must describe the new corpus")
    val got = collectMembers(r.membership("the"))
    val oracle = collectMembers(BruteForce.membership(corpusB, "the"))
    assert(got == oracle, s"labels from a stale dictionary: $got vs $oracle")
    assert(collectMembers(r.membership("uniq0_0")).isEmpty, "old-corpus docs still visible")
  }

  test("kill/resume: interrupted build + resume ≡ uninterrupted build (FIXTURES.md §2.6)") {
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    val d1 = TestSpark.freshDir("resume")
    val w1 = new IndexWriter(spark, d1, conf)
    w1.fullBuild(turns, "b0", maxWaves = 1) // "killed" after wave 1 of 3
    val partial = SegmentStore.latest(spark, d1).get
    assert(partial.buckets.size == 3, "partial index visible mid-build (FileAnalyzerTests.cs:289-317)")
    w1.fullBuild(turns, "b0") // resume
    assert(blocksFingerprint(d1) == blocksFingerprint(root))
    // lineage: a ledger row per bucket
    val ledger = Ledger.read(spark, d1)
    assert(ledger.where("step = 'segments' and status = 'done'").count() == 8)
  }

  test("wave failure is captured as a failed ledger row; resume retries to byte-identical segments (op 24)") {
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    val d = TestSpark.freshDir("wavefault")
    val w = new IndexWriter(spark, d, conf)
    var calls = 0
    val ex = intercept[RuntimeException] {
      w.fullBuild(turns, "b0", waveHook = _ => {
        calls += 1
        if (calls == 2) throw new RuntimeException("injected wave fault")
      })
    }
    assert(ex.getMessage.contains("injected"))
    val ledger = Ledger.read(spark, d)
    assert(ledger.where("step = 'segments' and status = 'failed'").count() == 3,
      "every bucket of the failed wave gets a failed lineage row")
    assert(ledger.where("status = 'failed' and error like '%injected wave fault%'").count() == 3,
      "the error is recorded, not swallowed (unlike TaskExtensions.cs:7)")
    // resume: wave 1's buckets stay done, the failed wave retries
    w.fullBuild(turns, "b0")
    assert(blocksFingerprint(d) == blocksFingerprint(root))
    assert(Ledger.read(spark, d).where("step = 'segments' and status = 'done'").count() == 8)
  }

  test("delete landing mid-build cancels the doc's pending waves (CancelTasks analog, BackgroundTaskQueue.cs:74-84)") {
    import org.apache.spark.sql.functions.col
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    val d = TestSpark.freshDir("middel")
    val w = new IndexWriter(spark, d, conf)
    w.fullBuild(turns, "b0", maxWaves = 1) // "killed" mid-build
    val built = SegmentStore.latest(spark, d).get.buckets.keySet
    // a conv whose unique token's bucket is NOT yet built — with the frozen
    // build input, its pending wave would re-index the doc after the delete
    val victim = (0 until 60).find { c =>
      !built.contains(killa.util.Hashing.termBucket(s"uniq${c}_0", 8))
    }.get
    val victimConv = f"conv$victim%06d"
    new killa.maintain.IndexMaintainer(spark, d, conf).remove(Seq(victimConv), "middel")
    w.fullBuild(turns, "b0") // resume
    val r = new IndexReader(spark, d, conf)
    assert(collectMembers(r.membership(s"uniq${victim}_0")).isEmpty,
      "a pending wave re-indexed a doc deleted mid-build")
    val fin = turns.where(col("conv_id") =!= victimConv)
    assert(collectMembers(r.membership("the")) ==
      collectMembers(BruteForce.membership(fin, "the")))
    assert(SegmentStore.latest(spark, d).get.numDocs == 59)
    val got = r.bm25TopK(Seq("the", "query"), 10).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    val exp = BruteForce.bm25(fin, Seq("the", "query"), 10).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(got == exp, "BM25 over the post-delete corpus diverged")
  }

  test("update landing mid-build wins over the stale build input (batchSeq last-write)") {
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    val d = TestSpark.freshDir("midupd")
    val w = new IndexWriter(spark, d, conf)
    w.fullBuild(turns, "b0", maxWaves = 1)
    val built = SegmentStore.latest(spark, d).get.buckets.keySet
    val victim = (0 until 60).find { c =>
      !built.contains(killa.util.Hashing.termBucket(s"uniq${c}_0", 8))
    }.get
    val victimConv = f"conv$victim%06d"
    import spark.implicits._
    val newContent = Seq((victimConv, 0, "user", "midupdate_tok only", "",
      new java.sql.Timestamp(0L))).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    new killa.maintain.IndexMaintainer(spark, d, conf).applyChanges(newContent, batchId = "midupd")
    w.fullBuild(turns, "b0") // resume
    val r = new IndexReader(spark, d, conf)
    assert(collectMembers(r.membership("midupdate_tok")) == Set(victimConv))
    assert(collectMembers(r.membership(s"uniq${victim}_0")).isEmpty,
      "stale build input overwrote a mid-build update")
  }

  test("partial snapshot only answers from built buckets (mid-indexing visibility, FileAnalyzerTests.cs:289-317)") {
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    val d = TestSpark.freshDir("partial")
    new IndexWriter(spark, d, conf).fullBuild(turns, "b0", maxWaves = 1)
    val r = new IndexReader(spark, d, conf)
    val full = collectMembers(BruteForce.membership(turns, "the"))
    val part = collectMembers(r.membership("the"))
    assert(part.subsetOf(full))
    assert(part.isEmpty || part == full || part.size < full.size)
  }

  /** Per-term decoded posting content: (df, docId-ordered (doc, tf, dl)
    * rows) — the block-layout-independent semantics of a segment store.
    */
  private def decodedFingerprint(dir: String): Map[String, (Long, Seq[(Long, Long, Long)])] = {
    val m = SegmentStore.latest(spark, dir).get
    import spark.implicits._
    val paths = m.buckets.keys.toSeq.sorted.flatMap(m.bucketPath)
      .filter(p => new java.io.File(p.stripPrefix("file:")).exists)
    val blocks = spark.read.parquet(paths: _*).as[killa.model.PostingBlock].collect()
    blocks.groupBy(_.term).map { case (t, bs) =>
      val rows = bs.sortBy(_.firstDoc).flatMap { b =>
        val ds = killa.codec.Delta.decode(b.docsBin, b.n)
        val ts = killa.codec.Varint.decode(b.tfsBin, b.n)
        val ls = killa.codec.Varint.decode(b.dlsBin, b.n)
        (0 until b.n).map(i => (ds(i), ts(i), ls(i)))
      }.toSeq
      t -> ((bs.head.df, rows))
    }
  }

  /** Logical content fingerprint of all segment blocks in a store. */
  private def blocksFingerprint(dir: String): Seq[String] = {
    val m = SegmentStore.latest(spark, dir).get
    import spark.implicits._
    val paths = m.buckets.keys.toSeq.sorted.flatMap(m.bucketPath)
      .filter(p => new java.io.File(p.stripPrefix("file:")).exists)
    if (paths.isEmpty) return Seq.empty
    spark.read.parquet(paths: _*).as[killa.model.PostingBlock]
      .collect()
      .map(b => s"${b.term}|${b.blockId}|${b.df}|${b.n}|${b.firstDoc}|${b.lastDoc}|" +
        s"${b.maxTf}|${b.minDl}|${b.docsBin.mkString(",")}|${b.tfsBin.mkString(",")}|" +
        s"${b.dlsBin.mkString(",")}|${b.bkt}")
      .sorted.toSeq
  }
}

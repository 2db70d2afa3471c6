package killa

import org.apache.spark.sql.functions.{col, explode, length => lenCol, levenshtein, lit, abs => absCol}
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.query.{BruteForce, IndexReader, Snippets}
import killa.store.SegmentStore
import killa.synth.Synth

/** Round-2 query-side extensions: boolean-NOT BM25, fuzzy term search,
  * keyword-in-context snippets, and snapshot vacuum.
  */
class QueryOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val turns = Synth.transcripts(spark, nConvs = 60, turnsPerConv = 6, seed = 7L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("qops")
    new IndexWriter(spark, r, Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16))
      .fullBuild(turns, "b0")
    r
  }

  // all three query paths: single-range local, parallel multi-range local
  // (localParBlocks=1 forces the threaded range decomposition), and the
  // forced distributed range fan-out
  private def readers = Seq(
    "local" -> new IndexReader(spark, root, Conf(nBuckets = 8, blockSize = 16)),
    "localpar" -> new IndexReader(spark, root,
      Conf(nBuckets = 8, blockSize = 16, localParBlocks = 1)),
    "dist" -> new IndexReader(spark, root, Conf(nBuckets = 8, blockSize = 16, localQueryBlocks = 0)))

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("bm25 mustNot: rank identity (ids AND scores) vs relational oracle on both paths") {
    val cases = Seq(
      (Seq("query", "filter"), Seq("the"), false), // hot exclusion
      (Seq("the"), Seq("shared_0"), false), // hot query, selective exclusion
      (Seq("query", "filter"), Seq("shared_1", "shared_2"), true)) // conjunctive
    for ((terms, ex, conj) <- cases; (path, r) <- readers) {
      val got = hits(r.bm25TopK(terms, 10, conjunctive = conj, mustNot = ex))
      val exp = hits(BruteForce.bm25(turns, terms, 10, conjunctive = conj, mustNot = ex))
      assert(got == exp, s"path=$path terms=$terms NOT $ex conj=$conj")
      // the exclusion is real: no hit conv contains an excluded term
      val excludedConvs = ex.flatMap(t =>
        BruteForce.membership(turns, t).collect().map(_.getString(0))).toSet
      assert(got.forall(h => !excludedConvs.contains(h._1)), s"path=$path leaked exclusion")
    }
  }

  test("bm25 mustNot: an exclusion term absent from the index is a no-op") {
    for ((path, r) <- readers) {
      val got = hits(r.bm25TopK(Seq("query", "filter"), 10,
        mustNot = Seq("absent_token_xyz")))
      val plain = hits(r.bm25TopK(Seq("query", "filter"), 10))
      assert(got == plain, s"path=$path")
    }
  }

  test("bm25 mustNot: a term both required and excluded is plain boolean (t AND NOT t)") {
    for ((path, r) <- readers) {
      // conjunctive: empty by definition
      assert(r.bm25TopK(Seq("query", "filter"), 10, conjunctive = true,
        mustNot = Seq("query")).isEmpty, s"path=$path")
      // disjunctive: every doc scoring on the excluded term drops
      val got = hits(r.bm25TopK(Seq("query", "filter"), 10, mustNot = Seq("query")))
      val exp = hits(BruteForce.bm25(turns, Seq("query", "filter"), 10, mustNot = Seq("query")))
      assert(got == exp, s"path=$path")
    }
  }

  test("fuzzy membership: parity with a relational levenshtein oracle; maxDist=0 → exact path") {
    val toks = turns.select(col("conv_id"),
      explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("term"))
    def oracle(term: String, d: Int): Set[String] = toks
      .where(absCol(lenCol(col("term")) - lit(term.length)) <= d &&
        levenshtein(col("term"), lit(term)) <= d)
      .select("conv_id").distinct().collect().map(_.getString(0)).toSet
    val r = readers.head._2
    Seq("uniq5_0" -> 1, "query" -> 1, "shared_0" -> 2).foreach { case (t, d) =>
      val got = r.membershipFuzzy(t, d).collect().map(_.getString(0)).toSet
      assert(got == oracle(t, d), s"term=$t d=$d")
      assert(got.nonEmpty, s"vacuous fixture for $t")
    }
    // distance 0 degrades to exact membership
    assert(r.membershipFuzzy("query", 0).collect().map(_.getString(0)).toSet ==
      BruteForce.membership(turns, "query").collect().map(_.getString(0)).toSet)
    assert(r.membershipFuzzy(null, 1).isEmpty)
    assert(r.membershipFuzzy("", 1).isEmpty)
  }

  test("snippets: first occurrence wins, window clamps at both edges, non-hits yield no row") {
    val t = Seq(
      ("cA", 0, "alpha beta target gamma delta epsilon"),
      ("cA", 1, "target again later"), // not first turn — ignored
      ("cB", 0, "target at start x y"), // left clamp
      ("cC", 0, "x y z target"), // right clamp
      ("cD", 0, "no occurrence here")
    ).toDF("conv_id", "turn_idx", "text")
    val hitsDf = Seq("cA", "cB", "cC", "cD").toDF("conv_id")
    val got = Snippets.forTerm(t, hitsDf, "target", 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("cA", 0, 3L, "alpha beta target gamma delta"),
      ("cB", 0, 1L, "target at start"),
      ("cC", 0, 4L, "y z target")))
  }

  test("vacuum: expired snapshots and their exclusive dirs removed; live snapshot byte-identical") {
    val r = TestSpark.freshDir("vac")
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    val maint = new IndexMaintainer(spark, r, conf)
    maint.remove(Seq("conv000003", "conv000007"), "d1") // rewrites affected buckets
    maint.compact("c1") // replaces the docs/forward logs entirely
    val latest = SegmentStore.latestVersion(spark, r).get // multi-wave builds
    assert(latest >= 3) //   commit one version per wave, so ≥ 3 exist here
    val before = new IndexReader(spark, r, conf).membership("the")
      .collect().map(_.getString(0)).toSet

    val stats = SegmentStore.vacuum(spark, r, keepLast = 1)
    assert(stats.removedSnapshots == latest - 1, s"stats=$stats")
    // compaction orphaned the pre-compaction docs/forward logs at minimum
    assert(stats.removedDirs >= 2, s"stats=$stats")
    assert(SegmentStore.latestVersion(spark, r).contains(latest))
    intercept[Exception](SegmentStore.read(spark, r, 1))

    val after = new IndexReader(spark, r, conf).membership("the")
      .collect().map(_.getString(0)).toSet
    assert(after == before && !after.contains("conv000003") && !after.contains("conv000007"))
    // idempotent: a second vacuum finds nothing else to remove
    assert(SegmentStore.vacuum(spark, r, keepLast = 1) == SegmentStore.VacuumStats(0, 0))
  }

  test("vacuum never deletes paths referenced by NO manifest (in-flight writer output)") {
    val r = TestSpark.freshDir("vacflight")
    val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    val maint = new IndexMaintainer(spark, r, conf)
    maint.remove(Seq("conv000004"), "d1") // create ≥ 1 expired version
    // simulate an in-flight build/batch: data dirs no manifest references yet
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inflight = Seq(
      new org.apache.hadoop.fs.Path(s"$r/data/inflight-commit/bkt_p=0"),
      new org.apache.hadoop.fs.Path(s"$r/docs/inflight-docs"),
      new org.apache.hadoop.fs.Path(s"$r/forward/inflight-fwd"))
    inflight.foreach(fs.mkdirs(_))
    val stats = SegmentStore.vacuum(spark, r, keepLast = 1)
    assert(stats.removedSnapshots >= 1)
    inflight.foreach(p => assert(fs.exists(p), s"vacuum deleted in-flight path $p"))
  }
}

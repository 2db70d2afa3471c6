package killa

import org.apache.spark.sql.functions.{col, explode}
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{FieldIndexes, IndexWriter}
import killa.dedup.Dedup
import killa.maintain.IndexMaintainer
import killa.query.{BruteForce, IndexReader}
import killa.store.SegmentStore
import killa.synth.Synth
import killa.tokenize.Tokenize

/** Round-4 capability layer: proximity (slop) phrase, cursor pagination
  * (searchAfter), more-like-this, field-scoped indexes + facets, snapshot
  * time travel, dedup keep-one and deterministic hash sampling.
  */
class Round4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 60, turnsPerConv = 6, seed = 7L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r4")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    new IndexWriter(spark, r, conf).buildPositions(turns, "pos0")
    r
  }

  private def readers = Seq(
    "local" -> new IndexReader(spark, root, conf),
    "localpar" -> new IndexReader(spark, root, conf.copy(localParBlocks = 1)),
    "dist" -> new IndexReader(spark, root, conf.copy(localQueryBlocks = 0)))

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  // ---- proximity phrase ----

  /** Pure-Scala chain oracle, independent of the positional index: global
    * token positions per conv under (turn_idx, within-turn ordinal) order.
    */
  private def chainOracle(terms: Seq[String], slop: Int): Set[String] = {
    val byConv = turns.orderBy("conv_id", "turn_idx")
      .select(col("conv_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.flatMap(_._2.split(" ").filter(_.nonEmpty))
      }
    byConv.collect { case (c, toks) =>
      val pos = terms.map(t => toks.zipWithIndex.collect { case (w, i) if w == t => i.toLong })
      var cand = pos.head
      for (next <- pos.tail)
        cand = next.filter(q => cand.exists(p => p < q && q <= p + 1 + slop))
      if (cand.nonEmpty) Some(c) else None
    }.flatten.toSet
  }

  test("phrase slop: DP chain matches the independent oracle; slop=0 is the exact phrase") {
    val r = readers.head._2
    for {
      phrase <- Seq(Seq("the", "the"), Seq("query", "filter"), Seq("the", "query", "the"))
      slop <- Seq(0, 1, 2)
    } {
      val got = r.phrase(phrase, slop).collect().map(_.getString(0)).toSet
      val exp = chainOracle(phrase, slop)
      assert(got == exp, s"phrase=$phrase slop=$slop")
    }
    // slop results grow monotonically with slop
    val s0 = r.phrase(Seq("the", "query"), 0).collect().map(_.getString(0)).toSet
    val s2 = r.phrase(Seq("the", "query"), 2).collect().map(_.getString(0)).toSet
    assert(s0.subsetOf(s2))
  }

  test("phrase slop: greedy-incomplete case matches (reachable-chain, not greedy walk)") {
    // A at 0; B at 1 and 2; C at 4. Greedy takes B=1 → C ∈ (1,3] misses 4;
    // the valid chain is B=2 → C ∈ (2,4]. slop=1 must match.
    val t = Seq(
      ("cX", 0, "u", "A B B z C", "", new java.sql.Timestamp(0L)),
      ("cY", 0, "u", "A B z z C", "", new java.sql.Timestamp(0L)) // no chain at slop=1
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val rt = TestSpark.freshDir("r4greedy")
    new IndexWriter(spark, rt, conf).fullBuild(t, "b0")
    new IndexWriter(spark, rt, conf).buildPositions(t, "pos0")
    val r = new IndexReader(spark, rt, conf)
    assert(r.phrase(Seq("A", "B", "C"), 1).collect().map(_.getString(0)).toSeq == Seq("cX"))
    assert(r.phrase(Seq("A", "B", "C"), 2).collect().map(_.getString(0)).toSet == Set("cX", "cY"))
  }

  // ---- cursor pagination ----

  test("searchAfter: pages concatenate to the full top-N, ids AND scores, on all three paths") {
    val terms = Seq("query", "filter", "join")
    for ((path, r) <- readers) {
      val full = hits(BruteForce.bm25(turns, terms, 30, conf = conf))
      val p1 = r.bm25TopKRows(terms, 10).toSeq
      assert(p1 == full.take(10), s"path=$path page1")
      val p2 = hits(r.bm25TopKAfter(terms, 10, p1.last._1, p1.last._2))
      assert(p2 == full.slice(10, 20), s"path=$path page2")
      val p3 = hits(r.bm25TopKAfter(terms, 10, p2.last._1, p2.last._2))
      assert(p3 == full.slice(20, 30), s"path=$path page3")
      assert(full.length == 30, "vacuous fixture") // enough matches to page
    }
  }

  test("searchAfter: hot single term pages through the whole corpus without overlap or gap") {
    val r = readers.head._2
    val full = hits(BruteForce.bm25(turns, Seq("the"), 60, conf = conf))
    var page = r.bm25TopKRows(Seq("the"), 7).toSeq
    var all = page
    while (page.nonEmpty) {
      val last = all.last
      page = hits(r.bm25TopKAfter(Seq("the"), 7, last._1, last._2))
      all = all ++ page
    }
    assert(all == full)
  }

  test("searchAfter: unknown cursor conv degrades to a score-only cursor") {
    val r = readers.head._2
    val full = hits(BruteForce.bm25(turns, Seq("query"), 40, conf = conf))
    val cut = full(4)._2
    val got = hits(r.bm25TopKAfter(Seq("query"), 10, "zz_never_indexed", cut))
    val exp = full.filter(_._2 < cut).take(10)
    assert(got == exp)
  }

  // ---- more-like-this ----

  test("moreLikeThis: engine matches the deterministic selection + BM25 recompute") {
    // uniq-free corpus so characteristic terms are shared across docs
    val t2 = Synth.transcripts(spark, nConvs = 40, turnsPerConv = 4, seed = 11L,
      uniquePerConv = 0).toDF().persist()
    val rt = TestSpark.freshDir("r4mlt")
    new IndexWriter(spark, rt, conf).fullBuild(t2, "b0")
    val r = new IndexReader(spark, rt, conf)

    val srcConv = "conv000005"
    val toks = t2.select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
    val tf = toks.groupBy("conv_id", "term").count().collect()
      .map(r0 => ((r0.getString(0), r0.getString(1)), r0.getLong(2))).toMap
    val df = toks.select("conv_id", "term").distinct().groupBy("term").count().collect()
      .map(r0 => (r0.getString(0), r0.getLong(1))).toMap
    val n = t2.select("conv_id").distinct().count()
    val selected = tf.collect { case ((c, t), f) if c == srcConv => (t, f) }.toSeq
      .filter { case (t, _) => df(t) * 2 <= n }
      .sortBy { case (t, f) => (-f, df(t), t) }
      .take(5).map(_._1)
    assert(selected.nonEmpty, "vacuous fixture")
    val exp = hits(BruteForce.bm25(t2, selected, 11, conf = conf))
      .filterNot(_._1 == srcConv).take(10)
    val got = hits(r.moreLikeThis(srcConv, maxTerms = 5, k = 10))
    assert(got == exp)
    assert(got.nonEmpty, "vacuous fixture")
    assert(!got.exists(_._1 == srcConv), "self leaked into MLT results")
    // unknown and null convs are empty, not errors
    assert(r.moreLikeThis("zz_missing").isEmpty)
    assert(r.moreLikeThis(null).isEmpty)
  }

  // ---- field-scoped indexes ----

  test("field indexes: per-role membership/BM25 parity with the filtered corpus; facet counts") {
    val froot = TestSpark.freshDir("r4field")
    val values = FieldIndexes.build(spark, froot, turns, "role", conf)
    assert(values.toSet == turns.select("role").distinct().collect().map(_.getString(0)).toSet)

    for (v <- values) {
      val sub = turns.where(col("role") === v)
      val r = FieldIndexes.reader(spark, froot, "role", v, conf)
      val gotM = r.membership("the").collect().map(_.getString(0)).toSet
      val expM = BruteForce.membership(sub, "the").collect().map(_.getString(0)).toSet
      assert(gotM == expM, s"role=$v membership")
      // BM25 uses the RESTRICTED corpus stats — oracle computed on sub
      val gotB = hits(r.bm25TopK(Seq("query", "filter"), 10))
      val expB = hits(BruteForce.bm25(sub, Seq("query", "filter"), 10, conf = conf))
      assert(gotB == expB, s"role=$v bm25")
    }

    val facet = FieldIndexes.facetCounts(spark, froot, "role", values, "the", conf)
      .collect().map(r0 => (r0.getString(0), r0.getLong(1))).toMap
    for (v <- values) {
      val exp = BruteForce.membership(turns.where(col("role") === v), "the").count()
      assert(facet.getOrElse(v, 0L) == exp, s"facet role=$v")
    }
  }

  // ---- snapshot time travel ----

  test("time travel: a version-pinned reader answers from the old corpus; latest sees deletes") {
    val rt = TestSpark.freshDir("r4tt")
    new IndexWriter(spark, rt, conf).fullBuild(turns, "b0")
    val v0 = SegmentStore.latestVersion(spark, rt).get
    val before = new IndexReader(spark, rt, conf).membership("the")
      .collect().map(_.getString(0)).toSet

    new IndexMaintainer(spark, rt, conf).remove(Seq("conv000002", "conv000009"), "d1")

    val pinned = new IndexReader(spark, rt, conf, pinVersion = Some(v0))
    assert(pinned.membership("the").collect().map(_.getString(0)).toSet == before)
    // pinned BM25 also runs against the old stats/postings
    assert(hits(pinned.bm25TopK(Seq("query"), 5)).nonEmpty)

    val latest = new IndexReader(spark, rt, conf).membership("the")
      .collect().map(_.getString(0)).toSet
    assert(latest == before -- Set("conv000002", "conv000009"))
  }

  // ---- dedup keep-one + deterministic sampling ----

  test("dropExactDuplicates keeps exactly each group's min-id representative") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (5L, "a  b   c"), // same normalized content
      (3L, "x y"), (4L, "z")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("hashSample: deterministic, monotone in the numerator, exact bounds at 0 and 256") {
    val docs = turns.select(col("conv_id").as("doc_id"), col("text"))
    assert(Dedup.hashSample(docs, "text", 0).count() == 0L)
    assert(Dedup.hashSample(docs, "text", 256).count() == docs.count())
    val s64a = Dedup.hashSample(docs, "text", 64).select("doc_id", "text")
      .collect().map(_.toString).toSet
    val s64b = Dedup.hashSample(docs, "text", 64).select("doc_id", "text")
      .collect().map(_.toString).toSet
    assert(s64a == s64b && s64a.nonEmpty && s64a.size < docs.count())
    val s128 = Dedup.hashSample(docs, "text", 128).select("doc_id", "text")
      .collect().map(_.toString).toSet
    assert(s64a.subsetOf(s128))
  }
}

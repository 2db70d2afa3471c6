package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.{BruteForce, IndexReader}

/** Round-5u layer: pinned query, rank_feature (saturation + log), span_or in
  * span_near, and the bucket_script / normalize / cumulative_cardinality /
  * rate / boxplot / top_metrics aggregations — each pinned against a
  * hand-computed or brute-force oracle on a tiny corpus.
  */
class Round5uSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L // 2024-01-01T00:00:00Z

  /** (conv, secondsOffset, text) rows — one turn per conv, ts = epoch + off. */
  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def build(corpus: DataFrame, positions: Boolean = false): IndexReader = {
    val root = TestSpark.freshDir("r5u")
    val w = new IndexWriter(spark, root, conf)
    w.fullBuild(corpus, "b0")
    if (positions) w.buildPositions(corpus, "pos1")
    new IndexReader(spark, root, conf)
  }

  private def members(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  // ---------------------------------------------------------------- span_or

  test("spanNearAny: a slot matches through EITHER alternative; window exact at the boundary") {
    val corpus = mkTurns(
      ("a", 0, "agg x x x x batch"),   // agg@0, batch@5: 5 <= slop+1 = 5 ✓
      ("b", 60, "scan y batch"),        // matches only via the scan alternative
      ("c", 120, "agg z z"),            // no batch
      ("d", 180, "batch q q q q q agg"),// distance 6 > 5 ✗
      ("e", 240, "x agg x scan batch")) // either alternative in range
    val r = build(corpus, positions = true)
    val got = members(r.spanNearAny(Seq(Seq("agg", "scan"), Seq("batch")), slop = 4))
    assert(got == Set("a", "b", "e"))
    // plain spanNear on one alternative misses the scan-only doc
    assert(!members(r.spanNear(Seq("agg", "batch"), slop = 4)).contains("b"))
    // single slot degenerates to union membership of the alternatives
    assert(members(r.spanNearAny(Seq(Seq("agg", "scan")), slop = 0)) ==
      Set("a", "b", "c", "d", "e"))
  }

  // ----------------------------------------------------- ordered intervals

  test("intervalsOrdered: strict order, total slack ≤ max_gaps, boundary exact") {
    val corpus = mkTurns(
      ("a", 0, "scan part filter"),            // gaps 0 ✓
      ("b", 60, "filter part scan"),           // reversed — ordered ✗
      ("c", 120, "scan x part y filter"),      // gaps 2 ✓
      ("d", 180, "scan x x x part filter"),    // gaps 3 = budget ✓
      ("e", 240, "scan x x x x part filter"),  // gaps 4 ✗
      ("f", 300, "scan part z"))               // slot missing ✗
    val r = build(corpus, positions = true)
    val got = members(r.intervalsOrdered(Seq("scan", "part", "filter"), maxGaps = 3))
    assert(got == Set("a", "c", "d"))
    // the unordered span_near at the same width DOES take the reversal
    assert(members(r.spanNear(Seq("scan", "part", "filter"), slop = 3))
      .contains("b"))
    // repeated term: two strictly increasing occurrences required
    val r2 = build(mkTurns(("g", 0, "dup dup"), ("h", 60, "dup x")),
      positions = true)
    assert(members(r2.intervalsOrdered(Seq("dup", "dup"), maxGaps = 0)) == Set("g"))
  }

  // ----------------------------------------------------------------- pinned

  test("pinned: live promoted ids first in compacted order, organic fills to k excluding them") {
    val corpus = mkTurns(
      ("a", 0, "t t t t"), ("b", 60, "t t t"), ("c", 120, "t t"),
      ("d", 180, "t"), ("e", 240, "t zz"), ("f", 300, "zz zz"))
    val r = build(corpus)
    val got = r.pinned(Seq("no-such-doc", "d", "f"), Seq("t"), 4)
      .collect().map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) Double.NaN else x.getDouble(2)))
    // dead id drops, ranks compact: d=1, f=2 with null scores
    assert(got.take(2).map(x => (x._1, x._2)).toSeq == Seq((1L, "d"), (2L, "f")))
    assert(got.take(2).forall(_._3.isNaN))
    // organic = brute-force top-k minus the pinned ids, ranks 3..4
    val brute = BruteForce.bm25(corpus, Seq("t"), 10, conf = conf)
      .collect().map(x => (x.getString(0), x.getDouble(1)))
      .filterNot(x => Set("d", "f").contains(x._1)).take(2)
    assert(got.drop(2).map(x => (x._1, x._2)).toSeq ==
      Seq(3L, 4L).zip(brute.map(_._1)))
    assert(got.drop(2).map(_._3).zip(brute.map(_._2))
      .forall { case (g, b) => math.abs(g - b) < 5e-5 }) // 4dp presentation
    // more live pins than k: the pinned prefix alone, cut at k
    val cut = r.pinned(Seq("a", "b", "c"), Seq("t"), 2)
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(cut.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  // ----------------------------------------------------------- rank_feature

  test("rankFeature: BM25 + saturation boost, brute-force parity; missing feature keeps lexical score") {
    val corpus = mkTurns(
      ("a", 0, "t t t pad pad pad pad pad"), ("b", 60, "t t"),
      ("c", 120, "t pad"), ("d", 180, "other"))
    val r = build(corpus)
    val dlMeta = Seq(("a", 8L), ("b", 2L), ("c", 2L)).toDF("conv_id", "dl")
    val got = r.rankFeature(Seq("t"), 3, dlMeta, "conv_id", "dl",
        "saturation", pivot = 4.0, boost = 2.0)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    val lex = BruteForce.bm25(corpus, Seq("t"), 10, conf = conf)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    val dl = Map("a" -> 8.0, "b" -> 2.0, "c" -> 2.0)
    for ((c, s) <- got)
      assert(math.abs(s - (lex(c) + 2.0 * dl(c) / (dl(c) + 4.0))) < 1e-9, c)
    // a matching doc absent from the feature frame keeps its lexical score
    val partial = r.rankFeature(Seq("t"), 3, dlMeta.where(col("conv_id") =!= "b"),
        "conv_id", "dl", "saturation", pivot = 4.0, boost = 2.0)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(math.abs(partial("b") - lex("b")) < 1e-9)
    // log function form
    val lg = r.rankFeature(Seq("t"), 3, dlMeta, "conv_id", "dl",
        "log", boost = 0.5, scaling = 1.0)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    for ((c, s) <- lg)
      assert(math.abs(s - (lex(c) + 0.5 * math.log(1.0 + dl(c)))) < 1e-9, c)
  }

  test("distanceFeature: reciprocal-distance recency boost, both directions; missing date keeps lexical") {
    val corpus = mkTurns(
      ("a", 0, "t x"), ("b", 100, "t y"), ("c", 300, "t z"), ("d", 400, "zz"))
    val r = build(corpus)
    val meta = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:00")),
      ("b", Timestamp.valueOf("2024-01-01 00:01:40")),
      ("c", Timestamp.valueOf("2024-01-01 00:05:00"))).toDF("conv_id", "ts")
    val origin = Timestamp.valueOf("2024-01-01 00:01:40") // = b's ts
    val got = r.distanceFeature(Seq("t"), 3, meta, "conv_id", "ts", origin,
        pivotSecs = 100.0, boost = 2.0)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    val lex = BruteForce.bm25(corpus, Seq("t"), 10, conf = conf)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    val dist = Map("a" -> 100.0, "b" -> 0.0, "c" -> 200.0)
    for ((c, s) <- got)
      assert(math.abs(s - (lex(c) + 2.0 * 100.0 / (100.0 + dist(c)))) < 1e-9, c)
    // absent from the date frame → lexical score unchanged
    val partial = r.distanceFeature(Seq("t"), 3,
        meta.where(col("conv_id") =!= "a"), "conv_id", "ts", origin, 100.0, 2.0)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(math.abs(partial("a") - lex("a")) < 1e-9)
  }

  // ------------------------------------------------------------- pipeline aggs

  private lazy val aggCorpus = mkTurns(
    // minute bucket 00:00 — convs a,b hold ta; a holds tb
    ("a", 10, "ta tb"), ("b", 20, "ta"),
    // minute bucket 00:01 — conv c holds ta; d holds tb only
    ("c", 70, "ta"), ("d", 80, "tb"))
  private lazy val aggReader = build(aggCorpus)
  private lazy val aggMeta = aggCorpus.groupBy("conv_id").agg(min(col("ts")).as("ts"))

  test("bucketScript: per-bucket ratio of sibling hit counts, absent sides zero") {
    val got = aggReader.bucketScript("ta", "tb", aggMeta, "conv_id", "ts", "minute")
      .orderBy("bucket").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00", 2L, 1L, 0.6667),
      ("2024-01-01 00:01:00", 1L, 1L, 0.5)))
  }

  test("normalizeAgg: percent_of_sum sums to 1; rescale_0_1 spans [0, 1]") {
    val pos = aggReader.normalizeAgg("ta", aggMeta, "conv_id", "ts", "minute",
        "percent_of_sum").collect().map(x => (x.getString(0), x.getDouble(2))).toMap
    assert(pos == Map("2024-01-01 00:00:00" -> 0.6667, "2024-01-01 00:01:00" -> 0.3333))
    val rs = aggReader.normalizeAgg("ta", aggMeta, "conv_id", "ts", "minute",
        "rescale_0_1").collect().map(x => (x.getString(0), x.getDouble(2))).toMap
    assert(rs == Map("2024-01-01 00:00:00" -> 1.0, "2024-01-01 00:01:00" -> 0.0))
  }

  test("cumulativeCardinality: first-seen cumulative distinct; later activity of a known conv adds nothing") {
    // conv a active in buckets 0 and 2; conv b first seen in bucket 1
    val turns = mkTurns(("a", 0, "ta x"), ("b", 60, "ta y"), ("a", 125, "more"))
    val r = build(mkTurns(("a", 0, "ta x"), ("b", 60, "ta y")))
    val got = r.cumulativeCardinality("ta", turns, "conv_id", "ts", "minute")
      .orderBy("bucket").collect().map(x => (x.getString(0), x.getLong(1)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00", 1L), ("2024-01-01 00:01:00", 2L),
      ("2024-01-01 00:02:00", 2L))) // bucket 2: activity, no NEW conv
  }

  test("rateAgg: matching turns per minute reported per second") {
    val turns = mkTurns(("a", 0, "ta"), ("a", 10, "ta again"), ("b", 70, "ta"))
    val r = build(turns)
    val got = r.rateAgg("ta", turns, "conv_id", "ts", "minute", "second")
      .orderBy("bucket").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00", 2L, 0.0333), ("2024-01-01 00:01:00", 1L, 0.0167)))
  }

  test("percentilesBucket: exact interpolated quartiles of the bucket hits") {
    val row = aggReader.percentilesBucket("ta", aggMeta, "conv_id", "ts", "minute")
      .collect()(0)
    // hits [2, 1] sorted [1, 2]: p25 = 1.25, p50 = 1.5, p75 = 1.75
    assert((row.getDouble(0), row.getDouble(1), row.getDouble(2)) == ((1.25, 1.5, 1.75)))
  }

  test("tTestAgg: Welch t with sample variances; overlap contributes to both sides") {
    val corpus = mkTurns(
      ("a", 0, "ga x"),  ("b", 60, "ga x y z"),
      ("c", 120, "gb w x y"), ("d", 180, "gb w x y z a"),
      ("e", 240, "gb w x y z a b"), ("f", 300, "neither"))
    val r = build(corpus)
    val dlMeta = Seq(("a", 2.0), ("b", 4.0), ("c", 4.0), ("d", 6.0),
      ("e", 8.0), ("f", 1.0)).toDF("conv_id", "dl")
    val row = r.tTestAgg("ga", "gb", dlMeta, "conv_id", "dl").collect()(0)
    // A {2,4}: μ=3 s²=2; B {4,6,8}: μ=6 s²=4; t = −3/√(2/2 + 4/3) = −1.964
    assert((row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3),
      row.getDouble(4)) == ((2L, 3L, 3.0, 6.0, -1.964)))
    // overlapping filters: a doc matching both terms appears on both sides
    val both = mkTurns(("a", 0, "ga gb"), ("b", 60, "ga"), ("c", 120, "gb"))
    val r2 = build(both)
    val m2 = Seq(("a", 2.0), ("b", 4.0), ("c", 6.0)).toDF("conv_id", "dl")
    val row2 = r2.tTestAgg("ga", "gb", m2, "conv_id", "dl").collect()(0)
    assert((row2.getLong(0), row2.getLong(1)) == ((2L, 2L)))
  }

  // --------------------------------------------------------------- metric aggs

  test("boxplotAgg: exact linearly-interpolated five-number summary") {
    val corpus = mkTurns(
      ("a", 0, "t x"),          // dl 2
      ("b", 60, "t x y z"),     // dl 4
      ("c", 120, "t x y z"),    // dl 4
      ("d", 180, "t x y z w"),  // dl 5
      ("e", 240, "zz"))         // no match — excluded
    val r = build(corpus)
    val dlMeta = Seq(("a", 2.0), ("b", 4.0), ("c", 4.0), ("d", 5.0), ("e", 99.0))
      .toDF("conv_id", "dl")
    val row = r.boxplotAgg("t", dlMeta, "conv_id", "dl").collect()(0)
    // sorted [2,4,4,5]: q1 at 0.75 → 3.5, median at 1.5 → 4, q3 at 2.25 → 4.25
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3),
      row.getDouble(4), row.getDouble(5)) == ((4L, 2.0, 3.5, 4.0, 4.25, 5.0)))
  }

  // ---------------------------------------------------------- streaming dedup

  test("streamExactGroups ≡ batch exactGroups; watermarked drop keeps one row per digest") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = killa.dedup.Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = killa.streaming.StreamOps.streamExactGroups(spark,
        "/root/testdata/sf0.001/documents.parquet", "r5u_sdedup")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // append form: one surviving row per digest (the bounded input fits one
    // horizon, so the watermark never re-admits)
    val out = TestSpark.freshDir("r5u-dd-out")
    val ckp = TestSpark.freshDir("r5u-dd-ckp")
    killa.streaming.StreamOps.dedupStreamToPath(spark,
      "/root/testdata/sf0.001/documents.parquet", out, ckp)
    val kept = spark.read.parquet(out)
    assert(kept.count() == batch.size)
    val keptDigests = kept.select(killa.text.TextOps.fingerprintMd5(col("text")))
      .collect().map(_.getString(0)).toSet
    assert(keptDigests == batch.map(_._1))
  }

  test("topMetricsAgg: per key value, the metric of the top doc by (sort desc, conv asc)") {
    val corpus = mkTurns(
      ("a", 0, "t"), ("b", 60, "t"), ("c", 120, "t"), ("d", 120, "t"))
    val r = build(corpus)
    val meta = Seq(
      ("a", "k1", Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("b", "k1", Timestamp.valueOf("2024-01-01 00:01:00"), 20.0),
      ("c", "k2", Timestamp.valueOf("2024-01-01 00:02:00"), 30.0),
      ("d", "k2", Timestamp.valueOf("2024-01-01 00:02:00"), 40.0) // ts tie → conv asc wins
    ).toDF("conv_id", "kv", "sv", "m")
    val got = r.topMetricsAgg("t", meta, "conv_id", "kv", "sv", "m")
      .orderBy("value").collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getDouble(3)))
    assert(got.toSeq == Seq(
      ("k1", "b", "2024-01-01 00:01:00", 20.0),
      ("k2", "c", "2024-01-01 00:02:00", 30.0)))
  }
}

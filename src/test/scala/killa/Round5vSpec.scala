package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.IndexReader

/** Round-5v layer: any_of intervals, span_multi prefix spans, sparse_vector
  * weighted-term scoring, sliced scored export, terms lookup, knn similarity
  * floor, and temperature mixture resampling — each pinned against a
  * hand-computed oracle or an exact partition/subset law on a tiny corpus.
  */
class Round5vSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def build(corpus: DataFrame, positions: Boolean = false): IndexReader = {
    val root = TestSpark.freshDir("r5v")
    val w = new IndexWriter(spark, root, conf)
    w.fullBuild(corpus, "b0")
    if (positions) w.buildPositions(corpus, "pos1")
    new IndexReader(spark, root, conf)
  }

  private def members(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  // ------------------------------------------------------- any_of intervals

  test("intervalsAnyOf: union of ordered alternatives; one alternative degenerates to intervalsOrdered") {
    val corpus = mkTurns(
      ("a", 0, "scan x filter"),      // alt 1 ordered, gap 1 ≤ 3 ✓
      ("b", 60, "filter x scan"),     // alt 1 present but wrong order ✗
      ("c", 120, "agg y y batch"),    // alt 2 ordered, slack 2 ≤ 3 ✓
      ("d", 180, "agg q q q q batch"),// slack 4 > 3 ✗
      ("e", 240, "scan filter agg batch")) // both alternatives ✓ (dedup to one row)
    val r = build(corpus, positions = true)
    val alts = Seq(Seq("scan", "filter"), Seq("agg", "batch"))
    assert(members(r.intervalsAnyOf(alts, maxGaps = 3)) == Set("a", "c", "e"))
    // disjunction law: any_of = union of the per-alternative ordered matches
    val viaUnion = alts.map(a => members(r.intervalsOrdered(a, 3))).reduce(_ union _)
    assert(members(r.intervalsAnyOf(alts, 3)) == viaUnion)
    assert(members(r.intervalsAnyOf(Seq(Seq("scan", "filter")), 3)) ==
      members(r.intervalsOrdered(Seq("scan", "filter"), 3)))
    assert(members(r.intervalsAnyOf(Seq(Seq.empty, Seq.empty), 3)).isEmpty)
  }

  // ------------------------------------------------------------- span_multi

  test("spanMultiNear: prefix expands to a span_or slot; the expansion cap is live") {
    val corpus = mkTurns(
      ("a", 0, "scan x batch"),    // scan within slop-2 window of batch ✓
      ("b", 60, "sort batch"),     // sort also matches the s* slot ✓
      ("c", 120, "spark y batch"), // spark is 3rd lexicographic s-term
      ("d", 180, "scan q q q q batch"), // |5-0| = 5 > slop+1 = 3 ✗
      ("e", 240, "batch only here"))    // no s* term ✗
    val r = build(corpus, positions = true)
    // dictionary s-terms here: scan, sort, spark (lexicographic)
    assert(members(r.spanMultiNear("s", 8, Seq("batch"), slop = 2)) ==
      Set("a", "b", "c"))
    // cap at 2 keeps scan+sort only: spark falls past the deterministic cap
    assert(members(r.spanMultiNear("s", 2, Seq("batch"), slop = 2)) ==
      Set("a", "b"))
    assert(members(r.spanMultiNear("zz", 8, Seq("batch"), slop = 2)).isEmpty)
  }

  // ---------------------------------------------------------- sparse_vector

  test("sparseVector: score is exactly Σ weight·tf, no corpus statistics; ties break conv asc") {
    val corpus = mkTurns(
      ("a", 0, "hot hot hot"),        // 3·2.0 = 6.0
      ("b", 60, "hot warm warm"),     // 2.0 + 2·0.5 = 3.0
      ("c", 120, "warm warm warm warm warm warm"), // 6·0.5 = 3.0 (tie with b)
      ("d", 180, "cold cold"))        // no query term
    val r = build(corpus)
    val got = r.sparseVector(Map("hot" -> 2.0, "warm" -> 0.5), 10)
      .collect().map(x => (x.getString(0), x.getDouble(1)))
    assert(got.toSeq == Seq(("a", 6.0), ("b", 3.0), ("c", 3.0)))
    // k truncates after the (score desc, conv asc) order
    assert(r.sparseVector(Map("hot" -> 2.0, "warm" -> 0.5), 2)
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    intercept[IllegalArgumentException] {
      r.sparseVector(Map("hot" -> 0.0), 5)
    }
  }

  // ---------------------------------------------------------- sliced export

  test("slicedExport: slices are pairwise disjoint and union EXACTLY to the full scored export") {
    val corpus = mkTurns((0 until 40).map(i =>
      (f"c$i%03d", i, if (i % 3 == 0) "alpha beta" else "alpha gamma")): _*)
    val r = build(corpus)
    val full = r.bm25ScoredAll(Seq("alpha")).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSet
    val slices = (0 until 3).map(i =>
      r.slicedExport(Seq("alpha"), i, 3).collect()
        .map(x => (x.getString(0), x.getDouble(1))).toSet)
    assert(slices.reduce(_ union _) == full)
    for (i <- 0 until 3; j <- (i + 1) until 3)
      assert(slices(i).intersect(slices(j)).isEmpty)
    // every slice is non-trivial at this corpus size (40 docs / 3 slices)
    assert(slices.forall(_.nonEmpty))
    assert(r.slicedExport(Seq("alpha"), 0, 1).collect().length == full.size)
    intercept[IllegalArgumentException] { r.slicedExport(Seq("alpha"), 3, 3) }
  }

  // ------------------------------------------------------------ terms lookup

  test("termsLookup: the lookup doc's terms drive an OR membership; the doc matches itself") {
    val corpus = mkTurns(
      ("a", 0, "alpha beta"),
      ("b", 60, "beta gamma"),
      ("c", 120, "gamma delta"),
      ("d", 180, "epsilon zeta"))
    val r = build(corpus)
    // a's terms {alpha, beta}: a itself and b (shares beta); c/d share nothing
    assert(members(r.termsLookup(corpus, "conv_id", "text", "a")) == Set("a", "b"))
    assert(members(r.termsLookup(corpus, "conv_id", "text", "zz_absent")).isEmpty)
  }

  // ---------------------------------------------------- knn similarity floor

  test("thresholdTopK: subset of bruteForceTopK with ranks preserved; only a rank suffix drops") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val q = emb.where(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val all = killa.ann.Ann.bruteForceTopK(emb, "vec_id", "embedding",
      q, "q_id", "embedding", 3).collect()
      .map(x => (x.getLong(1), x.getDouble(2), x.getInt(3))).toSeq
    val kept = killa.ann.Ann.thresholdTopK(emb, "vec_id", "embedding",
      q, "q_id", "embedding", 3, minCosine = 0.7).collect()
      .map(x => (x.getLong(1), x.getDouble(2), x.getInt(3))).toSeq
    assert(kept.toSet.subsetOf(all.toSet))
    assert(kept.forall(_._2 >= 0.7))
    // ranks survive the filter and form a gap-free prefix of the base ranks
    assert(kept.map(_._3) == (1 to kept.length))
    // the floor actually prunes here (vec 2 is orthogonal to the query)
    assert(kept.length < all.length && kept.nonEmpty)
  }

  // ----------------------------------------------------- temperature sample

  // --------------------------------------------------- msearch + rank_eval

  test("msearch: slot-tagged union of independent exact top-ks") {
    val corpus = mkTurns(
      ("a", 0, "alpha alpha"), ("b", 60, "alpha beta"), ("c", 120, "beta beta"))
    val r = build(corpus)
    val got = r.msearch(Seq("s1" -> Seq("alpha"), "s2" -> Seq("beta")), 2)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    val s1 = r.bm25TopK(Seq("alpha"), 2).collect().map("s1" -> _.getString(0)).toSet
    val s2 = r.bm25TopK(Seq("beta"), 2).collect().map("s2" -> _.getString(0)).toSet
    assert(got == (s1 union s2))
    intercept[IllegalArgumentException] {
      r.msearch(Seq("x" -> Seq("alpha"), "x" -> Seq("beta")), 2)
    }
  }

  test("rankEval: precision/recall/MRR hand-computed; no-hit and no-result queries report zeros") {
    val corpus = mkTurns(
      ("a", 0, "alpha alpha alpha"), // top for alpha
      ("b", 60, "alpha beta"),
      ("c", 120, "alpha gamma gamma gamma gamma gamma gamma gamma gamma"))
    val r = build(corpus)
    val judgments = Seq(
      ("q1", "a"), ("q1", "zz"),  // judged: a (hit, rank 1), zz (never returned)
      ("q2", "b"),                // q2 searches a term with no matches
      ("q3", "b")).toDF("qid", "conv")
    val got = r.rankEval(Seq(
        "q1" -> Seq("alpha"), "q2" -> Seq("qqq_absent"), "q3" -> Seq("beta")),
        judgments, "qid", "conv", k = 2)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3)))).toMap
    // q1: top-2 of alpha = (a, then b or c by score); a relevant at rank 1
    assert(got("q1") == ((0.5, 0.5, 1.0)))
    // q2: no results at all → all zeros
    assert(got("q2") == ((0.0, 0.0, 0.0)))
    // q3: beta's only match is b, judged relevant, rank 1 of a 1-row list
    assert(got("q3") == ((0.5, 1.0, 1.0)))
  }

  // ------------------------------------------------- gap-filled histogram

  test("dateHistogramFilled: full ladder with zero buckets; out-of-bounds data still appears") {
    val corpus = mkTurns(
      ("a", 0, "hit x"),     // minute 00:00
      ("b", 120, "hit y"),   // minute 00:02
      ("c", 600, "hit z"))   // minute 00:10 — OUTSIDE the [00:00, 00:04] ladder
    val r = build(corpus)
    val meta = corpus.select(col("conv_id"), col("ts"))
    val got = r.dateHistogramFilled("hit", meta, "conv_id", "ts", "minute",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:04:00"))
      .orderBy("bucket").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got == Seq(
      ("2024-01-01 00:00:00", 1L), ("2024-01-01 00:01:00", 0L),
      ("2024-01-01 00:02:00", 1L), ("2024-01-01 00:03:00", 0L),
      ("2024-01-01 00:04:00", 0L),
      ("2024-01-01 00:10:00", 1L))) // extended_bounds extends, never truncates
    intercept[IllegalArgumentException] {
      r.dateHistogramFilled("hit", meta, "conv_id", "ts", "week",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:04:00"))
    }
  }

  // ---------------------------------------------- transcript well-formedness

  test("validateTranscripts: dense-index holes, role repeats, and empty turns are each caught") {
    val rows = Seq(
      // good: dense 0..2, alternating, non-empty
      ("g", 0, "user", "a"), ("g", 1, "assistant", "b"), ("g", 2, "user", "c"),
      // hole: idx 0, 2 (missing 1)
      ("h", 0, "user", "a"), ("h", 2, "assistant", "b"),
      // duplicate idx: 0, 0, 1
      ("d", 0, "user", "a"), ("d", 0, "assistant", "b"), ("d", 1, "user", "c"),
      // role repeat at idx 1→2
      ("r", 0, "user", "a"), ("r", 1, "assistant", "b"), ("r", 2, "assistant", "c"),
      // empty turn (whitespace only)
      ("e", 0, "user", "a"), ("e", 1, "assistant", "   "))
    val turns = rows.map { case (c, i, role, txt) =>
      killa.model.Turn(c, i, role, txt, "", new java.sql.Timestamp(epoch))
    }.toDS().toDF()
    val got = killa.text.TextOps.validateTranscripts(turns, "conv_id",
      "turn_idx", "role", "text").collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4)))).toMap
    assert(got("g") == ((3L, true, true, false)))
    assert(got("h") == ((2L, false, true, false)))
    assert(got("d")._2 == false) // duplicate idx breaks density
    assert(got("r") == ((3L, true, false, false)))
    assert(got("e") == ((2L, true, true, true)))
  }

  // ------------------------------------------------------ loss-mask packing

  test("packTranscripts: conv-order offsets, trainable-token accounting, boundary spans") {
    val rows = Seq(
      ("a", 0, "user", "u1 u2 u3"), ("a", 1, "assistant", "a1 a2"),   // 5 tokens, 2 train
      ("b", 0, "user", "u1"), ("b", 1, "assistant", "a1 a2 a3 a4"),   // 5 tokens, 4 train
      ("c", 0, "user", "u1 u2"), ("c", 1, "assistant", "a1"))         // 3 tokens, 1 train
    val turns = rows.map { case (c, i, role, txt) =>
      killa.model.Turn(c, i, role, txt, "", new java.sql.Timestamp(epoch))
    }.toDS().toDF()
    val got = killa.text.Packing.packTranscripts(turns, "conv_id", "role",
        "text", budget = 8L).orderBy("conv_id").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // offsets: a@0, b@5, c@10; seq_id = offset / 8 → a:0, b:0 (spans into 1), c:1
    assert(got.toSeq == Seq(
      ("a", 5L, 2L, 0L, 0L), ("b", 5L, 4L, 5L, 0L), ("c", 3L, 1L, 10L, 1L)))
  }

  test("temperatureSample: data-derived per-source rates flatten the mixture, deterministically") {
    val docs = (0 until 1024).map(i =>
      (i.toLong, if (i < 960) "big" else "small", s"tok$i uniq${i * 7}"))
      .toDF("doc_id", "source", "text")
    val kept = killa.dedup.Dedup.temperatureSample(docs, "text", "source", rho = 0.5)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigRate = bySrc.getOrElse("big", 0L).toDouble / 960
    val smallRate = bySrc.getOrElse("small", 0L).toDouble / 64
    // the largest source keeps ~rho; a 15x smaller source keeps
    // ~rho·sqrt(15) ≈ 1.94 — capped at 1.0, so near-everything
    assert(math.abs(bigRate - 0.5) < 0.1, s"bigRate $bigRate")
    assert(smallRate == 1.0, s"smallRate $smallRate") // threshold caps at 2^32
    // deterministic: same input → identical row set, and a subset of df
    val again = killa.dedup.Dedup.temperatureSample(docs, "text", "source", 0.5)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      killa.dedup.Dedup.temperatureSample(docs, "text", "source", 0.0)
    }
  }
}

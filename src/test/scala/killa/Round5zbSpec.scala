package killa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.ann.Ann
import killa.build.IndexWriter
import killa.dedup.Dedup
import killa.query.{BruteForce, IndexReader, ShardedSearch}
import killa.synth.Synth
import killa.text.{Bpe, TextOps}

/** Round-5zb layer: min_score seeding the WAND threshold, indices_boost,
  * bucket_correlation, SemDeDup, DSIR selection, BPE corpus encode,
  * bigram-LM scoring, and PMI collocations.
  */
class Round5zbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 40, turnsPerConv = 5, seed = 31L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5zb")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  private def hits(df: DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  // ---- min_score ----

  test("minScore = -inf is a no-op; floor above the max empties the result") {
    val terms = Seq("query", "filter")
    assert(approxEq(hits(reader.bm25TopK(terms, 10)),
      hits(reader.bm25TopK(terms, 10, minScore = Double.NegativeInfinity))))
    val top = hits(reader.bm25TopK(terms, 1))
    assert(reader.bm25TopK(terms, 10, minScore = top.head._2 + 1.0).count() == 0L)
  }

  test("minScore equals filter-then-topk of the full scored order (admission-time, never a hole)") {
    val terms = Seq("query", "filter", "join")
    val all = hits(BruteForce.bm25(turns, terms, 10000, conf = conf))
    assert(all.length > 10)
    // a floor strictly between two adjacent scores, away from fp noise
    val gapIdx = all.indices.dropRight(1)
      .find(i => all(i)._2 - all(i + 1)._2 > 1e-6).get
    val floor = (all(gapIdx)._2 + all(gapIdx + 1)._2) / 2.0
    val want = all.filter(_._2 >= floor).take(7)
    val got = hits(reader.bm25TopK(terms, 7, minScore = floor))
    assert(approxEq(got, want))
    // the result may hold fewer than k rows — that is the contract
    val gotAll = hits(reader.bm25TopK(terms, 10000, minScore = floor))
    assert(gotAll.length == all.count(_._2 >= floor))
  }

  test("minScore composes with conjunctive and mustNot") {
    val all = hits(BruteForce.bm25(turns, Seq("the", "query"), 10000,
      conjunctive = true, conf = conf, mustNot = Seq("dup")))
    assume(all.length > 4)
    val floor = (all(1)._2 + all(2)._2) / 2.0
    val want = all.filter(_._2 >= floor)
    val got = hits(reader.bm25TopK(Seq("the", "query"), 10000,
      conjunctive = true, mustNot = Seq("dup"), minScore = floor))
    assert(approxEq(got, want))
  }

  // ---- indices_boost ----

  private lazy val shardRoots: Seq[String] = Seq(0, 1).map { par =>
    val r = TestSpark.freshDir(s"r5zb-shard$par")
    val part = turns.where(expr(s"CAST(substring(conv_id, 5) AS INT) % 2 = $par"))
    new IndexWriter(spark, r, conf).fullBuild(part, s"b-s$par")
    r
  }
  private lazy val shardReaders = shardRoots.map(new IndexReader(spark, _, conf))

  test("indices_boost with unit boosts equals the plain sharded merge") {
    val terms = Seq("query", "filter")
    val plain = hits(ShardedSearch.bm25TopK(spark, shardReaders, terms, 10))
    val unit = hits(ShardedSearch.bm25TopKIndicesBoost(spark,
      shardReaders.map((_, 1.0)), terms, 10))
    assert(approxEq(unit, plain))
  }

  test("indices_boost equals scale-by-shard-then-resort of the single-corpus scores") {
    val terms = Seq("query", "filter", "join")
    val (w0, w1) = (2.0, 0.5) // exact powers of two — scaling is IEEE-exact
    val base = hits(BruteForce.bm25(turns, terms, 10000, conf = conf))
    val want = base.map { case (c, s) =>
      val par = c.drop(4).toInt % 2
      (c, if (par == 0) s * w0 else s * w1)
    }.sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(ShardedSearch.bm25TopKIndicesBoost(spark,
      Seq((shardReaders(0), w0), (shardReaders(1), w1)), terms, 10))
    assert(approxEq(got, want))
  }

  // ---- bucket_correlation ----

  private lazy val tsMeta: DataFrame = turns.select("conv_id").distinct()
    .withColumn("ts", expr(
      "timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, CAST(substring(conv_id, 5) AS INT) * 37)"))

  test("bucketCorrelation: a series against itself correlates 1.0") {
    val row = reader.bucketCorrelation("query", "query", tsMeta, "conv_id",
      "ts", "minute").collect()(0)
    assert(row.getLong(0) >= 2L)
    assert(row.getDouble(1) == 1.0)
  }

  test("bucketCorrelation: bucket count is the UNION of the two series (zero-filled); zero variance → null") {
    // planted corpus: 'aa' in every conv (6 minute-buckets), 'bb' only in
    // the first two — n_buckets must be the UNION (6), and the constant
    // 'aa' series has zero variance so the correlation is null
    val planted = (0 until 6).map { i =>
      (f"conv$i%06d", 0, "user", if (i < 2) "aa bb" else "aa xx", "", new java.sql.Timestamp(0L))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val r = TestSpark.freshDir("r5zb-bc")
    new IndexWriter(spark, r, conf).fullBuild(planted, "b0")
    val rd = new IndexReader(spark, r, conf)
    val meta = planted.select("conv_id").distinct()
      .withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, CAST(substring(conv_id, 5) AS INT) * 60)"))
    val row = rd.bucketCorrelation("aa", "bb", meta, "conv_id", "ts", "minute")
      .collect()(0)
    assert(row.getLong(0) == 6L)
    assert(row.isNullAt(1)) // corr undefined for a constant series
    // and with variance on both sides the union zero-fill drives the sign:
    // 'bb' (first two minutes) vs 'xx' (last four) are anti-correlated
    val row2 = rd.bucketCorrelation("bb", "xx", meta, "conv_id", "ts", "minute")
      .collect()(0)
    assert(row2.getLong(0) == 6L)
    assert(row2.getDouble(1) == -1.0)
  }

  // ---- pseudo-relevance feedback ----

  test("prfTopK: fbTerms = 0 equals the plain base query") {
    assert(approxEq(hits(reader.prfTopK(Seq("query"), 10, fbDocs = 5,
      fbTerms = 0, beta = 0.5, maxDfPct = 100)),
      hits(reader.bm25TopK(Seq("query"), 10))))
  }

  test("prfTopK equals the hand-composed two-pass (selection + boosted requery)") {
    val terms = Seq("shared_0") // mid-frequency in the Synth vocabulary
    val (fbDocs, fbTerms, beta) = (5, 2, 0.5)
    // pass 1: feedback page
    val fb = reader.bm25TopKRows(terms, fbDocs).map(_._1).toSet
    // expansion selection recomputed relationally from the raw turns
    val toks = turns.select(col("conv_id"),
      explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("term"))
    val tf = toks.groupBy("conv_id", "term").agg(count(lit(1)).as("tf"))
    val stf = tf.where(col("conv_id").isin(fb.toSeq: _*))
      .where(!col("term").isin(terms: _*))
      .groupBy("term").agg(sum(col("tf")).as("stf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val expansion = stf.join(dfs, "term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (t, s, d) => (-s, d, t) }.take(fbTerms).map(_._1).toSeq
    assert(expansion.length == fbTerms)
    // pass 2: boosted requery through the ordinary kernel
    val want = hits(reader.bm25TopK(terms ++ expansion, 10,
      boosts = expansion.map(_ -> beta).toMap))
    val got = hits(reader.prfTopK(terms, 10, fbDocs, fbTerms, beta,
      maxDfPct = 100))
    assert(approxEq(got, want))
    // the expansion genuinely changed the ranking vs the base query
    assert(got.map(_._1) != hits(reader.bm25TopK(terms, 10)).map(_._1) ||
      got.map(_._2) != hits(reader.bm25TopK(terms, 10)).map(_._2))
  }

  // ---- SemDeDup ----

  test("semDedupKeep: intra-cell near-dup drops the HIGHER id; boundary pairs are never compared") {
    val vecs = Seq(
      (1L, Seq(1.0f, 1.0f, 0.90f, 0.10f)),   // cell (+,+) = 3
      (7L, Seq(1.0f, 1.0f, 0.90f, 0.11f)),   // same cell, cosine ≈ 1 → dropped
      (3L, Seq(-1.0f, 1.0f, 0.90f, 0.10f)),  // near-identical DIRECTION to 1 in
                                             // dims 2-4 but different cell → kept
      (4L, Seq(1.0f, 1.0f, -0.90f, -0.9f))   // same cell as 1, low cosine → kept
    ).toDF("vec_id", "embedding")
    val kept = Ann.semDedupKeep(vecs, "vec_id", "embedding", cellBits = 2, tau = 0.9)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("semDedupKeep: tau above every cosine keeps everything") {
    val vecs = (0L until 12L).map(i => (i, Seq.tabulate(6)(d =>
      (((killa.util.Hashing.fnv1a64(s"$i:$d") % 1000L) / 500.0f) - 1.0f))))
      .toDF("vec_id", "embedding")
    val kept = Ann.semDedupKeep(vecs, "vec_id", "embedding", cellBits = 3, tau = 1.1)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == (0L until 12L).toSeq)
  }

  // ---- DSIR ----

  test("dsirTopN: target == corpus makes every weight exactly 0.0; ties break id asc") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "gamma alpha"),
      (4L, "alpha alpha")).toDF("doc_id", "text")
    val got = Dedup.dsirTopN(docs, "doc_id", "text", docs.select("text"), "text", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 0.0), (2L, 0.0), (3L, 0.0)))
  }

  test("dsirTopN: docs made of target-heavy tokens outrank the rest") {
    val docs = ((1L to 20L).map(i => (i, s"common tokens here n$i")) ++
      Seq((21L, "zzz zzz zzz zzz"), (22L, "zzz zzz zzz common")))
      .toDF("doc_id", "text")
    val target = Seq("zzz zzz zzz zzz zzz").toDF("text")
    val top = Dedup.dsirTopN(docs, "doc_id", "text", target, "text", 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(21L, 22L))
  }

  // ---- BPE encode ----

  test("encodeTokenCounts: no merges = character counts; merges shrink exactly") {
    val docs = Seq((1L, "ab ab c"), (2L, "abc")).toDF("doc_id", "text")
    val noMerge = Bpe.encodeTokenCounts(docs, "doc_id", "text", Nil)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(noMerge == Map(1L -> 5L, 2L -> 3L)) // a|b a|b c ; a|b|c
    val merged = Bpe.encodeTokenCounts(docs, "doc_id", "text", Seq(("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == Map(1L -> 3L, 2L -> 2L)) // ab ab c ; ab|c
    val chained = Bpe.encodeTokenCounts(docs, "doc_id", "text",
      Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(chained == Map(1L -> 3L, 2L -> 1L)) // 'abc' fuses fully
  }

  test("encodeTokenCounts agrees with per-word segment() totals under trained merges") {
    val docs = turns.select(col("conv_id").as("id"), col("text"))
    val merges = Bpe.train(turns.select("text"), "text", 4)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val viaSegment = docs
      .select(col("id"), explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("word"))
    val segmented = Bpe.segment(viaSegment, "word", merges)
      .groupBy("id").agg(sum(size(col("pieces"))).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = Bpe.encodeTokenCounts(docs, "id", "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == segmented)
  }

  // ---- winnowing ----

  test("winnowFingerprints: every full window selects; guarantee — a shared k+w-1 run shares a fingerprint") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      // doc 2 embeds doc 1's tokens d..i (6 = k+w-1 tokens) at another offset
      (2L, "x y z d e f g h i q r")).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // the winnowing guarantee: the shared 6-token run "d e f g h i" must
    // contribute at least one COMMON fingerprint hash
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
    // density: selections ≤ number of full windows, ≥ 1 per document
    assert(fp.count(_._1 == 1L) >= 1 && fp.count(_._1 == 1L) <= 5)
    // every selected position is a valid gram position of a full window
    val ng1 = 10 - 2 // grams of doc 1
    assert(fp.filter(_._1 == 1L).forall(t => t._2 >= 1 && t._2 <= ng1))
  }

  test("winnowFingerprints: identical texts fingerprint identically; short docs have no full window") {
    val docs = Seq((1L, "p q r s t u v"), (2L, "p q r s t u v"),
      (3L, "p q r s")).toDF("doc_id", "text") // doc 3: 2 grams < w
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val d1 = fp.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet
    val d2 = fp.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet
    assert(d1 == d2 && d1.nonEmpty)
    assert(!fp.exists(_._1 == 3L)) // strict-window contract
  }

  // ---- bigram LM ----

  test("bigramLogProb: hand-computed toy corpus") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    // c(a,b)=2, c(a,c)=1, c(a·)=3: docs 1,2 → ln(2/3); doc 3 → ln(1/3);
    // doc 4 has no bigram → absent
    val l23 = BigDecimal(math.log(2.0 / 3.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val l13 = BigDecimal(math.log(1.0 / 3.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 1L, l23), (2L, 1L, l23), (3L, 1L, l13)))
  }

  test("bigramLogProb: bigrams never cross a row (turn) boundary") {
    val oneRow = Seq((1L, "a b c")).toDF("doc_id", "text")
    val twoRows = Seq((1L, "a b"), (1L, "c")).toDF("doc_id", "text")
    val n1 = TextOps.bigramLogProb(oneRow, "doc_id", "text")
      .collect()(0).getLong(1)
    val n2 = TextOps.bigramLogProb(twoRows, "doc_id", "text")
      .collect()(0).getLong(1)
    assert(n1 == 2L && n2 == 1L) // (a,b),(b,c) vs only (a,b)
  }

  // ---- PMI ----

  test("pmiPairs: hand-computed toy corpus, ranked PMI desc then lexicographic") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    val got = TextOps.pmiPairs(docs, "doc_id", "text",
      minDf = 1L, maxDf = 10L, minPair = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // N=4, df(a)=3, df(b)=3, df(c)=2; pairs (a,b)=2, (a,c)=1, (b,c)=1
    def pmi(n12: Long, d1: Long, d2: Long): Double =
      BigDecimal(math.log(n12 * 4.0 / (d1 * d2)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("a", "b", 2L, pmi(2, 3, 3)),
      ("a", "c", 1L, pmi(1, 3, 2)),
      ("b", "c", 1L, pmi(1, 3, 2))))
  }

  test("pmiPairs: the df window excludes terms outside it; minPair prunes") {
    val docs = Seq((1L, "a b stop"), (2L, "a b stop"), (3L, "a b stop"),
      (4L, "stop")).toDF("doc_id", "text")
    // 'stop' (df 4) excluded by maxDf 3; pair (a,b) support 3 survives
    val got = TextOps.pmiPairs(docs, "doc_id", "text",
      minDf = 2L, maxDf = 3L, minPair = 3L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a", "b")))
  }
}

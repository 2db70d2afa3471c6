package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth
import killa.text.TextOps

/** Round-5i surfaces: the remaining bucket-aggregation family —
  * multi_terms (count-ordered compound keys), missing, and the
  * bucket_selector / bucket_sort / stats_bucket pipeline aggs.
  */
class Round5iSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 30, turnsPerConv = 4, seed = 59L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5iroot")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  private lazy val matchSet: Set[String] =
    BruteForce.membership(turns, "the").collect().map(_.getString(0)).toSet

  // turn-level (conv, role, tool) pairs — real multi-valued meta: a conv
  // carries several (role, tool) combinations
  private lazy val pairMeta = turns.select("conv_id", "role", "tool")

  test("multiTermsAgg: count-ordered compound buckets ≡ brute force; null keys drop") {
    val got = reader.multiTermsAgg("the", pairMeta, "conv_id", "role", "tool", 7)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val expect = pairMeta.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter { case (c, r1, t) => matchSet.contains(c) && r1 != null && t != null }
      .distinct
      .groupBy { case (_, r1, t) => (r1, t) }
      .map { case ((r1, t), rows) => (r1, t, rows.map(_._1).distinct.length.toLong) }
      .toSeq
      .sortBy { case (r1, t, n) => (-n, r1, t) }
      .take(7)
    assert(got == expect)
    // a null key drops the PAIR, not the conv's other pairs
    val poisoned = pairMeta.withColumn("tool",
      when(col("role") === "user", lit(null)).otherwise(col("tool")))
    val got2 = reader.multiTermsAgg("the", poisoned, "conv_id", "role", "tool", 50)
      .collect().map(r => r.getString(0)).toSet
    assert(!got2.contains("user") && got2.contains("assistant"))
  }

  test("missingAgg: null values and absent convs both count as missing") {
    val all = matchSet.toSeq.sorted
    val nulled = all.take(2).toSet   // present with null value
    val absent = all.slice(2, 5).toSet // not in the frame at all
    val meta = turns.select("conv_id").distinct()
      .where(!col("conv_id").isin(absent.toSeq: _*))
      .withColumn("v",
        when(col("conv_id").isin(nulled.toSeq: _*), lit(null)).otherwise(lit("x")))
    val n = reader.missingAgg("the", meta, "conv_id", "v").collect()(0).getLong(0)
    assert(n == (nulled.size + absent.size).toLong)
    // nothing missing when every match carries a value
    val full = turns.select("conv_id").distinct().withColumn("v", lit("x"))
    assert(reader.missingAgg("the", full, "conv_id", "v").collect()(0).getLong(0) == 0L)
  }

  // per-conv synthetic timestamps: conv ordinal minutes past the epoch,
  // folded mod 4 so buckets have uneven sizes
  private lazy val tsMeta = turns.select("conv_id").distinct()
    .withColumn("ts", expr(
      "timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, CAST(substring(conv_id, 5) AS INT) % 4, 0)"))

  private lazy val bruteHist: Map[String, Long] = {
    val t = tsMeta.collect().map(r => (r.getString(0), r.getTimestamp(1))).toMap
    matchSet.toSeq.map(c => t(c))
      .groupBy(ts => new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss").format(ts))
      .map { case (b, xs) => (b, xs.length.toLong) }
  }

  test("dateHistogramSelect: selector filters, sort truncates, order exact") {
    val cut = bruteHist.values.toSeq.sorted.apply(1) // drop at least one bucket
    val got = reader.dateHistogramSelect("the", tsMeta, "conv_id", "ts",
      "minute", minHits = cut, topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = bruteHist.toSeq.filter(_._2 >= cut)
      .sortBy { case (b, h) => (-h, b) }.take(2)
    assert(got == expect)
    // selector above every bucket → empty, never an error
    assert(reader.dateHistogramSelect("the", tsMeta, "conv_id", "ts",
      "minute", minHits = Long.MaxValue, topN = 2).collect().isEmpty)
  }

  test("rrfTopK: fusion math exact, window cut respected, absent-source docs survive") {
    // lexical ranking for 'the' (bm25TopKRows order) + a synthetic second source
    val lex = reader.bm25TopKRows(Seq("the"), 5).map(_._1)
    assert(lex.length == 5)
    // second source: top doc = a conv NOT in the lexical top-5 (vector-only
    // hit must surface), rank 2 = the lexical #1 (boosted by both sources),
    // plus one rank beyond the window (must be ignored)
    val vecOnly = matchSet.toSeq.sorted.reverseIterator.find(c => !lex.contains(c)).get
    val other = Seq((vecOnly, 1L), (lex.head, 2L), (lex(1), 99L))
      .toDF("conv_id", "rank")
    val got = reader.rrfTopK(Seq("the"), other, k = 10, window = 5, c = 60)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    def r1(n: Int) = 1.0 / (60 + n)
    assert(math.abs(got(lex.head) - (r1(1) + r1(2))) < 1e-12) // both sources
    assert(math.abs(got(vecOnly) - r1(1)) < 1e-12)            // vector-only
    assert(math.abs(got(lex(1)) - r1(2)) < 1e-12)             // rank 99 > window ignored
    // fused head outranks any single-source doc
    val top = reader.rrfTopK(Seq("the"), other, k = 1, window = 5, c = 60)
      .collect()(0).getString(0)
    assert(top == lex.head)
  }

  test("percentileRanksAgg: exact ≤-probe percentages, probe order kept") {
    val t0 = turns.select("conv_id").distinct()
      .withColumn("t0", expr("CAST(CAST(substring(conv_id, 5) AS INT) AS DOUBLE)"))
    val vs = matchSet.toSeq.map(c => t0.where(col("conv_id") === c)
      .collect()(0).getDouble(1)) // bounded: test corpus
    val probes = Seq(5.0, 14.5, 100.0)
    val got = reader.percentileRanksAgg("the", t0, "conv_id", "t0", probes)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == probes)
    probes.zip(got).foreach { case (x, (_, pct)) =>
      val want = BigDecimal(100.0 * vs.count(_ <= x) / vs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pct == want, s"probe $x")
    }
  }

  test("qualityGate: every component filters; survivors = conjunction of features") {
    val rows = Seq(
      (0L, "short doc"),                                        // too few tokens
      (1L, ("w " * 200).trim),                                  // too many + repeats
      (2L, "the of and to in a is it for on with as the of and to in a is it"), // stopword-heavy
      (3L, (1 to 30).map(i => s"t$i").mkString(" ")),           // clean → survives
      (4L, ("a b " * 15).trim)                                  // dup bigrams
    ).toDF("doc_id", "text")
    val kept = TextOps.qualityGate(rows, "doc_id", "text",
      minTokens = 10L, maxTokens = 100L, maxStopwordRatio = 0.5,
      maxTopBigramFrac = 0.2, maxDupBigramFrac = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("statsBucket: scalar stats over the histogram's hit counts") {
    val r = reader.statsBucket("the", tsMeta, "conv_id", "ts", "minute").collect()(0)
    val hs = bruteHist.values.toSeq
    assert(r.getLong(0) == hs.length.toLong)
    assert(r.getLong(1) == hs.min)
    assert(r.getLong(2) == hs.max)
    val avg = BigDecimal(hs.sum.toDouble / hs.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == avg)
    assert(r.getLong(4) == hs.sum)
  }
}

package killa

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.IndexReader
import killa.synth.Synth

/** Round-5p layer: the remaining ES aggregation family — top_hits, sampler,
  * diversified_sampler, auto_date_histogram, matrix_stats, significant_text —
  * and the linear (score-aware) hybrid retriever.
  */
class Round5pSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 40, turnsPerConv = 5,
    seed = 47L).toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5p-idx")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b1")
    r
  }
  private lazy val rd = new IndexReader(spark, root, conf)

  private val terms = Seq("query", "index")

  test("topHitsAgg == direct per-value window over the full scored set") {
    val meta = turns.select("conv_id", "role")
    val got = rd.topHitsAgg(terms, meta, "conv_id", "role", 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    val w = Window.partitionBy("value").orderBy(col("score").desc, col("conv_id").asc)
    val ref = rd.bm25ScoredAll(terms)
      .join(meta.select(col("conv_id"), col("role").as("value")), "conv_id")
      .select("value", "conv_id", "score").distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 2)
      .orderBy(col("value").asc, col("rank").asc)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    assert(got.nonEmpty)
    assert(got.toSeq == ref.toSeq)
    // every synth role bucket is present and respects the per-bucket cap
    val perValue = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perValue.values.forall(_ <= 2))
    assert(perValue.keySet == Set("user", "assistant", "system", "tool"))
  }

  test("samplerTermsAgg == terms agg over the exact top sample") {
    val meta = turns.select("conv_id", "tool")
    val got = rd.samplerTermsAgg(terms, meta, "conv_id", "tool", 15, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sample = rd.bm25ScoredAll(terms)
      .orderBy(col("score").desc, col("conv_id").asc).limit(15).select("conv_id")
    val ref = sample
      .join(meta.select(col("conv_id"), col("tool").as("value")), "conv_id")
      .where(col("value").isNotNull)
      .select("conv_id", "value").distinct()
      .groupBy("value").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("value").asc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got == ref)
    // sampling can only SHRINK counts vs the full-match-set value counts
    val full = rd.bm25ScoredAll(terms)
      .join(meta.select(col("conv_id"), col("tool").as("value")), "conv_id")
      .select("conv_id", "value").distinct()
      .groupBy("value").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (v, n) => assert(n <= full.getOrElse(v, 0L), v) }
  }

  test("diversifiedTermsAgg caps any one group's contribution to the sample") {
    val meta = turns.select("conv_id", "tool")
      .withColumn("grp",
        expr("concat('g', CAST(CAST(substring(conv_id, 5) AS INT) % 3 AS STRING))"))
    val got = rd.diversifiedTermsAgg(terms, meta, "conv_id", "grp", "tool",
      maxDocsPerValue = 2, sampleSize = 8, size = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    // reference: cap per group by window, then global top-8, then terms agg
    val wDiv = Window.partitionBy("__dk").orderBy(col("score").desc, col("conv_id").asc)
    val sample = rd.bm25ScoredAll(terms)
      .join(meta.select(col("conv_id"), col("grp").as("__dk")).distinct(), "conv_id")
      .withColumn("__dr", row_number().over(wDiv))
      .where(col("__dr") <= 2)
      .orderBy(col("score").desc, col("conv_id").asc).limit(8)
    val ref = sample.select("conv_id")
      .join(meta.select(col("conv_id"), col("tool").as("value")), "conv_id")
      .select("conv_id", "value").distinct()
      .groupBy("value").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("value").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == ref)
    // the cap actually binds: no group appears more than twice in the sample
    val sampleGroups = sample
      .join(meta.select(col("conv_id"), col("grp")).distinct(), "conv_id")
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sampleGroups.forall(_ <= 2))
  }

  test("autoDateHistogram picks the smallest fitting ladder rung") {
    // synth ts = epoch + id seconds; 40 convs × 5 turns → 200 s span,
    // conv min-ts range ≈ 195 s ⇒ second rung (60 s) fits 10 buckets
    val meta = turns.groupBy("conv_id").agg(min(col("ts")).as("ts"))
    val got = rd.autoDateHistogram("the", meta, "conv_id", "ts", 10)
      .orderBy("bucket").collect()
    assert(got.nonEmpty)
    val interval = got.head.getLong(2)
    assert(interval == 60L, s"expected 60s rung, got $interval")
    assert(got.map(_.getLong(2)).distinct.length == 1)
    // bucket count fits the target and hits sum to the match-set size
    assert(got.length <= 10)
    val nMatch = rd.membership("the").count()
    assert(got.map(_.getLong(1)).sum == nMatch)
    // a huge target zooms all the way in to the 1 s rung
    val fine = rd.autoDateHistogram("the", meta, "conv_id", "ts", 100000)
      .collect()
    assert(fine.head.getLong(2) == 1L)
    assert(fine.length.toLong == nMatch) // conv min-ts values are distinct
  }

  test("matrixStatsAgg == direct moment computation") {
    val meta = turns.groupBy("conv_id")
      .agg(min(unix_timestamp(col("ts"))).cast("double").as("a"))
      .withColumn("b",
        expr("CAST(CAST(substring(conv_id, 5) AS INT) % 7 + 1 AS DOUBLE)"))
    val got = rd.matrixStatsAgg("the", meta, "conv_id", "a", "b").collect()(0)
    val ref = rd.membership("the").join(meta, "conv_id")
      .agg(count(lit(1)), round(avg("a"), 4), round(avg("b"), 4),
        round(var_samp("a"), 4), round(var_samp("b"), 4),
        round(covar_samp("a", "b"), 4), round(corr("a", "b"), 4))
      .collect()(0)
    assert(got.getLong(0) == ref.getLong(0) && got.getLong(0) > 0)
    (1 to 6).foreach(i => assert(got.getDouble(i) == ref.getDouble(i), s"col $i"))
    // correlation is a correlation
    assert(math.abs(got.getDouble(6)) <= 1.0)
  }

  test("significantText with a whole-match-set sample == significantTerms") {
    val probe = "query"
    val nMatch = rd.membershipCount(probe).toInt
    assert(nMatch > 0)
    val viaText = rd.significantText(probe, sampleSize = nMatch + 10, n = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val viaTerms = rd.significantTerms(probe, 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaText.toSeq == viaTerms.toSeq)
    // a genuinely small sample yields fg_df bounded by the sample size
    val sampled = rd.significantText(probe, sampleSize = 5, n = 8).collect()
    sampled.foreach(r => assert(r.getLong(1) <= 5))
  }

  test("packSequences == single-window prefix sum; no global window in plan") {
    import killa.text.Packing
    val docs = turns.select(
      (col("turn_idx") + expr("CAST(substring(conv_id, 5) AS INT)") * 5).as("doc_id"),
      col("text"))
    val got = Packing.packSequences(docs, "doc_id", "text", 50L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs.select(col("doc_id").cast("long"),
        size(killa.tokenize.Tokenize.termsCol(col("text"))).cast("long").as("n"))
      .withColumn("st", coalesce(sum(col("n")).over(w), lit(0L)))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(2) / 50L))
    assert(got.length == 200 && got.toSeq == ref.toSeq)
    // offsets are contiguous: each doc starts where the previous ended
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2)
    }
    // budget respected in the derived sense: a sequence never STARTS two docs
    // whose combined preceding tokens exceed its window start
    got.foreach { case (_, _, st, sq) => assert(sq == st / 50L) }
  }

  test("duplicateChunks finds planted cross-doc boilerplate, full windows only") {
    import killa.dedup.Dedup
    val boiler = (1 to 16).map(i => s"bp$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma"),
      (2L, s"$boiler delta epsilon"),
      (3L, "unrelated words only here nothing shared at all beyond chance"),
      // doc 4 repeats the boilerplate TWICE (occurrence counting)
      (4L, s"$boiler $boiler")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateChunks(docs, "doc_id", "text", 16, 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly one duplicated chunk hash: the boilerplate window, present in
    // docs 1, 2, 4 (4 twice) — 3 distinct docs, 4 occurrences
    assert(got.length == 1)
    assert(got.head._2 == 3L && got.head._3 == 4L)
    // trailing stubs never count: shrink window so stubs would collide
    val none = Dedup.duplicateChunks(
      Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text"), "doc_id", "text", 16, 16)
      .collect()
    assert(none.isEmpty)
  }

  test("linearHybridTopK: minmax normalization, weights, absent-source zeros") {
    val other = Seq(("x_only", 10.0), ("x_mid", 5.0), ("x_low", 0.0))
      .toDF("conv_id", "score")
    // lexical side empty (absent term) → pure normalized second source × w
    val got = rd.linearHybridTopK(Seq("zzz_absent_term"), other, 3,
        window = 10, wLex = 1.0, wOther = 2.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("x_only", 2.0), ("x_mid", 1.0), ("x_low", 0.0)))
    // all-equal window normalizes to 1.0 for every doc
    val flat = Seq(("f1", 3.0), ("f2", 3.0)).toDF("conv_id", "score")
    val gotFlat = rd.linearHybridTopK(Seq("zzz_absent_term"), flat, 2,
        window = 10, wLex = 1.0, wOther = 1.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(gotFlat.toSeq == Seq(("f1", 1.0), ("f2", 1.0)))
    // fused: the lexical best (norm 1.0) beats it only through the weights
    val lexTop = rd.bm25TopKRows(terms, 1).head._1
    val boost = Seq((lexTop, 1.0)).toDF("conv_id", "score")
    val fused = rd.linearHybridTopK(terms, boost, 1, window = 10,
        wLex = 1.0, wOther = 1.0)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(fused.head._1 == lexTop && fused.head._2 == 2.0)
  }
}

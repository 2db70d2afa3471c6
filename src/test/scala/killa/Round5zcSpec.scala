package killa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.IndexReader
import killa.synth.Synth

/** Round-5zc layer: the last four Elasticsearch aggregations —
  * max_bucket (sibling max + tie keys), value_count (values, not docs),
  * date_range (from-inclusive / to-exclusive date buckets), and global
  * (metrics outside the query scope).
  */
class Round5zcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 40, turnsPerConv = 5, seed = 33L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5zc")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  /** Independent match set: convs whose whitespace tokens contain `term`. */
  private def matchSet(term: String): Set[String] =
    turns.select(col("conv_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") === term).select("conv_id").distinct()
      .as[String].collect().toSet

  private lazy val minTs: Map[String, java.sql.Timestamp] =
    turns.groupBy("conv_id").agg(min(col("ts")).as("ts"))
      .as[(String, java.sql.Timestamp)].collect().toMap

  private lazy val meta =
    turns.groupBy("conv_id").agg(min(col("ts")).as("ts"))

  // ---- max_bucket ----

  test("maxBucket: value is the histogram max, keys are every bucket attaining it") {
    val hist = reader.dateHistogram("the", meta, "conv_id", "ts", "minute")
      .as[(String, Long)].collect().toMap
    assert(hist.nonEmpty)
    val mx = hist.values.max
    val wantKeys = hist.filter(_._2 == mx).keys.toSeq.sorted.mkString(",")
    val got = reader.maxBucket("the", meta, "conv_id", "ts", "minute")
      .as[(String, Long)].collect()
    assert(got.length == 1)
    assert(got.head == ((wantKeys, mx)))
  }

  test("maxBucket: a forced tie reports BOTH keys, ascending") {
    // shared_0 appears in a strict subset of convs; whatever its histogram,
    // duplicate it against itself via a synthetic meta that maps half the
    // matching convs to one minute and half to another, evenly
    val ms = matchSet("shared_0").toSeq.sorted
    assume(ms.length >= 2 && ms.length % 2 == 0)
    val half = ms.length / 2
    val fakeMeta = ms.zipWithIndex.map { case (c, i) =>
      (c, java.sql.Timestamp.valueOf(
        if (i < half) "2030-01-01 00:00:00" else "2030-01-01 00:01:00"))
    }.toDF("conv_id", "ts")
    val got = reader.maxBucket("shared_0", fakeMeta, "conv_id", "ts", "minute")
      .as[(String, Long)].collect().head
    assert(got._1 == "2030-01-01 00:00:00,2030-01-01 00:01:00")
    assert(got._2 == half.toLong)
  }

  // ---- value_count ----

  test("valueCount counts non-null VALUES of matching convs — not docs, not distinct") {
    val vals = turns.withColumn("v",
      when(col("turn_idx") % 3 === 0, lit(null)).otherwise(col("tool")))
      .select("conv_id", "v")
    val ms = matchSet("the")
    val want = vals.where(col("conv_id").isin(ms.toSeq: _*))
      .where(col("v").isNotNull).count()
    val got = reader.valueCountAgg("the", vals, "conv_id", "v")
      .as[Long].collect().head
    assert(got == want)
    // sanity: more values than matching docs (multi-valued is the point)
    assert(want > ms.size)
  }

  test("valueCount of a missing term is zero") {
    val vals = turns.select(col("conv_id"), col("tool").as("v"))
    assert(reader.valueCountAgg("zzz_no_such_term", vals, "conv_id", "v")
      .as[Long].collect().head == 0L)
  }

  // ---- date_range ----

  test("dateRange: buckets partition the matches; from inclusive, to exclusive") {
    // conv min ts ladder is 5s apart from 2024-01-01 00:00:00; a bound at
    // exactly 00:01:00 lands on conv 12's min ts — it must fall in the
    // SECOND bucket (from is inclusive)
    val b1 = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
    val b2 = java.sql.Timestamp.valueOf("2024-01-01 00:02:00")
    val ms = matchSet("the")
    val got = reader.dateRangeAgg("the", meta, "conv_id", "ts", Seq(b1, b2))
      .as[(String, Long)].collect().toMap
    def cnt(p: java.sql.Timestamp => Boolean) = ms.count(c => p(minTs(c))).toLong
    val want = Map(
      "*-2024-01-01 00:01:00" -> cnt(_.before(b1)),
      "2024-01-01 00:01:00-2024-01-01 00:02:00" -> cnt(t => !t.before(b1) && t.before(b2)),
      "2024-01-01 00:02:00-*" -> cnt(t => !t.before(b2))
    ).filter(_._2 > 0L)
    assert(got == want)
    assert(got.values.sum == ms.size.toLong)
    // the boundary conv (min ts == b1) is counted in the middle bucket
    val boundary = ms.filter(c => minTs(c) == b1)
    assume(boundary.nonEmpty)
    assert(got("2024-01-01 00:01:00-2024-01-01 00:02:00") >= boundary.size.toLong)
  }

  test("dateRange: docs missing the value are ignored, never a null bucket") {
    val holed = meta.withColumn("ts",
      when(col("conv_id") === lit(matchSet("the").head), lit(null))
        .otherwise(col("ts")))
    val got = reader.dateRangeAgg("the", holed, "conv_id", "ts",
      Seq(java.sql.Timestamp.valueOf("2024-01-01 00:01:00")))
      .as[(String, Long)].collect()
    assert(!got.exists(_._1 == null))
    assert(got.map(_._2).sum == matchSet("the").size.toLong - 1L)
  }

  // ---- graded rank_eval (nDCG) ----

  test("rankEvalNdcg: judging the top-k in rank order scores exactly 1.0") {
    val top = reader.bm25TopK(Seq("the", "shared_0"), 3)
      .as[(String, Double)].collect().map(_._1)
    assume(top.length == 3)
    val judgments = top.zip(Seq(3.0, 2.0, 1.0)).map { case (c, g) => ("q", c, g) }
      .toSeq.toDF("qid", "conv", "g")
    val got = reader.rankEvalNdcg(Seq("q" -> Seq("the", "shared_0")),
      judgments, "qid", "conv", "g", 3)
      .as[(String, Double, Double)].collect().head
    assert(got._3 == 1.0)
  }

  test("rankEvalNdcg: reversed grades match the hand formula; out-of-topk grades cut ndcg") {
    val top = reader.bm25TopK(Seq("the", "shared_0"), 3)
      .as[(String, Double)].collect().map(_._1)
    val judgments = top.zip(Seq(1.0, 2.0, 3.0)).map { case (c, g) => ("q", c, g) }
      .toSeq.toDF("qid", "conv", "g")
    def dcgOf(gs: Seq[Double]) = gs.zipWithIndex.map { case (g, i) =>
      (math.pow(2.0, g) - 1.0) / (math.log(i + 2.0) / math.log(2.0))
    }.sum
    val want = BigDecimal(dcgOf(Seq(1.0, 2.0, 3.0)) / dcgOf(Seq(3.0, 2.0, 1.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = reader.rankEvalNdcg(Seq("q" -> Seq("the", "shared_0")),
      judgments, "qid", "conv", "g", 3)
      .as[(String, Double, Double)].collect().head
    assert(got._3 == want)
    // a judged conv that never ranks inflates the ideal only → ndcg drops
    val withGhost = judgments.unionByName(
      Seq(("q", "zz_not_a_conv", 3.0)).toDF("qid", "conv", "g"))
    val got2 = reader.rankEvalNdcg(Seq("q" -> Seq("the", "shared_0")),
      withGhost, "qid", "conv", "g", 3)
      .as[(String, Double, Double)].collect().head
    assert(got2._3 < got._3)
    assert(got2._2 == got._2) // dcg itself unchanged
  }

  test("rankEvalNdcg: no judged hit in the top-k → dcg 0, ndcg 0") {
    val judgments = Seq(("q", "zz_nope", 2.0)).toDF("qid", "conv", "g")
    val got = reader.rankEvalNdcg(Seq("q" -> Seq("the")),
      judgments, "qid", "conv", "g", 5)
      .as[(String, Double, Double)].collect().head
    assert(got == (("q", 0.0, 0.0)))
  }

  // ---- LTR features ----

  test("ltrFeatures match independent recomputation from the turns") {
    val terms = Seq("the", "shared_1")
    val k = 5
    val toks = turns.select(col("conv_id"),
      explode(split(col("text"), " ")).as("t")).where(col("t") =!= "")
    val n = toks.select("conv_id").distinct().count()
    val dl = toks.groupBy("conv_id").agg(count(lit(1)).as("dl"))
      .as[(String, Long)].collect().toMap
    val avgdl = dl.values.sum.toDouble / n
    val tf = toks.where(col("t").isin(terms: _*))
      .groupBy("conv_id", "t").agg(count(lit(1)).as("tf"))
      .as[(String, String, Long)].collect()
    val df = tf.groupBy(_._2).map { case (t, rs) => t -> rs.length.toLong }
    val conf2 = conf
    val perDoc = tf.groupBy(_._1).map { case (c, rs) =>
      val score = rs.map { case (_, t, f) =>
        killa.query.Bm25.contrib(
          killa.query.Bm25.weight(n, df(t), conf2.k1), f, dl(c),
          conf2.k1, conf2.b, avgdl)
      }.sum
      val sumIdf = rs.map { case (_, t, _) =>
        killa.query.Bm25.idf(n, df(t)) }.sum
      c -> ((score, rs.length.toLong, rs.map(_._3).sum, sumIdf, dl(c)))
    }
    val want = perDoc.toSeq
      .sortBy { case (c, v) => (-v._1, c) }.take(k).zipWithIndex
      .map { case ((c, (s, nm, st, si, d)), i) =>
        def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        ("q", i + 1, c, r4(s), nm, st, r4(si), d)
      }
    val got = reader.ltrFeatures(Seq("q" -> terms), k)
      .as[(String, Int, String, Double, Long, Long, Double, Long)].collect().toSeq
    assert(got == want)
  }

  // ---- span corruption ----

  private lazy val corruptDocs =
    turns.select((expr("CAST(substring(conv_id, 5) AS LONG)") * 5 +
      col("turn_idx")).as("doc_id"), col("text"))

  private val SentinelRe = """<extra_id_(\d+)>""".r

  test("spanCorrupt round-trips: splicing target spans back into input reconstructs the text") {
    val rows = killa.text.TextOps.spanCorrupt(corruptDocs, "doc_id", "text")
      .join(corruptDocs, "doc_id")
      .select("doc_id", "input", "target", "text")
      .as[(Long, String, String, String)].collect()
    assert(rows.length == corruptDocs.count())
    rows.foreach { case (_, input, target, text) =>
      val spans: Map[Int, Seq[String]] =
        if (target.isEmpty) Map.empty
        else {
          // target = <extra_id_0> t t <extra_id_1> t ... <extra_id_n>
          val toks = target.split(" ").toSeq
          val idx = toks.zipWithIndex.collect {
            case (SentinelRe(k), i) => (k.toInt, i)
          }
          idx.sliding(2).collect {
            case Seq((k, i), (_, j)) => k -> toks.slice(i + 1, j)
          }.toMap
        }
      val rebuilt = input.split(" ").toSeq.flatMap {
        case SentinelRe(k) => spans(k.toInt)
        case t => Seq(t)
      }.mkString(" ")
      assert(rebuilt == text.split(" ").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("spanCorrupt: ~12.5% mask rate, multi-token spans occur, no-mask docs get empty target") {
    val rows = killa.text.TextOps.spanCorrupt(corruptDocs, "doc_id", "text")
      .as[(Long, String, String)].collect()
    val nTok = corruptDocs.select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").count()
    val nMasked = rows.map { case (_, _, target) =>
      if (target.isEmpty) 0
      else target.split(" ").count(t => SentinelRe.findFirstIn(t).isEmpty)
    }.sum
    val rate = nMasked.toDouble / nTok
    assert(rate > 0.08 && rate < 0.18, s"mask rate $rate out of band")
    // consecutive picks merge: some target span holds >= 2 tokens
    val hasMulti = rows.exists { case (_, _, target) =>
      !target.isEmpty && {
        val toks = target.split(" ").toSeq
        val idx = toks.zipWithIndex.collect { case (SentinelRe(_), i) => i }
        idx.sliding(2).exists { case Seq(i, j) => j - i > 2; case _ => false }
      }
    }
    assert(hasMulti, "no multi-token span found — island merge untested")
    // docs with no selected token: input is the text, target empty
    val clean = rows.filter(_._3.isEmpty)
    assume(clean.nonEmpty)
    val byId = corruptDocs.as[(Long, String)].collect().toMap
    clean.foreach { case (id, input, _) =>
      assert(input == byId(id).split(" ").filter(_.nonEmpty).mkString(" "))
    }
  }

  // ---- terms agg ordered by sub-metric ----

  test("termsAggByMetric ranks buckets by the metric, not the count") {
    val meta = turns.groupBy("conv_id")
      .agg(min_by(col("role"), col("turn_idx")).as("k"))
      .join(turns.select(col("conv_id"),
          explode(split(col("text"), " ")).as("t")).where(col("t") =!= "")
        .groupBy("conv_id").agg(count(lit(1)).as("v")), "conv_id")
    val ms = matchSet("the")
    val want = meta.where(col("conv_id").isin(ms.toSeq: _*))
      .groupBy("k").agg(count(lit(1)).as("n"), round(avg(col("v")), 4).as("a"))
      .as[(String, Long, Double)].collect()
      .sortBy { case (k, _, a) => (-a, k) }.take(3).toSeq
    val got = reader.termsAggByMetric("the", meta, "conv_id", "k", "v", 3)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want)
  }

  // ---- BPE fertility ----

  test("fertility: hand-checked on a tiny corpus, merge shrinks pieces") {
    val tiny = Seq("ab ab c").toDF("text")
    val noMerge = killa.text.Bpe.fertility(tiny, "text", Nil)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(noMerge == ((3L, 5L, 5L, 1.6667, 1.0)))
    val merged = killa.text.Bpe.fertility(tiny, "text", Seq(("a", "b")))
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(merged == ((3L, 3L, 5L, 1.0, 1.6667)))
  }

  // ---- multi-word synonyms ----

  test("membershipSynonymPhrases = term membership ∪ exact phrase matches, distinct") {
    val posRoot = {
      val r = TestSpark.freshDir("r5zc-pos")
      new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
      new IndexWriter(spark, r, conf).buildPositions(turns, "pos0")
      r
    }
    val rd = new IndexReader(spark, posRoot, conf)
    // pick a phrase that actually occurs: the first adjacent token pair
    // of some turn
    val Array(w1, w2) = turns.orderBy("conv_id", "turn_idx").limit(1)
      .select("text").as[String].collect().head.split(" ").take(2)
    val want = (rd.membership("shared_2").as[String].collect().toSet ++
      rd.phrase(Seq(w1, w2)).select("conv_id").as[String].collect().toSet)
    val got = rd.membershipSynonymPhrases(Seq(Seq("shared_2"), Seq(w1, w2)))
      .as[String].collect()
    assert(got.toSet == want)
    assert(got.length == got.distinct.length)
    // phrase alternative genuinely contributes beyond the single term
    assert(rd.phrase(Seq(w1, w2)).count() > 0)
  }

  // ---- fill-in-the-middle ----

  test("fimTransform round-trips: prefix ++ middle ++ suffix is the original token stream") {
    val rows = killa.text.TextOps.fimTransform(corruptDocs, "doc_id", "text")
      .join(corruptDocs, "doc_id")
      .as[(Long, String, Long, String)].collect()
    assert(rows.length == corruptDocs.count())
    var sawEmptyMid = false; var sawEmptyPre = false
    rows.foreach { case (_, psm, nMid, text) =>
      val toks = psm.split(" ").toSeq
      assert(toks.head == "<fim_prefix>")
      val iSuf = toks.indexOf("<fim_suffix>")
      val iMid = toks.indexOf("<fim_middle>")
      assert(iSuf > 0 && iMid > iSuf)
      val pre = toks.slice(1, iSuf)
      val suf = toks.slice(iSuf + 1, iMid)
      val mid = toks.drop(iMid + 1)
      assert(mid.length == nMid)
      sawEmptyMid ||= mid.isEmpty; sawEmptyPre ||= pre.isEmpty
      assert((pre ++ mid ++ suf).mkString(" ") ==
        text.split(" ").filter(_.nonEmpty).mkString(" "))
    }
    assert(sawEmptyMid, "no empty middle in the corpus — edge untested")
  }

  // ---- global ----

  test("globalAgg: scoped pair is over the matches, global pair ignores the query") {
    val dl = turns.select(col("conv_id"), explode(split(col("text"), " ")).as("t"))
      .where(col("t") =!= "").groupBy("conv_id").agg(count(lit(1)).as("dl"))
    val ms = matchSet("shared_1")
    val scoped = dl.where(col("conv_id").isin(ms.toSeq: _*))
      .agg(count(lit(1)), round(avg(col("dl")), 4))
      .as[(Long, Double)].collect().head
    val global = dl.agg(count(lit(1)), round(avg(col("dl")), 4))
      .as[(Long, Double)].collect().head
    val got = reader.globalAgg("shared_1", dl, "conv_id", "dl")
      .as[(Long, Double, Long, Double)].collect().head
    assert(got == ((scoped._1, scoped._2, global._1, global._2)))
    // the query genuinely scopes: a strict subset of the corpus
    assert(scoped._1 < global._1)
  }
}

package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth

/** Round-5d surfaces: the metric-aggregation family (stats / percentiles /
  * cardinality), the function_score family (decay, field_value_factor,
  * boosting), collapse inner hits, match_phrase_prefix, and span_first.
  */
class Round5dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
  private val epoch = 1704067200000L

  private lazy val turns = Synth.transcripts(spark, nConvs = 30, turnsPerConv = 4, seed = 31L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5droot")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  // per-conv doc value: the conv ordinal as a double (deterministic, dense)
  private lazy val meta = turns.select("conv_id").distinct()
    .withColumn("t0", expr("CAST(CAST(substring(conv_id, 5) AS INT) AS DOUBLE)"))

  private def hits(df: DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  private lazy val matchSet: Set[String] =
    BruteForce.membership(turns, "the").collect().map(_.getString(0)).toSet
  private lazy val valOf: Map[String, Double] =
    meta.collect().map(r => (r.getString(0), r.getDouble(1))).toMap

  // ---- metric aggregations ----

  test("statsAgg: count/min/max/sum/avg over the match set, nulls ignored") {
    val nullConv = matchSet.toSeq.min
    val poisoned = meta.withColumn("t0",
      when(col("conv_id") === nullConv, lit(null)).otherwise(col("t0")))
    val vs = matchSet.toSeq.filter(_ != nullConv).map(valOf)
    val row = reader.statsAgg("the", poisoned, "conv_id", "t0").collect()(0)
    assert(row.getLong(0) == vs.length)
    assert(row.getDouble(1) == vs.min)
    assert(row.getDouble(2) == vs.max)
    assert(math.abs(row.getDouble(3) - vs.sum) < 1e-9)
    assert(math.abs(row.getDouble(4) - vs.sum / vs.length) < 1e-9)
  }

  test("percentilesAgg: exact linear interpolation, caller's percentile order") {
    val pcts = Seq(0.0, 0.5, 0.9, 1.0)
    val vs = matchSet.toSeq.map(valOf).sorted
    def interp(p: Double): Double = {
      val pos = p * (vs.length - 1)
      val lo = pos.toInt; val hi = math.min(lo + 1, vs.length - 1)
      vs(lo) + (pos - lo) * (vs(hi) - vs(lo))
    }
    val got = reader.percentilesAgg("the", meta, "conv_id", "t0", pcts)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == pcts)
    got.foreach { case (p, v) => assert(math.abs(v - interp(p)) < 1e-9, s"pct $p") }
  }

  test("cardinalityAgg exact; cardinalityApprox within the HLL rsd envelope") {
    // turn-level meta: distinctness is over VALUES, not rows
    val toolMeta = turns.select(col("conv_id"), col("role").as("v"))
    val exp = turns.where(col("conv_id").isin(matchSet.toSeq: _*))
      .select("role").distinct().count()
    val got = reader.cardinalityAgg("the", toolMeta, "conv_id", "v").collect()(0).getLong(0)
    assert(got == exp)
    val approx = reader.cardinalityApprox("the", toolMeta, "conv_id", "v", rsd = 0.05)
      .collect()(0).getLong(0)
    assert(math.abs(approx - exp).toDouble <= math.max(1.0, 0.25 * exp))
  }

  test("termsAgg: conv counted once per value, top-size by (count desc, value asc)") {
    val m = turns.select(col("conv_id"), col("role").as("v"))
    val exp = turns.where(col("conv_id").isin(matchSet.toSeq: _*))
      .select("conv_id", "role").distinct()
      .groupBy("role").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (v, n) => (-n, v) }.take(3).toSeq
    val got = reader.termsAgg("the", m, "conv_id", "v", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("histogramAgg: floor-interval buckets, missing values ignored") {
    val nullConv = matchSet.toSeq.min
    val poisoned = meta.withColumn("t0",
      when(col("conv_id") === nullConv, lit(null)).otherwise(col("t0")))
    val exp = matchSet.toSeq.filter(_ != nullConv).map(valOf)
      .groupBy(v => math.floor(v / 7.0) * 7.0).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = reader.histogramAgg("the", poisoned, "conv_id", "t0", 7.0)
      .orderBy("bucket").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("compositeAgg: key-ordered buckets; after-key pages tile the space exactly") {
    val m = turns.select(col("conv_id"), col("role").as("k1"), col("tool").as("k2"))
    val all = turns.where(col("conv_id").isin(matchSet.toSeq: _*))
      .select(col("conv_id"), col("role"), col("tool"))
      .where(col("role").isNotNull && col("tool").isNotNull)
      .distinct()
      .groupBy("role", "tool").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy { case (a, b, _) => (a, b) }.toSeq
    val size = math.max(1, all.length / 2)
    val p1 = reader.compositeAgg("the", m, "conv_id", "k1", "k2", size)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(p1 == all.take(size))
    val afterKey = (p1.last._1, p1.last._2)
    val p2 = reader.compositeAgg("the", m, "conv_id", "k1", "k2", size,
        after = Some(afterKey))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(p2 == all.slice(size, 2 * size))
    assert((p1 ++ p2) == all.take(2 * size), "pages tile with no gap or overlap")
  }

  // ---- function_score family ----

  test("decayScoredTopK gauss: decay(scale) = decay exactly; missing value keeps 1.0") {
    val terms = Seq("query", "filter")
    val base = hits(BruteForce.bm25(turns, terms, 100000, conf = conf)).toMap
    val origin = 7.0; val scale = 5.0; val decay = 0.5
    // poison one scored conv's value with null: its multiplier must be 1.0
    val scoredConvs = base.keySet
    val nullConv = scoredConvs.toSeq.min
    val poisoned = meta.withColumn("t0",
      when(col("conv_id") === nullConv, lit(null)).otherwise(col("t0")))
    def gauss(v: Double) = {
      val d = math.max(0.0, math.abs(v - origin))
      math.exp(d * d * math.log(decay) / (scale * scale))
    }
    val exp = base.toSeq.map { case (c, s) =>
      (c, if (c == nullConv) s else s * gauss(valOf(c)))
    }.sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.decayScoredTopK(terms, 10, poisoned, "conv_id", "t0",
      origin, scale, decay = decay, fn = "gauss"))
    assert(approxEq(got, exp))
    // pin decay(scale): a doc value exactly `scale` away multiplies by decay
    assert(math.abs(gauss(origin + scale) - decay) < 1e-12)
  }

  test("decayScoredTopK linear clamps to zero beyond the support") {
    val terms = Seq("query", "filter")
    val base = hits(BruteForce.bm25(turns, terms, 100000, conf = conf)).toMap
    val origin = 0.0; val scale = 4.0; val decay = 0.5
    def lin(v: Double) =
      math.max(0.0, 1.0 - math.abs(v - origin) * (1.0 - decay) / scale)
    val exp = base.toSeq.map { case (c, s) => (c, s * lin(valOf(c))) }
      .sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.decayScoredTopK(terms, 10, meta, "conv_id", "t0",
      origin, scale, decay = decay, fn = "linear"))
    assert(approxEq(got, exp))
    assert(lin(9.0) == 0.0, "beyond support clamps to exactly 0")
  }

  test("fieldValueFactorTopK ln1p vs brute force; absent docs use `missing`") {
    val terms = Seq("query", "filter")
    val base = hits(BruteForce.bm25(turns, terms, 100000, conf = conf)).toMap
    val factor = 0.3; val missing = 2.0
    // drop one scored conv from the frame entirely: it must use `missing`
    val dropConv = base.keySet.toSeq.max
    val partial = meta.where(col("conv_id") =!= dropConv)
    val exp = base.toSeq.map { case (c, s) =>
      val v = if (c == dropConv) missing else valOf(c)
      (c, s * math.log1p(v * factor))
    }.sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.fieldValueFactorTopK(terms, 10, partial, "conv_id", "t0",
      factor = factor, missing = missing))
    assert(approxEq(got, exp))
  }

  test("boostingTopK: demotion not exclusion; boost 1 is the identity") {
    val pos = Seq("query", "filter"); val neg = Seq("scan")
    val negSet = BruteForce.membership(turns, "scan")
      .collect().map(_.getString(0)).toSet
    val base = hits(BruteForce.bm25(turns, pos, 100000, conf = conf))
    val nb = 0.25
    val exp = base.map { case (c, s) => (c, if (negSet(c)) s * nb else s) }
      .sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.boostingTopK(pos, neg, nb, 10))
    assert(approxEq(got, exp))
    assert(got.map(_._1).exists(negSet), "demoted docs stay present (data precondition)")
    val id = hits(reader.boostingTopK(pos, neg, 1.0, 10))
    assert(approxEq(id, hits(reader.bm25TopK(pos, 10))))
  }

  test("disMaxTopK: best clause + tieBreaker × rest; edges are best-of and should-sum") {
    val q1 = Seq("query", "filter"); val q2 = Seq("spark", "scan")
    def scoredMap(ts: Seq[String]) =
      BruteForce.bm25(turns, ts, 100000, conf = conf)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val s1 = scoredMap(q1); val s2 = scoredMap(q2)
    val tie = 0.3
    val exp = (s1.keySet ++ s2.keySet).toSeq.map { c =>
      val ss = Seq(s1.get(c), s2.get(c)).flatten
      (c, ss.max + tie * (ss.sum - ss.max))
    }.sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.disMaxTopK(Seq(q1, q2), tie, 10))
    assert(approxEq(got, exp))
    // tieBreaker 1 = the should-sum of the two clauses
    val sumExp = (s1.keySet ++ s2.keySet).toSeq
      .map(c => (c, s1.getOrElse(c, 0.0) + s2.getOrElse(c, 0.0)))
      .sortBy { case (c, s) => (-s, c) }.take(10)
    assert(approxEq(hits(reader.disMaxTopK(Seq(q1, q2), 1.0, 10)), sumExp))
  }

  test("randomScoreTopK: seeded md5 order — deterministic, uniform-ish, seed-sensitive") {
    val a = reader.randomScoreTopK("the", "s1", 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val b = reader.randomScoreTopK("the", "s1", 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(a == b, "same seed replays identically")
    val exp = matchSet.toSeq
      .map(c => (c, org.apache.commons.codec.digest.DigestUtils.md5Hex("s1" + c)))
      .sortBy { case (c, h) => (h, c) }.take(5)
    assert(a == exp, "rank key is exactly md5(seed ++ conv_id)")
    val other = reader.randomScoreTopK("the", "s2", 5)
      .collect().map(_.getString(0)).toSeq
    assert(other != a.map(_._1), "a different seed permutes (data precondition)")
  }

  // ---- collapse inner hits ----

  test("collapseTopN: top-n per group with ranks; n=1 matches collapseTop") {
    val grpMeta = turns.select("conv_id").distinct()
      .withColumn("grp", expr("concat('g', CAST(CAST(substring(conv_id, 5) AS INT) % 3 AS STRING))"))
    val terms = Seq("query", "filter")
    val scored = BruteForce.bm25(turns, terms, 100000, conf = conf)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val exp = scored.groupBy { case (c, _) => "g" + (c.drop(4).toInt % 3) }.view
      .mapValues(_.sortBy { case (c, s) => (-s, c) }.take(2)).toMap
    val got = reader.collapseTopN(terms, grpMeta, "conv_id", "grp", 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(got.keySet == exp.keySet)
    for ((g, rows) <- got) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"ranks in $g")
      assert(sorted.map(_._3).toSeq == exp(g).map(_._1).toSeq, s"convs in $g")
    }
    val top1 = reader.collapseTopN(terms, grpMeta, "conv_id", "grp", 1)
      .select("grp", "conv_id", "score")
    val ct = reader.collapseTop(terms, grpMeta, "conv_id", "grp")
    assert(top1.orderBy("grp").collect().toSeq == ct.orderBy("grp").collect().toSeq)
  }

  // ---- match_phrase_prefix + span_first ----

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, i, txt) =>
      Turn(c, i, "user", txt, "", new Timestamp(epoch + i * 1000L))
    }.toDS().toDF()

  test("phrasePrefix: expansion-union semantics and the deterministic cap") {
    val corpus = mkTurns(
      ("pa", 0, "run scan now"), ("pb", 0, "run sort now"),
      ("pc", 0, "run small jobs"), ("pd", 0, "scan run"),
      ("pe", 0, "run the scan"), ("pf", 0, "walk slow"))
    val r = TestSpark.freshDir("r5dpp")
    val w = new IndexWriter(spark, r, conf)
    w.fullBuild(corpus, "b0")
    w.buildPositions(corpus, "pos0")
    val rd = new IndexReader(spark, r, conf)
    // "run s…": pa (run scan), pb (run sort), pc (run small) — NOT pd
    // (wrong order), NOT pe (gap), NOT pf (no "run")
    val got = rd.phrasePrefix(Seq("run"), "s").collect().map(_.getString(0)).toSet
    assert(got == Set("pa", "pb", "pc"))
    // equivalent to the union of plain phrases over the full expansion
    val manual = Seq("scan", "slow", "small", "sort")
      .flatMap(t => rd.phrase(Seq("run", t)).collect().map(_.getString(0))).toSet
    assert(got == manual)
    // cap = 2 keeps the lexicographically smallest expansions {scan, slow}:
    // pb (sort) and pc (small) drop, pa stays
    val capped = rd.phrasePrefix(Seq("run"), "s", maxExpansions = 2)
      .collect().map(_.getString(0)).toSet
    assert(capped == Set("pa"))
    // bare prefix (no leading terms) degrades to prefix membership
    val bare = rd.phrasePrefix(Nil, "s").collect().map(_.getString(0)).toSet
    assert(bare == Set("pa", "pb", "pc", "pd", "pe", "pf"))
    // no dictionary term carries the prefix → empty, no error
    assert(rd.phrasePrefix(Seq("run"), "zz").isEmpty)
  }

  test("spanFirst: first occurrence strictly inside the leading window") {
    val corpus = mkTurns(
      ("sa", 0, "alpha beta gamma"), // alpha at 0
      ("sb", 0, "beta alpha gamma"), // alpha at 1
      ("sb", 1, "alpha again here"), // later positions don't help
      ("sc", 0, "beta gamma delta"),
      ("sc", 1, "gamma alpha beta")) // alpha first at 4
    val r = TestSpark.freshDir("r5dsf")
    val w = new IndexWriter(spark, r, conf)
    w.fullBuild(corpus, "b0")
    w.buildPositions(corpus, "pos0")
    val rd = new IndexReader(spark, r, conf)
    assert(rd.spanFirst("alpha", 1).collect().map(_.getString(0)).toSet == Set("sa"))
    assert(rd.spanFirst("alpha", 2).collect().map(_.getString(0)).toSet == Set("sa", "sb"))
    assert(rd.spanFirst("alpha", 5).collect().map(_.getString(0)).toSet == Set("sa", "sb", "sc"))
    assert(rd.spanFirst("alpha", 4).collect().map(_.getString(0)).toSet == Set("sa", "sb"))
    assert(rd.spanFirst("nope", 10).isEmpty)
  }
}

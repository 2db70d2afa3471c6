package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth
import killa.tokenize.Tokenize

/** Round-5b layer: minimum_should_match inside the DAAT kernel (the ES
  * m-of-n bool query, with a live<m early-out), multi-term OR membership
  * (terms query / query-time synonym sets), and the significant_terms
  * aggregation (JLH-scored foreground-vs-background term rates).
  */
class Round5bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 50, turnsPerConv = 5, seed = 23L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5b")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  // ---- minimum_should_match ----

  test("minShouldMatch = 1 is the plain disjunction; conjunctive ignores it") {
    val terms = Seq("query", "filter", "join")
    assert(approxEq(reader.bm25TopKRows(terms, 10, minShouldMatch = 1).toSeq,
      reader.bm25TopKRows(terms, 10).toSeq))
    // conjunctive mode requires every term regardless of the msm value
    val conjTerms = Seq("the", "query")
    assert(approxEq(
      reader.bm25TopKRows(conjTerms, 10, conjunctive = true, minShouldMatch = 7).toSeq,
      reader.bm25TopKRows(conjTerms, 10, conjunctive = true).toSeq))
  }

  test("minShouldMatch = |terms| equals conjunctive mode, ids AND scores") {
    val terms = Seq("the", "query")
    val conj = reader.bm25TopKRows(terms, 10, conjunctive = true).toSeq
    val msm = reader.bm25TopKRows(terms, 10, minShouldMatch = terms.length).toSeq
    assert(conj.nonEmpty, "vacuous fixture")
    assert(approxEq(msm, conj))
  }

  test("minShouldMatch m-of-n exact vs brute force on all three execution paths") {
    val terms = Seq("query", "filter", "join")
    val rLocal = new IndexReader(spark, root, conf)
    val rPool = new IndexReader(spark, root, conf.copy(localParBlocks = 0))
    val rDist = new IndexReader(spark, root, conf.copy(localQueryBlocks = 0))
    for (m <- 2 to 3; (ex, tag) <- Seq((Nil, "plain"), (Seq("spark"), "not"))) {
      val exp = hits(BruteForce.bm25(turns, terms, 10, conf = conf,
        mustNot = ex, minShouldMatch = m))
      assert(exp.nonEmpty || m == 3, s"m=$m $tag oracle empty — fixture too weak")
      for ((r, path) <- Seq((rLocal, "local"), (rPool, "pool"), (rDist, "dist"))) {
        val got = r.bm25TopKRows(terms, 10, mustNot = ex, minShouldMatch = m).toSeq
        assert(approxEq(got, exp), s"m=$m path=$path $tag")
      }
    }
    // the constraint must actually bite on this fixture
    val all = hits(BruteForce.bm25(turns, terms, 1000, conf = conf))
    val m2 = hits(BruteForce.bm25(turns, terms, 1000, conf = conf, minShouldMatch = 2))
    assert(m2.length < all.length, "msm=2 dropped nothing — fixture vacuous")
  }

  test("minShouldMatch > |terms| (or > live terms) matches nothing") {
    assert(reader.bm25TopKRows(Seq("query", "filter"), 10, minShouldMatch = 3).isEmpty)
    // two absent terms + one present: only 1 clause can ever match
    val got = reader.bm25TopKRows(
      Seq("query", "qq_absent_1", "qq_absent_2"), 10, minShouldMatch = 2)
    assert(got.isEmpty)
  }

  test("minShouldMatch composes with the doc-values filter") {
    val keep = turns.select("conv_id").distinct().collect().map(_.getString(0))
      .sorted.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c }.toSet
    val flt = keep.toSeq.toDF("conv_id")
    val terms = Seq("query", "filter", "join")
    val exp = hits(BruteForce.bm25(turns, terms, 100000, conf = conf, minShouldMatch = 2))
      .filter { case (c, _) => keep(c) }.take(10)
    val got = hits(reader.bm25TopKFiltered(terms, 10, flt, minShouldMatch = 2))
    assert(exp.nonEmpty, "vacuous fixture")
    assert(approxEq(got, exp))
  }

  test("bm25ScoredAll honors minShouldMatch (full scored set)") {
    val terms = Seq("query", "filter", "join")
    val exp = hits(BruteForce.bm25(turns, terms, 1000000, conf = conf, minShouldMatch = 2))
    val got = hits(reader.bm25ScoredAll(terms, minShouldMatch = 2)
      .orderBy(col("score").desc, col("conv_id").asc))
    assert(exp.nonEmpty, "vacuous fixture")
    assert(approxEq(got, exp))
    assert(reader.bm25ScoredAll(terms, minShouldMatch = 4).collect().isEmpty)
  }

  test("per-term boosts: ES term^boost semantics, exact on all three paths") {
    val terms = Seq("query", "filter", "join")
    val boosts = Map("filter" -> 2.5, "join" -> 0.5)
    val exp = hits(BruteForce.bm25(turns, terms, 10, conf = conf, boosts = boosts))
    val unboosted = reader.bm25TopKRows(terms, 10).toSeq
    assert(exp.nonEmpty && exp != unboosted, "boosts did not bite — fixture vacuous")
    val rLocal = new IndexReader(spark, root, conf)
    val rPool = new IndexReader(spark, root, conf.copy(localParBlocks = 0))
    val rDist = new IndexReader(spark, root, conf.copy(localQueryBlocks = 0))
    for ((r, tag) <- Seq((rLocal, "local"), (rPool, "pool"), (rDist, "dist")))
      assert(approxEq(r.bm25TopKRows(terms, 10, boosts = boosts).toSeq, exp), tag)
    // all-1.0 boosts are the identity
    assert(approxEq(
      reader.bm25TopKRows(terms, 10, boosts = terms.map(_ -> 1.0).toMap).toSeq,
      unboosted))
    // composes with minimum_should_match and NOT
    val exp2 = hits(BruteForce.bm25(turns, terms, 10, conf = conf,
      mustNot = Seq("spark"), minShouldMatch = 2, boosts = boosts))
    assert(exp2.nonEmpty)
    assert(approxEq(reader.bm25TopKRows(terms, 10, mustNot = Seq("spark"),
      minShouldMatch = 2, boosts = boosts).toSeq, exp2))
    // scored export carries the same boosted scores
    val expAll = hits(BruteForce.bm25(turns, terms, 1000000, conf = conf, boosts = boosts))
    val gotAll = hits(reader.bm25ScoredAll(terms, boosts = boosts)
      .orderBy(col("score").desc, col("conv_id").asc))
    assert(approxEq(gotAll, expAll))
    // non-positive boosts would break block-max admissibility — rejected
    intercept[IllegalArgumentException](
      reader.bm25TopK(terms, 10, boosts = Map("query" -> 0.0)))
  }

  // ---- multi-term OR membership (terms query / synonym sets) ----

  test("membershipAny = union of the per-term membership sets") {
    val ts = Seq("spark", "merge", "shared_0")
    val exp = ts.map(t => BruteForce.membership(turns, t)
        .collect().map(_.getString(0)).toSet)
      .reduce(_ union _)
    val got = reader.membershipAny(ts).collect().map(_.getString(0)).toSet
    assert(exp.nonEmpty, "vacuous fixture")
    assert(got == exp)
    // the union genuinely exceeds each member on this fixture
    assert(ts.forall(t =>
      BruteForce.membership(turns, t).count() < exp.size))
  }

  test("membershipAny edge cases: single term, absent terms, empties") {
    val single = reader.membershipAny(Seq("spark")).collect().map(_.getString(0)).toSet
    val direct = reader.membership("spark").collect().map(_.getString(0)).toSet
    assert(single == direct)
    // absent terms contribute nothing (and don't fail the scan)
    val mixed = reader.membershipAny(Seq("spark", "qq_absent_zz")).collect()
      .map(_.getString(0)).toSet
    assert(mixed == direct)
    assert(reader.membershipAny(Seq("qq_absent_zz")).collect().isEmpty)
    assert(reader.membershipAny(Nil).collect().isEmpty)
  }

  // ---- significant terms ----

  /** Relational recomputation of significantTerms from the raw turns:
    * fg df = distinct convs per term inside the match set, bg df = global
    * df, JLH = (fr − br)·(fr/br) with the same operation order.
    */
  private def sigOracle(term: String, n: Int): Seq[(String, Long, Long, Double)] = {
    val toks = turns.select(col("conv_id"),
      explode(Tokenize.termsCol(col("text"))).as("term"))
    val tf = toks.groupBy("conv_id", "term").agg(count(lit(1)).as("tf"))
    val fg = toks.where(col("term") === term).select("conv_id").distinct()
    val fgN = fg.count().toDouble
    val nDocs = turns.select("conv_id").distinct().count().toDouble
    val fgDf = tf.join(fg, "conv_id").groupBy("term").agg(count(lit(1)).as("fg_df"))
    val bgDf = tf.groupBy("term").agg(count(lit(1)).as("bg_df"))
    fgDf.join(bgDf, "term").where(col("term") =!= term)
      .withColumn("fr", col("fg_df").cast("double") / lit(fgN))
      .withColumn("br", col("bg_df").cast("double") / lit(nDocs))
      .where(col("fr") > col("br"))
      .withColumn("score", (col("fr") - col("br")) * (col("fr") / col("br")))
      .select("term", "fg_df", "bg_df", "score")
      .orderBy(col("score").desc, col("term").asc).limit(n)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
  }

  test("significantTerms matches the relational JLH recomputation exactly") {
    // 'spark' appears in a strict subset of convs on this fixture, so its
    // match set has genuinely over-represented co-occurring terms
    val exp = sigOracle("spark", 15)
    val got = reader.significantTerms("spark", 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(exp.nonEmpty, "vacuous fixture — query term matches every conv")
    assert(got.map(_._1) == exp.map(_._1), s"terms differ: $got vs $exp")
    assert(got.zip(exp).forall { case ((_, f1, b1, s1), (_, f2, b2, s2)) =>
      f1 == f2 && b1 == b2 && math.abs(s1 - s2) <= 1e-12 * math.max(1.0, math.abs(s2))
    })
    // contract bits: query term excluded, fg df can never exceed bg df
    assert(!got.exists(_._1 == "spark"))
    assert(got.forall { case (_, fgDf, bgDf, _) => fgDf <= bgDf })
  }

  test("significantTerms surfaces a planted co-occurring marker at the top") {
    // plant: 6 convs share a marker term; the SAME 6 convs (and only they)
    // contain the probe term — the marker is maximally over-represented in
    // the probe's match set and must outrank every background term
    val planted = (0 until 40).map { i =>
      val extra = if (i % 7 == 0) " probeterm markerterm" else ""
      (f"p$i%05d", 0, s"base filler words common$extra")
    }.toDF("conv_id", "turn_idx", "text")
    val r2 = TestSpark.freshDir("r5b-sig")
    new IndexWriter(spark, r2, conf).fullBuild(planted, "b0")
    val rd = new IndexReader(spark, r2, conf)
    val got = rd.significantTerms("probeterm", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.head._1 == "markerterm", s"got $got")
    // the filler terms appear in every conv (fr = br) and must NOT appear
    assert(!got.exists(t => Set("base", "filler", "words", "common")(t._1)))
  }

  // ---- phrase-filtered BM25 + numeric range facet ----

  test("phrase-as-filter composition: ranked top-k restricted to phrase docs") {
    import org.apache.spark.sql.expressions.Window
    val rootP = TestSpark.freshDir("r5b-pf")
    new IndexWriter(spark, rootP, conf).fullBuild(turns, "b0")
    new IndexWriter(spark, rootP, conf).buildPositions(turns, "pos0")
    val rd = new IndexReader(spark, rootP, conf)
    // a real corpus bigram matching SOME but not ALL convs, so the filter
    // provably bites (EndToEndSpec's derive-the-bigram pattern)
    val nConvs = turns.select("conv_id").distinct().count()
    val ppos = turns.select(col("conv_id"), col("turn_idx"),
        posexplode(Tokenize.termsCol(col("text"))).as(Seq("tp", "term")))
      .withColumn("pos", row_number().over(
        Window.partitionBy("conv_id").orderBy("turn_idx", "tp")).cast("long") - 1L)
    val big = ppos.as("a").join(ppos.as("b"),
        col("a.conv_id") === col("b.conv_id") && col("b.pos") === col("a.pos") + 1)
      .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
      .agg(countDistinct(col("a.conv_id")).as("nc"))
      .where(col("nc") < nConvs && col("nc") >= 5)
      .orderBy(col("nc").desc, col("t1").asc, col("t2").asc).limit(1).collect()(0)
    val (t1, t2) = (big.getString(0), big.getString(1))
    val phraseConvs = rd.phrase(Seq(t1, t2))
    val keep = phraseConvs.collect().map(_.getString(0)).toSet
    assert(keep.nonEmpty && keep.size < nConvs, s"fixture vacuous: [$t1 $t2]")
    val terms = Seq("query", "filter", "join")
    val exp = hits(BruteForce.bm25(turns, terms, 100000, conf = conf))
      .filter { case (c, _) => keep(c) }.take(10)
    val got = hits(rd.bm25TopKFiltered(terms, 10, phraseConvs))
    assert(exp.nonEmpty, "vacuous fixture — no phrase doc matches the terms")
    assert(approxEq(got, exp))
  }

  test("rangeFacet: ES [from, to) buckets, open ends, boundary inclusive below") {
    // doc-values: conv index as the number; bounds chosen so one conv sits
    // EXACTLY on a bound (must land in the upper bucket — from-inclusive)
    val meta = turns.select("conv_id").distinct()
      .withColumn("v", expr("CAST(substring(conv_id, 5) AS DOUBLE)"))
    val got = reader.rangeFacet("spark", meta, "conv_id", "v", Seq(10.0, 30.0))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // relational recomputation
    val matchSet = BruteForce.membership(turns, "spark")
      .collect().map(_.getString(0)).toSet
    def v(c: String) = c.drop(4).toDouble
    val exp = matchSet.groupBy { c =>
      if (v(c) < 10.0) "*-10" else if (v(c) < 30.0) "10-30" else "30-*"
    }.map { case (b, cs) => (b, cs.size.toLong) }
    assert(got == exp, s"got $got exp $exp")
    assert(got.size == 3, "fixture too small to fill all three buckets")
    // from-inclusive boundary: the conv sitting exactly on a bound must be
    // in the upper bucket — pinned by the relational oracle's < / >= split
    assert(matchSet.exists(c => v(c) == 10.0 || v(c) == 30.0),
      "no conv on a bound — boundary case unexercised")
  }

  test("CLI: bm25 ^boost/MIN/NOT grammar, qany and sig verbs") {
    def capture(verb: String, args: Array[String]): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        killa.cli.Main.run(spark, root, verb, args)
      }
      out.toString.split("\n").toSeq.filter(_.nonEmpty)
    }
    val exp = reader.bm25TopKRows(Seq("query", "filter", "join"), 5,
        mustNot = Seq("spark"), minShouldMatch = 2, boosts = Map("filter" -> 2.5))
      .toSeq.map { case (c, s) => s"$c\t$s" }
    assert(exp.nonEmpty, "vacuous fixture")
    assert(capture("bm25",
      Array("5", "query", "filter^2.5", "join", "MIN", "2", "NOT", "spark")) == exp)
    val expAny = reader.membershipAny(Seq("spark", "merge")).orderBy("conv_id")
      .collect().map(_.getString(0)).toSeq
    assert(capture("qany", Array("spark", "merge")) == expAny)
    val sig = capture("sig", Array("spark", "3"))
    assert(sig.nonEmpty && sig.forall(_.split("\t").length == 4))
  }

  test("significantTerms edge cases: absent probe, empty input") {
    assert(reader.significantTerms("qq_absent_zz", 5).collect().isEmpty)
    assert(reader.significantTerms("", 5).collect().isEmpty)
    assert(reader.significantTerms("spark", 0).collect().isEmpty)
  }
}

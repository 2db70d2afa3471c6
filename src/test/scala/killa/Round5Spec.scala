package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{FieldIndexes, IndexWriter}
import killa.dedup.Dedup
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth

/** Round-5 layer: doc-values filtered BM25 (admission-time include cursor),
  * incremental field-index maintenance, benchmark decontamination, regex
  * alternation guard, rescore-window semantics, one-job facets,
  * multi-generation pagination fallback.
  */
class Round5Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 50, turnsPerConv = 5, seed = 17L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5")
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

  // ---- doc-values filtered BM25 ----

  /** ES filter-context oracle: full global-stats scored set, then keep only
    * filtered convs, then top-k — what admission-time filtering must equal.
    */
  private def filteredOracle(terms: Seq[String], k: Int, keep: Set[String],
      conjunctive: Boolean = false, mustNot: Seq[String] = Nil): Seq[(String, Double)] =
    hits(BruteForce.bm25(turns, terms, 100000, conjunctive = conjunctive,
      conf = conf, mustNot = mustNot))
      .filter { case (c, _) => keep(c) }
      .take(k)

  test("bm25TopKFiltered: exact filtered top-k on all three execution paths, all modes") {
    val allConvs = turns.select("conv_id").distinct().collect().map(_.getString(0)).sorted
    val keep = allConvs.zipWithIndex.collect { case (c, i) if i % 3 != 0 => c }.toSet
    val flt = keep.toSeq.toDF("conv_id")
    val terms = Seq("query", "filter", "join")
    // three execution paths over the same root: driver single-range,
    // driver multi-range pool, distributed fan-out
    val rLocal = new IndexReader(spark, root, conf)
    val rPool = new IndexReader(spark, root, conf.copy(localParBlocks = 0))
    val rDist = new IndexReader(spark, root, conf.copy(localQueryBlocks = 0))
    // conjunctive mode gets a two-term query: requiring all THREE terms in
    // one conv empties the 50-conv fixture (oracle and engine both agree on
    // empty — vacuous, proves nothing)
    for ((qts, conj, ex) <- Seq((terms, false, Nil), (Seq("the", "query"), true, Nil),
        (terms, false, Seq("spark")))) {
      val exp = filteredOracle(qts, 10, keep, conj, ex)
      for ((r, tag) <- Seq((rLocal, "local"), (rPool, "pool"), (rDist, "dist"))) {
        val got = hits(r.bm25TopKFiltered(qts, 10, flt, conj, ex))
        assert(approxEq(got, exp), s"path=$tag conj=$conj ex=$ex")
        assert(got.nonEmpty, s"vacuous fixture path=$tag conj=$conj ex=$ex")
      }
    }
    // every result is actually in the filter, and differs from unfiltered
    val unfiltered = reader.bm25TopKRows(terms, 10).toSeq
    val filtered = hits(reader.bm25TopKFiltered(terms, 10, flt))
    assert(filtered.forall { case (c, _) => keep(c) })
    assert(filtered != unfiltered, "filter did not bite — fixture vacuous")
    // the k-th filtered hit is exact, not a post-filtered hole: a doc-values
    // filter admitting everything reproduces the unfiltered ranking
    val all = allConvs.toSeq.toDF("conv_id")
    assert(approxEq(hits(reader.bm25TopKFiltered(terms, 10, all)), unfiltered))
    // empty filter → empty result
    assert(reader.bm25TopKFiltered(terms, 10,
      Seq.empty[String].toDF("conv_id")).isEmpty)
    // filter of unknown convs → empty (dictionary join drops them)
    assert(reader.bm25TopKFiltered(terms, 10,
      Seq("zzz_not_a_conv").toDF("conv_id")).isEmpty)
  }

  // ---- regex alternation guard (ADVICE r4 high) ----

  test("membershipRegex: alternation disables prefix pushdown — find semantics preserved") {
    val toks = turns
      .select(col("conv_id"), explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("term"))
    // '^zzz|shared' under Java find semantics matches 'shared' ANYWHERE —
    // the old pushdown ANDed startsWith("zzz") and returned nothing
    for (p <- Seq("^zzz|shared", "^the$|^spark$", "^sh(ared|ine)_[0-9]$", "^a\\|b$")) {
      val exp = toks.where(col("term").rlike(p)).select("conv_id").distinct()
        .collect().map(_.getString(0)).toSet
      val got = reader.membershipRegex(p).collect().map(_.getString(0)).toSet
      assert(got == exp, s"pattern=$p")
    }
    assert(reader.membershipRegex("^zzz|shared").collect().nonEmpty,
      "alternation result empty — prefix over-pruned")
  }

  // ---- rescore window < k (ADVICE r4) ----

  test("rescoreTopK with window < k: factor multiplies only the window rows") {
    val terms = Seq("query", "filter", "join")
    val base = reader.bm25TopKRows(terms, 10).toSeq
    assert(base.length == 10, "fixture too small")
    val factors = base.map { case (c, _) => (c, 0.1) }.toDF("conv_id", "factor")
    val window = 3
    val exp = (base.take(window).map { case (c, s) => (c, s * 0.1) } ++ base.drop(window))
      .sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.rescoreTopK(terms, 10, window, factors))
    assert(approxEq(got, exp))
    // rows beyond the window kept their base scores (the old bug multiplied
    // the factor into all fetched rows)
    val baseMap = base.toMap
    assert(got.count { case (c, s) => baseMap.get(c).contains(s) } == 10 - window)
  }

  // ---- incremental field-index maintenance ----

  test("FieldIndexes.applyChanges: incremental batch equals a fresh per-field rebuild") {
    val partial = turns.where(col("turn_idx") < 3)
    val incrRoot = TestSpark.freshDir("r5fi")
    val values = FieldIndexes.build(spark, incrRoot, partial, "role", conf)
    FieldIndexes.applyChanges(spark, incrRoot, "role", values, turns, batchId = "d1", conf = conf)
    val freshRoot = TestSpark.freshDir("r5ff")
    FieldIndexes.build(spark, freshRoot, turns, "role", conf)
    for (v <- values) {
      val ri = FieldIndexes.reader(spark, incrRoot, "role", v, conf)
      val rf = FieldIndexes.reader(spark, freshRoot, "role", v, conf)
      assert(ri.membership("the").collect().map(_.getString(0)).sorted.toSeq ==
        rf.membership("the").collect().map(_.getString(0)).sorted.toSeq, s"value=$v")
      // ranking too: the sub-index's OWN stats (N, avgdl, df) must have
      // shifted with its corpus, not just the membership sets
      assert(approxEq(ri.bm25TopKRows(Seq("query", "filter"), 10).toSeq,
        rf.bm25TopKRows(Seq("query", "filter"), 10).toSeq, tol = 1e-9), s"value=$v")
      assert(ri.manifest.get.numDocs == rf.manifest.get.numDocs, s"value=$v numDocs")
      assert(math.abs(ri.manifest.get.avgdl - rf.manifest.get.avgdl) < 1e-9, s"value=$v avgdl")
    }
  }

  test("FieldIndexes.applyChanges: a conv losing ALL turns of a value leaves that sub-index") {
    val incrRoot = TestSpark.freshDir("r5fe")
    val values = FieldIndexes.build(spark, incrRoot, turns, "role", conf)
    val victim = FieldIndexes.reader(spark, incrRoot, "role", values.head, conf)
      .membership("the").limit(1).collect()(0).getString(0)
    // new content of the victim conv: ONE turn, a role that is NOT values.head
    val other = values(1)
    val batch = Seq((victim, 0, other, "replacement content only", "", new java.sql.Timestamp(0L)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    FieldIndexes.applyChanges(spark, incrRoot, "role", values, batch, batchId = "d2", conf = conf)
    // gone from values.head's sub-index...
    val after = FieldIndexes.reader(spark, incrRoot, "role", values.head, conf)
    assert(!after.membership("the").collect().map(_.getString(0)).contains(victim),
      "stale content survived in the emptied value's sub-index")
    // ...and present in `other`'s with the new content
    val ro = FieldIndexes.reader(spark, incrRoot, "role", other, conf)
    assert(ro.membership("replacement").collect().map(_.getString(0)).contains(victim))
  }

  test("FieldIndexes.valueRoot is injective for values that sanitize alike") {
    assert(FieldIndexes.valueRoot("/r", "f", "a/b") != FieldIndexes.valueRoot("/r", "f", "a:b"))
    assert(FieldIndexes.valueRoot("/r", "f", "x") == FieldIndexes.valueRoot("/r", "f", "x"))
  }

  // ---- one-job facets ----

  test("facetCounts: correct counts; ONE Spark job cold, ZERO warm") {
    val froot = TestSpark.freshDir("r5fc")
    val values = FieldIndexes.build(spark, froot, turns, "role", conf)
    // expected: per role, distinct convs whose turns of that role contain the term
    val exp = values.map { v =>
      v -> BruteForce.membership(turns.where(col("role") === v), "query").count()
    }.filter(_._2 > 0L).toMap
    var cold: Seq[(String, Long)] = Nil
    val nCold = jobsFor("facet-cold") {
      cold = FieldIndexes.facetCounts(spark, froot, "role", values, "query", conf)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    assert(cold.toMap == exp)
    assert(nCold <= 1, s"cold facet submitted $nCold jobs — per-value loop came back?")
    val nWarm = jobsFor("facet-warm") {
      val warm = FieldIndexes.facetCounts(spark, froot, "role", values, "query", conf)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(warm == cold)
    }
    assert(nWarm == 0, s"warm facet submitted $nWarm jobs — result cache missed?")
  }

  // ---- benchmark decontamination ----

  test("contaminationReport: planted benchmark quote caught, clean doc not") {
    val bench = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "pack my box with five dozen liquor jugs right now")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim quote of bench doc 0 → overlap 1.0
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      // half-contaminated: leading 6 tokens quote bench doc 1, rest fresh
      (11L, "pack my box with five dozen apples from the orchard basket"),
      // clean
      (12L, "completely unrelated sentence about distributed index maintenance"),
      // too short to assess (< 3 tokens) — omitted
      (13L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationReport(corpus, bench, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(got.contains(10L) && got(10L) == 1.0, s"verbatim quote missed: $got")
    assert(got.contains(11L) && got(11L) > 0.3 && got(11L) < 1.0,
      s"partial quote misjudged: $got")
    assert(!got.contains(12L), "clean doc flagged")
    assert(!got.contains(13L), "unassessable doc flagged")
    // at threshold 0.9 only the verbatim quote survives
    val strict = Dedup.contaminationReport(corpus, bench, "doc_id", "text", 3, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(10L))
  }

  // ---- multi-generation pagination fallback ----

  test("bm25TopKAfter on a maintained (multi-generation) index pages the exact total order") {
    val mroot = TestSpark.freshDir("r5pg")
    new IndexWriter(spark, mroot, conf).fullBuild(turns, "b0")
    // a rename breaks docId-order ≡ conv-order (label moves over a fixed id)
    new killa.maintain.IndexMaintainer(spark, mroot, conf)
      .rename("conv000003", "zzz999999", "d1")
    val r = new IndexReader(spark, mroot, conf)
    assert(r.manifest.get.batchSeq > 0, "fixture did not become multi-generation")
    val terms = Seq("query", "filter", "join")
    val all = r.bm25TopKRows(terms, 30).toSeq
    assert(all.length > 20, "fixture too small to page")
    val p1 = all.take(10)
    val p2 = hits(r.bm25TopKAfter(terms, 10, p1.last._1, p1.last._2))
    assert(approxEq(p2, all.slice(10, 20)),
      s"page 2 diverged from the exact total order")
    val p3 = hits(r.bm25TopKAfter(terms, 10, all(19)._1, all(19)._2))
    assert(approxEq(p3, all.slice(20, 30)))
  }

  // ---- MLT df-scan bucket pruning (VERDICT r4 wrong #2) ----

  test("termBucketPaths prunes the MLT df scan to the selected terms' dirs, losslessly") {
    val all = reader.prunedBucketPaths(None, None)
    assert(all.size >= 4, s"fixture spread too narrow: ${all.size} buckets")
    for (ts <- Seq(Seq("query"), Seq("spark", "filter"), Seq("the", "query", "join"))) {
      val pruned = reader.termBucketPaths(ts)
      assert(pruned.nonEmpty, s"false prune for $ts")
      assert(pruned.size <= ts.size && pruned.size < all.size,
        s"terms $ts pruned to ${pruned.size} of ${all.size} dirs — no pruning?")
      assert(pruned.toSet.subsetOf(all.toSet))
      // lossless: df read from the pruned dirs equals df over ALL dirs
      def dfOver(paths: Seq[String]) = spark.read.parquet(paths: _*)
        .where(col("term").isin(ts: _*))
        .groupBy("term").agg(max(col("df")).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dfOver(pruned) == dfOver(all), s"pruned df diverged for $ts")
    }
    assert(reader.termBucketPaths(Nil).isEmpty)
    // moreLikeThis (the consumer) still answers on the pruned scan
    val conv = turns.select("conv_id").limit(1).collect()(0).getString(0)
    assert(reader.moreLikeThis(conv, 5, 10, maxDfPct = 100).collect().nonEmpty)
  }

  // ---- suggest df across maintenance generations (ADVICE r4 low #5) ----

  test("suggest df stays global-exact on a maintained (multi-generation) store") {
    val sroot = TestSpark.freshDir("r5sg")
    new IndexWriter(spark, sroot, conf).fullBuild(turns, "b0")
    // one content batch: a new candidate term ("sparky") enters via an update
    // AND one conv holding the probe's neighbors is deleted — df of every
    // affected candidate must be the CURRENT-corpus count, not a stale max
    // over generations (the store rewrites a touched term's bucket whole and
    // stamps global df into every block; this pins that invariant end to end)
    val batch = Seq(("conv000001", 0, "user", "sparky sparks the spark demo", "",
      new java.sql.Timestamp(0L))).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    new killa.maintain.IndexMaintainer(spark, sroot, conf)
      .applyChangesDf(batch, Some(Seq("conv000002").toDF("conv_id")), Map.empty, "d1")
    val cur = turns.where(!col("conv_id").isin("conv000001", "conv000002"))
      .unionByName(batch)
    val exp = cur
      .select(col("conv_id"), explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("term"))
      .where(levenshtein(col("term"), lit("spark")) <= 1 && col("term") =!= "spark")
      .groupBy("term").agg(countDistinct(col("conv_id")).as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exp.exists(_._1 == "sparky"), "fixture vacuous: new-generation candidate absent")
    val got = new IndexReader(spark, sroot, conf).suggest("spark", 1, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exp, s"suggest df diverged from current-corpus truth: got=$got exp=$exp")
  }

  test("suggest prefix boost: same-initial candidates outrank higher-df ones") {
    // planted corpus: "sow" neighbors on BOTH sides of the prefix boost with
    // dfs arranged so the boost visibly reorders (cow df 4 > now df 3 >
    // sox df 2 > son df 1; boosted order puts the two s-initials first)
    val rows = (0 until 4).map(i => (f"p$i%03d", 0, "user", "cow grass", "",
        new java.sql.Timestamp(0L))) ++
      (4 until 7).map(i => (f"p$i%03d", 0, "user", "now then", "",
        new java.sql.Timestamp(0L))) ++
      (7 until 9).map(i => (f"p$i%03d", 0, "user", "sox laundry", "",
        new java.sql.Timestamp(0L))) ++
      Seq(("p009", 0, "user", "son daughter sow", "", new java.sql.Timestamp(0L)))
    val planted = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val proot = TestSpark.freshDir("r5sp")
    new IndexWriter(spark, proot, conf).fullBuild(planted, "b0")
    val r = new IndexReader(spark, proot, conf)
    val got = r.suggest("sow", 1, 5, boostPrefixLen = 1).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got == Seq(("sox", 2L), ("son", 1L), ("cow", 4L), ("now", 3L)),
      s"boosted order wrong: $got")
    // boost off reproduces the pure df order (regression on the default path)
    val gotPlain = r.suggest("sow", 1, 5).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(gotPlain == Seq(("cow", 4L), ("now", 3L), ("sox", 2L), ("son", 1L)))
  }

  // ---- MinHash banding after the allocation-free band hash ----

  test("minhashLshPairs: planted near-dups still found after the allocation-free band hash") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = Seq(
      (0L, base),
      (1L, base),                                       // exact dup → jaccard 1.0
      (2L, base.replace("mu", "nu")),                   // near dup
      (3L, "totally different words about something else entirely here today now")
    ).toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 64, 16, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 1L)), "fixture lost its planted dup")
    assert(lsh.subsetOf(exact), "LSH emitted a pair the exact verify should have killed")
    assert(lsh == exact, s"recall dropped after band-hash change: missing ${exact -- lsh}")
  }

  /** Count the Spark jobs `f` submits on this thread (ServeSpec's helper). */
  private def jobsFor(tag: String)(f: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try f finally sc.clearJobGroup()
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(tag).length
    var tries = 0
    while (cur != last && tries < 100) {
      last = cur; Thread.sleep(30)
      cur = sc.statusTracker.getJobIdsForGroup(tag).length
      tries += 1
    }
    cur
  }
}

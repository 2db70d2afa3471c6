package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.IndexReader

/** Round-5h surfaces: span_containing / span_within, filters +
  * adjacency_matrix + rare_terms aggregations, date-histogram pipeline
  * aggs, terms_set, and fuzzy prefix_length.
  */
class Round5hSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, i, txt) =>
      Turn(c, i, "user", txt, "", new Timestamp(epoch + i * 1000L))
    }.toDS().toDF()

  private def convs(df: DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).sorted.toSeq

  private def posReader(tag: String, corpus: DataFrame): IndexReader = {
    val root = TestSpark.freshDir(tag)
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexWriter(spark, root, conf).buildPositions(corpus, "pos0")
    new IndexReader(spark, root, conf)
  }

  private def plainReader(tag: String, corpus: DataFrame): IndexReader = {
    val root = TestSpark.freshDir(tag)
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexReader(spark, root, conf)
  }

  // ---- span_containing / span_within ----

  private lazy val spanCorpus = mkTurns(
    ("s1", 0, "alpha mid beta"),                 // big [0,2] needs slop >= 1
    ("s2", 0, "beta mid alpha"),                 // reversed — ordered must miss
    ("s3", 0, "alpha beta mid"),                 // mid outside [0,1]
    ("s4", 0, "alpha mid mid beta x"),           // two mids inside [0,3]
    ("s5", 0, "alpha mid beta alpha mid beta"),  // two disjoint spans
    ("s6", 0, "alpha mid"), ("s6", 1, "beta x"), // cross-turn: beta global@2
    ("s7", 0, "alpha alpha mid beta beta"))      // overlapping spans, one mid

  test("spanContaining: ordered window with the little inside, endpoints inclusive") {
    val rd = posReader("r5hsc", spanCorpus)
    // slop 0: only adjacent alpha-beta pairs — none has a mid between
    assert(convs(rd.spanContaining("alpha", "beta", 0, "mid")) == Seq.empty)
    // slop 1: [p, p+2] windows admit alpha-mid-beta (s7 via alpha@1-beta@3)
    assert(convs(rd.spanContaining("alpha", "beta", 1, "mid")) ==
      Seq("s1", "s5", "s6", "s7"))
    // slop 3 widens to s4 (beta@3)
    assert(convs(rd.spanContaining("alpha", "beta", 3, "mid")) ==
      Seq("s1", "s4", "s5", "s6", "s7"))
    // reversed big pair never matches an ordered span
    assert(!convs(rd.spanContaining("alpha", "beta", 9, "mid")).contains("s2"))
    // absent little → empty
    assert(rd.spanContaining("alpha", "beta", 9, "zzz").isEmpty)
  }

  test("spanWithin: counts DISTINCT covered little positions, overlap-safe") {
    val rd = posReader("r5hsw", spanCorpus)
    val hits = rd.spanWithin("alpha", "beta", 3, "mid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // s4: two mids inside one span; s5: one per span; s7: ONE mid although
    // two (p, q) spans cover it — the distinct-position contract
    assert(hits == Map("s1" -> 1L, "s4" -> 2L, "s5" -> 2L, "s6" -> 1L, "s7" -> 1L))
    // doc set identical to spanContaining by construction
    assert(hits.keySet == convs(rd.spanContaining("alpha", "beta", 3, "mid")).toSet)
  }

  // ---- filters / adjacency_matrix / rare_terms aggs ----

  private lazy val aggCorpus = mkTurns(
    ("f1", 0, "x y"), ("f2", 0, "x"), ("f3", 0, "y z"))

  test("filtersAgg: per-name doc counts from metadata; absent term omitted") {
    val rd = plainReader("r5hfa", aggCorpus)
    val got = rd.filtersAgg(Seq("ax" -> "x", "by" -> "y", "cz" -> "z",
      "miss" -> "zzz", "dx" -> "x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a term may back two names; an absent term emits no bucket
    assert(got == Map("ax" -> 2L, "by" -> 2L, "cz" -> 1L, "dx" -> 2L))
    intercept[IllegalArgumentException] {
      rd.filtersAgg(Seq("dup" -> "x", "dup" -> "y")).collect()
    }
  }

  test("adjacencyMatrix: singles + lexicographic pair keys, empty pairs omitted") {
    val rd = plainReader("r5ham", aggCorpus)
    val got = rd.adjacencyMatrix(Seq("a" -> "x", "b" -> "y", "c" -> "z"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // x&z never co-occur → no a&c key; pair keys always smaller-name first
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "a&b" -> 1L, "b&c" -> 1L))
  }

  test("rareTerms: df ceiling, (df asc, term asc) order, limit") {
    // dfs: x=3, y=2, z=1
    val rd = plainReader("r5hrt", mkTurns(
      ("r1", 0, "x y z"), ("r2", 0, "x y"), ("r3", 0, "x")))
    val got = rd.rareTerms(2L, 10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("z", 1L), ("y", 2L)))
    assert(rd.rareTerms(2L, 1).collect().map(_.getString(0)).toSeq == Seq("z"))
    assert(rd.rareTerms(0L, 10).isEmpty)
  }

  // ---- date-histogram pipeline aggs ----

  test("dateHistogramPipeline: cumulative sum, null-first derivative, partial-window mavg") {
    // hits per minute bucket: 1, 2, 1
    val corpus = mkTurns(
      ("d1", 0, "hit a"), ("d2", 0, "hit b"), ("d3", 0, "hit c"), ("d4", 0, "hit d"))
    val rd = posReader("r5hdp", corpus)
    val meta = Seq(
      ("d1", new Timestamp(epoch)),
      ("d2", new Timestamp(epoch + 60000L)),
      ("d3", new Timestamp(epoch + 61000L)),
      ("d4", new Timestamp(epoch + 120000L))).toDF("conv_id", "ts")
    val rows = rd.dateHistogramPipeline("hit", meta, "conv_id", "ts", "minute", 3)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 1L))          // hits
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 3L, 4L))          // cum_hits
    assert(rows(0).isNullAt(3))                                      // ES: no first deriv
    assert(rows.drop(1).map(_.getLong(3)).toSeq == Seq(1L, -1L))     // deriv
    // trailing window of 3, partial windows averaged over what exists
    assert(rows.map(_.getDouble(4)).toSeq == Seq(1.0, 1.5, 1.3333))
  }

  // ---- terms_set ----

  test("termsSet: per-doc minimum from doc values, null/zero/overshoot edges") {
    val corpus = mkTurns(
      ("t1", 0, "x y"),    // matched 2
      ("t2", 0, "x"),      // matched 1
      ("t3", 0, "x y z"),  // matched 3
      ("t4", 0, "x y"))    // matched 2, null minimum
    val rd = plainReader("r5hts", corpus)
    val meta = Seq[(String, String)](
      ("t1", "2"),   // 2 >= 2 → match
      ("t2", "0"),   // min < 1 never matches (ES edge)
      ("t3", "4"),   // above its matched count → fails
      ("t4", null)). // null minimum never matches
      toDF("conv_id", "min_req")
    val got = rd.termsSet(Seq("x", "y", "z"), meta, "conv_id", "min_req")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("t1" -> 2L))
    // drop t3's bar to 3 → exact-boundary match
    val meta2 = Seq(("t3", "3")).toDF("conv_id", "min_req")
    assert(rd.termsSet(Seq("x", "y", "z"), meta2, "conv_id", "min_req")
      .collect().map(r => r.getString(0)).toSeq == Seq("t3"))
  }

  // ---- fuzzy prefix_length ----

  test("membershipFuzzy prefixLength: literal head prunes cross-prefix candidates") {
    val corpus = mkTurns(
      ("p1", 0, "bat flies"), ("p2", 0, "cat naps"), ("p3", 0, "bats swarm"))
    val rd = plainReader("r5hfz", corpus)
    // no prefix: 'cat' is within edit 1 of 'bat'
    assert(convs(rd.membershipFuzzy("bat", 1)) == Seq("p1", "p2", "p3"))
    // prefix 'b' drops it; 'bats' (suffix edit) survives
    assert(convs(rd.membershipFuzzy("bat", 1, prefixLength = 1)) == Seq("p1", "p3"))
    // prefixLength beyond the query length degrades to the whole-term prefix
    assert(convs(rd.membershipFuzzy("bat", 1, prefixLength = 9)) == Seq("p1", "p3"))
  }
}

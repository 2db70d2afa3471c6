package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.{IndexReader, QueryStringFull => Q}

/** Full query_string dialect: keyword operators, field scoping, term
  * ranges, fuzzy/wildcard leaves, group boosts, and the constant-score
  * pure-filter path — parser pinned clause by clause, planner pinned
  * against hand-computed match sets on a tiny corpus.
  */
class QueryStringFullSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def build(corpus: DataFrame, positions: Boolean = false): IndexReader = {
    val root = TestSpark.freshDir("qsf")
    val w = new IndexWriter(spark, root, conf)
    w.fullBuild(corpus, "b0")
    if (positions) w.buildPositions(corpus, "pos1")
    new IndexReader(spark, root, conf)
  }

  private def members(df: DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  // ---------------------------------------------------------------- parser

  test("parser: keyword operators are the symbol operators; OR is the default") {
    assert(Q.parse("a AND b") == Q.parse("a + b"))
    assert(Q.parse("a OR b") == Q.parse("a | b"))
    assert(Q.parse("a && b") == Q.parse("a + b"))
    assert(Q.parse("a || b") == Q.parse("a | b"))
    assert(Q.parse("a NOT b") == Q.parse("a -b"))
    // default operator OR (the ES query_string default)
    assert(Q.parse("a b") == Q.parse("a | b"))
    assert(Q.parse("a b", defaultAnd = true) == Q.parse("a + b"))
  }

  test("parser: leaf classification — scope, range, fuzzy, wildcard, prefix, boosts") {
    assert(Q.parse("role:assistant").pos.head._2 == Q.Scoped("role", "assistant"))
    assert(Q.parse("[aa TO bb]").pos.head._2 ==
      Q.Range(Some("aa"), Some("bb"), incLo = true, incHi = true))
    assert(Q.parse("{aa TO *}").pos.head._2 ==
      Q.Range(Some("aa"), None, incLo = false, incHi = false))
    assert(Q.parse("word~").pos.head._2 == Q.Fuzzy("word", 2)) // Lucene default
    assert(Q.parse("word~1").pos.head._2 == Q.Fuzzy("word", 1))
    assert(Q.parse("w?rd").pos.head._2 == Q.Wildcard("w?rd"))
    assert(Q.parse("w*rd").pos.head._2 == Q.Wildcard("w*rd"))
    assert(Q.parse("wor*").pos.head._2 == Q.Prefix("wor")) // trailing-only stays scoring
    assert(Q.parse("word^2.5").pos.head._2 == Q.Term("word", 2.5))
    assert(Q.parse("(a b)^3").pos.head._2.asInstanceOf[Q.Group].boost == 3.0)
    intercept[IllegalArgumentException](Q.parse("word~3"))
    intercept[IllegalArgumentException](Q.parse("[aa bb]"))
    intercept[IllegalArgumentException](Q.parse("a AND"))
    intercept[IllegalArgumentException](Q.parse("a ] b")) // stray close bracket
  }

  test("parser: group boosts multiply through nesting in scoringTerms") {
    val corpus = mkTurns(("a", 0, "x y z"))
    val r = build(corpus)
    val (_, boosts) = Q.scoringTerms(r, Q.parse("((x^2 y)^3 z)^0.5"))
    assert(boosts("x") == 3.0)  // 2 · 3 · 0.5
    assert(boosts("y") == 1.5)  // 3 · 0.5
    assert(boosts.get("z").contains(0.5))
  }

  // --------------------------------------------------------------- planner

  test("matchSet: ranges, fuzzy, wildcard, and NOT compose; filter leaves score nothing") {
    val corpus = mkTurns(
      ("a", 0, "sort alpha"),
      ("b", 60, "spark alpha"),
      ("c", 120, "stream alpha"),
      ("d", 180, "scan beta"),
      ("e", 240, "sort beta dup"))
    val r = build(corpus)
    // [so TO st} = terms in [so, st): sort, spark — not stream, not scan
    assert(members(Q.matchSet(r, Q.parse("[so TO st}"), Q.noFields)) ==
      Set("a", "b", "e"))
    assert(members(Q.matchSet(r, Q.parse("[so TO st} AND alpha NOT dup"), Q.noFields)) ==
      Set("a", "b"))
    // fuzzy ~1 of 'sprak' matches spark via one transposition (OSA)
    assert(members(Q.matchSet(r, Q.parse("sprak~1"), Q.noFields)) == Set("b"))
    // wildcard s??n matches scan only
    assert(members(Q.matchSet(r, Q.parse("s??n"), Q.noFields)) == Set("d"))
    // filter leaves contribute no scoring terms
    val (terms, _) = Q.scoringTerms(r, Q.parse("[so TO st} AND s??n AND sprak~1 AND alpha"))
    assert(terms == Seq("alpha"))
  }

  test("topK: scored path matches bm25TopKFiltered composition; ranking exact") {
    val corpus = mkTurns(
      ("a", 0, "alpha alpha sort"),
      ("b", 60, "alpha spark"),
      ("c", 120, "alpha stream"),   // outside the range filter
      ("d", 180, "beta sort"))      // no alpha
    val r = build(corpus)
    val got = Q.topK(r, "alpha AND [so TO st}", 10).collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val want = r.bm25TopKFiltered(Seq("alpha"), 10,
      r.membershipTermRangeBounds(Some("so"), Some("st"), incLo = true, incHi = false))
      .collect().map(x => (x.getString(0), x.getDouble(1)))
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._1).toSet == Set("a", "b"))
    // doc a has tf(alpha) = 2: strictly higher score, first
    assert(got.head._1 == "a" && got.head._2 > got(1)._2)
  }

  test("topK: pure filter is constant-score 1.0, conv asc, limited to k") {
    val corpus = mkTurns(
      ("a", 0, "sort x"), ("b", 60, "spark y"), ("c", 120, "stream z"))
    val r = build(corpus)
    val got = Q.topK(r, "[so TO st]", 2).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    // [so TO st] inclusive-hi still excludes stream ('stream' > 'st')
    assert(got == Seq(("a", 1.0), ("b", 1.0)))
  }

  test("scoped clauses resolve through the field resolver; unmapped fields match nothing") {
    val corpus = mkTurns(("a", 0, "x"), ("b", 60, "y"))
    val r = build(corpus)
    // resolver mapping any (f, v) to the main index: scope = all live convs
    val all: Q.FieldResolver = (_, _) => Some(r)
    assert(members(Q.matchSet(r, Q.parse("role:anything"), all)) == Set("a", "b"))
    assert(members(Q.matchSet(r, Q.parse("role:anything"), Q.noFields)).isEmpty)
    // scoped is filter-context: alone it constant-scores
    val got = Q.topK(r, "role:anything", 5, fields = all).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(got == Seq(("a", 1.0), ("b", 1.0)))
  }

  test("allMembers and open ranges: [* TO *] is the match_all surface") {
    val corpus = mkTurns(("a", 0, "x"), ("b", 60, "y"), ("c", 120, "z"))
    val r = build(corpus)
    assert(members(r.allMembers) == Set("a", "b", "c"))
    assert(members(Q.matchSet(r, Q.parse("[* TO *]"), Q.noFields)) ==
      Set("a", "b", "c"))
    assert(members(Q.matchSet(r, Q.parse("[y TO *]"), Q.noFields)) == Set("b", "c"))
  }
}

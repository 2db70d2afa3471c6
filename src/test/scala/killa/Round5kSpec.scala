package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.{IndexReader, QueryString}
import killa.query.QueryString._
import killa.synth.Synth

/** Round-5k layer: the query-string mini-language (ES simple_query_string /
  * Lucene SimpleQueryParser) — parser shapes, per-group Lucene negation,
  * boolean match-set algebra, and rank identity of the compiled plan with
  * the hand-composed kernel surfaces it lowers onto.
  */
class Round5kSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 50, turnsPerConv = 5, seed = 23L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5k")
    val w = new IndexWriter(spark, r, conf)
    w.fullBuild(turns, "b0")
    w.buildPositions(turns, "pos0") // phrase clauses need the positional index
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def members(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.getString(0)).toSet

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  // ---- parser ----

  test("parser: operators, boosts, phrases, prefixes, groups") {
    val g = parse("""query^2 +(filter | join) -batch "agg mode"~1 pre*""")
    assert(g.neg == Seq(Term("batch")))
    assert(g.pos.map(_._2) == Seq(
      Term("query", 2.0),
      Group(Seq((false, Term("filter")), (true, Term("join"))), Nil),
      Phrase(Seq("agg", "mode"), 1),
      Prefix("pre")))
    // defaultAnd = true → implicit joins are conjunctive (orWithPrev = false)
    assert(g.pos.tail.forall(!_._1))
    // defaultAnd = false flips only the implicit joins
    val gOr = parse("a b + c", defaultAnd = false)
    assert(gOr.pos.map(_._1) == Seq(false, true, false))
  }

  test("parser: mid-word '-' is data, clause-head '-' is negation") {
    val g = parse("re-index -bad")
    assert(g.pos.map(_._2) == Seq(Term("re-index")))
    assert(g.neg == Seq(Term("bad")))
  }

  test("parser: malformed inputs are rejected") {
    intercept[IllegalArgumentException](parse("\"unterminated"))
    intercept[IllegalArgumentException](parse("a | "))
    intercept[IllegalArgumentException](parse("(a"))
    intercept[IllegalArgumentException](parse("a)b)"))
    intercept[IllegalArgumentException](parse("w^0.0"))
    intercept[IllegalArgumentException](parse("*"))
    intercept[IllegalArgumentException](parse("a*b"))
  }

  // ---- match-set algebra ----

  private def m(t: String): Set[String] = members(reader.membership(t))

  test("matchSet: AND / OR / NOT fold left-to-right, per-group negation") {
    val want = (m("query") intersect (m("filter") union m("join"))) diff m("batch")
    val got = members(QueryString.matchSet(reader,
      parse("query +(filter | join) -batch")))
    assert(got == want && got.nonEmpty)
    // a | -b is Lucene bool semantics: the MUST_NOT excludes from the whole
    // group, not from one branch
    assert(members(QueryString.matchSet(reader, parse("query | -batch"))) ==
      (m("query") diff m("batch")))
  }

  test("matchSet: pure-negative group matches nothing") {
    assert(members(QueryString.matchSet(reader, parse("-query"))).isEmpty)
  }

  test("matchSet: phrase and prefix clauses use their engine surfaces") {
    val phr = members(reader.phrase(Seq("batch", "agg")).select("conv_id").distinct())
    assert(members(QueryString.matchSet(reader, parse("\"batch agg\""))) == phr)
    val exp = reader.expandPrefix("qu", 50)
    assert(exp.nonEmpty)
    assert(members(QueryString.matchSet(reader, parse("qu*"))) ==
      members(reader.membershipAny(exp)))
  }

  // ---- ranked plan lowering ----

  test("topK: flat conjunction/disjunction take the plain kernel fast path") {
    assert(approxEq(hits(QueryString.topK(reader, "query filter -batch", 10)),
      hits(reader.bm25TopK(Seq("query", "filter"), 10, conjunctive = true,
        mustNot = Seq("batch")))))
    assert(approxEq(hits(QueryString.topK(reader, "query | filter", 10)),
      hits(reader.bm25TopK(Seq("query", "filter"), 10))))
  }

  test("topK: structural query ≡ filtered kernel over the boolean set") {
    val q = "query^2 +(filter | join) -batch"
    val byHand = reader.bm25TopKFiltered(Seq("query", "filter", "join"), 10,
      QueryString.matchSet(reader, parse(q)), boosts = Map("query" -> 2.0))
    assert(approxEq(hits(QueryString.topK(reader, q, 10)), hits(byHand)))
    assert(hits(QueryString.topK(reader, q, 10)).nonEmpty)
  }

  test("topK: phrase clause filters positionally AND scores by members") {
    val q = "\"batch agg\" | spark"
    val got = hits(QueryString.topK(reader, q, 10, defaultAnd = false))
    val setWant = members(reader.phrase(Seq("batch", "agg"))
      .select("conv_id").distinct()) union m("spark")
    val byHand = reader.bm25TopKFiltered(Seq("batch", "agg", "spark"), 10,
      QueryString.matchSet(reader, parse(q, defaultAnd = false)))
    assert(approxEq(got, hits(byHand)))
    assert(got.map(_._1).toSet.subsetOf(setWant))
  }

  test("topK: empty/no-positive queries return the empty hits frame") {
    assert(hits(QueryString.topK(reader, "-query", 10)).isEmpty)
    assert(hits(QueryString.topK(reader, "zzz-no-such-term", 10)).isEmpty)
  }
}

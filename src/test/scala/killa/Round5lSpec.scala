package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.query.{IndexReader, ShardedSearch}
import killa.synth.Synth

/** Round-5l layer: sharded search with exact merged statistics (the ES
  * dfs_query_then_fetch) — a corpus split across independent index roots
  * must rank IDENTICALLY (ids AND scores) to one index over the union
  * corpus, for every kernel mode, at every split shape.
  */
class Round5lSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 60, turnsPerConv = 5, seed = 31L)
    .toDF().persist()

  private def build(df: org.apache.spark.sql.DataFrame, tag: String): IndexReader = {
    val r = TestSpark.freshDir(s"r5l-$tag")
    new IndexWriter(spark, r, conf).fullBuild(df, s"b-$tag")
    new IndexReader(spark, r, conf)
  }

  private lazy val whole = build(turns, "whole")

  private def convNum = expr("CAST(substring(conv_id, 5) AS INT)") // 'conv%06d'

  // two-way split by conv parity
  private lazy val shards2 = Seq(
    build(turns.where(convNum % 2 === 0), "even"),
    build(turns.where(convNum % 2 === 1), "odd"))

  // three-way UNEVEN split (one shard gets a single conv) — the skew case
  private lazy val shards3 = Seq(
    build(turns.where(convNum === 0), "solo"),
    build(turns.where(convNum > 0 && convNum % 3 === 1), "m1"),
    build(turns.where(convNum > 0 && convNum % 3 =!= 1), "rest"))

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  test("mergedStats reproduces the union corpus's stats bit-exactly") {
    val terms = Seq("query", "filter", "the", "zz-absent")
    val s2 = ShardedSearch.mergedStats(shards2, terms)
    val m = whole.manifest.get
    assert(s2.numDocs == m.numDocs)
    assert(s2.avgdl == m.avgdl) // same Σtokens/Σdocs expression → bit-equal
    val wholeDf = whole.termDf(terms)
    terms.foreach(t => assert(s2.df(t) == wholeDf(t), t))
    assert(s2.df("zz-absent") == 0L)
  }

  test("disjunctive top-k: 2-way split ≡ single index, ids AND scores") {
    val want = hits(whole.bm25TopK(Seq("query", "filter", "join"), 10))
    val got = hits(ShardedSearch.bm25TopK(spark, shards2,
      Seq("query", "filter", "join"), 10))
    assert(want.nonEmpty && approxEq(got, want))
  }

  test("conjunctive + mustNot + boosts survive an uneven 3-way split") {
    val want = hits(whole.bm25TopK(Seq("query", "filter"), 10,
      conjunctive = true, mustNot = Seq("batch")))
    val got = hits(ShardedSearch.bm25TopK(spark, shards3,
      Seq("query", "filter"), 10, conjunctive = true, mustNot = Seq("batch")))
    assert(want.nonEmpty && approxEq(got, want))

    val wantB = hits(whole.bm25TopK(Seq("query", "filter", "join"), 10,
      boosts = Map("join" -> 3.0)))
    val gotB = hits(ShardedSearch.bm25TopK(spark, shards3,
      Seq("query", "filter", "join"), 10, boosts = Map("join" -> 3.0)))
    assert(approxEq(gotB, wantB))
  }

  test("minimum_should_match across shards") {
    val want = hits(whole.bm25TopK(Seq("window", "big", "dup"), 10,
      minShouldMatch = 2))
    val got = hits(ShardedSearch.bm25TopK(spark, shards2,
      Seq("window", "big", "dup"), 10, minShouldMatch = 2))
    assert(approxEq(got, want))
  }

  test("deep k beyond any single shard's match count stays exact") {
    val want = hits(whole.bm25TopK(Seq("the"), 1000))
    val got = hits(ShardedSearch.bm25TopK(spark, shards3, Seq("the"), 1000))
    assert(want.length > 10 && approxEq(got, want))
  }

  test("membership and counts are per-shard sums/unions") {
    val want = whole.membership("query").collect().map(_.getString(0)).toSet
    val got = ShardedSearch.membership(shards2, "query")
      .collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty)
    assert(ShardedSearch.membershipCount(shards3, "the") ==
      whole.membershipCount("the"))
  }

  test("per-shard OWN stats would diverge (the query_then_fetch skew)") {
    // negative control: scoring the uneven split under each shard's own
    // stats must NOT equal the single-index scores — proving the dfs stats
    // round is what carries the identity above
    val want = hits(whole.bm25TopK(Seq("query", "filter", "join"), 10)).toMap
    val ownStats = shards3.flatMap(r =>
      r.bm25TopKRows(Seq("query", "filter", "join"), 10))
    val diverges = ownStats.exists { case (c, s) =>
      want.get(c).exists(ws => math.abs(ws - s) > 1e-6)
    }
    assert(diverges, "own-stats scores unexpectedly matched merged stats")
  }
}

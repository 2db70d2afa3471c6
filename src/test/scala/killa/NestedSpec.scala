package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{IndexWriter, NestedIndex}
import killa.query.IndexReader
import killa.tokenize.WhitespaceTokenizer

/** Nested (same-turn) search: the ES `nested` query over a turn-granularity
  * child index — same-turn co-occurrence vs the conv index's cross-turn
  * conjunction, turn-corpus scoring, score_mode folds, inner hits.
  */
class NestedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  // hand-built corpus where same-turn vs cross-turn is unambiguous:
  //  conv0: 'alpha beta' in ONE turn          → nested AND conv match
  //  conv1: 'alpha' turn 0, 'beta' turn 1     → conv match only
  //  conv2: 'alpha' only                      → neither
  //  conv3: two turns both 'alpha beta ...'   → nested (sum > max)
  private lazy val turns = Seq(
    ("conv0", 0, "user", "alpha beta gamma", "t", "2024-01-01 00:00:00"),
    ("conv0", 1, "assistant", "delta", "t", "2024-01-01 00:00:01"),
    ("conv1", 0, "user", "alpha gamma", "t", "2024-01-01 00:00:02"),
    ("conv1", 1, "assistant", "beta delta", "t", "2024-01-01 00:00:03"),
    ("conv2", 0, "user", "alpha alpha", "t", "2024-01-01 00:00:04"),
    ("conv3", 0, "user", "alpha beta", "t", "2024-01-01 00:00:05"),
    ("conv3", 1, "assistant", "alpha beta epsilon", "t", "2024-01-01 00:00:06")
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  private lazy val reader: IndexReader = {
    val root = TestSpark.freshDir("nestedroot")
    NestedIndex.build(spark, root, turns, conf)
    new IndexReader(spark, root, conf)
  }

  test("sameTurnMembership: one turn must carry ALL terms") {
    val got = NestedIndex.sameTurnMembership(reader, Seq("alpha", "beta"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("conv0", "conv3")) // conv1's split pair excluded
  }

  test("nestedTopK: turn-corpus stats; sum rewards repeats, max does not") {
    // brute-force turn-level BM25 over the 7-turn corpus
    val docs = turns.collect().map(r =>
      (r.getString(0), r.getInt(1), WhitespaceTokenizer.tokenize(r.getString(3)).toSeq))
    val n = docs.length
    val dls = docs.map(_._3.length.toDouble)
    val avgdl = dls.sum / n
    def df(t: String) = docs.count(_._3.contains(t))
    def score(terms: Seq[String], toks: Seq[String], dl: Double): Option[Double] = {
      val cs = terms.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else Some(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (1.2 + 1.0) * tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      }
      if (cs.length == terms.length) Some(cs.sum) else None // conjunctive
    }
    val turnScores = docs.zip(dls).flatMap { case ((c, ti, toks), dl) =>
      score(Seq("alpha", "beta"), toks, dl).map(s => (c, ti, s))
    }
    val wantMax = turnScores.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._3).max) }
    val wantSum = turnScores.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._3).sum) }

    val gotMax = NestedIndex.nestedTopK(reader, Seq("alpha", "beta"), 10, "max")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val gotSum = NestedIndex.nestedTopK(reader, Seq("alpha", "beta"), 10, "sum")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(gotMax.keySet == wantMax.keySet)
    wantMax.foreach { case (c, s) => assert(math.abs(gotMax(c) - s) < 1e-9, c) }
    wantSum.foreach { case (c, s) => assert(math.abs(gotSum(c) - s) < 1e-9, c) }
    // conv3 matches twice: sum strictly exceeds max there, equal on conv0
    assert(gotSum("conv3") > gotMax("conv3") + 1e-12)
    assert(math.abs(gotSum("conv0") - gotMax("conv0")) < 1e-12)
  }

  test("innerHits: matching turns per top parent, best first, capped") {
    val hits = NestedIndex.innerHits(reader, Seq("alpha", "beta"), 10, 1)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // kChildren=1 → exactly one turn per matching parent
    assert(hits.map(_._1) == Set("conv0", "conv3"))
    assert(hits.size == 2)
    assert(hits.contains(("conv0", 0)))
    val all = NestedIndex.innerHits(reader, Seq("alpha", "beta"), 10, 5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(all == Set(("conv0", 0), ("conv3", 0), ("conv3", 1)))
  }

  test("childTermsAgg: counts matching TURNS by a child-level value") {
    val meta = turns.select(col("conv_id"), col("turn_idx"), col("role"))
    val got = NestedIndex.childTermsAgg(reader, Seq("alpha", "beta"), meta, "role")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // matching turns: conv0#0 (user), conv3#0 (user), conv3#1 (assistant)
    assert(got == Map("user" -> 2L, "assistant" -> 1L))
    // disjunctive: every turn holding either term
    val dis = NestedIndex.matchingChildren(reader, Seq("epsilon", "delta"),
      conjunctive = false).collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(dis == Set(("conv0", 1), ("conv1", 1), ("conv3", 1)))
  }

  test("disjunctive nested: any term in a turn admits it") {
    val got = NestedIndex.sameTurnMembership(reader, Seq("epsilon"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("conv3"))
    val dis = NestedIndex.nestedTopK(reader, Seq("alpha", "beta"), 10, "max",
      conjunctive = false).collect().map(_.getString(0)).toSet
    assert(dis == Set("conv0", "conv1", "conv2", "conv3"))
  }
}

package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.IndexReader

/** Round-5w layer: dictionary enumeration (the ES `_terms_enum` API) and the
  * closing-session additions — each pinned against a hand-computed oracle on
  * a tiny corpus.
  */
class Round5wSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def build(corpus: DataFrame): IndexReader = {
    val root = TestSpark.freshDir("r5w")
    val w = new IndexWriter(spark, root, conf)
    w.fullBuild(corpus, "b0")
    new IndexReader(spark, root, conf)
  }

  // ------------------------------------------------------------- terms_enum

  test("termsEnum: term-ordered prefix head with exact dfs; n caps; miss and degenerate inputs empty") {
    val corpus = mkTurns(
      ("a", 0, "scan sort spark scan"),
      ("b", 60, "sort span query"),
      ("c", 120, "spark sort the"))
    val r = build(corpus)
    // dictionary under 's': scan(df 1) < sort(3) < span(1) < spark(2)
    val got = r.termsEnum("s", n = 10).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got == Seq(("scan", 1L), ("sort", 3L), ("span", 1L), ("spark", 2L)))
    // n is a head cut of the SAME term order, not a resort
    assert(r.termsEnum("s", n = 2).collect().map(_.getString(0)).toSeq ==
      Seq("scan", "sort"))
    // longer prefix narrows; absent prefix, empty prefix, n <= 0 all empty
    assert(r.termsEnum("spa", n = 10).collect().map(_.getString(0)).toSeq ==
      Seq("span", "spark"))
    assert(r.termsEnum("zz", n = 5).isEmpty)
    assert(r.termsEnum("", n = 5).isEmpty)
    assert(r.termsEnum("s", n = 0).isEmpty)
  }

  // ------------------------------------------------------- turn transitions

  test("turnTransitions: per-conv adjacency under stable order; first turns emit nothing; deterministic order") {
    val turns = Seq(
      ("a", 0, "user"), ("a", 1, "assistant"), ("a", 2, "tool"),
      ("b", 0, "user"), ("b", 1, "assistant"), ("b", 2, "assistant"),
      ("c", 0, "tool")).toDF("conv_id", "turn_idx", "role")
    val got = killa.text.TextOps.turnTransitions(turns, "conv_id", "turn_idx", "role")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // user→assistant ×2 first, then the singletons pair-asc; conv c has no
    // adjacent pair and contributes nothing
    assert(got == Seq(
      ("user", "assistant", 2L),
      ("assistant", "assistant", 1L),
      ("assistant", "tool", 1L)))
  }

  // ----------------------------------------------------- frequent_item_sets

  test("frequentItemPairs: exact pair supports, set semantics, Apriori pruning matches the naive count") {
    val baskets = Seq(
      ("b1", "x"), ("b1", "y"), ("b1", "z"),
      ("b2", "x"), ("b2", "y"),
      ("b3", "x"), ("b3", "z"), ("b3", "x"), // dup x collapses (set semantics)
      ("b4", "y")).toDF("id", "item")
    val got = killa.mine.Itemsets.frequentItemPairs(baskets, "id", "item", 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // (x,y) in b1,b2; (x,z) in b1,b3; (y,z) only b1 — below support
    assert(got == Seq(("x", "y", 2L), ("x", "z", 2L)))
    // raising support past every pair's count empties the result even though
    // single items still qualify (downward closure prunes, never invents)
    assert(killa.mine.Itemsets.frequentItemPairs(baskets, "id", "item", 3L, 10).isEmpty)
    // k caps the support-desc, pair-asc total order deterministically
    val top1 = killa.mine.Itemsets.frequentItemPairs(baskets, "id", "item", 2L, 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top1 == Seq(("x", "y")))
  }

  test("termsEnum: df stays global and enumeration stays exact across a maintenance batch") {
    val corpus = mkTurns(("a", 0, "sort spark"), ("b", 60, "sort scan"))
    val root = TestSpark.freshDir("r5w-incr")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new killa.maintain.IndexMaintainer(spark, root, conf)
      .applyChangesDf(mkTurns(("c", 120, "sort span")), None, batchId = "d1")
    val r = new IndexReader(spark, root, conf)
    val got = r.termsEnum("s", n = 10).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got == Seq(("scan", 1L), ("sort", 3L), ("span", 1L), ("spark", 1L)))
  }
}

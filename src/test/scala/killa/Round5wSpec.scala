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

  // -------------------------------------------------- moving_percentiles

  test("movingPercentiles: trailing-window interpolated p50/p95, partial leading windows") {
    import org.apache.spark.sql.functions.col
    // hits per minute bucket: 1, 3, 2, 5
    val offs = Seq(0) ++ Seq(60, 61, 62) ++ Seq(120, 121) ++ Seq(180, 181, 182, 183, 184)
    val corpus = mkTurns(offs.zipWithIndex.map { case (off, i) =>
      (f"m$i%02d", off, "hit pad")
    }: _*)
    val r = build(corpus)
    val meta = offs.zipWithIndex.map { case (off, i) =>
      (f"m$i%02d", new Timestamp(epoch + off * 1000L))
    }.toDF("conv_id", "ts")
    val rows = r.movingPercentiles("hit", meta, "conv_id", "ts", "minute", window = 3)
      .orderBy("bucket").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L, 5L))
    // windows (sorted): [1] / [1,3] / [1,2,3] / [2,3,5] under rank=(n-1)p
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 2.0, 3.0))    // p50
    assert(rows.map(_.getDouble(3)).toSeq == Seq(1.0, 2.9, 2.9, 4.8))    // p95
    // degenerate window/percentile arguments refuse loudly
    intercept[IllegalArgumentException] {
      r.movingPercentiles("hit", meta, "conv_id", "ts", "minute", window = 0)
    }
    intercept[IllegalArgumentException] {
      r.movingPercentiles("hit", meta, "conv_id", "ts", "minute",
        ps = Seq("p" -> 1.5))
    }
  }

  // ------------------------------------------------------ embedding pooling

  test("meanPoolNormalized: element-wise mean, unit norm, zero groups dropped") {
    import org.apache.spark.sql.functions.col
    val vecs = Seq(
      (0L, Array(3f, 4f)), (0L, Array(1f, 0f)),  // mean [2,2] → [.7071,.7071]
      (1L, Array(0f, 5f)),                       // → [0,1]
      (2L, Array(0f, 0f))                        // zero norm → dropped
    ).toDF("g", "v")
    val got = killa.ann.Pooling.meanPoolNormalized(vecs, col("g"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (0L, 0L, 0.7071), (0L, 1L, 0.7071),
      (1L, 0L, 0.0), (1L, 1L, 1.0)))
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

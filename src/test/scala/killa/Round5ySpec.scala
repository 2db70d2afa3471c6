package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{GramIndex, IndexWriter}
import killa.maintain.IndexMaintainer
import killa.model.Turn

/** Round-5y layer: the trigram dictionary sub-index (the ES `wildcard`
  * field-type technique) — infix masks pruned by n-gram conjunction, regex
  * verification of out-of-order gram false positives, fallbacks, and
  * dictionary-diff maintenance.
  */
class Round5ySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def buildWithGrams(corpus: DataFrame, tag: String): String = {
    val root = TestSpark.freshDir(tag)
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    GramIndex.build(spark, root, conf)
    root
  }

  private def infix(root: String, mask: String, cap: Int = 4096): Set[String] =
    GramIndex.membershipInfix(spark, root, conf, mask, cap)
      .collect().map(_.getString(0)).toSet

  test("membershipInfix: trigram pruning finds infix matches across terms; anchors via mask edges") {
    val root = buildWithGrams(mkTurns(
      ("a", 0, "spark merge"),
      ("b", 1, "customer data"),
      ("c", 2, "order by")), "r5y-base")
    // 'mer' appears inside merge AND customer
    assert(infix(root, "*mer*") == Set("a", "b"))
    // suffix-anchored infix: '*ta' has no gram, 'ata' does via *ata
    assert(infix(root, "*ata*") == Set("b"))
    // miss
    assert(infix(root, "*zzz*") == Set())
  }

  test("membershipInfix: out-of-order gram false positive dies in the verify pass") {
    // 'xyzxy' carries grams {xyz, yzx, zxy} — the conjunction for mask
    // '*zxyz*' (grams zxy, xyz) holds, but the mask itself does not match
    val root = buildWithGrams(mkTurns(
      ("fp", 0, "xyzxy filler"),
      ("tp", 1, "azxyzb other")), "r5y-fp")
    assert(infix(root, "*zxyz*") == Set("tp"))
  }

  test("membershipInfix: gramless masks and over-cap candidate sets fall back to the wildcard scan, same answer") {
    val corpus = mkTurns(
      ("a", 0, "spark merge"), ("b", 1, "customer part"), ("c", 2, "order"))
    val root = buildWithGrams(corpus, "r5y-fb")
    val main = new killa.query.IndexReader(spark, root, conf)
    // every literal run < 3 chars → no gram → fallback
    val viaWild = main.membershipWildcard("*ar*").collect().map(_.getString(0)).toSet
    assert(infix(root, "*ar*") == viaWild && viaWild == Set("a", "b")) // spark, part
    // cap 1 with 2 candidates ('mer' hits merge + customer) → fallback path
    assert(infix(root, "*mer*", cap = 1) == Set("a", "b"))
  }

  test("searchSortedAfter: strictly-after cursor pages the (sort_val, conv) order exactly, ties included") {
    import org.apache.spark.sql.functions.col
    val corpus = mkTurns(
      ("a", 0, "t x y"), ("b", 1, "t p q"), ("c", 2, "t z"), ("d", 3, "t"))
    val root = TestSpark.freshDir("r5y-ssa")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val r = new killa.query.IndexReader(spark, root, conf)
    val meta = Seq(("a", 3.0), ("b", 3.0), ("c", 2.0), ("d", 1.0))
      .toDF("conv_id", "dl")
    // desc order: (3,a), (3,b), (2,c), (1,d)
    val p1 = r.searchSorted("t", meta, "conv_id", "dl", ascending = false, k = 2)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(p1 == Seq(("a", 3.0), ("b", 3.0)))
    // cursor sits INSIDE the tie plateau: page 2 must not re-emit a or b
    val p2 = r.searchSortedAfter("t", meta, "conv_id", "dl", ascending = false,
      k = 2, afterVal = 3.0, afterConv = "b")
      .collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(p2 == Seq(("c", 2.0), ("d", 1.0)))
    // ascending direction mirrors
    val p2a = r.searchSortedAfter("t", meta, "conv_id", "dl", ascending = true,
      k = 2, afterVal = 1.0, afterConv = "d")
      .collect().map(_.getString(0)).toSeq
    assert(p2a == Seq("c", "a"))
  }

  test("ksTestAgg: ECDF max gap with full tie weight; identical series give d = 0") {
    import org.apache.spark.sql.functions.{col, min}
    // A's minute hits {2, 1}; B's {1, 2, 1} → pooled D at v=1: |1/2 − 2/3|
    val corpus = mkTurns(
      ("a1", 0, "aa x"), ("a2", 5, "aa y"), ("a3", 60, "aa z"),
      ("b1", 10, "bb x"), ("b2", 61, "bb y"), ("b3", 62, "bb z"), ("b4", 120, "bb w"))
    val root = TestSpark.freshDir("r5y-ks")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val r = new killa.query.IndexReader(spark, root, conf)
    val meta = corpus.groupBy("conv_id").agg(min(col("ts")).as("ts"))
    val got = r.ksTestAgg("aa", "bb", meta, "conv_id", "ts", "minute").collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getDouble(2)) == (2L, 3L, 0.1667))
    // a distribution against itself: d = 0
    val self = r.ksTestAgg("aa", "aa", meta, "conv_id", "ts", "minute").collect()(0)
    assert(self.getDouble(2) == 0.0)
  }

  test("int8Codes: exact round-half-up codes, zero-vector zeros, reconstruction within scale/2") {
    val vecs = Seq(
      (0L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = killa.ann.Quant.int8Codes(vecs, "vec_id", "embedding")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    assert(got == Seq(
      (0L, 0L, 127L), (0L, 1L, -63L), (0L, 2L, 32L), (0L, 3L, 0L),
      (1L, 0L, 0L), (1L, 1L, 0L)))
    // reconstruction bound: |x − q·scale| ≤ scale/2 for every element
    val scale = 1.0 / 127.0
    val xs = Seq(1.0, -0.5, 0.25, 0.0)
    got.filter(_._1 == 0L).foreach { case (_, i, q) =>
      assert(math.abs(xs(i.toInt) - q * scale) <= scale / 2 * 1.0000001)
    }
  }

  test("refresh: dictionary diff applies adds AND removes after main-index maintenance") {
    val root = buildWithGrams(mkTurns(
      ("a", 0, "foobar alpha"),
      ("b", 1, "alpha beta")), "r5y-maint")
    assert(infix(root, "*oba*") == Set("a"))
    // rewrite conv a: 'foobar' dies (last carrier), 'quxish' is born
    new IndexMaintainer(spark, root, conf).applyChangesDf(
      mkTurns(("a", 0, "quxish alpha")), None, batchId = "d1")
    GramIndex.refresh(spark, root, conf)
    assert(infix(root, "*uxi*") == Set("a"))
    assert(infix(root, "*oba*") == Set())
    // untouched terms still answer
    assert(infix(root, "*lph*") == Set("a", "b"))
  }
}

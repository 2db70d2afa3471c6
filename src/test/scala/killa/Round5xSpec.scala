package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{IndexWriter, NestedIndex}
import killa.maintain.IndexMaintainer
import killa.model.Turn
import killa.query.IndexReader

/** Round-5x layer: change_point / categorize_text / random_sampler /
  * variable_width_histogram aggregations, the ids (_mget) query, has_child
  * with min_children, has_parent, each pinned against a hand-computed oracle
  * on a tiny corpus.
  */
class Round5xSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L // 2024-01-01 00:00:00 UTC

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def build(corpus: DataFrame, tag: String): IndexReader = {
    val root = TestSpark.freshDir(tag)
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexReader(spark, root, conf)
  }

  // ------------------------------------------------------------ change_point

  test("changePointAgg: argmax mean split, earliest-bucket ties, < 2 buckets empty") {
    // minute series of conv min-ts hits: [2, 2, 4, 4] → best split before
    // bucket 3 (L mean 2, R mean 4, diff 2; the i=2/i=4 splits give 4/3)
    val corpus = mkTurns(
      ("a1", 0, "t x"), ("a2", 5, "t y"),
      ("b1", 60, "t x"), ("b2", 65, "t y"),
      ("c1", 120, "t x"), ("c2", 121, "t y"), ("c3", 122, "t z"), ("c4", 123, "t w"),
      ("d1", 180, "t x"), ("d2", 181, "t y"), ("d3", 182, "t z"), ("d4", 183, "t w"))
    val r = build(corpus, "r5x-cp")
    val meta = corpus.groupBy("conv_id").agg(min(col("ts")).as("ts"))
    val got = r.changePointAgg("t", meta, "conv_id", "ts", "minute").collect()
    assert(got.length == 1)
    val row = got(0)
    assert(row.getString(0) == "2024-01-01 00:02:00")
    assert(row.getDouble(1) == 2.0 && row.getDouble(2) == 4.0 && row.getDouble(3) == 2.0)

    // a flat series ties everywhere → the EARLIEST split bucket wins
    val flat = mkTurns(("a", 0, "t"), ("b", 60, "t"), ("c", 120, "t"))
    val rf = build(flat, "r5x-cpf")
    val mf = flat.groupBy("conv_id").agg(min(col("ts")).as("ts"))
    val gf = rf.changePointAgg("t", mf, "conv_id", "ts", "minute").collect()
    assert(gf(0).getString(0) == "2024-01-01 00:01:00" && gf(0).getDouble(3) == 0.0)

    // single-bucket series: no split point exists
    val one = mkTurns(("a", 0, "t"), ("b", 1, "t"))
    val ro = build(one, "r5x-cp1")
    val mo = one.groupBy("conv_id").agg(min(col("ts")).as("ts"))
    assert(ro.changePointAgg("t", mo, "conv_id", "ts", "minute").isEmpty)
  }

  // --------------------------------------------------------- categorize_text

  test("categorizeTextAgg: digit-masked leading-token templates, count desc / template asc, size cut") {
    val corpus = mkTurns(
      ("a", 0, "err 12 x foo"),
      ("b", 1, "err 99 x foo"),
      ("c", 2, "warn 5 y foo tail tail"),
      ("d", 3, "warn 5 y zzz")) // no 'foo' → excluded from the match set
    val r = build(corpus, "r5x-cat")
    val got = r.categorizeTextAgg("foo", corpus, "conv_id", "text",
      nTokens = 3, size = 10).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got == Seq(("err <num> x", 2L), ("warn <num> y", 1L)))
    // size caps after ordering
    val top1 = r.categorizeTextAgg("foo", corpus, "conv_id", "text", 3, 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 == Seq("err <num> x"))
    // shorter texts than nTokens keep what they have
    val short = mkTurns(("s1", 0, "foo"), ("s2", 1, "foo"))
    val rs = build(short, "r5x-cats")
    val gs = rs.categorizeTextAgg("foo", short, "conv_id", "text", 3, 10)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(gs == Seq(("foo", 2L)))
  }

  // ---------------------------------------------------------- random_sampler

  test("randomSamplerAgg: content-addressed sample matches a driver md5 replay; numerator 256 is exact") {
    val convs = (0 until 12).map(i => (f"c$i%02d", i, s"t ${"f " * i}".trim))
    val corpus = mkTurns(convs: _*)
    val r = build(corpus, "r5x-rs")
    // driver-side replay of the sampling predicate
    def firstByte(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d(0) & 0xff
    }
    val dls = convs.map { case (c, i, txt) =>
      (c, txt.split(" ").count(_.nonEmpty).toLong)
    }.toMap
    val sampled = convs.map(_._1).filter(c => firstByte("s1" + c) < 128)
    val got = r.randomSamplerAgg("t", corpus
      .select(col("conv_id"), size(split(col("text"), " ")).cast("long").as("dl")),
      "conv_id", "dl", numerator = 128, seed = "s1").collect()(0)
    assert(got.getLong(0) == sampled.length.toLong)
    assert(got.getDouble(1) == sampled.length * 2.0)
    assert(got.getDouble(2) == sampled.map(dls).sum * 2.0)
    // numerator 256 keeps everything: the estimate IS the exact answer
    val full = r.randomSamplerAgg("t", corpus
      .select(col("conv_id"), size(split(col("text"), " ")).cast("long").as("dl")),
      "conv_id", "dl", numerator = 256, seed = "s1").collect()(0)
    assert(full.getLong(0) == 12L && full.getDouble(1) == 12.0)
    assert(full.getDouble(2) == dls.values.sum.toDouble)
  }

  // ------------------------------------------------ variable_width_histogram

  test("variableWidthHistogramAgg: SQL-standard NTILE depths; more buckets than rows; empty match set") {
    // dls 1..10 (term + i-1 fillers), buckets 4 → depths 3,3,2,2
    val corpus = mkTurns((1 to 10).map(i =>
      (f"c$i%02d", i, ("t" +: (1 until i).map(j => s"f$j")).mkString(" "))): _*)
    val r = build(corpus, "r5x-vw")
    val dlMeta = corpus.select(col("conv_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val got = r.variableWidthHistogramAgg("t", dlMeta, "conv_id", "dl", 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 3L, 1.0, 2.0, 3.0),
      (2L, 3L, 4.0, 5.0, 6.0),
      (3L, 2L, 7.0, 7.5, 8.0),
      (4L, 2L, 9.0, 9.5, 10.0)))
    // more buckets than rows: one row per bucket, ranks 1..n
    val small = r.variableWidthHistogramAgg("t",
      dlMeta.where(col("dl") <= 3), "conv_id", "dl", 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(small == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // no matches → empty frame with the agg schema
    val none = r.variableWidthHistogramAgg("zzz", dlMeta, "conv_id", "dl", 4)
    assert(none.isEmpty && none.columns.toSeq ==
      Seq("bucket", "n", "min_v", "centroid", "max_v"))
  }

  // --------------------------------------------------------------- ids/_mget

  test("idsQuery: found from the live dictionary (deletes drop), dl stored, request dedup + order") {
    val corpus = mkTurns(
      ("a", 0, "x y z"), ("b", 1, "x y"), ("c", 2, "x"))
    val root = TestSpark.freshDir("r5x-ids")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexMaintainer(spark, root, conf).remove(Seq("b"), "d1")
    val r = new IndexReader(spark, root, conf)
    val got = r.idsQuery(Seq("c", "a", "b", "zz", "a")).collect()
      .map(x => (x.getString(0), x.getBoolean(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSeq
    assert(got == Seq(
      ("a", true, 3L), ("b", false, -1L), ("c", true, 1L), ("zz", false, -1L)))
  }

  // ----------------------------------------------------------- hard negatives

  test("hardNegatives: band keeps semi-hard only — ceiling drops dups, floor drops easy, ranks dense in band") {
    val corpus = Seq(
      (0L, Seq(1f, 0f)),   // cos 1.0    — near-dup, ceiling drops
      (1L, Seq(1f, 1f)),   // cos 0.7071 — in band
      (2L, Seq(0f, 1f)),   // cos 0.0    — easy, floor drops
      (3L, Seq(1f, 3f)),   // cos 0.3162 — in band
      (4L, Seq(-1f, 0f))). // cos -1.0   — easy, floor drops
      toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1f, 0f))).toDF("q_id", "qv")
    val got = killa.ann.Ann.hardNegatives(corpus, "vec_id", "embedding",
      q, "q_id", "qv", k = 5, lo = 0.3, hi = 0.9)
      .collect().map(x => (x.getLong(1), x.getDouble(2), x.getInt(3))).toSeq
      .sortBy(_._3)
    assert(got == Seq((1L, 0.7071, 1), (3L, 0.3162, 2)))
    // k cuts inside the band; empty band returns nothing
    assert(killa.ann.Ann.hardNegatives(corpus, "vec_id", "embedding",
      q, "q_id", "qv", k = 1, lo = 0.3, hi = 0.9).count() == 1L)
    assert(killa.ann.Ann.hardNegatives(corpus, "vec_id", "embedding",
      q, "q_id", "qv", k = 5, lo = 0.8, hi = 0.9).isEmpty)
  }

  // ------------------------------------------------- has_child / has_parent

  private lazy val pcTurns = Seq(
    ("p0", 0, "user", "alpha beta", "t", "2024-01-01 00:00:00"),
    ("p0", 1, "assistant", "alpha gamma", "t", "2024-01-01 00:00:01"),
    ("p1", 0, "user", "alpha", "t", "2024-01-01 00:00:02"),
    ("p1", 1, "assistant", "delta beta", "t", "2024-01-01 00:00:03"),
    ("p2", 0, "user", "gamma", "t", "2024-01-01 00:00:04")
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  private lazy val childReader: IndexReader = {
    val root = TestSpark.freshDir("r5x-child")
    NestedIndex.build(spark, root, pcTurns, conf)
    new IndexReader(spark, root, conf)
  }

  private lazy val parentReader: IndexReader = build(pcTurns, "r5x-parent")

  test("hasChild: min_children floors the per-parent matching-turn count") {
    val all = NestedIndex.hasChild(childReader, Seq("alpha"), minChildren = 1)
      .collect().map(x => (x.getString(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(all == Seq(("p0", 2L), ("p1", 1L)))
    val two = NestedIndex.hasChild(childReader, Seq("alpha"), minChildren = 2)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(two == Seq(("p0", 2L)))
    // conjunctive same-turn: only p0's turn 0 has both
    val conj = NestedIndex.hasChild(childReader, Seq("alpha", "beta"),
      minChildren = 1).collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(conj == Seq(("p0", 1L)))
  }

  test("reverseNestedAgg: parent-level buckets over child matches; parent counted once; nulls drop") {
    val meta = Seq(("p0", "t1"), ("p1", "t1"), ("p2", "t2"))
      .toDF("conv_id", "tool0")
    // same-turn (alpha AND beta): only p0's turn 0
    val conj = NestedIndex.reverseNestedAgg(childReader, Seq("alpha", "beta"),
      meta, "conv_id", "tool0")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(conj == Seq(("t1", 1L)))
    // disjunctive 'alpha': p0 matches in TWO turns but counts once
    val dis = NestedIndex.reverseNestedAgg(childReader, Seq("alpha"),
      meta, "conv_id", "tool0", conjunctive = false)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(dis == Seq(("t1", 2L)))
    // a null parent value contributes nothing
    val metaN = Seq(("p0", null.asInstanceOf[String]), ("p1", "t1"))
      .toDF("conv_id", "tool0")
    val gotN = NestedIndex.reverseNestedAgg(childReader, Seq("alpha"),
      metaN, "conv_id", "tool0", conjunctive = false)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(gotN == Seq(("t1", 1L)))
  }

  test("maxSimTopK: per-token best cosine summed per doc; rank order; k cut") {
    val docs = Seq(
      ("A", Seq(1f, 0f)), ("A", Seq(0f, 1f)),
      ("B", Seq(1f, 1f)),
      ("C", Seq(-1f, 0f))).toDF("doc_id", "embedding")
    val q = Seq((0L, 0L, Seq(1f, 0f)), (0L, 1L, Seq(0f, 1f)))
      .toDF("q_id", "q_tok", "qv")
    val got = killa.ann.Ann.maxSimTopK(docs, "doc_id", "embedding",
      q, "q_id", "q_tok", "qv", 5)
      .collect().map(x => (x.getString(1), x.getDouble(2), x.getInt(3)))
      .sortBy(_._3).toSeq
    assert(got == Seq(("A", 2.0, 1), ("B", 1.4142, 2), ("C", -1.0, 3)))
    val cut = killa.ann.Ann.maxSimTopK(docs, "doc_id", "embedding",
      q, "q_id", "q_tok", "qv", 2)
      .collect().map(_.getString(1)).sorted.toSeq
    assert(cut == Seq("A", "B"))
  }

  test("duplicationWeights: 1/group-multiplicity, whitespace-normalized grouping, uniques weigh 1.0") {
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "x  y"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = killa.dedup.Dedup.duplicationWeights(df, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 0.3333), (2L, 0.3333), (3L, 0.3333), (4L, 1.0)))
  }

  test("hasParent: children of conv-level matches; child-index deletes drop turns") {
    // parent query 'alpha beta' (cross-turn conjunction): p0 and p1 match
    val got = NestedIndex.hasParent(parentReader, childReader, Seq("alpha", "beta"))
      .collect().map(x => (x.getString(0), x.getInt(1))).sorted.toSeq
    assert(got == Seq(("p0", 0), ("p0", 1), ("p1", 0), ("p1", 1)))
    // delete one CHILD doc: the parent still matches, the turn drops
    val root = TestSpark.freshDir("r5x-child2")
    NestedIndex.build(spark, root, pcTurns, conf)
    new IndexMaintainer(spark, root, conf).remove(Seq("p1#0"), "d1")
    val cr2 = new IndexReader(spark, root, conf)
    val got2 = NestedIndex.hasParent(parentReader, cr2, Seq("alpha", "beta"))
      .collect().map(x => (x.getString(0), x.getInt(1))).sorted.toSeq
    assert(got2 == Seq(("p0", 0), ("p0", 1), ("p1", 1)))
  }
}

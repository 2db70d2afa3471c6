package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.ann.Quant
import killa.build.IndexWriter
import killa.dedup.Dedup
import killa.model.Turn
import killa.query.IndexReader

/** Round-5z layer: binary (sign-bit) embedding quantization + Hamming kNN,
  * the two language-model similarity modules (LM Dirichlet, LM
  * Jelinek-Mercer), and target-mixture resampling.
  */
class Round5zSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 8, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, off, txt) =>
      Turn(c, 0, "user", txt, "", new Timestamp(epoch + off * 1000L))
    }.toDS().toDF()

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("binaryCodes: exact sign-bit packing, lane split at 32 dims, zeros code to 0") {
    val df = vecs(
      (0L, Seq(0.5f, -1f, 2f)),                                   // bits 0,2 → 5
      (1L, Seq.tabulate(34)(i => if (i == 0 || i == 33) 1f else -1f)),
      (2L, Seq(0f, -0f, -3f)))                                    // no bit set
    val got = Quant.binaryCodes(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, 0L, 5L),
      (1L, 0L, 1L), (1L, 1L, 2L),  // bit 33 = bit 1 of lane 1
      (2L, 0L, 0L)))
  }

  test("hammingTopK: popcount(xor) distances, ties on vec_id, self excluded") {
    val corpus = vecs(
      (1L, Seq(1f, 1f, 1f)),    // dist 0
      (2L, Seq(1f, 1f, -1f)),   // dist 1
      (3L, Seq(1f, -1f, 1f)),   // dist 1 (tie with 2 → after by id)
      (4L, Seq(-1f, -1f, -1f)), // dist 3
      (9L, Seq(1f, 1f, 1f)))    // the query itself — must be excluded
    val q = vecs((9L, Seq(1f, 1f, 1f)))
      .selectExpr("vec_id as q_id", "embedding as qv")
    val got = Quant.hammingTopK(corpus, "vec_id", "embedding", q, "q_id", "qv", 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == Seq((1L, 0L, 1), (2L, 1L, 2), (3L, 1L, 3)))
  }

  test("lm similarities: hand-computed Dirichlet and Jelinek-Mercer scores, order and k") {
    val corpus = mkTurns(("a", 0, "x x y"), ("b", 1, "x z"), ("c", 2, "y y z z"))
    val root = TestSpark.freshDir("r5z-lm")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val r = new IndexReader(spark, root, conf)
    // corpus stats: Ctot = 9; cf(x) = 3, cf(y) = 3; dl: a 3, b 2, c 4
    val mu = 10.0
    def dContrib(tf: Double, dl: Double, cf: Double): Double =
      math.log(1.0 + tf / (mu * (cf / 9.0))) + math.log(mu / (dl + mu))
    val dExp = Map(
      "a" -> (dContrib(2, 3, 3) + dContrib(1, 3, 3)),
      "b" -> dContrib(1, 2, 3),
      "c" -> dContrib(2, 4, 3))
    val dGot = r.lmDirichletTopK(Seq("x", "y"), 10, mu)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(dGot.keySet == dExp.keySet)
    dExp.foreach { case (cId, s) =>
      assert(math.abs(dGot(cId) - s) < 5e-5, s"dirichlet $cId")
    }
    // k truncation keeps the exact-score descending prefix
    val dOrder = dExp.toSeq.sortBy { case (cId, s) => (-s, cId) }.map(_._1)
    val dTop = r.lmDirichletTopK(Seq("x", "y"), 2, mu)
      .orderBy(org.apache.spark.sql.functions.col("score").desc)
      .collect().map(_.getString(0)).toSeq
    assert(dTop == dOrder.take(2))

    val lambda = 0.25
    def jContrib(tf: Double, dl: Double, cf: Double): Double =
      math.log(1.0 + ((1.0 - lambda) / lambda) * ((tf / dl) / (cf / 9.0)))
    val jExp = Map(
      "a" -> (jContrib(2, 3, 3) + jContrib(1, 3, 3)),
      "b" -> jContrib(1, 2, 3),
      "c" -> jContrib(2, 4, 3))
    val jGot = r.lmJelinekMercerTopK(Seq("x", "y"), 10, lambda)
      .collect().map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(jGot.keySet == jExp.keySet)
    jExp.foreach { case (cId, s) =>
      assert(math.abs(jGot(cId) - s) < 5e-5, s"jm $cId")
    }
  }

  test("mixtureSample: max-ratio source keeps everything, others thresholded, absent sources drop") {
    // s0: 2 tokens/doc × 8 docs = 16 tokens; s1: 8 tokens/doc × 8 = 64;
    // s2 present in data but absent from targets
    val rows =
      (0 until 8).map(i => (s"s0-$i", s"a$i b$i", "s0")) ++
      (0 until 8).map(i => (s"s1-$i", (0 until 8).map(j => s"w$i-$j").mkString(" "), "s1")) ++
      (0 until 4).map(i => (s"s2-$i", s"z$i", "s2"))
    val df = rows.toDF("id", "text", "source")
    val targets = Map("s0" -> 0.5, "s1" -> 0.5)
    val kept = Dedup.mixtureSample(df, "text", "source", targets)
      .select("id").collect().map(_.getString(0)).toSet
    // recompute thresholds exactly as documented
    val c = Map("s0" -> 16L, "s1" -> 64L)
    val ratio = targets.map { case (sName, t) => sName -> t / c(sName).toDouble }
    val rmax = ratio.values.max
    val thr = ratio.map { case (sName, x) =>
      sName -> math.floor((x / rmax) * 4294967296.0).toLong
    }
    assert(thr("s0") == 4294967296L) // rate 1: nothing deleted from s0
    def h32(text: String): Long = {
      val toks = text.split(" ").filter(_.nonEmpty).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(toks.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val expected = rows.collect {
      case (id, text, sName) if thr.contains(sName) && h32(text) < thr(sName) => id
    }.toSet
    assert(kept == expected)
    assert(kept.filter(_.startsWith("s0-")).size == 8)   // all of s0 kept
    assert(!kept.exists(_.startsWith("s2-")))            // absent target → dropped
    assert(kept.filter(_.startsWith("s1-")).size < 8)    // s1 downsampled
  }
}

package killa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.ann.{Ann, Quant}
import killa.dedup.Dedup

/** Round-5za layer: int8 coarse+float-rescore kNN (the ES `rescore_vector`
  * pattern), query-time MinHash near-dup search, and per-doc duplicated-span
  * coverage.
  */
class Round5zaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // deterministic pseudo-random unit-ish vectors (no runtime randomness)
  private def synthVec(id: Long, dim: Int): Seq[Float] =
    Seq.tabulate(dim) { i =>
      val h = killa.util.Hashing.fnv1a64(s"$id:$i")
      ((h % 1000L).toFloat / 500.0f) - 1.0f
    }

  test("int8RescoreTopK: equals brute-force float top-k when the coarse window covers the corpus") {
    val corpus = vecs((0L until 20L).map(i => (i, synthVec(i, 16))): _*)
    val q = corpus.where(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding"))
    // oversample × k ≥ corpus ⇒ every candidate admitted ⇒ exact
    val got = Quant.int8RescoreTopK(corpus, "vec_id", "embedding",
      q, "q_id", "embedding", 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val want = Ann.bruteForceTopK(corpus, "vec_id", "embedding", q, "q_id", "embedding", 5)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("int8RescoreTopK: admission is by INTEGER int8 dot, rescore by exact float cosine") {
    // corpus vector 1 is the float-cosine winner; vector 2 has a larger
    // int8 dot (quantization favors its direction) — with oversample
    // window ≥ 2 both are admitted and the float rescore must rank 1 first
    val corpus = vecs(
      (1L, Seq(1.0f, 0.02f)),   // cosine vs q ≈ 1.0
      (2L, Seq(1.0f, 1.0f)),    // cosine vs q ≈ 0.72
      (3L, Seq(-1.0f, -1.0f)))  // opposite
    val q = vecs((9L, Seq(1.0f, 0.0f))).select(col("vec_id").as("q_id"), col("embedding"))
    val got = Quant.int8RescoreTopK(corpus, "vec_id", "embedding",
      q, "q_id", "embedding", 1, 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L)))
  }

  test("int8RescoreTopK: oversample=1 truncates to the coarse winner (documented tradeoff)") {
    // same fixture: with NO oversampling only the best-int8-dot candidate
    // survives to the rescore, so the float winner can be lost — this is
    // the recall/cost dial, pinned so the contract stays honest
    val corpus = vecs(
      (1L, Seq(1.0f, 0.02f)),
      (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(-1.0f, -1.0f)))
    val q = vecs((9L, Seq(1.0f, 0.0f))).select(col("vec_id").as("q_id"), col("embedding"))
    // int8 codes: v1 → (127, 3)·(127, 0) = 16129; v2 → (127,127)·(127,0) = 16129
    // tie → vec_id asc admits v1 — adjust q so v2's dot strictly wins:
    val q2 = vecs((9L, Seq(1.0f, 0.5f))).select(col("vec_id").as("q_id"), col("embedding"))
    val got = Quant.int8RescoreTopK(corpus, "vec_id", "embedding",
      q2, "q_id", "embedding", 1, 1)
      .collect().map(r => r.getLong(1)).toSeq
    assert(got == Seq(2L)) // coarse winner, not the float-exact one at k=1
  }

  test("int8RescoreTopK: self-match excluded, ranks dense per query") {
    val corpus = vecs((0L until 8L).map(i => (i, synthVec(i, 8))): _*)
    val q = corpus.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val out = Quant.int8RescoreTopK(corpus, "vec_id", "embedding",
      q, "q_id", "embedding", 3, 2).collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  private val baseText = (1 to 40).map(i => s"tok$i").mkString(" ")

  test("neardupSearch: finds self at 1.0 and planted near-dups, misses clean docs") {
    val corpus = docs(
      (0L, baseText),
      (1L, baseText.replace("tok40", "changed")),    // near-dup of 0
      (2L, (1 to 40).map(i => s"other$i").mkString(" ")), // clean
      (3L, baseText))                                 // exact dup of 0
    val queries = docs((0L, baseText)).select(col("doc_id").as("q_id"), col("text"))
    val got = Dedup.neardupSearch(corpus, "doc_id", "text",
      queries, "q_id", "text", 3, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // self and the exact dup at 1.0; the one-token edit changes exactly one
    // trailing 3-gram ⇒ jaccard 37/39 ≈ 0.9487 ≥ 0.8; the clean doc absent
    assert(got.map(t => (t._1, t._2)) == Set((0L, 0L), (0L, 1L), (0L, 3L)))
    assert(got.filter(t => t._2 == 0L || t._2 == 3L).forall(_._3 == 1.0))
  }

  test("neardupSearch: equals exact query×corpus Jaccard on a planted fixture") {
    val corpus = docs((0L until 12L).map { i =>
      if (i % 4 == 0) (i, baseText)
      else if (i % 4 == 1) (i, baseText.replace("tok3", s"x$i"))
      else (i, (1 to 30).map(j => s"w${i}_$j").mkString(" "))
    }: _*)
    val queries = corpus.where(col("doc_id") < 4)
      .select(col("doc_id").as("q_id"), col("text"))
    val got = Dedup.neardupSearch(corpus, "doc_id", "text",
      queries, "q_id", "text", 3, 64, 16, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact oracle: brute-force shingle jaccard
    def shingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val corp = corpus.collect().map(r => (r.getLong(0), shingles(r.getString(1))))
    val want = (for {
      (q, qs) <- corp.filter(_._1 < 4)
      (d, ds) <- corp
      i = (qs & ds).size
      j = i.toDouble / (qs.size + ds.size - i)
      jr = math.floor(j * 10000 + 0.5) / 10000 // HALF_UP, like Spark round()
      if jr >= 0.8
    } yield (q, d, jr)).toSet
    assert(got == want)
    assert(want.exists(t => t._1 != t._2)) // fixture genuinely has cross matches
  }

  test("dupChunkCoverage: exact fractions; within-doc repetition alone does not count") {
    val span = (1 to 16).map(i => s"s$i").mkString(" ")       // one full window
    val uniqA = (1 to 8).map(i => s"a$i").mkString(" ")
    val uniqB = (1 to 24).map(i => s"b$i").mkString(" ")
    val corpus = docs(
      (0L, s"$span $uniqA"),        // 24 toks: windows at 0 (dup), 8, 16 (stubs)
      (1L, s"$uniqB $span"),        // 40 toks: window at 24 = span (dup)
      (2L, s"$span $span"),         // within-doc repeat of span + cross-doc dup
      (3L, (1 to 16).map(i => s"c$i c$i").mkString(" ").split(" ").take(16).mkString(" ")),
      (4L, "too short"))            // < 16 tokens → no full window → omitted
    val byId = Dedup.dupChunkCoverage(corpus, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 0: 24 toks → offsets 0,8,16; only offset 0 is a full window = span → 1/2?
    //   offsets: 0 (16 toks, full), 8 (16 toks: s9..s16,a1..a8 full), 16 (8 toks stub)
    //   full windows: [s1..s16] (dup), [s9..s16 a1..a8] (unique) → 1/2
    assert(byId(0L) == ((2L, 1L, 0.5)))
    // doc 1: 40 toks → offsets 0..32; full at 0,8,16,24; [b25..b8? ...] only
    //   offset 24 = span (dup) → 1/4
    assert(byId(1L) == ((4L, 1L, 0.25)))
    // doc 2: span span = 32 toks → full at 0,8,16; 0=[span] dup (cross-doc),
    //   8=[s9..s16 s1..s8] unique, 16=[span] dup → 2/3
    assert(byId(2L) == ((3L, 2L, 0.6667)))
    // doc 3: 16 unique toks → 1 full window, no other doc shares → 0.0
    assert(byId(3L) == ((1L, 0L, 0.0)))
    // doc 4 omitted
    assert(!byId.contains(4L))
  }

  test("dupChunkCoverage: pure within-doc repetition is not duplicated-span") {
    val span = (1 to 16).map(i => s"only$i").mkString(" ")
    val corpus = docs(
      (0L, s"$span $span"),                       // repeats itself, no other doc
      (1L, (1 to 20).map(i => s"z$i").mkString(" ")))
    val byId = Dedup.dupChunkCoverage(corpus, "doc_id", "text", 16, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(byId(0L) == 0.0)
    assert(byId(1L) == 0.0)
  }
}

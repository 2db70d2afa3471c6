package killa

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.text.Bpe

/** Distributed BPE vocabulary induction — trainer semantics pinned against
  * hand-computed merges and a classic textbook fixture.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("train: the Sennrich low/lower/newest/widest fixture learns es, est, lo, low in order") {
    // the canonical BPE walkthrough: counts low:5, lower:2, newest:6, widest:3
    val corpus = docs(
      (0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    val got = Bpe.train(corpus, "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    // pair counts round 1: (e,s)=9, (s,t)=9, (w,e)=8(newest? n-e-w-e-s-t has w-e)... hand-check:
    //   es 9, st 9, lo 7, ow 7, we 8, ne 6, ew 6, wi 3, id 3, de 3, er 2
    //   max 9 tie (e,s) < (s,t) lexicographically → es
    // round 2: es+t → est 9 wins (ties: we 8 below)
    // round 3: we? n-e-w-est: (w,est)=6, (e,w)=6, (n,e)=6, lo 7, ow 7 → lo 7 vs ow 7 → lo first lexicographically?
    //   l<o → (l,o) wins at 7
    // round 4: (lo,w)=7 wins over we/new pairs at 6
    assert(got == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)))
  }

  test("train: merge application is left-to-right non-overlapping (aaa -> aa,a)") {
    val corpus = docs((0L, Seq.fill(4)("aaa").mkString(" ")))
    val got = Bpe.train(corpus, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    // "aaa" = a-a-a: (a,a) counts TWICE per occurrence → freq 8; merge →
    // [aa, a] (non-overlap); round 2: (aa, a) freq 4
    assert(got == Seq((1, "a", "a", 8L), (2, "aa", "a", 4L)))
  }

  test("train: stops early when the vocabulary is fully merged") {
    val corpus = docs((0L, "ab ab ab"))
    val got = Bpe.train(corpus, "text", 5).collect()
    assert(got.length == 1) // after a+b there are no pairs left
    assert(got(0).getString(3) == "ab")
  }

  test("topPairs: exact weighted counts with the deterministic total order") {
    val corpus = docs((0L, "ab ab ba"))
    val got = Bpe.topPairs(corpus, "text", 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("segment: encodes words with the learned merges in order") {
    val corpus = docs(
      (0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    val merges = Bpe.train(corpus, "text", 4)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val words = Seq("lowest", "newest", "low").toDF("word")
    val got = Bpe.segment(words, "word", merges)
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toList)).toMap
    assert(got("lowest") == List("low", "est"))
    assert(got("newest") == List("n", "e", "w", "est"))
    assert(got("low") == List("low"))
  }

  test("train is partitioning-invariant: 1-partition and 8-partition corpora learn identical merges") {
    val base = (0L until 64L).map(i =>
      (i, s"alpha beta gamma tok$i alpha beta"))
    val one = docs(base: _*).coalesce(1)
    val eight = docs(base: _*).repartition(8)
    val a = Bpe.train(one, "text", 6).collect().map(_.toString).toSeq
    val b = Bpe.train(eight, "text", 6).collect().map(_.toString).toSeq
    assert(a == b)
  }
}

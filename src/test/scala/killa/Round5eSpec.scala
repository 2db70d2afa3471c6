package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.model.Turn
import killa.query.{IndexReader, Percolate}

/** Round-5e surfaces: percolate (reverse search) and update-by-query. */
class Round5eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, i, txt) =>
      Turn(c, i, "user", txt, "", new Timestamp(epoch + i * 1000L))
    }.toDS().toDF()

  // ---- percolate ----

  test("percolate: conjunctive needs ALL terms, disjunctive ANY, set-style duplicates") {
    val docs = mkTurns(
      ("d1", 0, "spark query runs"), ("d1", 1, "more spark here"),
      ("d2", 0, "query only text"),
      ("d3", 0, "nothing relevant"),
      ("d4", 0, "spark alone"))
    val queries = Seq(
      ("both", Seq("spark", "query"), true),
      ("either", Seq("spark", "query"), false),
      ("dup", Seq("spark", "spark"), true), // duplicates collapse set-style
      ("miss", Seq("spark", "zzz"), true)
    ).toDF("query_id", "terms", "conjunctive")
    val got = Percolate.percolate(docs, queries)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val exp = Set(
      ("d1", "both"), ("d1", "either"), ("d1", "dup"),
      ("d2", "either"),
      ("d4", "either"), ("d4", "dup"))
    assert(got == exp)
  }

  test("percolate: a doc spanning turns satisfies a conjunctive query across turns") {
    val docs = mkTurns(("x", 0, "alpha only"), ("x", 1, "beta only"))
    val queries = Seq(("ab", Seq("alpha", "beta"), true)).toDF("query_id", "terms", "conjunctive")
    val got = Percolate.percolate(docs, queries).collect().map(_.getString(0)).toSeq
    assert(got == Seq("x"))
  }

  test("percolateTranscripts: arriving files alert against the registered queries") {
    val src = TestSpark.freshDir("r5eperc-src")
    val out = TestSpark.freshDir("r5eperc-out")
    val ckpt = TestSpark.freshDir("r5eperc-ckpt")
    mkTurns(("pa", 0, "hit one"), ("pb", 0, "nothing here"))
      .write.mode("append").parquet(src)
    mkTurns(("pc", 0, "another hit arrives"))
      .write.mode("append").parquet(src)
    val queries = Seq(("watch_hit", Seq("hit"), false)).toDF("query_id", "terms", "conjunctive")
    val batches = killa.streaming.StreamOps.percolateTranscripts(spark, src, queries, out, ckpt)
    assert(batches >= 1)
    val alerts = spark.read.parquet(out).select("conv_id", "query_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(alerts == Set(("pa", "watch_hit"), ("pc", "watch_hit")))
  }

  // ---- update-by-query ----

  test("updateByQuery: mutated index is rank-identical to a fresh build of the rewritten corpus") {
    val corpus = mkTurns(
      ("u1", 0, "spark query fast"), ("u1", 1, "spark again here"),
      ("u2", 0, "query filter text"),
      ("u3", 0, "spark filter mix"),
      ("u4", 0, "plain words only"))
    val rewrite =
      expr("array_join(transform(split(text, ' '), x -> CASE WHEN x = 'spark' THEN 'meteor' ELSE x END), ' ')")
    val root = TestSpark.freshDir("r5eubq")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexMaintainer(spark, root, conf)
      .updateByQuery(Seq("spark"), corpus, rewrite, "u1")
    val mutated = new IndexReader(spark, root, conf)
    // fresh build over the externally-rewritten corpus = ground truth
    val rewritten = corpus.withColumn("text", rewrite)
    val freshRoot = TestSpark.freshDir("r5eubqf")
    new IndexWriter(spark, freshRoot, conf).fullBuild(rewritten, "b0")
    val fresh = new IndexReader(spark, freshRoot, conf)
    // membership flips exactly
    assert(mutated.membership("spark").isEmpty)
    assert(mutated.membership("meteor").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("u1", "u3"))
    // scored identity: same ids AND scores on the mutated vs fresh index
    val a = mutated.bm25TopK(Seq("meteor", "filter"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = fresh.bm25TopK(Seq("meteor", "filter"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b)
    // untouched docs still answer
    assert(mutated.membership("query").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("u1", "u2"))
  }
}

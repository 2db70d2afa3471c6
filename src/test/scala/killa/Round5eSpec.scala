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

  test("bm25Explain: matched clauses only; contributions sum to the doc's score") {
    val corpus = mkTurns(
      ("e1", 0, "spark query fast"), ("e1", 1, "query again"),
      ("e2", 0, "query filter text"),
      ("e3", 0, "filter words here"))
    val root = TestSpark.freshDir("r5eexp")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val rd = new IndexReader(spark, root, conf)
    val rows = rd.bm25Explain("e1", Seq("query", "filter", "spark"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(5))).toSeq
    // e1 holds query (tf 2) and spark (tf 1) but NOT filter
    assert(rows.map(_._1) == Seq("query", "spark"))
    val byTerm = rows.map(r => r._1 -> r).toMap
    assert(byTerm("query")._2 == 2L && byTerm("spark")._2 == 1L)
    assert(rows.forall(_._3 == 5L), "dl = e1's 5 tokens")
    assert(byTerm("query")._4 == 2L && byTerm("spark")._4 == 1L, "global dfs")
    // sum of contributions = the doc's score on the scored surface
    val score = rd.bm25TopK(Seq("query", "filter", "spark"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap.apply("e1")
    assert(math.abs(rows.map(_._5).sum - score) <= 1e-9 * math.max(1.0, score))
    // unknown doc and no-match term sets return empty, no error
    assert(rd.bm25Explain("nope", Seq("query")).isEmpty)
    assert(rd.bm25Explain("e1", Seq("zzz")).isEmpty)
  }

  test("reindexTo: resharded rebuild from the forward log is rank-identical to the source") {
    val corpus = mkTurns(
      ("r1", 0, "spark query fast"), ("r1", 1, "query again spark"),
      ("r2", 0, "query filter text"),
      ("r3", 0, "spark filter mix extra words"),
      ("r4", 0, "plain other things"),
      ("r5", 0, "")) // token-less doc must survive the reindex
    val src = TestSpark.freshDir("r5eridx-src")
    new IndexWriter(spark, src, conf).fullBuild(corpus, "b0")
    val maint = new IndexMaintainer(spark, src, conf)
    // mutate before reindexing: the LIVE state is what must carry over
    maint.applyChangesDf(mkTurns(("r2", 0, "query filter rewritten")), None, batchId = "d1")
    maint.removeConvs(Seq("r4").toDF("conv_id"), "d2")
    val dst = TestSpark.freshDir("r5eridx-dst")
    val dstConf = conf.copy(nBuckets = 16, rangeDocs = 4, blockSize = 8)
    maint.reindexTo(dst, dstConf)
    val a = new IndexReader(spark, src, conf)
    val b = new IndexReader(spark, dst, dstConf)
    // membership identity on every term of the live corpus
    for (t <- Seq("spark", "query", "filter", "rewritten", "plain")) {
      assert(b.membership(t).collect().map(_.getString(0)).sorted.toSeq ==
        a.membership(t).collect().map(_.getString(0)).sorted.toSeq, s"term $t")
    }
    // scored identity: ids AND scores
    val ha = a.bm25TopK(Seq("spark", "query"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val hb = b.bm25TopK(Seq("spark", "query"), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(ha == hb)
    // the token-less doc kept its dictionary entry (N preserved → idf equal,
    // already implied by the score identity; assert directly too)
    assert(b.docs.count() == a.docs.count())
  }

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

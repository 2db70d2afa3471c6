package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.{IndexReader, Snippets}

/** Round-5f surfaces: unordered span_near, realtime term vectors, and
  * multi-term tagged highlighting.
  */
class Round5fSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, i, txt) =>
      Turn(c, i, "user", txt, "", new Timestamp(epoch + i * 1000L))
    }.toDS().toDF()

  private def convs(df: DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).sorted.toSeq

  // ---- span_near (unordered) ----

  test("spanNear: order-free within the window, slop slack is exact") {
    val corpus = mkTurns(
      ("s1", 0, "batch x agg tail"),      // ordered, window 3 → slack 1
      ("s2", 0, "agg x batch tail"),      // REVERSED, window 3 → slack 1
      ("s3", 0, "agg x y batch"),         // reversed, window 4 → slack 2
      ("s4", 0, "agg only here"),         // one term missing
      ("s5", 0, "batch agg"))             // adjacent reversed → slack 0
    val root = TestSpark.freshDir("r5fsn")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexWriter(spark, root, conf).buildPositions(corpus, "pos0")
    val rd = new IndexReader(spark, root, conf)
    assert(convs(rd.spanNear(Seq("batch", "agg"), 0)) == Seq("s5"))
    assert(convs(rd.spanNear(Seq("batch", "agg"), 1)) == Seq("s1", "s2", "s5"))
    assert(convs(rd.spanNear(Seq("batch", "agg"), 2)) == Seq("s1", "s2", "s3", "s5"))
    // the ordered phrase with the same slop must NOT match the reversals
    assert(convs(rd.phrase(Seq("batch", "agg"), 1)) == Seq("s1", "s5"))
    // single term degenerates to membership; unknown term → empty
    assert(convs(rd.spanNear(Seq("agg"), 0)) == Seq("s1", "s2", "s3", "s4", "s5"))
    assert(rd.spanNear(Seq("batch", "zzz"), 5).isEmpty)
  }

  test("spanNear: three terms, minimal covering window across turns") {
    val corpus = mkTurns(
      ("t1", 0, "cc aa bb"),              // window 3, slack 0
      ("t2", 0, "aa x cc bb"),            // best window 4, slack 1
      ("t3", 0, "aa x"), ("t3", 1, "y cc z bb")) // global pos: aa0 cc3 bb5 → slack 3
    val root = TestSpark.freshDir("r5fsn3")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexWriter(spark, root, conf).buildPositions(corpus, "pos0")
    val rd = new IndexReader(spark, root, conf)
    assert(convs(rd.spanNear(Seq("aa", "bb", "cc"), 0)) == Seq("t1"))
    assert(convs(rd.spanNear(Seq("aa", "bb", "cc"), 1)) == Seq("t1", "t2"))
    assert(convs(rd.spanNear(Seq("aa", "bb", "cc"), 3)) == Seq("t1", "t2", "t3"))
  }

  // ---- term vectors ----

  test("termVectors: tf, global positions across turns, df from the index") {
    val corpus = mkTurns(
      ("v1", 0, "spark query spark"), ("v1", 1, "more spark"),
      ("v2", 0, "query only"),
      ("v3", 0, "nothing else"))
    val root = TestSpark.freshDir("r5ftv")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val rd = new IndexReader(spark, root, conf)
    val rows = rd.termVectors(corpus, "v1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_._1).toSeq == Seq("more", "query", "spark"), "term asc")
    val byTerm = rows.map(r => r._1 -> r).toMap
    assert(byTerm("spark") == (("spark", 3L, 1L, "0,2,4")),
      "tf 3, df 1, positions global across turns")
    assert(byTerm("query") == (("query", 1L, 2L, "1")), "df counts v2 too")
    assert(byTerm("more") == (("more", 1L, 1L, "3")))
    // realtime semantics: a term in the live doc but absent from the index
    // reports df = 0
    val live = mkTurns(("v1", 0, "spark brandnew"))
    val liveRows = rd.termVectors(live, "v1")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(liveRows("brandnew") == 0L && liveRows("spark") == 1L)
    // unknown conv → empty frame, no error
    assert(rd.termVectors(corpus, "nope").isEmpty)
  }

  // ---- highlight ----

  test("highlight: tags every occurrence, caps fragments, counts hits") {
    val corpus = mkTurns(
      ("h1", 0, "spark leads spark twice"),
      ("h1", 1, "no match here"),
      ("h1", 2, "batch at last"),
      ("h1", 3, "spark again late"),  // 3rd matching turn — cut by maxFragments=2
      ("h2", 0, "only batch once"),
      ("h3", 0, "nothing at all"))
    val hits = Seq("h1", "h2").toDF("conv_id")
    val got = Snippets.highlight(corpus, hits, Seq("spark", "batch"), 2)
      .orderBy("conv_id", "turn_idx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      ("h1", 0, 2L, "<em>spark</em> leads <em>spark</em> twice"),
      ("h1", 2, 1L, "<em>batch</em> at last"),
      ("h2", 0, 1L, "only <em>batch</em> once")))
    // custom tags, fragment cap 1
    val one = Snippets.highlight(corpus, hits, Seq("batch"), 1, "[", "]")
      .collect().map(r => (r.getString(0), r.getString(3))).toSeq.sorted
    assert(one == Seq(("h1", "[batch] at last"), ("h2", "only [batch] once")))
  }
}

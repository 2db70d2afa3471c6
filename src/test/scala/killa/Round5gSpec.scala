package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.IndexReader

/** Round-5g surfaces: span_not, match_bool_prefix, and the phrase
  * ("did you mean") suggester.
  */
class Round5gSpec extends AnyFunSuite {
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

  // ---- span_not ----

  test("spanNot: include survives only outside the exclusion window") {
    val corpus = mkTurns(
      ("n1", 0, "spark plug here"),        // spark@0 next to plug@1
      ("n2", 0, "spark alone words"),      // no exclude at all
      ("n3", 0, "spark plug spark far"),   // second spark@2 escapes [2,3]
      ("n4", 0, "plug only text"),         // no include
      ("n5", 0, "spark x"), ("n5", 1, "plug late")) // cross-turn: plug@2
    val root = TestSpark.freshDir("r5gsn")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    new IndexWriter(spark, root, conf).buildPositions(corpus, "pos0")
    val rd = new IndexReader(spark, root, conf)
    // post=1: spark@0 of n1 is killed by plug@1; n5's plug@2 is outside +1
    assert(convs(rd.spanNot("spark", "plug", 0, 1)) == Seq("n2", "n3", "n5"))
    // widen post to 2: n5's spark@0 now collides with plug@2 too
    assert(convs(rd.spanNot("spark", "plug", 0, 2)) == Seq("n2", "n3"))
    // pre-only window looks BACKWARD from the include: plug@1 AFTER spark@0
    // does not suppress it
    assert(convs(rd.spanNot("spark", "plug", 1, 0)) ==
      Seq("n1", "n2", "n3", "n5"))
    // exclude absent from the corpus → plain membership
    assert(convs(rd.spanNot("spark", "zzz", 3, 3)) ==
      Seq("n1", "n2", "n3", "n5"))
    // a span minus itself is empty
    assert(rd.spanNot("spark", "spark", 0, 0).isEmpty)
  }

  // ---- match_bool_prefix ----

  test("matchBoolPrefix: blended prefix group ≡ explicit synonym group") {
    val corpus = mkTurns(
      ("b1", 0, "query scan fast"),
      ("b2", 0, "query sort slow"),
      ("b3", 0, "scan sort scan"),
      ("b4", 0, "other words only"))
    val root = TestSpark.freshDir("r5gbp")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val rd = new IndexReader(spark, root, conf)
    val got = rd.matchBoolPrefix(Seq("query"), "s", 50, 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // dictionary s-terms, lexicographic: scan, slow, sort
    val want = rd.bm25SynonymsTopK(
      Seq(Seq("query"), Seq("scan", "slow", "sort")), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == want)
    // maxExpansions caps the expansion at the lexicographically FIRST terms
    val capped = rd.matchBoolPrefix(Seq("query"), "s", 1, 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val wantCapped = rd.bm25SynonymsTopK(Seq(Seq("query"), Seq("scan")), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(capped == wantCapped)
    // no dictionary term carries the prefix → plain disjunction remains
    val bare = rd.matchBoolPrefix(Seq("query"), "zz", 50, 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val wantBare = rd.bm25SynonymsTopK(Seq(Seq("query")), 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(bare == wantBare && bare.nonEmpty)
  }

  // ---- phrase suggester ----

  test("suggestPhrase: present slots kept, absent slots corrected, df ties by term asc") {
    val corpus = mkTurns(
      ("p1", 0, "spark filter fell"),
      ("p2", 0, "spark filter felt"),
      ("p3", 0, "spark words here"))
    val root = TestSpark.freshDir("r5gsp")
    new IndexWriter(spark, root, conf).fullBuild(corpus, "b0")
    val rd = new IndexReader(spark, root, conf)
    val got = rd.suggestPhrase(Seq("spark", "filtr", "fel", "zzzzzz"))
      .orderBy("slot")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (0, "spark", "spark", 3L),    // present: kept with its global df
      (1, "filtr", "filter", 2L),   // corrected to the df-2 candidate
      (2, "fel", "fell", 1L),       // df tie (fell/felt both 1) → term asc
      (3, "zzzzzz", "zzzzzz", 0L))) // no candidate → unchanged, df 0
    // duplicate input tokens keep their own slots
    val dup = rd.suggestPhrase(Seq("filtr", "filtr"))
      .collect().map(r => (r.getInt(0), r.getString(2))).toSeq.sorted
    assert(dup == Seq((0, "filter"), (1, "filter")))
  }
}

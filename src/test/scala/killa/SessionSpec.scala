package killa

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.IndexMaintainer
import killa.model.Turn
import killa.session.QuerySession

/** Two-tier read-your-writes (Search vs DelayedSearch, SURVEY.md §1.3.5),
  * IsIndexing, and Flush semantics.
  */
class SessionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
  private val epoch = 1704067200000L

  private def mkTurns(rows: (String, Int, String)*): DataFrame =
    rows.map { case (c, i, t) => Turn(c, i, "user", t, "", new Timestamp(epoch)) }
      .toDS().toDF()

  test("search is snapshot-pinned; delayedSearch observes committed maintenance (FileAnalyzer.cs:51-60)") {
    val root = TestSpark.freshDir("sess")
    new IndexWriter(spark, root, conf).fullBuild(mkTurns(("a", 0, "one")), "b0")
    val s = new QuerySession(spark, root, conf)
    assert(s.search("one").collect().map(_.getString(0)).toSet == Set("a"))
    new IndexMaintainer(spark, root, conf).applyChanges(mkTurns(("b", 0, "one two")), batchId = "d1")
    // immediate search: old snapshot
    assert(s.search("two").isEmpty)
    // delayed search: quiesced view
    assert(s.delayedSearch("two").collect().map(_.getString(0)).toSet == Set("b"))
    assert(s.search("one").collect().map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("isIndexing reflects pending build buckets (FileAnalyzer.cs:49)") {
    val root = TestSpark.freshDir("idx")
    val w = new IndexWriter(spark, root, conf)
    w.fullBuild(mkTurns(("a", 0, "x y z")), "b0", maxWaves = 1)
    val s = new QuerySession(spark, root, conf)
    assert(s.isIndexing, "partial build → indexing")
    w.fullBuild(mkTurns(("a", 0, "x y z")), "b0") // resume to completion
    assert(!s.isIndexing)
  }

  test("flush clears the index; pinned readers keep their snapshot (StringIndex.cs:84-89)") {
    val root = TestSpark.freshDir("flush")
    new IndexWriter(spark, root, conf).fullBuild(mkTurns(("a", 0, "keep")), "b0")
    val pinned = new QuerySession(spark, root, conf)
    assert(pinned.contains("keep"))
    QuerySession.flush(spark, root)
    val fresh = new QuerySession(spark, root, conf)
    assert(!fresh.contains("keep"))
    assert(fresh.search("keep").isEmpty)
    assert(fresh.topK(Seq("keep"), 5).isEmpty)
    // pinned session still answers from its snapshot until refreshed
    assert(pinned.search("keep").collect().map(_.getString(0)).toSet == Set("a"))
    pinned.refresh()
    assert(pinned.search("keep").isEmpty)
  }
}

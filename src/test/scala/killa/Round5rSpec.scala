package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.Rollover
import killa.query.IndexReader
import killa.store.SegmentStore
import killa.synth.Synth

/** Round-5r layer: rollover lifecycle (the ES ILM rollover action) — capped
  * roots, atomic write-alias flips, merged-stats search across the group.
  */
class Round5rSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 30, turnsPerConv = 4,
    seed = 53L).toDF().persist()

  private def convBatch(lo: Int, hi: Int) =
    turns.where(expr(
      s"CAST(substring(conv_id, 5) AS INT) >= $lo AND CAST(substring(conv_id, 5) AS INT) < $hi"))

  test("rollover: cap-gated root creation, alias flips, append routing") {
    val group = TestSpark.freshDir("r5r-group")
    assert(Rollover.roots(spark, group).isEmpty)
    assert(Rollover.activeRoot(spark, group).isEmpty)

    // batch 1 (10 convs) opens r000000
    val r0 = Rollover.ingest(spark, group, conf, convBatch(0, 10), 12L, "b1")
    assert(r0.endsWith("r000000"))
    assert(Rollover.activeRoot(spark, group).contains(r0))
    // batch 2 (5 convs): 10 < 12 live docs → stays in r000000 (ES semantics:
    // the cap gates BEFORE the batch, a root may finish past it)
    assert(Rollover.ingest(spark, group, conf, convBatch(10, 15), 12L, "b2") == r0)
    assert(SegmentStore.latest(spark, r0).get.numDocs == 15)
    // batch 3: 15 >= 12 → rolls to r000001, alias flips
    val r1 = Rollover.ingest(spark, group, conf, convBatch(15, 30), 12L, "b3")
    assert(r1.endsWith("r000001") && r1 != r0)
    assert(Rollover.activeRoot(spark, group).contains(r1))
    assert(Rollover.roots(spark, group) == Seq(r0, r1))
    assert(SegmentStore.latest(spark, r1).get.numDocs == 15)

    // rolled root r0 is immutable from here on: batch 3 left its manifest
    // version untouched
    val v0 = SegmentStore.latest(spark, r0).get.version
    Rollover.ingest(spark, group, conf, convBatch(0, 0), 12L, "b4-empty")
    assert(SegmentStore.latest(spark, r0).get.version == v0)

    // group search == one unrolled index, ids AND scores
    val mono = TestSpark.freshDir("r5r-mono")
    new IndexWriter(spark, mono, conf).fullBuild(turns, "bm")
    val monoRd = new IndexReader(spark, mono, conf)
    val qs = Seq("query", "the", "index")
    val got = Rollover.bm25TopK(spark, group, conf, qs, 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = monoRd.bm25TopKRows(qs, 10).toSeq
    assert(got == want && got.nonEmpty)

    // membership union across roots == unrolled membership
    val gotM = Rollover.membership(spark, group, conf, "the")
      .collect().map(_.getString(0)).toSet
    val wantM = monoRd.membership("the").collect().map(_.getString(0)).toSet
    assert(gotM == wantM && gotM.nonEmpty)

    // empty group searches are empty, not errors
    val empty = TestSpark.freshDir("r5r-empty")
    assert(Rollover.membership(spark, empty, conf, "the").collect().isEmpty)
  }

  test("streaming rollover ingestion: capped roots across resumed passes") {
    import killa.streaming.StreamOps
    val group = TestSpark.freshDir("r5r-sgroup")
    val feed = TestSpark.freshDir("r5r-feed")
    // pass 1: 12 convs land, cap 10 → r000000 only (cap gates BEFORE a batch)
    convBatch(0, 12).write.mode("append").parquet(feed)
    assert(StreamOps.ingestRollover(spark, feed, group, conf, 10L) >= 1L)
    assert(Rollover.roots(spark, group).size == 1)
    // pass 2 (resumed from checkpoint): only the NEW files index; the active
    // root is at 12 ≥ 10 docs, so the batch rolls to r000001
    convBatch(12, 30).write.mode("append").parquet(feed)
    assert(StreamOps.ingestRollover(spark, feed, group, conf, 10L) >= 1L)
    val rs = Rollover.roots(spark, group)
    assert(rs.size >= 2)
    assert(Rollover.activeRoot(spark, group).contains(rs.last))
    // group view == the whole corpus, no dup, no loss
    val mono = TestSpark.freshDir("r5r-smono")
    new IndexWriter(spark, mono, conf).fullBuild(turns, "bm")
    val wantM = new IndexReader(spark, mono, conf).membership("the")
      .collect().map(_.getString(0)).toSet
    val gotM = Rollover.membership(spark, group, conf, "the")
      .collect().map(_.getString(0)).toSet
    assert(gotM == wantM && gotM.nonEmpty)
  }

  test("crossFieldsBm25: per-term best-field fold (term-centric multi_match)") {
    import killa.build.FieldIndexes
    val root = TestSpark.freshDir("r5r-xf")
    val values = FieldIndexes.build(spark, root, turns, "role", conf)
    assert(values.size >= 2)
    val terms = Seq("query", "index")

    // single-term cross_fields == the max of the per-field scores (per-term
    // dis_max with tie_breaker 0)
    val one = FieldIndexes.crossFieldsBm25(spark, root, "role", values,
        Seq("query"), 50, conf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val perField = values.map(v =>
      FieldIndexes.reader(spark, root, "role", v, conf)
        .bm25ScoredAll(Seq("query"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
    val refOne = perField.flatMap(_.keys).distinct
      .map(c => c -> perField.flatMap(_.get(c)).max).toMap
    assert(one.nonEmpty && one == refOne)

    // multi-term: score = Σ_t max_f contribution(t, f) — never exceeds
    // most_fields' unweighted sum, and matches it exactly for docs whose
    // terms all live in a single field
    val cross = FieldIndexes.crossFieldsBm25(spark, root, "role", values,
        terms, 1000, conf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val most = FieldIndexes.multiFieldBm25(spark, root, "role",
        values.map(_ -> 1.0).toMap, terms, 1000, conf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cross.keySet == most.keySet)
    cross.foreach { case (c, s) => assert(s <= most(c) + 1e-9, c) }
  }
}

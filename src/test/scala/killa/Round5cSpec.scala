package killa

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{FieldIndexes, IndexWriter}
import killa.cli.Main
import killa.model.Turn
import killa.query.IndexReader
import killa.synth.Synth

/** Round-5 review fixes: a maintenance batch that INTRODUCES a field value,
  * ES-semantics null handling in the range facet, and the CLI bm25 grammar's
  * NOT section treating a literal MIN token as an exclusion term.
  */
class Round5cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 30, turnsPerConv = 4, seed = 23L)
    .toDF().persist()

  // ---- new field value arriving in a delta batch ----

  test("FieldIndexes.applyChanges: a batch introducing a NEW field value builds its sub-index") {
    val incrRoot = TestSpark.freshDir("r5cnv")
    val values = FieldIndexes.build(spark, incrRoot, turns, "role", conf)
    assert(!values.contains("moderator"))
    // two fresh convs carrying a role no build has seen
    val batch = Seq(
      Turn("convM1", 0, "moderator", "flagged content review alpha", "", new Timestamp(0L)),
      Turn("convM2", 0, "moderator", "flagged escalation beta", "", new Timestamp(0L)),
      Turn("convM2", 1, "user", "ordinary user words", "", new Timestamp(0L))
    ).toDS().toDF()
    val after = FieldIndexes.applyChanges(
      spark, incrRoot, "role", values, batch, batchId = "dnv", conf = conf)
    assert(after.contains("moderator"), "returned value list must include the new value")
    assert((after.toSet -- values.toSet) == Set("moderator"))
    // the new sub-index answers field-scoped search for exactly the new turns
    val rm = FieldIndexes.reader(spark, incrRoot, "role", "moderator", conf)
    assert(rm.membership("flagged").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("convM1", "convM2"))
    assert(rm.membership("ordinary").collect().isEmpty,
      "the new sub-index must hold only the new value's turns")
    // the batch's user turn reached the existing user sub-index too
    val ru = FieldIndexes.reader(spark, incrRoot, "role", "user", conf)
    assert(ru.membership("ordinary").collect().map(_.getString(0)).toSeq == Seq("convM2"))
    // and the whole incremental store equals a fresh per-field rebuild
    val freshRoot = TestSpark.freshDir("r5cnvf")
    FieldIndexes.build(spark, freshRoot, turns.unionByName(batch), "role", conf)
    for (v <- after) {
      val ri = FieldIndexes.reader(spark, incrRoot, "role", v, conf)
      val rf = FieldIndexes.reader(spark, freshRoot, "role", v, conf)
      assert(ri.membership("flagged").collect().map(_.getString(0)).sorted.toSeq ==
        rf.membership("flagged").collect().map(_.getString(0)).sorted.toSeq, s"value=$v")
      assert(ri.manifest.map(_.numDocs) == rf.manifest.map(_.numDocs), s"value=$v numDocs")
    }
  }

  test("FieldIndexes.applyChanges: a value introduced and deleted in ONE batch builds nothing") {
    val incrRoot = TestSpark.freshDir("r5cnd")
    val values = FieldIndexes.build(spark, incrRoot, turns, "role", conf)
    val batch = Seq(
      Turn("convG1", 0, "ghost", "never alive content", "", new Timestamp(0L))
    ).toDS().toDF()
    val after = FieldIndexes.applyChanges(
      spark, incrRoot, "role", values, batch, deletes = Seq("convG1"),
      batchId = "dgd", conf = conf)
    assert(after.contains("ghost"), "value list still records the value")
    val rg = FieldIndexes.reader(spark, incrRoot, "role", "ghost", conf)
    assert(rg.manifest.isEmpty, "delete-wins: no sub-index tree for an all-deleted slice")
  }

  // ---- range facet null/NaN semantics ----

  test("rangeFacet ignores docs whose doc-value is null or NaN (no null bucket)") {
    val root = TestSpark.freshDir("r5crf")
    val docs = Seq(
      Turn("cv1", 0, "user", "widget alpha", "", new Timestamp(0L)),
      Turn("cv2", 0, "user", "widget beta", "", new Timestamp(0L)),
      Turn("cv3", 0, "user", "widget gamma", "", new Timestamp(0L)),
      Turn("cv4", 0, "user", "widget delta", "", new Timestamp(0L))
    ).toDS().toDF()
    new IndexWriter(spark, root, conf).fullBuild(docs, "b0")
    val meta = Seq(
      ("cv1", java.lang.Double.valueOf(5.0)),
      ("cv2", java.lang.Double.valueOf(15.0)),
      ("cv3", null.asInstanceOf[java.lang.Double]),
      ("cv4", java.lang.Double.valueOf(Double.NaN))
    ).toDF("conv_id", "size")
    val got = new IndexReader(spark, root, conf)
      .rangeFacet("widget", meta, "conv_id", "size", Seq(10.0))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("*-10" -> 1L, "10-*" -> 1L),
      s"null/NaN doc-values must be ignored, got $got")
    assert(!got.contains(null), "no null-labeled bucket row")
  }

  // ---- sort-by-doc-value search (ES sort clause) ----

  private lazy val root: String = {
    val r = TestSpark.freshDir("r5croot")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    r
  }
  private lazy val reader = new IndexReader(spark, root, conf)

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  test("searchSorted: membership ordered by the doc value, both directions, nulls ignored") {
    val meta0 = turns.groupBy("conv_id")
      .agg(min(unix_timestamp(col("ts"))).cast("double").as("t0"))
    val pairs = meta0.collect().map(r => (r.getString(0), r.getDouble(1)))
    val matches = killa.query.BruteForce.membership(turns, "the")
      .collect().map(_.getString(0)).toSet
    // poison one MATCHING conv's value with null: it must drop, not sort first
    val nullConv = matches.toSeq.min
    val meta = meta0.withColumn("t0",
      when(col("conv_id") === nullConv, lit(null)).otherwise(col("t0")))
    val vals = pairs.toMap
    val expDesc = matches.toSeq.filter(_ != nullConv)
      .map(c => (c, vals(c))).sortBy { case (c, v) => (-v, c) }.take(5)
    val gotDesc = reader.searchSorted("the", meta, "conv_id", "t0", ascending = false, k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(gotDesc == expDesc)
    val expAsc = matches.toSeq.filter(_ != nullConv)
      .map(c => (c, vals(c))).sortBy { case (c, v) => (v, c) }.take(5)
    val gotAsc = reader.searchSorted("the", meta, "conv_id", "t0", ascending = true, k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(gotAsc == expAsc)
  }

  // ---- field collapsing (ES collapse clause) ----

  test("collapseTop: the best-scoring conv per group of the FULL scored set") {
    val groupOf = (c: String) => "g" + (c.drop(4).toInt % 3)
    val meta = turns.select("conv_id").distinct()
      .withColumn("grp", expr("concat('g', CAST(CAST(substring(conv_id, 5) AS INT) % 3 AS STRING))"))
    val terms = Seq("query", "filter")
    val scored = killa.query.BruteForce.bm25(turns, terms, 100000, conf = conf)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val exp = scored.groupBy { case (c, _) => groupOf(c) }.view
      .mapValues(_.minBy { case (c, s) => (-s, c) }).toMap
    val got = reader.collapseTop(terms, meta, "conv_id", "grp")
      .collect().map(r => (r.getString(0), (r.getString(1), r.getDouble(2)))).toMap
    assert(got.keySet == exp.keySet)
    for ((g, (c, s)) <- got) {
      assert(c == exp(g)._1, s"group $g winner")
      assert(math.abs(s - exp(g)._2) <= 1e-9 * math.max(1.0, math.abs(s)), s"group $g score")
    }
  }

  // ---- synonym-group scored BM25 (ES synonym_graph) ----

  test("bm25SynonymsTopK: singleton groups are score-identical to plain disjunctive BM25") {
    val got = hits(reader.bm25SynonymsTopK(Seq(Seq("query"), Seq("filter")), 10))
    val exp = hits(reader.bm25TopK(Seq("query", "filter"), 10))
    assert(approxEq(got, exp))
  }

  test("bm25SynonymsTopK: merged tf + union df vs a collection brute force") {
    val groups = Seq(Seq("query", "scan"), Seq("filter"))
    val toks = turns
      .select(col("conv_id"), explode(killa.tokenize.Tokenize.termsCol(col("text"))).as("term"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byConv = toks.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val dls = byConv.view.mapValues(_.length.toLong).toMap
    val n = byConv.size.toLong
    val avgdl = dls.values.sum.toDouble / n
    val dfs = groups.map(g => byConv.count { case (_, ts) => ts.exists(g.contains) }.toLong)
    val exp = byConv.toSeq.flatMap { case (conv, ts) =>
      val s = groups.zipWithIndex.map { case (g, gi) =>
        val tf = ts.count(t => g.contains(t)).toLong
        if (tf == 0L) 0.0
        else killa.query.Bm25.contrib(
          killa.query.Bm25.weight(n, dfs(gi), conf.k1), tf, dls(conv), conf.k1, conf.b, avgdl)
      }.sum
      if (s > 0.0) Some((conv, s)) else None
    }.sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.bm25SynonymsTopK(groups, 10))
    assert(approxEq(got, exp))
  }

  test("bm25SynonymsTopK: a synonym group can outrank the plain rare spelling") {
    // group df is the UNION set — its idf drops vs the rarest member's, so
    // scores differ from plain bm25 on the rare member alone
    val plain = hits(reader.bm25TopK(Seq("query"), 10))
    val grouped = hits(reader.bm25SynonymsTopK(Seq(Seq("query", "scan")), 10))
    assert(plain.nonEmpty && grouped.nonEmpty)
    assert(plain.map(_._2).sum != grouped.map(_._2).sum,
      "the group's union df must change scoring vs the single member")
  }

  // ---- delete-by-query (ES _delete_by_query) ----

  test("deleteByQuery: the match set leaves; other queries see the survivor corpus") {
    val r = TestSpark.freshDir("r5cdbq")
    new IndexWriter(spark, r, conf).fullBuild(turns, "b0")
    val sparkConvs = killa.query.BruteForce.membership(turns, "spark")
      .collect().map(_.getString(0)).toSet
    val queryConvs = killa.query.BruteForce.membership(turns, "query")
      .collect().map(_.getString(0)).toSet
    assert(sparkConvs.nonEmpty && (queryConvs -- sparkConvs).nonEmpty)
    new killa.maintain.IndexMaintainer(spark, r, conf).deleteByQuery(Seq("spark"), "d1")
    val rd = new IndexReader(spark, r, conf)
    assert(rd.membership("spark").collect().isEmpty, "matching convs must be gone")
    assert(rd.membership("query").collect().map(_.getString(0)).toSet ==
      queryConvs -- sparkConvs, "non-matching convs must survive intact")
    // idempotent: repeating the deletion is a no-op
    new killa.maintain.IndexMaintainer(spark, r, conf).deleteByQuery(Seq("spark"), "d2")
    assert(new IndexReader(spark, r, conf).membership("query")
      .collect().map(_.getString(0)).toSet == queryConvs -- sparkConvs)
  }

  // ---- CLI bm25 grammar: literal MIN inside the NOT section ----

  test("CLI bm25: a literal MIN token after NOT is an exclusion term, not the keyword") {
    val root = TestSpark.freshDir("r5cmin")
    val data = TestSpark.freshDir("r5cmindata")
    Seq(
      Turn("k1", 0, "user", "shared MIN words", "", new Timestamp(0L)),
      Turn("k2", 0, "user", "shared other words", "", new Timestamp(0L))
    ).toDS().toDF().write.mode("overwrite").parquet(data)
    Main.run(spark, root, "build", Array(data))
    def capture(verb: String, args: Array[String]): Seq[String] = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { Main.run(spark, root, verb, args) }
      out.toString.split("\n").filter(_.nonEmpty).toSeq
    }
    // NOT MIN excludes the doc containing the literal token MIN (the old
    // parser hijacked MIN as the keyword and silently excluded nothing)
    val hits = capture("bm25", Array("5", "shared", "NOT", "MIN"))
    assert(hits.map(_.split("\t")(0)) == Seq("k2"), s"got $hits")
    // and a non-numeric token after NOT MIN must not crash the parser
    val hits2 = capture("bm25", Array("5", "shared", "NOT", "MIN", "absent"))
    assert(hits2.map(_.split("\t")(0)) == Seq("k2"))
    // MIN before NOT is still the minimum_should_match keyword
    val hits3 = capture("bm25", Array("5", "shared", "MIN", "1", "NOT", "other"))
    assert(hits3.map(_.split("\t")(0)) == Seq("k1"))
  }
}

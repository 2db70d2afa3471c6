package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{FieldIndexes, IndexWriter}
import killa.query.{BruteForce, IndexReader}
import killa.synth.Synth
import killa.tokenize.Tokenize

/** Round-4 capability layer, second wave: spell-suggest, full scored export
  * (bm25ScoredAll), window rescoring (function score), multi-field boosted
  * BM25, date-histogram facets.
  */
class Round4bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 50, turnsPerConv = 5, seed = 13L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("r4b")
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

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---- spell-suggest ----

  test("suggest: parity with a brute dictionary scan; df-desc/term-asc order; probe excluded") {
    val dfByTerm = turns
      .select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
      .distinct().groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (probe <- Seq("sow", "the", "quary", "zzzzzz")) {
      val exp = dfByTerm.toSeq
        .filter { case (t, _) => t != probe && lev(t, probe) <= 1 }
        .sortBy { case (t, d) => (-d, t) }.take(5)
      val got = reader.suggest(probe, 1, 5).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == exp, s"probe=$probe")
    }
    assert(reader.suggest("the", 1, 5).collect().forall(_.getString(0) != "the"),
      "suggester echoed its input")
    assert(reader.suggest(null, 1, 5).isEmpty && reader.suggest("x", 0, 5).isEmpty)
  }

  // ---- regex term search ----

  test("membershipRegex: parity with a brute token-level regex; prefix pushdown never over-prunes") {
    val toks = turns
      .select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("term"))
    for (p <- Seq("^the$", "^sp[aeiou]rk$", "^sp?ark$", "^uniq[0-9]+_0$",
        "ed_[0-9]$", "^shar", "^zzz")) {
      val exp = toks.where(col("term").rlike(p)).select("conv_id").distinct()
        .collect().map(_.getString(0)).toSet
      val got = reader.membershipRegex(p).collect().map(_.getString(0)).toSet
      assert(got == exp, s"pattern=$p")
    }
    // unanchored pattern finds mid-term (no prefix assumed)
    assert(reader.membershipRegex("hared").collect().nonEmpty)
    assert(reader.membershipRegex(null).isEmpty)
  }

  // ---- full scored export ----

  test("bm25ScoredAll: full match set with exact scores, disjunctive/conjunctive/mustNot") {
    val terms = Seq("query", "filter")
    for ((conj, ex) <- Seq((false, Nil), (true, Nil), (false, Seq("spark")))) {
      val exp = hits(BruteForce.bm25(turns, terms, 100000, conjunctive = conj,
        conf = conf, mustNot = ex))
      val got = hits(reader.bm25ScoredAll(terms, conjunctive = conj, mustNot = ex)
        .orderBy(col("score").desc, col("conv_id").asc))
      assert(approxEq(got, exp), s"conj=$conj ex=$ex: got ${got.length} exp ${exp.length}")
      assert(got.nonEmpty, "vacuous fixture")
    }
    // the top of the export IS the top-k surface's answer
    val top = reader.bm25TopKRows(terms, 10).toSeq
    val exTop = hits(reader.bm25ScoredAll(terms)
      .orderBy(col("score").desc, col("conv_id").asc).limit(10))
    assert(approxEq(exTop, top))
  }

  // ---- window rescore ----

  test("rescoreTopK: window >= corpus equals a full re-rank; missing factors default to 1.0") {
    val terms = Seq("query", "filter", "join")
    val full = hits(BruteForce.bm25(turns, terms, 100000, conf = conf))
    // deterministic synthetic factor per conv (varies, not order-preserving)
    val factors = full.map { case (c, _) =>
      (c, 1.0 + (c.hashCode.abs % 7).toDouble / 2.0)
    }.toDF("conv_id", "factor")
    val fmap = factors.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = full.map { case (c, s) => (c, s * fmap(c)) }
      .sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(reader.rescoreTopK(terms, 10, window = full.length, factors))
    assert(approxEq(got, exp))
    // the re-rank actually changed the order (else the fixture is vacuous)
    assert(got.map(_._1) != full.take(10).map(_._1), "factors did not reorder")

    // factors covering only half the window: the rest keep factor 1.0
    val half = factors.where(col("factor") > 2.0)
    val hmap = half.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp2 = full.map { case (c, s) => (c, s * hmap.getOrElse(c, 1.0)) }
      .sortBy { case (c, s) => (-s, c) }.take(10)
    val got2 = hits(reader.rescoreTopK(terms, 10, window = full.length, half))
    assert(approxEq(got2, exp2))

    // window == k degenerates to the base order with factors applied to top-k only
    val base = reader.bm25TopKRows(terms, 10).toSeq
    val exp3 = base.map { case (c, s) => (c, s * fmap.getOrElse(c, 1.0)) }
      .sortBy { case (c, s) => (-s, c) }
    val got3 = hits(reader.rescoreTopK(terms, 10, window = 10, factors))
    assert(approxEq(got3, exp3))
  }

  // ---- multi-field boosted BM25 ----

  test("multiFieldBm25: weighted sum of per-field full scored sets, each with its own stats") {
    val froot = TestSpark.freshDir("r4bmf")
    val values = FieldIndexes.build(spark, froot, turns, "role", conf)
    val terms = Seq("query", "filter")
    val boosts = values.zipWithIndex.map { case (v, i) => v -> (1.0 + i) }.toMap
    val perField = boosts.toSeq.map { case (v, w) =>
      hits(BruteForce.bm25(turns.where(col("role") === v), terms, 100000, conf = conf))
        .map { case (c, s) => (c, s * w) }
    }
    val exp = perField.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (c, s) => (-s, c) }.take(10)
    val got = hits(FieldIndexes.multiFieldBm25(spark, froot, "role", boosts, terms, 10, conf))
    assert(approxEq(got, exp, tol = 1e-6))
    assert(got.nonEmpty, "vacuous fixture")
    // boost singleton == that field's own ranking
    val v0 = values.head
    val solo = hits(FieldIndexes.multiFieldBm25(spark, froot, "role",
      Map(v0 -> 1.0), terms, 10, conf))
    val expSolo = hits(BruteForce.bm25(turns.where(col("role") === v0), terms, 10, conf = conf))
    assert(approxEq(solo, expSolo, tol = 1e-6))
  }

  // ---- date-histogram facet ----

  test("dateHistogram: per-bucket hit counts match a direct recomputation") {
    val meta = turns.groupBy("conv_id").agg(min(col("ts")).as("ts"))
    val matches = BruteForce.membership(turns, "the")
      .collect().map(_.getString(0)).toSet
    val expected = meta.collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
      .filter { case (c, _) => matches(c) }
      .groupBy { case (_, ts) =>
        val t = ts.toLocalDateTime.withSecond(0).withNano(0)
        t.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      }
      .map { case (b, rows) => (b, rows.length.toLong) }.toSeq.sorted
    val got = reader.dateHistogram("the", meta, "conv_id", "ts", "minute")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == expected)
    assert(got.map(_._2).sum == matches.size.toLong)
    assert(got.nonEmpty, "vacuous fixture")
  }
}

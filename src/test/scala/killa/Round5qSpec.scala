package killa

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.model.Turn
import killa.query.IndexReader
import killa.synth.Synth
import killa.tokenize.Analyzer

/** Round-5q layer: the analysis chain (lowercase / stop / S-stemmer) with an
  * analyzed index + matched query-time analysis, and the lexicographic
  * term-range query.
  */
class Round5qSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  test("S-stemmer known cases — terminal rule selection, no cascading") {
    val cases = Seq(
      "studies" -> "study", "tables" -> "table", "scans" -> "scan",
      "queries" -> "query", "class" -> "class", "bus" -> "bus",
      // the exception words: ending matches a rule, exception blocks it,
      // and the word must NOT fall through to the bare-s rule
      "goes" -> "goes", "trees" -> "trees", "aliases" -> "aliase",
      "movies" -> "movy", "eies" -> "eies",
      "table" -> "table", "query" -> "query", "" -> "")
    cases.foreach { case (in, want) =>
      assert(Analyzer.stem(in) == want, s"stem($in)")
    }
  }

  test("stemCol == scalar stem on a token sample (codegen parity)") {
    val toks = Seq("studies", "tables", "scans", "class", "goes", "bus",
      "s", "es", "ies", "uniq3_1", "the", "stress", "aes", "atlases")
    val got = toks.toDF("t").select(col("t"), Analyzer.stemCol(col("t")).as("st"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    toks.foreach(t => assert(got(t) == Analyzer.stem(t), s"<$t>"))
  }

  test("full chain: lowercase → stop → stem, scalar == column") {
    val chain = Analyzer.Chain(lowercase = true,
      stopwords = Seq("the", "a"), sStemmer = true)
    val text = "The Tables a STUDIES s the scans"
    val want = Seq("table", "study", "scan")
    assert(Analyzer.analyze(text, chain) == want)
    val viaCol = Seq(text).toDF("text")
      .select(Analyzer.termsCol(col("text"), chain).as("ts"))
      .collect()(0).getSeq[String](0)
    assert(viaCol == want)
    // query-side analysis agrees term by term
    assert(Analyzer.analyzeTerm("Tables", chain).contains("table"))
    assert(Analyzer.analyzeTerm("THE", chain).isEmpty)
    assert(Analyzer.analyzeTerm("s", chain).isEmpty)
  }

  test("analyzed index unifies morphological variants; raw index does not") {
    val chain = Analyzer.Chain(lowercase = true,
      stopwords = Seq("the"), sStemmer = true)
    val ts = new Timestamp(1704067200000L)
    val turns = Seq(
      Turn("cA", 0, "user", "the tables hold data", "", ts),
      Turn("cB", 0, "user", "one table only", "", ts),
      Turn("cC", 0, "user", "no furniture here", "", ts),
      Turn("cD", 0, "user", "Tables AND TABLE", "", ts)).toDS().toDF()

    val rawRoot = TestSpark.freshDir("r5q-raw")
    new IndexWriter(spark, rawRoot, conf).fullBuild(turns, "b1")
    val raw = new IndexReader(spark, rawRoot, conf)
    assert(raw.membership("tables").collect().map(_.getString(0)).toSet == Set("cA"))
    assert(raw.membership("table").collect().map(_.getString(0)).toSet == Set("cB"))

    val anRoot = TestSpark.freshDir("r5q-an")
    val analyzed = turns.withColumn("text", Analyzer.textCol(col("text"), chain))
    new IndexWriter(spark, anRoot, conf).fullBuild(analyzed, "b1")
    val an = new IndexReader(spark, anRoot, conf)
    val q = Analyzer.analyzeTerm("Tables", chain).get
    assert(q == "table")
    assert(an.membership(q).collect().map(_.getString(0)).toSet ==
      Set("cA", "cB", "cD"))
    // the stopword is not in the analyzed index at all
    assert(an.membershipCount("the") == 0)
    assert(raw.membershipCount("the") == 1)
  }

  test("membershipTermRange: gte/lt semantics, pushed range, edge cases") {
    val root = TestSpark.freshDir("r5q-range")
    val turns = Synth.transcripts(spark, nConvs = 20, turnsPerConv = 4, seed = 51L).toDF()
    new IndexWriter(spark, root, conf).fullBuild(turns, "b1")
    val rd = new IndexReader(spark, root, conf)
    val got = rd.membershipTermRange("so", "st")
      .collect().map(_.getString(0)).toSet
    // reference: union of exact memberships of every in-range corpus term
    val inRange = Synth.CommonWords.filter(w => w >= "so" && w < "st").toSeq
    assert(inRange.contains("sort") && inRange.contains("spark") &&
      !inRange.contains("scan") && !inRange.contains("the"))
    val ref = inRange.flatMap(t => rd.membership(t).collect().map(_.getString(0))).toSet
    assert(got == ref && got.nonEmpty)
    // degenerate ranges are empty, not errors
    assert(rd.membershipTermRange("st", "so").collect().isEmpty)
    assert(rd.membershipTermRange("zz", "zz").collect().isEmpty)
  }
}

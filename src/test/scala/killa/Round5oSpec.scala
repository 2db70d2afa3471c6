package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.expr.OsaDistance
import killa.query.IndexReader
import killa.synth.Synth
import killa.util.Hashing

/** Round-5o layer: ES-default fuzzy semantics — optimal-string-alignment
  * distance (Levenshtein + adjacent transposition as one edit, the Lucene
  * fuzzy-automaton distance behind `fuzziness` with `transpositions: true`).
  */
class Round5oSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  // ---- scalar distance -------------------------------------------------

  test("OSA known cases (incl. the OSA-vs-full-Damerau discriminator)") {
    assert(OsaDistance.dist("", "") == 0)
    assert(OsaDistance.dist("abc", "") == 3)
    assert(OsaDistance.dist("", "abc") == 3)
    assert(OsaDistance.dist("spark", "spark") == 0)
    assert(OsaDistance.dist("psark", "spark") == 1) // transposition = 1 edit
    assert(OsaDistance.dist("abcd", "acbd") == 1)
    assert(OsaDistance.dist("kitten", "sitting") == 3) // pure Levenshtein agrees
    // the classic case where OSA (Lucene/ES) differs from full Damerau:
    // a transposed pair cannot be edited again → 3, full Damerau says 2
    assert(OsaDistance.dist("ca", "abc") == 3)
    assert(OsaDistance.dist("abc", "ca") == 3)
  }

  /** Exponential-recursion reference (memoized) — the OSA recurrence stated
    * directly, for the property check against the DP.
    */
  private def osaRef(s: String, t: String): Int = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Int]
    def d(i: Int, j: Int): Int = memo.getOrElseUpdate((i, j), {
      if (i == 0) j
      else if (j == 0) i
      else {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var best = math.min(math.min(d(i - 1, j) + 1, d(i, j - 1) + 1),
          d(i - 1, j - 1) + cost)
        if (i > 1 && j > 1 && s(i - 1) == t(j - 2) && s(i - 2) == t(j - 1))
          best = math.min(best, d(i - 2, j - 2) + 1)
        best
      }
    })
    d(s.length, t.length)
  }

  test("OSA DP == direct recurrence on exhaustive short-string pairs") {
    // deterministic corpus: all strings over {a,b,c} of length <= 4
    val alpha = "abc"
    val words = (0 to 4).flatMap { n =>
      (0 until math.pow(3, n).toInt).map { k =>
        var x = k
        val sb = new StringBuilder
        (0 until n).foreach { _ => sb.append(alpha(x % 3)); x /= 3 }
        sb.toString
      }
    }
    // hash-sampled pairs keep the cross under 20k comparisons, seedless-stable
    val pairs = for {
      a <- words; b <- words
      if java.lang.Math.floorMod(Hashing.fnv1a64(a + "|" + b), 7L) == 0L
    } yield (a, b)
    assert(pairs.size > 1000)
    pairs.foreach { case (a, b) =>
      assert(OsaDistance.dist(a, b) == osaRef(a, b), s"<$a> vs <$b>")
      // symmetry + Levenshtein upper bound
      assert(OsaDistance.dist(a, b) == OsaDistance.dist(b, a))
    }
  }

  test("OSA codegen column == scalar (and null-safe)") {
    import spark.implicits._
    val terms = Seq("spark", "psark", "sparkk", "park", "spa", "", "the",
      "shared_3", "uniq7_1")
    val got = terms.toDF("t")
      .select(col("t"), OsaDistance.distCol(col("t"), "psark").as("d"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(got(t) == OsaDistance.dist(t, "psark"), s"codegen mismatch for <$t>")
    }
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(OsaDistance.distCol(col("t"), "x")).collect()(0)
    assert(r.isNullAt(0))
  }

  // ---- engine surface ---------------------------------------------------

  test("membershipFuzzy transpositions=true reaches a swapped-head term") {
    val root = TestSpark.freshDir("r5o-fuzzy")
    val turns = Synth.transcripts(spark, nConvs = 25, turnsPerConv = 4, seed = 43L).toDF()
    new IndexWriter(spark, root, conf).fullBuild(turns, "b1")
    val rd = new IndexReader(spark, root, conf)

    // 'psark' is OSA-1 from 'spark' (transposed head) and Levenshtein-2:
    // the ES-default form finds spark's convs, the classic form nothing
    val osa = rd.membershipFuzzy("psark", 1, transpositions = true)
      .collect().map(_.getString(0)).toSet
    val lev = rd.membershipFuzzy("psark", 1)
      .collect().map(_.getString(0)).toSet
    val exact = rd.membership("spark").collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty)
    assert(osa == exact)
    assert(lev.isEmpty)

    // at distances where no transposition is involved the two forms agree
    val osa2 = rd.membershipFuzzy("spork", 1, transpositions = true)
      .collect().map(_.getString(0)).toSet
    val lev2 = rd.membershipFuzzy("spork", 1)
      .collect().map(_.getString(0)).toSet
    assert(osa2 == lev2)

    // prefix_length composes with transpositions: requiring the literal
    // 'p' head keeps the scan pruned and (here) still matches nothing
    // besides what the unpruned form found for a 'ps…' query
    val osaPre = rd.membershipFuzzy("psark", 1, prefixLength = 1,
      transpositions = true).collect().map(_.getString(0)).toSet
    assert(osaPre.subsetOf(osa))
  }
}

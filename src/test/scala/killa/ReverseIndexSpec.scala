package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.{IndexWriter, ReverseIndex}
import killa.query.IndexReader
import killa.synth.Synth
import killa.tokenize.Tokenize
import killa.util.Glob

/** Reversed-term sub-index: suffix search, leading-wildcard masks, and the
  * incremental maintenance path.
  */
class ReverseIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 25, turnsPerConv = 4, seed = 67L)
    .toDF().persist()

  private lazy val root: String = {
    val r = TestSpark.freshDir("revroot")
    ReverseIndex.build(spark, r, turns, conf)
    r
  }

  // (conv, term) ground truth off the raw turns
  private lazy val convTerms: Seq[(String, String)] = turns
    .select(col("conv_id"), explode(Tokenize.termsCol(col("text"))).as("t"))
    .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSeq

  private def bruteSuffix(sfx: String): Set[String] =
    convTerms.filter(_._2.endsWith(sfx)).map(_._1).toSet

  test("membershipSuffix ≡ brute force over several suffixes incl. miss") {
    for (sfx <- Seq("e", "rk", "_0", "query", "zzz_absent")) {
      val got = ReverseIndex.membershipSuffix(spark, root, conf, sfx)
        .collect().map(_.getString(0)).toSet
      assert(got == bruteSuffix(sfx), s"suffix '$sfx'")
    }
    assert(ReverseIndex.membershipSuffix(spark, root, conf, "").collect().isEmpty)
  }

  test("mask reversal property: m matches t ⇔ m.reverse matches t.reverse") {
    val masks = Seq("*ark", "?he", "*a*", "s*k", "uniq*_?", "*", "??", "plan")
    val terms = convTerms.map(_._2).distinct
    for (m <- masks; t <- terms.take(200)) {
      val fwd = t.matches(Glob.toRegex(m))
      val rev = t.reverse.matches(Glob.toRegex(m.reverse))
      assert(fwd == rev, s"mask '$m' term '$t'")
    }
  }

  test("membershipWildcardReversed ≡ main-tree membershipWildcard") {
    val mainRoot = TestSpark.freshDir("revmain")
    new IndexWriter(spark, mainRoot, conf).fullBuild(turns, "b0")
    val main = new IndexReader(spark, mainRoot, conf)
    for (m <- Seq("*he", "*ark", "?uery", "*a?", "uniq0_*", "*zzz")) {
      val got = ReverseIndex.membershipWildcardReversed(spark, root, conf, m)
        .collect().map(_.getString(0)).toSet
      val want = main.membershipWildcard(m).collect().map(_.getString(0)).toSet
      assert(got == want, s"mask '$m'")
    }
  }

  test("applyChanges: subset build + delta batch ≡ full reversed build, incl. delete + rename") {
    val r = TestSpark.freshDir("revincr")
    ReverseIndex.build(spark, r, turns.where(col("turn_idx") < 2), conf)
    // delta: the remaining turns as updates, one delete, one rename
    val allConvs = turns.select("conv_id").distinct()
      .collect().map(_.getString(0)).sorted
    val dead = allConvs.head
    val renamed = allConvs(1)
    // a conv being renamed must not also ride the update set under its old
    // name — that would (correctly) re-add it as a fresh doc
    ReverseIndex.applyChanges(spark, r, turns.where(col("conv_id") =!= renamed),
      deletesDf = Some(Seq(dead).toDF("conv_id")),
      renames = Map(renamed -> "zzz999"), batchId = "d1", conf = conf)
    // the renamed conv never rode the update set, so its content stays at
    // the subset-build state (turn_idx < 2) under the new label
    val renamedEarlyTerms: Set[String] = turns
      .where(col("conv_id") === renamed && col("turn_idx") < 2)
      .select(explode(Tokenize.termsCol(col("text"))).as("t"))
      .collect().map(_.getString(0)).toSet
    for (sfx <- Seq("e", "rk", "_0")) {
      val got = ReverseIndex.membershipSuffix(spark, r, conf, sfx)
        .collect().map(_.getString(0)).toSet
      val want = bruteSuffix(sfx) - dead - renamed ++
        (if (renamedEarlyTerms.exists(_.endsWith(sfx))) Set("zzz999")
         else Set.empty[String])
      assert(got == want, s"suffix '$sfx'")
    }
  }
}

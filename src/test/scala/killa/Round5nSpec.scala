package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.store.AliasStore
import killa.synth.Synth

/** Round-5n layer: index aliases — atomic re-pointing of a stable serving
  * name between index roots (the ES _aliases flip over a reindex), with
  * snapshot-pinned readers giving the zero-downtime property.
  */
class Round5nSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)

  private lazy val turns = Synth.transcripts(spark, nConvs = 30, turnsPerConv = 5, seed = 41L)
    .toDF().persist()

  test("set / resolve / list / history / remove roundtrip") {
    val dir = TestSpark.freshDir("r5n-store")
    assert(AliasStore.resolve(spark, dir, "serve").isEmpty)
    assert(AliasStore.list(spark, dir).isEmpty)
    assert(AliasStore.set(spark, dir, "serve", "/roots/a") == 1)
    assert(AliasStore.set(spark, dir, "other", "/roots/x") == 1)
    assert(AliasStore.set(spark, dir, "serve", "/roots/b") == 2)
    assert(AliasStore.resolve(spark, dir, "serve").contains("/roots/b"))
    assert(AliasStore.list(spark, dir) == Seq("other", "serve"))
    assert(AliasStore.history(spark, dir, "serve") ==
      Seq((1, "/roots/a"), (2, "/roots/b")))
    assert(AliasStore.remove(spark, dir, "serve"))
    assert(AliasStore.resolve(spark, dir, "serve").isEmpty)
    assert(AliasStore.resolve(spark, dir, "other").contains("/roots/x"))
    intercept[IllegalArgumentException](
      AliasStore.set(spark, dir, "bad/name", "/roots/a"))
    intercept[IllegalArgumentException](
      AliasStore.reader(spark, dir, "gone", conf))
  }

  test("zero-downtime flip: open readers keep their snapshot, new ones move") {
    val dir = TestSpark.freshDir("r5n-flip")
    val partialRoot = TestSpark.freshDir("r5n-partial")
    val fullRoot = TestSpark.freshDir("r5n-full")
    new IndexWriter(spark, partialRoot, conf)
      .fullBuild(turns.where(col("turn_idx") < 2), "b-part")
    new IndexWriter(spark, fullRoot, conf).fullBuild(turns, "b-full")

    AliasStore.set(spark, dir, "serve", partialRoot)
    val before = AliasStore.reader(spark, dir, "serve", conf)
    val nBefore = before.membershipCount("the")

    // the flip — one atomic metadata write
    AliasStore.set(spark, dir, "serve", fullRoot)
    val after = AliasStore.reader(spark, dir, "serve", conf)

    // the old reader still serves the old target's snapshot…
    assert(before.membershipCount("the") == nBefore)
    // …the new reader serves the new corpus, which strictly grew
    assert(after.membershipCount("the") > nBefore)
    assert(after.manifest.get.numDocs == 30)
  }
}

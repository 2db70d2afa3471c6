package killa

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import killa.build.IndexWriter
import killa.maintain.ShardRouter
import killa.query.{IndexReader, ShardedSearch}
import killa.synth.Synth

/** Round-5m layer: the write side of sharding — deterministic doc routing
  * (ES `_routing`), sharded build, routed maintenance (update / delete /
  * rename incl. the cross-shard move), all pinned rank-identical to a
  * single index over the same final corpus.
  */
class Round5mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val conf = Conf(nBuckets = 8, rangeDocs = 16, waveBuckets = 3, blockSize = 16)
  private val NS = 3

  private lazy val turns = Synth.transcripts(spark, nConvs = 40, turnsPerConv = 5, seed = 37L)
    .toDF().persist()

  private def freshRoots(tag: String): Seq[String] =
    (0 until NS).map(i => TestSpark.freshDir(s"r5m-$tag-s$i"))

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def approxEq(a: Seq[(String, Double)], b: Seq[(String, Double)],
      tol: Double = 1e-9): Boolean =
    a.length == b.length && a.zip(b).forall { case ((c1, s1), (c2, s2)) =>
      c1 == c2 && math.abs(s1 - s2) <= tol * math.max(1.0, math.abs(s2))
    }

  private def singleIndex(df: org.apache.spark.sql.DataFrame, tag: String): IndexReader = {
    val r = TestSpark.freshDir(s"r5m-single-$tag")
    new IndexWriter(spark, r, conf).fullBuild(df, s"b-$tag")
    new IndexReader(spark, r, conf)
  }

  test("routing: column twin equals scalar; every doc has exactly one owner") {
    val got = turns.select(col("conv_id"),
      ShardRouter.shardCol(col("conv_id"), NS).as("s"))
      .distinct().collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.nonEmpty)
    got.foreach { case (c, s) =>
      assert(s == ShardRouter.shardOf(c, NS), c)
      assert(s >= 0 && s < NS)
    }
    // all three shards actually used on this corpus (hash spreads)
    assert(got.map(_._2).toSet == (0 until NS).toSet)
    // route() partitions: per-shard counts sum to the whole
    val parts = ShardRouter.route(turns, NS)
    assert(parts.map(_.count()).sum == turns.count())
  }

  test("sharded build + routed update batch ≡ single index on final corpus") {
    val roots = freshRoots("upd")
    ShardRouter.fullBuild(spark, roots, turns.where(col("turn_idx") < 3), conf)
    ShardRouter.applyChanges(spark, roots, turns, conf, "d1")
    val readers = roots.map(new IndexReader(spark, _, conf))
    val whole = singleIndex(turns, "upd")
    val want = hits(whole.bm25TopK(Seq("query", "scan"), 10))
    val got = hits(ShardedSearch.bm25TopK(spark, readers, Seq("query", "scan"), 10))
    assert(want.nonEmpty && approxEq(got, want))
  }

  test("routed delete ≡ single index over the surviving corpus") {
    val roots = freshRoots("del")
    ShardRouter.fullBuild(spark, roots, turns, conf)
    val victims = turns.select("conv_id").distinct()
      .where(expr("CAST(substring(conv_id, 5) AS INT) % 10 = 0"))
      .collect().map(_.getString(0)).toSeq
    assert(victims.nonEmpty)
    ShardRouter.remove(spark, roots, victims, conf, "rm1")
    val readers = roots.map(new IndexReader(spark, _, conf))
    val whole = singleIndex(turns.where(!col("conv_id").isin(victims: _*)), "del")
    assert(ShardedSearch.membershipCount(readers, "the") ==
      whole.membershipCount("the"))
    val want = hits(whole.bm25TopK(Seq("query", "filter"), 10, conjunctive = true))
    val got = hits(ShardedSearch.bm25TopK(spark, readers,
      Seq("query", "filter"), 10, conjunctive = true))
    assert(want.nonEmpty && approxEq(got, want))
  }

  test("rename: same-owner uses rename; cross-shard moves the doc") {
    val roots = freshRoots("ren")
    ShardRouter.fullBuild(spark, roots, turns, conf)
    val convs = turns.select("conv_id").distinct()
      .collect().map(_.getString(0)).sorted
    // pick one rename that keeps the owner and one that changes it
    def ownerOf(c: String) = ShardRouter.shardOf(c, NS)
    val same = convs.flatMap { c =>
      val t = s"${c}-same"
      if (ownerOf(t) == ownerOf(c)) Some((c, t)) else None
    }.head
    val cross = convs.reverse.flatMap { c =>
      val t = s"${c}-x"
      if (ownerOf(t) != ownerOf(c)) Some((c, t)) else None
    }.head
    ShardRouter.rename(spark, roots, same._1, same._2, None, conf, "r1")
    val crossContent = turns.where(col("conv_id") === cross._1)
      .withColumn("conv_id", lit(cross._2))
    ShardRouter.rename(spark, roots, cross._1, cross._2, Some(crossContent),
      conf, "r2")
    // cross-shard rename without content must refuse
    val crossTgt = Iterator.from(0).map(i => s"${cross._2}-y$i")
      .find(t => ownerOf(t) != ownerOf(cross._2)).get
    intercept[IllegalArgumentException](
      ShardRouter.rename(spark, roots, cross._2, crossTgt, None, conf, "r3"))

    val readers = roots.map(new IndexReader(spark, _, conf))
    val renamed = turns.withColumn("conv_id",
      when(col("conv_id") === same._1, lit(same._2))
        .when(col("conv_id") === cross._1, lit(cross._2))
        .otherwise(col("conv_id")))
    val whole = singleIndex(renamed, "ren")
    val gotSet = ShardedSearch.membership(readers, "the")
      .collect().map(_.getString(0)).toSet
    val wantSet = whole.membership("the").collect().map(_.getString(0)).toSet
    assert(gotSet == wantSet)
    assert(gotSet.contains(same._2) && gotSet.contains(cross._2))
    assert(!gotSet.contains(same._1) && !gotSet.contains(cross._1))
  }
}

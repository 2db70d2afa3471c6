package killa.maintain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import killa.Conf
import killa.build.IndexWriter
import killa.expr.Fnv1a64
import killa.util.Hashing

/** Document routing across shard roots — the write side of sharded search
  * (the Elasticsearch `_routing` rule: shard = hash(doc key) mod nShards).
  * [[killa.query.ShardedSearch]] makes shard placement invisible to reads;
  * this makes it invisible to writes: builds and every maintenance batch
  * route each document to its owning shard, so a doc's whole lifecycle —
  * add, update, partial term removal, delete — happens in exactly one
  * root, and per-shard snapshot isolation carries over unchanged.
  *
  * The hash is the engine's FNV-1a bucket rule ([[Hashing.termBucket]],
  * with the codegen column twin used for the distributed split), NOT
  * Spark's partitioning hash: routing must be a stable function of the doc
  * key alone, reproducible across engines, sessions and cluster shapes.
  *
  * Shape at scale: routing a batch is one codegen projection + nShards
  * column-pruned filters of the SAME cached frame — no shuffle (each
  * shard's maintainer re-partitions internally as it already does); shard
  * counts grow by adding roots and re-routing via
  * [[IndexMaintainer.reindexTo]] per shard (resharding is rebuild-shaped,
  * as in ES).
  */
object ShardRouter {

  /** Owning shard of one doc key. */
  def shardOf(convId: String, nShards: Int): Int =
    Hashing.termBucket(convId, nShards)

  /** Codegen column twin of [[shardOf]] (property-pinned equal in
    * Round5mSpec). */
  def shardCol(c: Column, nShards: Int): Column =
    Fnv1a64.termBucketCol(c, nShards)

  /** Split a batch by owning shard: `route(df, n)(i)` holds exactly shard
    * i's rows. Plain filters over one frame — Catalyst pushes them into
    * the scan; no shuffle here.
    */
  def route(batch: DataFrame, nShards: Int,
      convCol: String = "conv_id"): Seq[DataFrame] = {
    require(nShards >= 1, "at least one shard")
    val tagged = shardCol(org.apache.spark.sql.functions.col(convCol), nShards)
    (0 until nShards).map(i => batch.where(tagged === i))
  }

  /** Sharded full build: route `turns` and build each root from its slice.
    * An empty slice still builds (an empty-but-live shard is valid and
    * serves empty results until writes arrive).
    */
  def fullBuild(spark: SparkSession, roots: Seq[String], turns: DataFrame,
      conf: Conf, buildId: String = "shard-b0"): Unit = {
    val parts = route(turns.cache(), roots.length)
    roots.zip(parts).zipWithIndex.foreach { case ((root, part), i) =>
      new IndexWriter(spark, root, conf).fullBuild(part, s"$buildId-s$i")
      ()
    }
  }

  /** Apply one change batch (the [[IndexMaintainer.applyChanges]] contract:
    * upserts; absence elsewhere is NOT a delete) across the shard set —
    * each shard maintains only its own docs.
    */
  def applyChanges(spark: SparkSession, roots: Seq[String], batch: DataFrame,
      conf: Conf, batchId: String): Unit = {
    val parts = route(batch.cache(), roots.length)
    roots.zip(parts).zipWithIndex.foreach { case ((root, part), i) =>
      // the emptiness probe is one codegen-filtered limit(1) — cheap next
      // to the maintenance job it saves on shards the batch never touches
      if (!part.isEmpty)
        new IndexMaintainer(spark, root, conf)
          .applyChanges(part, batchId = s"$batchId-s$i")
    }
  }

  /** Delete docs across the shard set — each id routed to its owner. */
  def remove(spark: SparkSession, roots: Seq[String], convIds: Seq[String],
      conf: Conf, batchId: String): Unit = {
    val byShard = convIds.distinct.groupBy(shardOf(_, roots.length))
    byShard.foreach { case (i, ids) =>
      new IndexMaintainer(spark, roots(i), conf)
        .remove(ids, batchId = s"$batchId-s$i")
      ()
    }
  }

  /** Rename a doc key. Routing is keyed on the id, so a rename may MOVE the
    * doc between shards: same-owner renames use the shard's own rename
    * path; cross-shard renames re-add the content under the new key at the
    * new owner (from the caller's batch row) and delete at the old.
    */
  def rename(spark: SparkSession, roots: Seq[String], from: String,
      to: String, content: Option[DataFrame], conf: Conf,
      batchId: String): Unit = {
    val n = roots.length
    val (sFrom, sTo) = (shardOf(from, n), shardOf(to, n))
    if (sFrom == sTo) {
      new IndexMaintainer(spark, roots(sFrom), conf)
        .rename(from, to, batchId = s"$batchId-ren")
      ()
    } else {
      val turns = content.getOrElse(throw new IllegalArgumentException(
        s"cross-shard rename $from -> $to needs the doc's turns " +
          "(routing moves it to a different root)"))
      new IndexMaintainer(spark, roots(sTo), conf)
        .applyChanges(turns, batchId = s"$batchId-add")
      new IndexMaintainer(spark, roots(sFrom), conf)
        .remove(Seq(from), batchId = s"$batchId-del")
      ()
    }
  }
}

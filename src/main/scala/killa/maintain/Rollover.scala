package killa.maintain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import killa.Conf
import killa.build.IndexWriter
import killa.query.{IndexReader, ShardedSearch}
import killa.store.{AliasStore, SegmentStore}

/** Index rollover (the Elasticsearch ILM `rollover` action): an append-mode
  * ingestion surface that caps how large any single index root grows —
  * when the active root's live doc count reaches `maxDocsPerRoot`, the next
  * batch opens a fresh root and the group's `write` alias flips to it
  * atomically ([[AliasStore]]). Search spans the whole group through
  * [[ShardedSearch]]'s merged-statistics path, so scores are identical to a
  * single unrolled index at any roll count — the property the registered
  * `q_rollover_*` gates pin against the single-corpus oracle.
  *
  * Why this matters at 10^12 turns: an ever-growing single root makes every
  * maintenance rewrite, compaction pass, and manifest older; bounded roots
  * keep per-root operations O(maxDocsPerRoot), let old roots go fully cold
  * (immutable → infinitely cacheable, vacuum-final), and give retention a
  * unit to expire ("drop indices older than N days" = drop rolled roots).
  *
  * Contract: append-only — each batch carries NEW conversations (the
  * time-ordered ingestion shape rollover exists for). Updates/deletes to an
  * already-rolled conv must route to its root (IndexMaintainer on
  * `roots(...)` — the same routed-write story ShardRouter handles for
  * hash-sharded groups).
  */
object Rollover {
  private val WriteAlias = "write"
  private val RootFmt = "r%06d"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The group's numbered roots, oldest first. */
  def roots(spark: SparkSession, groupRoot: String): Seq[String] = {
    val f = fs(spark, groupRoot)
    val base = new Path(groupRoot)
    if (!f.exists(base)) return Nil
    // return caller-rooted paths (the listing qualifies with a scheme —
    // "file:/…" — which must not leak into alias targets or reader roots)
    f.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("r\\d{6}"))
      .map(s => s"${groupRoot.stripSuffix("/")}/${s.getPath.getName}")
      .sorted
  }

  /** The root the write alias points at (None before the first ingest). */
  def activeRoot(spark: SparkSession, groupRoot: String): Option[String] =
    AliasStore.resolve(spark, groupRoot, WriteAlias)

  /** Ingest one batch of NEW conversations. Rolls first when the active
    * root is at/over `maxDocsPerRoot` live docs (ES semantics: the
    * condition is evaluated against the CURRENT index, so a root may finish
    * somewhat past the cap — the cap bounds when it stops growing, it is
    * not a mid-batch splitter). Returns the root the batch landed in.
    */
  def ingest(spark: SparkSession, groupRoot: String, conf: Conf,
      batch: DataFrame, maxDocsPerRoot: Long, batchId: String,
      source: String = "default"): String = {
    require(maxDocsPerRoot >= 1, "maxDocsPerRoot must be >= 1")
    val existing = roots(spark, groupRoot)
    // an empty batch is a no-op (it must neither roll a full root nor open
    // an empty one); returns the current tail so callers can chain
    if (batch.isEmpty) return existing.lastOption.getOrElse(groupRoot)
    val active = existing.lastOption.filter { r =>
      SegmentStore.latest(spark, r).exists(_.numDocs < maxDocsPerRoot)
    }
    active match {
      case Some(r) =>
        new IndexMaintainer(spark, r, conf)
          .applyChanges(batch, source = source, batchId = batchId)
        r
      case None =>
        val next = s"$groupRoot/${RootFmt.format(existing.length)}"
        new IndexWriter(spark, next, conf).fullBuild(batch, batchId)
        AliasStore.set(spark, groupRoot, WriteAlias, next)
        next
    }
  }

  /** Snapshot-pinned readers over every root of the group (search side). */
  def readers(spark: SparkSession, groupRoot: String, conf: Conf): Seq[IndexReader] =
    roots(spark, groupRoot).map(new IndexReader(spark, _, conf))

  /** Group-wide BM25 under merged statistics — rank-identical to a single
    * unrolled index (docs never span roots under the append contract).
    */
  def bm25TopK(spark: SparkSession, groupRoot: String, conf: Conf,
      terms: Seq[String], k: Int, conjunctive: Boolean = false): DataFrame =
    ShardedSearch.bm25TopK(spark, readers(spark, groupRoot, conf), terms, k,
      conjunctive)

  /** Group-wide membership (statistics-free union). */
  def membership(spark: SparkSession, groupRoot: String, conf: Conf,
      term: String): DataFrame = {
    import spark.implicits._
    val rs = readers(spark, groupRoot, conf)
    if (rs.isEmpty) Seq.empty[String].toDF("conv_id")
    else ShardedSearch.membership(rs, term)
  }
}

package killa.session

import org.apache.spark.sql.{DataFrame, SparkSession}

import killa.Conf
import killa.build.Ledger
import killa.query.IndexReader
import killa.store.SegmentStore

/** The user-facing query surface with the reference's two-tier
  * read-your-writes semantics (SURVEY.md §1.3.5):
  *
  *  - [[search]] / [[topK]] — non-blocking, answer from the pinned snapshot;
  *    mid-build they may see a partial index, exactly like the reference's
  *    `Search` (FileAnalyzerTests.cs:289-317 asserts only a range);
  *  - [[delayedSearch]] / [[refresh]] — re-pin to the latest committed
  *    snapshot first, the analog of `DelayedSearch`'s queue quiescence
  *    (FileAnalyzer.cs:51-60): batch maintenance is synchronous, so "drain
  *    pending work, then read" collapses to "read the newest version".
  */
final class QuerySession(spark: SparkSession, root: String, conf: Conf = Conf.default) {
  @volatile private var readerV: IndexReader = new IndexReader(spark, root, conf)

  def reader: IndexReader = readerV

  /** Re-pin to the latest committed snapshot. */
  def refresh(): Unit = { readerV = new IndexReader(spark, root, conf) }

  /** Immediate search on the pinned snapshot (`q` verb, Program.cs:52-66). */
  def search(term: String): DataFrame = readerV.membership(term)

  /** Quiescent search (`qw` verb, Program.cs:53-66 → DelayedSearch). */
  def delayedSearch(term: String): DataFrame = { refresh(); search(term) }

  def topK(terms: Seq[String], k: Int, conjunctive: Boolean = false,
      mustNot: Seq[String] = Nil, minShouldMatch: Int = 1,
      boosts: Map[String, Double] = Map.empty): DataFrame =
    readerV.bm25TopK(terms, k, conjunctive, mustNot, minShouldMatch, boosts)

  def contains(term: String): Boolean = readerV.contains(term)

  /** Fuzzy search (`qf` verb): terms within edit distance ≤ maxDist. */
  def searchFuzzy(term: String, maxDist: Int = 1): DataFrame =
    readerV.membershipFuzzy(term, maxDist)

  /** OSA fuzzy (`qfo` verb — the ES `fuzziness` default: adjacent
    * transposition counts as one edit).
    */
  def searchFuzzyOsa(term: String, maxDist: Int = 1): DataFrame =
    readerV.membershipFuzzy(term, maxDist, transpositions = true)

  /** Lexicographic term range (`qrange` verb — ES keyword range, gte/lt). */
  def searchTermRange(lo: String, hi: String): DataFrame =
    readerV.membershipTermRange(lo, hi)

  /** Prefix search (`qp` verb — the reference's wildcard-index TODO). */
  def searchPrefix(prefix: String): DataFrame = readerV.membershipPrefix(prefix)

  /** Glob wildcard search (`*`/`?` over terms). */
  def searchWildcard(mask: String): DataFrame = readerV.membershipWildcard(mask)

  /** Phrase search over the positional index (`phrase` verb). */
  def phrase(terms: Seq[String]): DataFrame = readerV.phrase(terms)

  /** IsIndexing analog (FileAnalyzer.cs:49): any build with pending
    * segment buckets in the ledger.
    */
  def isIndexing: Boolean = QuerySession.pendingBuilds(spark, root, conf).nonEmpty
}

object QuerySession {
  /** Builds that have started (forward step done) but not finished all
    * segment buckets — the ledger-derived "queue not empty" state.
    */
  def pendingBuilds(spark: SparkSession, root: String, conf: Conf): Seq[String] = {
    val ledger = Ledger.read(spark, root)
    if (ledger.isEmpty) return Nil
    import org.apache.spark.sql.functions._
    val started = ledger.where(col("step") === "forward" && col("status") === "done")
      .select("buildId").distinct().collect().map(_.getString(0))
    started.filter { b =>
      Ledger.doneBuckets(spark, root, b, "segments").size < conf.nBuckets
    }.toSeq
  }

  /** Flush (StringIndex.cs:84-89 op 14): clear every entry — commit an empty
    * manifest version. Old snapshot files remain for pinned readers
    * (snapshot isolation); new readers see an empty index.
    */
  def flush(spark: SparkSession, root: String): Unit = {
    val base = SegmentStore.latest(spark, root)
    val empty = killa.store.Manifest(
      version = 0,
      nBuckets = base.map(_.nBuckets).getOrElse(Conf.default.nBuckets),
      buckets = Map.empty, docsDirs = Nil, forwardDirs = Nil,
      numDocs = 0L, totalTokens = 0L, avgdl = 0.0, maxDocId = -1L,
      batchSeq = base.map(_.batchSeq + 1).getOrElse(0L))
    SegmentStore.commit(spark, root, empty)
    ()
  }
}

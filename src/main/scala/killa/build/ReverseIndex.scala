package killa.build

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.maintain.IndexMaintainer
import killa.query.IndexReader
import killa.store.SegmentStore
import killa.tokenize.Tokenize

/** Reversed-term sub-index: the standard fulltext answer to suffix and
  * leading-wildcard queries (Lucene/Elasticsearch `reverse` token filter on
  * a sibling sub-field). A plain term dictionary prunes prefix queries to a
  * sorted range but can do nothing for `*ark` — every bucket must be
  * scanned. Indexing each token REVERSED turns a suffix into a prefix:
  * `*ark` over the main tree ≡ `kra*` over the reversed tree, which pushes
  * down as the same range scan [[IndexReader.membershipPrefix]] uses.
  *
  * The sub-index is a full index tree under `root/reversed` — the
  * [[FieldIndexes]] layout pattern — so every existing build, maintenance,
  * store, and read path works on it unchanged; only the token transform
  * differs. Reversal is a codegen column transform (no UDF) and token-set
  * cardinality is preserved (string reversal is a bijection), so the
  * reversed tree's size and build cost equal the main tree's.
  *
  * Glob masks reverse char-by-char: `*` and `?` are single glob atoms, so
  * reversing the mask string maps a mask over terms onto the identical mask
  * language over reversed terms ("m matches t" ⇔ "m.reverse matches
  * t.reverse" — pinned by spec property). A leading-wildcard mask thereby
  * GAINS a literal prefix on the reversed side and prunes, which is the
  * whole point.
  */
object ReverseIndex {

  def reverseRoot(root: String): String = s"$root/reversed"

  /** The turns frame with every token reversed — same schema, so the
    * builder/maintainer consume it verbatim. Pure codegen (transform +
    * reverse), no UDF.
    */
  def reversedTurns(turns: DataFrame): DataFrame = {
    val rev: Column = concat_ws(" ",
      transform(Tokenize.termsCol(col("text")), t => reverse(t)))
    turns.withColumn("text", rev)
  }

  /** Build the reversed sub-index (one filtered-transform pass, same
    * distributed shape as the main [[IndexWriter.fullBuild]]).
    */
  def build(spark: SparkSession, root: String, turns: DataFrame, conf: Conf,
      buildId: String = "b0"): Unit = {
    new IndexWriter(spark, reverseRoot(root), conf)
      .fullBuild(reversedTurns(turns), buildId)
    ()
  }

  def reader(spark: SparkSession, root: String, conf: Conf): IndexReader =
    new IndexReader(spark, reverseRoot(root), conf)

  /** Conversations containing a term that ENDS with `suffix` — a pruned
    * prefix range scan over the reversed dictionary.
    */
  def membershipSuffix(spark: SparkSession, root: String, conf: Conf,
      suffix: String): DataFrame =
    reader(spark, root, conf).membershipPrefix(
      if (suffix == null) null else suffix.reverse)

  /** Wildcard term search served from the reversed tree — the efficient
    * path for masks whose wildcards LEAD (`*ark`, `?indow`): the reversed
    * mask's literal prefix pushes down exactly like
    * [[IndexReader.membershipWildcard]]'s does for trailing wildcards.
    * Correct for any mask; only worth routing here when the original mask
    * has no usable literal prefix of its own.
    */
  def membershipWildcardReversed(spark: SparkSession, root: String, conf: Conf,
      mask: String): DataFrame =
    reader(spark, root, conf).membershipWildcard(
      if (mask == null) null else mask.reverse)

  /** Route one maintenance batch through the reversed tree: identical
    * change semantics (adds/updates/deletes/renames), tokens reversed on
    * the way in — the incremental path field sub-indexes got in r5, owed
    * here for the same reason (a stale suffix index after every delta batch
    * is a correctness bug a full-rebuild contract hides).
    */
  def applyChanges(spark: SparkSession, root: String, changedTurns: DataFrame,
      deletesDf: Option[DataFrame] = None,
      renames: Map[String, String] = Map.empty,
      batchId: String = "delta", conf: Conf = Conf.default): Unit = {
    val rr = reverseRoot(root)
    require(SegmentStore.latest(spark, rr).nonEmpty,
      s"no reversed index at $rr — run ReverseIndex.build first")
    new IndexMaintainer(spark, rr, conf)
      .applyChangesDf(reversedTurns(changedTurns), deletesDf, renames,
        batchId = batchId)
    ()
  }
}

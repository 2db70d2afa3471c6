package killa.build

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.maintain.IndexMaintainer
import killa.query.IndexReader
import killa.store.SegmentStore

/** Trigram dictionary sub-index: the Elasticsearch `wildcard` FIELD TYPE's
  * technique (an n-gram index over values plus a verification pass),
  * answering INFIX masks — `*art*`, `*a?c*` — which neither the sorted main
  * dictionary (prefix pushdown, [[killa.query.IndexReader.membershipWildcard]])
  * nor the [[ReverseIndex]] (suffix pushdown) can prune: a mask with
  * wildcards on BOTH ends has no literal prefix in either direction, so both
  * degrade to a full dictionary scan.
  *
  * The realisation reuses the engine on itself: the sub-index under
  * `root/grams` is an ordinary index whose DOCUMENTS are the main
  * dictionary's distinct terms and whose TOKENS are each term's character
  * trigrams (a codegen transform, no UDF). An infix query then becomes
  *   1. conjunctive trigram membership over the gram index — every trigram
  *      of every literal run ≥ 3 chars must appear in the term (the same
  *      necessary-condition pruning ES's wildcard field does),
  *   2. a residual full-mask regex verify on the ≤ cap surviving candidate
  *      terms (trigram conjunction is necessary, not sufficient: grams may
  *      match out of order),
  *   3. the main index's bucket-pruned [[IndexReader.membershipAny]] over
  *      the verified terms.
  * Every stage is bounded: gram postings are pruned scans, the candidate
  * collect is capped (over the cap the query falls back to the full-scan
  * wildcard path rather than ship an unbounded set through the driver), and
  * the final step reads only the candidates' buckets.
  *
  * Shape at scale: the gram corpus is the DICTIONARY (|terms| documents of
  * ~|term| tokens), orders of magnitude smaller than the posting corpus, and
  * it rides the identical range-salted build — trigram skew ("ing", "the")
  * is exactly term-hotness skew, already bounded at rangeDocs postings per
  * task. Maintenance is a dictionary diff: [[refresh]] compares the live
  * term set against the gram index's alive documents and applies adds /
  * deletes through the ordinary maintenance path, so an incrementally
  * updated main index keeps its infix surface exact (same owed-maintenance
  * contract the field and reversed sub-indexes carry).
  */
object GramIndex {

  /** Gram width. 3 is the ES wildcard-field choice: selective enough to
    * prune, short enough that any literal run ≥ 3 yields at least one gram.
    */
  val N = 3

  def gramRoot(root: String): String = s"$root/grams"

  /** Codegen trigram column: terms shorter than [[N]] index as themselves
    * (still findable; a run that short never prunes anyway).
    */
  def gramsCol(term: Column): Column =
    when(length(term) < N, array(term))
      .otherwise(transform(sequence(lit(1), length(term) - (N - 1)),
        i => term.substr(i, lit(N))))

  /** Dictionary terms as gram documents: doc key = the term itself, text =
    * its space-joined trigrams (trigrams never contain spaces — the main
    * tokenizer split them out — so the join round-trips exactly).
    */
  private def gramDocs(terms: DataFrame): DataFrame =
    terms.select(col("term").as("conv_id"),
      concat_ws(" ", gramsCol(col("term"))).as("text"))

  /** Live distinct terms of the main index — ONE column-pruned scan of the
    * posting blocks (term column only, no payloads).
    */
  private def dictTerms(spark: SparkSession, root: String, conf: Conf): DataFrame =
    new IndexReader(spark, root, conf).allBlocks.select(col("term")).distinct()

  /** Build the gram sub-index from the main index's current dictionary. */
  def build(spark: SparkSession, root: String, conf: Conf,
      buildId: String = "g0"): Unit = {
    new IndexWriter(spark, gramRoot(root), conf)
      .fullBuild(gramDocs(dictTerms(spark, root, conf)), buildId)
    ()
  }

  /** Literal runs of a glob mask (the maximal wildcard-free substrings). */
  def literalRuns(mask: String): Seq[String] =
    mask.split("[*?]").toSeq.filter(_.nonEmpty)

  /** Conversations containing a term matching the infix `mask` — trigram
    * pruning + residual verify + bucket-pruned main membership. Falls back
    * to the full-scan wildcard path when the mask yields no trigram (every
    * literal run < [[N]]) or the candidate set exceeds `candidateCap` (an
    * unselective mask like `*e*` is a scan either way; the cap keeps the
    * driver hop bounded by construction).
    */
  def membershipInfix(spark: SparkSession, root: String, conf: Conf,
      mask: String, candidateCap: Int = 4096): DataFrame = {
    val main = new IndexReader(spark, root, conf)
    if (mask == null || mask.isEmpty) return main.membershipWildcard(mask)
    val grams = literalRuns(mask).filter(_.length >= N)
      .flatMap(_.sliding(N)).distinct
    if (grams.isEmpty) return main.membershipWildcard(mask)
    val gr = new IndexReader(spark, gramRoot(root), conf)
    require(gr.manifest.nonEmpty,
      s"no gram index at ${gramRoot(root)} — run GramIndex.build first")
    val cand = grams.map(gr.membership).reduce(_ intersect _)
      .where(col("conv_id").rlike(killa.util.Glob.toRegex(mask)))
      .limit(candidateCap + 1)
      .collect().map(_.getString(0)).toSeq
    if (cand.length > candidateCap) main.membershipWildcard(mask)
    else main.membershipAny(cand)
  }

  /** Bring the gram index up to the main index's CURRENT dictionary after
    * main-index maintenance: adds = live terms the gram index lacks,
    * deletes = gram documents whose term died (its last posting removed).
    * Two column-pruned set differences + one ordinary maintenance batch —
    * no rebuild, cost proportional to the dictionary churn.
    */
  def refresh(spark: SparkSession, root: String, conf: Conf,
      batchId: String = "gdelta"): Unit = {
    val gr = gramRoot(root)
    require(SegmentStore.latest(spark, gr).nonEmpty,
      s"no gram index at $gr — run GramIndex.build first")
    val current = dictTerms(spark, root, conf)
    val indexed = new IndexReader(spark, gr, conf).docs
      .select(col("convId").as("term"))
    val added = current.except(indexed)
    val removed = indexed.except(current).select(col("term").as("conv_id"))
    new IndexMaintainer(spark, gr, conf)
      .applyChangesDf(gramDocs(added), Some(removed), batchId = batchId)
    ()
  }
}

package killa.build

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.query.IndexReader
import killa.store.Manifest

/** Nested (same-turn) search: the Elasticsearch/Lucene `nested` query,
  * realised the way Lucene itself does it — child documents indexed
  * alongside their parent key. The main index's document is the whole
  * conversation, so a conjunctive query matches terms spread across
  * DIFFERENT turns; a nested query requires them to co-occur inside ONE
  * turn. Here the child index's doc key is `conv_id#turn_idx`, every query
  * runs against the turn corpus (turn-level df / dl / N / avgdl — exactly
  * ES's nested scoring, where inner hits score against the nested docs),
  * and parents aggregate child scores under the ES `score_mode`.
  *
  * Shape at scale: the child index is just an index whose docs are turns —
  * same range-salted build, same pruned reads, same maintenance paths
  * (batches keyed by `conv_id#turn_idx` flow through IndexMaintainer
  * unchanged). Parent mapping is a string prefix, so rollup is one
  * map-side-combinable groupBy; no joins beyond the scored set itself.
  */
object NestedIndex {

  /** Separator between parent key and child ordinal in the child doc key.
    * '#' cannot appear in tokenized terms or the driver's conv ids. */
  val Sep = "#"

  /** Re-key a turns frame so each turn becomes its own document. */
  def turnDocs(turns: DataFrame): DataFrame =
    turns.withColumn("conv_id",
      concat(col("conv_id"), lit(Sep), col("turn_idx").cast("string")))

  /** Parent key of a child doc id (everything before the first [[Sep]]). */
  def parent(c: Column): Column = substring_index(c, Sep, 1)

  /** Child ordinal (turn index) of a child doc id. */
  def childIdx(c: Column): Column =
    substring_index(c, Sep, -1).cast("int")

  /** Build the child index at `root` from the turns frame. */
  def build(spark: SparkSession, root: String, turns: DataFrame,
      conf: Conf, buildId: String = "nested-b0"): Option[Manifest] =
    new IndexWriter(spark, root, conf).fullBuild(turnDocs(turns), buildId)

  /** Parents with at least one SINGLE turn containing ALL `terms` — the
    * nested bool/must membership. Contrast: the main index's conjunctive
    * membership accepts terms spread across turns.
    *
    * Shape at scale: one pruned membership scan per term, intersected on
    * the child key (shuffle carries child ids only), one dedup to parents.
    */
  def sameTurnMembership(reader: IndexReader, terms: Seq[String]): DataFrame = {
    val ts = terms.filter(t => t != null && t.nonEmpty).distinct
    require(ts.nonEmpty, "at least one term")
    ts.map(reader.membership).reduce(_ intersect _)
      .select(parent(col("conv_id")).as("conv_id")).distinct()
  }

  /** Top-k parents by aggregated child BM25 score (the nested query with
    * `score_mode`): each matching turn scores against the TURN corpus's
    * statistics, then parents fold their matching turns' scores by
    * `scoreMode` ∈ max / sum / avg / min. Conjunctive = all terms in the
    * same turn (the usual nested bool/must); disjunctive = any.
    *
    * @return (conv_id, score) — exact scores, (score desc, conv_id asc)
    *         order, ≤ k rows.
    */
  def nestedTopK(reader: IndexReader, terms: Seq[String], k: Int,
      scoreMode: String = "max", conjunctive: Boolean = true): DataFrame = {
    val fold = scoreMode match {
      case "max" => max(col("score"))
      case "sum" => sum(col("score"))
      case "avg" => avg(col("score"))
      case "min" => min(col("score"))
      case other => throw new IllegalArgumentException(
        s"score_mode must be max|sum|avg|min, got '$other'")
    }
    reader.bm25ScoredAll(terms, conjunctive = conjunctive)
      .groupBy(parent(col("conv_id")).as("conv_id"))
      .agg(fold.as("score"))
      .orderBy(col("score").desc, col("conv_id").asc)
      .limit(k)
  }

  /** Child keys (conv_id, turn_idx) of the turns matching the nested query
    * — conjunctive: every term inside the one turn; disjunctive: any.
    * Pure pruned membership algebra on the child index.
    */
  def matchingChildren(reader: IndexReader, terms: Seq[String],
      conjunctive: Boolean = true): DataFrame = {
    val ts = terms.filter(t => t != null && t.nonEmpty).distinct
    require(ts.nonEmpty, "at least one term")
    val sets = ts.map(reader.membership)
    val folded =
      if (conjunctive) sets.reduce(_ intersect _)
      else sets.reduce(_ union _).distinct()
    folded.select(parent(col("conv_id")).as("conv_id"),
      childIdx(col("conv_id")).as("turn_idx"))
  }

  /** Parents with at least `minChildren` turns matching the nested query
    * (the Elasticsearch `has_child` query with its `min_children`
    * constraint): the parent qualifies on the NUMBER of matching children,
    * not just existence — "conversations where the assistant used the tool
    * in ≥ 2 separate turns" is this query. `min_children = 1` degrades to
    * plain has_child (= [[sameTurnMembership]] for conjunctive terms, but
    * carrying the count).
    *
    * Shape at scale: [[matchingChildren]]'s pruned scans → one map-side-
    * combinable count keyed by the parent prefix → a post-agg filter.
    *
    * @return (conv_id, n_children) rows, parents meeting the floor only.
    */
  def hasChild(reader: IndexReader, terms: Seq[String], minChildren: Int = 1,
      conjunctive: Boolean = true): DataFrame = {
    require(minChildren >= 1, "minChildren must be >= 1")
    matchingChildren(reader, terms, conjunctive)
      .groupBy("conv_id").agg(count(lit(1)).as("n_children"))
      .where(col("n_children") >= minChildren)
  }

  /** Child documents whose PARENT matches — the Elasticsearch `has_parent`
    * query: every turn of each conversation the parent-level (conv-corpus)
    * query admits. The parent query runs on the MAIN index (conv docs,
    * conv statistics); the children come from the child index's alive
    * dictionary — so a turn deleted from the child index drops out even
    * while its parent still matches.
    *
    * Shape at scale: parent membership is the usual pruned-scan intersect;
    * the child side is ONE column-pruned dictionary scan (no posting
    * payloads); one equi-join on the parent key.
    *
    * @return (conv_id, turn_idx) rows — the admitted child keys.
    */
  def hasParent(parentReader: IndexReader, childReader: IndexReader,
      terms: Seq[String]): DataFrame = {
    val ts = terms.filter(t => t != null && t.nonEmpty).distinct
    require(ts.nonEmpty, "at least one term")
    val parents = ts.map(parentReader.membership).reduce(_ intersect _)
    childReader.allMembers
      .select(parent(col("conv_id")).as("conv_id"),
        childIdx(col("conv_id")).as("turn_idx"))
      .join(parents, "conv_id")
  }

  /** Nested terms aggregation (the ES `nested` aggregation): doc counts of
    * a CHILD-level doc value over the turns matching the nested query —
    * e.g. "of the turns containing both terms, how many are user vs
    * assistant". The conv-level facet machinery can't express this: it
    * counts conversations, this counts turns.
    *
    * Shape at scale: pruned membership scans → one equi-join to the turn
    * meta frame on the composite child key → one combinable count agg.
    *
    * @param meta turn-level doc values: (conv_id, turn_idx, `valCol`).
    * @return (`valCol`, n_children), count desc then value asc.
    */
  def childTermsAgg(reader: IndexReader, terms: Seq[String], meta: DataFrame,
      valCol: String, conjunctive: Boolean = true): DataFrame =
    matchingChildren(reader, terms, conjunctive)
      .join(meta.select(col("conv_id"), col("turn_idx").cast("int"),
        col(valCol)), Seq("conv_id", "turn_idx"))
      .groupBy(col(valCol))
      .agg(count(lit(1)).as("n_children"))
      .orderBy(col("n_children").desc, col(valCol).asc)

  /** Reverse-nested aggregation (the ES `reverse_nested` agg): bucket
    * PARENT-level doc values over the parents of the matching children —
    * the inverse direction of [[childTermsAgg]] ("of the conversations with
    * a turn matching the nested query, how many per first-turn tool").
    * A parent counts once however many of its turns match (the dedup to
    * parents is the reverse_nested step itself).
    *
    * Shape at scale: pruned child scans → parent-prefix dedup → one
    * equi-join to the parent doc-values frame → combinable count.
    *
    * @param parentMeta parent-level doc values: (convCol, valCol).
    * @return (`valCol`, n_parents), count desc then value asc.
    */
  def reverseNestedAgg(childReader: IndexReader, terms: Seq[String],
      parentMeta: DataFrame, convCol: String, valCol: String,
      conjunctive: Boolean = true): DataFrame =
    matchingChildren(childReader, terms, conjunctive)
      .select("conv_id").distinct()
      .join(parentMeta.select(col(convCol).as("conv_id"),
        col(valCol).cast("string").as("value")), "conv_id")
      .where(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("n_parents"))
      .orderBy(col("n_parents").desc, col("value").asc)

  /** Inner hits: for each of the top-`k` parents (under `scoreMode`), the
    * matching turns themselves — (conv_id, turn_idx, score), at most
    * `kChildren` per parent, best turn first (the ES `inner_hits` block).
    *
    * Shape at scale: the child scored set is computed once; the top-parent
    * cut is a semi-join against the ≤ k parent rows; the per-parent cut is
    * one window over parents (bounded groups — a conv has few turns).
    */
  def innerHits(reader: IndexReader, terms: Seq[String], k: Int,
      kChildren: Int, scoreMode: String = "max",
      conjunctive: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = reader.bm25ScoredAll(terms, conjunctive = conjunctive)
      .select(parent(col("conv_id")).as("conv_id"),
        childIdx(col("conv_id")).as("turn_idx"), col("score"))
    val top = nestedTopK(reader, terms, k, scoreMode, conjunctive)
      .select(col("conv_id"))
    val w = Window.partitionBy("conv_id")
      .orderBy(col("score").desc, col("turn_idx").asc)
    scored.join(broadcast(top), "conv_id")
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= kChildren).drop("__r")
  }
}

package killa.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.query.IndexReader

/** Field-scoped indexes: one sub-index per value of a categorical column
  * (role, tool, …) of the transcripts table — the Lucene per-field postings
  * analog, giving field-restricted membership/BM25 ("conversations where the
  * ASSISTANT said X") and cheap facet counting.
  *
  * Design: each field value gets its own full index tree under
  * `root/field_<field>=<value>`, built from the field-filtered turns. That
  * buys each field corpus its OWN BM25 statistics (numDocs, avgdl of the
  * restricted corpus — what field-scoped ranking should use) and keeps every
  * existing query/maintenance path working unchanged per field. The
  * alternative single-tree layout (field-prefixed terms, Lucene-style
  * `field:term` keys) halves build passes but shares corpus stats; at
  * 10^12-turn scale the per-value build is still one filtered scan per value
  * over a COLUMN-PRUNED source read, and field cardinality is small and
  * bounded by contract (roles/tools are enumerations, not open domains).
  *
  * The reference has no fields (its docs are flat token sets —
  * FileAnalyzer.cs:69-78); this is part of the engine's capability layer,
  * like BM25 itself.
  */
object FieldIndexes {

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9._-]", "_")

  def valueRoot(root: String, field: String, value: String): String =
    s"$root/field_${sanitize(field)}=${sanitize(value)}"

  /** Distinct values of the field column — collect is bounded by contract
    * (categorical fields only; guarded so an accidental open-domain column
    * fails loudly instead of building a million sub-indexes).
    */
  def fieldValues(turns: DataFrame, field: String, maxValues: Int = 64): Seq[String] = {
    val vs = turns.select(col(field).cast("string")).where(col(field).isNotNull)
      .distinct().limit(maxValues + 1).collect().map(_.getString(0)).sorted.toSeq
    require(vs.lengthCompare(maxValues) <= 0,
      s"field '$field' has more than $maxValues distinct values — not a categorical field")
    vs
  }

  /** Build one sub-index per field value; returns the values built. */
  def build(spark: SparkSession, root: String, turns: DataFrame, field: String,
      conf: Conf, buildId: String = "b0", maxValues: Int = 64): Seq[String] = {
    val vs = fieldValues(turns, field, maxValues)
    vs.foreach { v =>
      new IndexWriter(spark, valueRoot(root, field, v), conf)
        .fullBuild(turns.where(col(field) === v), buildId)
    }
    vs
  }

  def reader(spark: SparkSession, root: String, field: String, value: String,
      conf: Conf): IndexReader =
    new IndexReader(spark, valueRoot(root, field, value), conf)

  /** Multi-field boosted BM25 (the Elasticsearch `multi_match` with
    * per-field boosts): combined score = Σ over fields of
    * boost(field) · bm25_field(doc), where bm25_field uses the field
    * corpus's OWN statistics (its N, avgdl, per-field df — what field-aware
    * ranking means), and a document qualifies when it matches in ANY boosted
    * field. Exact by construction: each sub-index contributes its FULL
    * scored match set ([[killa.query.IndexReader.bm25ScoredAll]] — no
    * per-field top-k window to truncate a cross-field winner), the weighted
    * union folds in one map-side-combinable groupBy, and only the final
    * global top-k materializes. Shape at scale: per-field pruned block
    * scans → one shuffle over scored candidates → TakeOrdered(k).
    *
    * @param boosts field value → multiplier; values absent from the built
    *               index contribute nothing (their reader sees no manifest).
    * @return (conv_id, score) top-k, score desc then conv_id asc.
    */
  def multiFieldBm25(spark: SparkSession, root: String, field: String,
      boosts: Map[String, Double], terms: Seq[String], k: Int, conf: Conf,
      conjunctive: Boolean = false): DataFrame = {
    val perField = boosts.toSeq.sortBy(_._1).map { case (v, w) =>
      reader(spark, root, field, v, conf)
        .bm25ScoredAll(terms, conjunctive)
        .select(col("conv_id"), (col("score") * w).as("score"))
    }
    perField.reduce(_ union _)
      .groupBy("conv_id").agg(sum(col("score")).as("score"))
      .orderBy(col("score").desc, col("conv_id").asc)
      .limit(k)
  }

  /** Facet: per-field-value count of documents containing `term`, via each
    * sub-index's block-metadata count (no posting decode, no label join —
    * the membershipCount fast path per value). Values with zero hits drop,
    * mirroring a GROUP BY facet.
    */
  def facetCounts(spark: SparkSession, root: String, field: String,
      values: Seq[String], term: String, conf: Conf): DataFrame = {
    import spark.implicits._
    values.sorted
      .map(v => v -> reader(spark, root, field, v, conf).membershipCount(term))
      .filter(_._2 > 0L)
      .toDF(field, "n_docs")
  }
}

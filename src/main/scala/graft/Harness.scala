package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import killa.Conf
import killa.build.IndexWriter
import killa.query.IndexReader

/** Glue between the driver contract (SparkEntry/Verify/Bench) and the killa
  * engine. The fulltext corpus for oracle-checked queries is a transcripts
  * table (BASELINE.json input_hint shape) derived *deterministically* from
  * the driver's `documents` parquet — every 5 documents form one 5-turn
  * conversation — so each registered query has a DuckDB-expressible oracle
  * over the same inputs (FIXTURES.md §4).
  */
object Harness {
  val conf: Conf = Conf(nBuckets = 8, rangeDocs = 32, waveBuckets = 8, blockSize = 64)

  /** DuckDB CTE mirror of [[transcripts]] — prepended to every fulltext
    * oracle query. Must stay semantically identical to the Spark derivation.
    */
  val TurnsCte: String =
    "WITH turns AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CAST(doc_id % 5 AS INT) AS turn_idx, text FROM documents)"

  /** Token + tf + dl + corpus-stats CTEs shared by the fulltext oracles
    * (reference tokenization semantics: split on single space, drop empties —
    * WhitespaceTokenizer.cs:8-10).
    */
  val TfCtes: String =
    ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM turns)" +
      ", tok2 AS (SELECT conv_id, term FROM toks WHERE term <> '')" +
      ", tf AS (SELECT conv_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2)" +
      ", dl AS (SELECT conv_id, sum(tf) AS dl FROM tf GROUP BY 1)" +
      ", stats AS (SELECT (SELECT count(DISTINCT conv_id) FROM turns) AS n, " +
      "(SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT count(DISTINCT conv_id) FROM turns) AS avgdl)"

  /** Transcripts CTE restricted to assistant turns (doc_id % 2 = 1 under the
    * deterministic role derivation below) — the field-index oracles' corpus:
    * a per-field index computes BM25 stats over ITS corpus, so the oracle's
    * tf/dl/N/avgdl must all derive from the filtered turns.
    */
  val TurnsAssistantCte: String =
    "WITH turns AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CAST(doc_id % 5 AS INT) AS turn_idx, text FROM documents WHERE doc_id % 2 = 1)"

  /** Turn-granularity corpus CTE — every turn its own document, keyed
    * `conv_id#turn_idx` (the NestedIndex child-doc key). All downstream
    * tf/dl/stats CTEs then compute turn-level statistics, mirroring the
    * child index exactly.
    */
  val TurnsNestedCte: String =
    "WITH turns AS (SELECT printf('c%05d#%d', doc_id // 5, doc_id % 5) AS conv_id, " +
      "CAST(doc_id % 5 AS INT) AS turn_idx, text FROM documents)"

  /** Nested same-turn membership oracle: parents with one turn containing
    * ALL terms — the SQL mirror of NestedIndex.sameTurnMembership.
    */
  def nestedSameTurnOracleSql(terms: Seq[String]): String =
    TurnsNestedCte + TfCtes +
      terms.zipWithIndex.map { case (t, i) =>
        s", h$i AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$t')"
      }.mkString +
      ", hit AS (" +
      terms.indices.map(i => s"SELECT conv_id FROM h$i").mkString(" INTERSECT ") +
      ") SELECT DISTINCT split_part(conv_id, '#', 1) AS conv_id FROM hit" +
      " ORDER BY conv_id"

  /** Nested top-k oracle: turn-level BM25 (turn corpus statistics), parents
    * folding matching turns' scores by `scoreMode` — the SQL mirror of
    * NestedIndex.nestedTopK.
    */
  def nestedTopKOracleSql(terms: Seq[String], k: Int, scoreMode: String,
      conjunctive: Boolean): String = {
    val fold = scoreMode match {
      case "max" => "max(s)"; case "sum" => "sum(s)"
      case "avg" => "avg(s)"; case "min" => "min(s)"
    }
    val vals = terms.map(t => s"('$t')").mkString(", ")
    TurnsNestedCte + TfCtes +
      s", q(term) AS (VALUES $vals)" +
      ", qdf AS (SELECT q.term, count(tf.conv_id) AS df FROM q" +
      " LEFT JOIN tf ON tf.term = q.term GROUP BY 1)" +
      ", contrib AS (SELECT tf.conv_id, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s, count(*) AS nt FROM contrib GROUP BY 1)" +
      s", kept AS (SELECT * FROM scored${if (conjunctive) s" WHERE nt = ${terms.distinct.length}" else ""})" +
      s", par AS (SELECT split_part(conv_id, '#', 1) AS conv_id, $fold AS s FROM kept GROUP BY 1)" +
      s", top AS (SELECT conv_id, s FROM par ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** BM25 oracle SQL over the shared CTEs for a fixed term list. Mirrors
    * killa.query.Bm25 exactly (same formula shape, same constants).
    *
    * @param offset skip the first `offset` rows of the exact total order —
    *               the oracle for cursor pagination (bm25TopKAfter): page
    *               n+1 ≡ OFFSET n·k of the same (s desc, conv_id asc) order.
    * @param turnsCte corpus CTE — [[TurnsCte]] (default) or a filtered
    *               variant such as [[TurnsAssistantCte]] for field indexes.
    * @param filterT0 doc-values filter (bm25TopKFiltered's oracle): keep only
    *               convs whose min ts — = min doc_id seconds under the
    *               deterministic derivation — lies in [lo, hi]. Scoring
    *               stats stay GLOBAL (ES filter-context semantics); the
    *               filter applies before top-k selection.
    * @param minMatch disjunctive minimum_should_match: keep only convs
    *               matching at least this many query terms (one contrib row
    *               per matched term ⇒ a HAVING count, the relational mirror
    *               of the kernel's admission count).
    * @param extraCtes additional CTE text appended after the shared CTEs
    *               (e.g. the positional ppos family for a phrase filter).
    * @param filterConvSql arbitrary doc-values filter: a SELECT yielding the
    *               admissible conv_ids (the SQL mirror of any
    *               bm25TopKFiltered filter frame). Composes with filterT0.
    * @param boosts per-term boosts: each contrib multiplies by the term's
    *               boost in the SAME left-associative position the engine
    *               folds it ((idf·2.2)·boost)·tf/denom — bit-identical
    *               doubles. Empty map leaves the SQL byte-identical to the
    *               unboosted form.
    */
  def bm25OracleSql(terms: Seq[String], k: Int, conjunctive: Boolean,
      mustNot: Seq[String] = Nil, offset: Int = 0,
      turnsCte: String = TurnsCte,
      filterT0: Option[(Long, Long)] = None,
      minMatch: Int = 1,
      extraCtes: String = "",
      filterConvSql: Option[String] = None,
      boosts: Map[String, Double] = Map.empty,
      minScore: Option[Double] = None): String = {
    val hasBoost = boosts.nonEmpty
    val vals = terms.zipWithIndex.map { case (t, i) =>
      if (hasBoost) s"('$t', $i, CAST(${boosts.getOrElse(t, 1.0)} AS DOUBLE))"
      else s"('$t', $i)"
    }.mkString(", ")
    val having =
      if (conjunctive) s" HAVING count(*) = ${terms.length}"
      else if (minMatch > 1) s" HAVING count(*) >= $minMatch"
      else ""
    val preds = Seq(
      // boolean NOT: drop every conv holding any excluded term BEFORE top-k
      if (mustNot.isEmpty) None else Some(mustNot.map(t => s"'$t'").mkString(
        "conv_id NOT IN (SELECT DISTINCT conv_id FROM tf WHERE term IN (", ", ", "))")),
      filterT0.map { case (fLo, fHi) =>
        s"conv_id IN (SELECT conv_id FROM convt0f WHERE t0 BETWEEN $fLo AND $fHi)" },
      filterConvSql.map(sql => s"conv_id IN ($sql)")
    ).flatten
    val whereCl = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
    val filterCte = if (filterT0.isEmpty) "" else
      ", convt0f AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, min(doc_id) AS t0 FROM documents GROUP BY 1)"
    val off = if (offset > 0) s" OFFSET $offset" else ""
    turnsCte + TfCtes + extraCtes + filterCte +
      s", q(term, tidx${if (hasBoost) ", boost" else ""}) AS (VALUES $vals)" +
      s", qdf AS (SELECT q.term, q.tidx${if (hasBoost) ", q.boost" else ""}, " +
      s"count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2${if (hasBoost) ", 3" else ""})" +
      ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * " +
      s"${if (hasBoost) "qdf.boost * " else ""}tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      s", scored AS (SELECT conv_id, sum(c) AS s FROM contrib$whereCl GROUP BY conv_id$having)" +
      // min_score drops sub-floor docs BEFORE the top-k cut (the unrounded
      // score compares against the floor, exactly like the kernel's seeded
      // WAND threshold), so the page may hold fewer than k rows
      minScore.map(f => s", scored2 AS (SELECT * FROM scored WHERE s >= $f)")
        .getOrElse("") +
      s", top AS (SELECT conv_id, s FROM ${if (minScore.isDefined) "scored2" else "scored"}" +
      s" ORDER BY s DESC, conv_id ASC LIMIT $k$off)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** More-like-this oracle: the SQL recomputation of
    * IndexReader.moreLikeThis — term selection is integer-keyed
    * (tf desc, df asc, term asc; stopword guard df·2 ≤ N) so both engines
    * pick the identical term set, then standard BM25 excluding the source.
    */
  def mltOracleSql(convId: String, maxTerms: Int, k: Int, maxDfPct: Int = 50): String =
    TurnsCte + TfCtes +
      s", src AS (SELECT term, tf FROM tf WHERE conv_id = '$convId')" +
      ", qdf0 AS (SELECT s.term, s.tf, count(*) AS df FROM src s JOIN tf ON tf.term = s.term GROUP BY 1, 2)" +
      s", q AS (SELECT term, df FROM qdf0 WHERE df * 100 <= (SELECT n FROM stats) * $maxDfPct ORDER BY tf DESC, df ASC, term ASC LIMIT $maxTerms)" +
      ", contrib AS (SELECT tf.conv_id, " +
      "ln(1.0 + ((SELECT n FROM stats) - q.df + 0.5) / (q.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN q ON tf.term = q.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      s", scored AS (SELECT conv_id, sum(c) AS s FROM contrib WHERE conv_id <> '$convId' GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** Spell-suggest oracle: dictionary terms within levenshtein ≤ maxDist of
    * the probe (probe itself excluded), ranked df desc then term asc — the
    * SQL recomputation of IndexReader.suggest.
    */
  def suggestOracleSql(term: String, maxDist: Int, n: Int,
      boostPrefixLen: Int = 0): String = {
    val order =
      if (boostPrefixLen <= 0) "df DESC, term ASC"
      else s"(substr(term, 1, $boostPrefixLen) = '${term.take(boostPrefixLen)}') DESC, " +
        "df DESC, term ASC"
    TurnsCte + TfCtes +
      ", dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)" +
      s" SELECT term, df FROM dfs WHERE abs(length(term) - ${term.length}) <= $maxDist" +
      s" AND levenshtein(term, '$term') <= $maxDist AND term <> '$term'" +
      s" ORDER BY $order LIMIT $n"
  }

  /** Window-rescore oracle (recency decay): top-`window` of the exact BM25
    * order, each hit's score multiplied by the rational decay
    * halfLife/(halfLife + ageSecs) where age = corpus max ts − conv min ts
    * (= doc_id seconds under the deterministic ts derivation — rational
    * arithmetic only, so both engines compute bit-identical factors; exp()
    * is deliberately avoided: IEEE does not pin its rounding).
    */
  def rescoreOracleSql(terms: Seq[String], k: Int, window: Int,
      halfLifeSecs: Long): String = {
    val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    TurnsCte + TfCtes +
      s", q(term, tidx) AS (VALUES $vals)" +
      ", qdf AS (SELECT q.term, q.tidx, count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
      ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      s", win AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $window)" +
      ", convt0 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, min(doc_id) AS t0 FROM documents GROUP BY 1)" +
      ", anchor AS (SELECT max(doc_id) AS tmax FROM documents)" +
      s", resc AS (SELECT w.conv_id, w.s * (CAST($halfLifeSecs AS DOUBLE) / ($halfLifeSecs + (SELECT tmax FROM anchor) - c.t0)) AS s " +
      "FROM win w JOIN convt0 c ON w.conv_id = c.conv_id)" +
      s", top AS (SELECT conv_id, s FROM resc ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** Range-facet oracle: docs matching the term, bucketed by which
    * [from, to) interval of `bounds` the conv's min doc_id (= its min-ts
    * seconds offset) falls in — ES range-agg labeling ("from-to", "*" at
    * the open ends), empty buckets omitted.
    */
  def rangeFacetOracleSql(term: String, bounds: Seq[Double]): String = {
    def lbl(d: Double) =
      if (d == math.rint(d)) d.toLong.toString else d.toString
    val edges: Seq[Option[Double]] = (None +: bounds.map(Option(_))) :+ None
    val cases = edges.sliding(2).map {
      case Seq(lo, hi) =>
        val name = s"${lo.fold("*")(lbl)}-${hi.fold("*")(lbl)}"
        val conds = lo.map(l => s"t0 >= $l").toSeq ++ hi.map(h => s"t0 < $h")
        s"WHEN ${conds.mkString(" AND ")} THEN '$name'"
    }.mkString(" ")
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", convt0 AS (SELECT conv_id, CAST(min(doc_id) AS DOUBLE) AS t0 FROM t2 GROUP BY 1)" +
      s" SELECT CASE $cases END AS bucket, CAST(count(*) AS BIGINT) AS hits" +
      " FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id GROUP BY 1 ORDER BY 1"
  }

  /** Significant-terms oracle: the SQL recomputation of
    * IndexReader.significantTerms — fg df = distinct convs per term inside
    * the query term's match set, bg df = global df, JLH score
    * (fr − br)·(fr/br) over docs-rate doubles with the exact same operation
    * order as the Spark expression (IEEE −,/,× are rounding-pinned, so both
    * engines compute bit-identical scores). Selection on raw score
    * (desc, term asc) like every BM25 surface; display rounds to 4dp.
    */
  def significantTermsOracleSql(term: String, n: Int): String =
    TurnsCte + TfCtes +
      s", fg AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", fgn AS (SELECT CAST(count(*) AS DOUBLE) AS fn FROM fg)" +
      ", fgdf AS (SELECT tf.term, count(*) AS fg_df FROM tf JOIN fg ON tf.conv_id = fg.conv_id GROUP BY 1)" +
      ", bgdf AS (SELECT term, count(*) AS bg_df FROM tf GROUP BY 1)" +
      ", r AS (SELECT f.term, f.fg_df, b.bg_df," +
      " CAST(f.fg_df AS DOUBLE) / (SELECT fn FROM fgn) AS fr," +
      " CAST(b.bg_df AS DOUBLE) / CAST((SELECT n FROM stats) AS DOUBLE) AS br" +
      s" FROM fgdf f JOIN bgdf b ON f.term = b.term WHERE f.term <> '$term')" +
      ", s AS (SELECT term, fg_df, bg_df, (fr - br) * (fr / br) AS sc FROM r WHERE fr > br)" +
      s", top AS (SELECT * FROM s ORDER BY sc DESC, term ASC LIMIT $n)" +
      " SELECT term, fg_df, bg_df, round(sc, 4) AS score FROM top" +
      " ORDER BY score DESC, term ASC"

  /** Sort-by-doc-value search oracle: the match set ordered by conv min
    * doc_id (= its min-ts seconds offset under the deterministic ts
    * derivation), ties on conv_id — the SQL mirror of
    * IndexReader.searchSorted.
    */
  def searchSortedOracleSql(term: String, k: Int, ascending: Boolean,
      offset: Int = 0): String = {
    val dir = if (ascending) "ASC" else "DESC"
    val off = if (offset > 0) s" OFFSET $offset" else ""
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", convt0 AS (SELECT conv_id, CAST(min(doc_id) AS DOUBLE) AS t0 FROM t2 GROUP BY 1)" +
      s", top AS (SELECT h.conv_id, c.t0 AS sort_val FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id" +
      s" ORDER BY c.t0 $dir, h.conv_id ASC LIMIT $k$off)" +
      s" SELECT conv_id, sort_val FROM top ORDER BY sort_val $dir, conv_id ASC"
  }

  /** Language-model similarity oracles (IndexReader.lmDirichletTopK /
    * lmJelinekMercerTopK): disjunctive per-matched-term contributions with
    * collection frequency cf = sum of the term's corpus tfs and C = total
    * token count, every float step grouped exactly as the Spark columns are
    * so both engines replay the identical IEEE operations. `param` is mu
    * (Dirichlet) or lambda (Jelinek-Mercer); Scala's Double.toString
    * round-trips, so interpolating it preserves the bit pattern.
    */
  def lmOracleSql(terms: Seq[String], k: Int, dirichlet: Boolean,
      param: Double): String = {
    val vals = terms.map(t => s"('$t')").mkString(", ")
    val ctot = "(SELECT c FROM ctot)"
    val contrib =
      if (dirichlet)
        s"ln(1.0 + tf.tf / ($param * (CAST(cfs.cf AS DOUBLE) / $ctot)))" +
          s" + ln($param / (CAST(dl.dl AS DOUBLE) + $param))"
      else
        s"ln(1.0 + ((1.0 - $param) / $param) * ((CAST(tf.tf AS DOUBLE) /" +
          s" CAST(dl.dl AS DOUBLE)) / (CAST(cfs.cf AS DOUBLE) / $ctot)))"
    TurnsCte + TfCtes +
      s", q(term) AS (VALUES $vals)" +
      ", ctot AS (SELECT CAST(sum(dl) AS DOUBLE) AS c FROM dl)" +
      ", cfs AS (SELECT tf.term, CAST(sum(tf.tf) AS BIGINT) AS cf FROM tf" +
      " JOIN q ON tf.term = q.term GROUP BY 1)" +
      s", contrib AS (SELECT tf.conv_id, $contrib AS c FROM tf" +
      " JOIN cfs ON tf.term = cfs.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY 1)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** Field-collapsing oracle (top-1 per group of the exact scored set) —
    * group = deterministic conv bucket 'g' + (conv ordinal mod nGroups),
    * derivable identically on both engines from conv_id alone.
    */
  def collapseOracleSql(terms: Seq[String], nGroups: Int): String = {
    val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    TurnsCte + TfCtes +
      s", q(term, tidx) AS (VALUES $vals)" +
      ", qdf AS (SELECT q.term, q.tidx, count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
      ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      s", grps AS (SELECT conv_id, 'g' || CAST(CAST(substr(conv_id, 2) AS INT) % $nGroups AS VARCHAR) AS grp FROM (SELECT DISTINCT conv_id FROM turns))" +
      ", ranked AS (SELECT g.grp, s.conv_id, s.s, row_number() OVER (PARTITION BY g.grp ORDER BY s.s DESC, s.conv_id ASC) AS rn " +
      "FROM scored s JOIN grps g ON s.conv_id = g.conv_id)" +
      " SELECT grp, conv_id, round(s, 4) AS score FROM ranked WHERE rn = 1 ORDER BY grp ASC"
  }

  /** Synonym-group BM25 oracle: group tf = Σ member tfs per conv, group df =
    * distinct convs holding any member — then the standard BM25 contrib in
    * the engine's exact operation order (IEEE-pinned), top-k. The SQL
    * recomputation of IndexReader.bm25SynonymsTopK.
    */
  def synonymsOracleSql(groups: Seq[Seq[String]], k: Int): String = {
    val vals = groups.zipWithIndex.flatMap { case (g, gi) =>
      g.map(t => s"('$t', $gi)")
    }.mkString(", ")
    TurnsCte + TfCtes +
      s", gq(term, g) AS (VALUES $vals)" +
      synonymChainSql(k)
  }

  /** match_bool_prefix oracle: singleton groups for the leading terms plus
    * one group holding EVERY dictionary term carrying the prefix (assumes
    * |expansion| < the engine's maxExpansions — true by construction on the
    * test corpus's 31-term vocabulary), blended with the same synonym-group
    * CTE chain the engine's bm25SynonymsTopK mirrors.
    */
  def boolPrefixOracleSql(terms: Seq[String], prefix: String, k: Int): String = {
    val vals = terms.zipWithIndex.map { case (t, gi) => s"('$t', $gi)" }.mkString(", ")
    val pg = terms.length
    TurnsCte + TfCtes +
      s", gq0(term, g) AS (VALUES $vals)" +
      s", gq AS (SELECT term, g FROM gq0 UNION ALL" +
      s" SELECT DISTINCT term, $pg AS g FROM tf WHERE term LIKE '$prefix%')" +
      synonymChainSql(k)
  }

  /** The shared synonym-group scoring chain: expects a `gq(term, g)` CTE. */
  private def synonymChainSql(k: Int): String =
    ", gtf AS (SELECT tf.conv_id, gq.g, sum(tf.tf) AS tf FROM tf JOIN gq ON tf.term = gq.term GROUP BY 1, 2)" +
      ", gdf AS (SELECT g, count(*) AS df FROM gtf GROUP BY 1)" +
      ", contrib AS (SELECT gtf.conv_id, " +
      "ln(1.0 + ((SELECT n FROM stats) - gdf.df + 0.5) / (gdf.df + 0.5)) * (1.2 + 1.0) * gtf.tf " +
      "/ (gtf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM gtf JOIN gdf ON gtf.g = gdf.g JOIN dl ON gtf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** The plain disjunctive full-scored-set CTE chain (q→qdf→contrib→scored),
    * shared by the function-score-family oracles.
    */
  private def plainScoredCtes(terms: Seq[String]): String = {
    val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    s", q(term, tidx) AS (VALUES $vals)" +
      ", qdf AS (SELECT q.term, q.tidx, count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
      ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)"
  }

  /** Per-conv doc value under the deterministic ts derivation: t0 = min
    * doc_id = seconds since the corpus epoch (the same value the Spark side
    * computes as min(unix_timestamp(ts)) − epoch).
    */
  val ConvT0Cte: String =
    ", convt0 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CAST(min(doc_id) AS DOUBLE) AS t0 FROM documents GROUP BY 1)"

  /** Stats-aggregation oracle: count/min/max/sum/avg of t0 over the match
    * set — the SQL mirror of IndexReader.statsAgg.
    */
  def statsAggOracleSql(term: String): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      " SELECT CAST(count(*) AS BIGINT) AS n, min(t0) AS min_v, max(t0) AS max_v, " +
      "round(sum(t0), 4) AS sum_v, round(avg(t0), 4) AS avg_v" +
      " FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id"

  /** Percentiles oracle: exact linear-interpolated quantiles (quantile_cont
    * ≡ Spark `percentile`) of t0 over the match set.
    */
  def percentilesOracleSql(term: String, pcts: Seq[Double]): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", j AS (SELECT t0 FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id) " +
      pcts.map(p =>
        s"SELECT CAST($p AS DOUBLE) AS pct, round(quantile_cont(t0, $p), 4) AS value FROM j")
        .mkString(" UNION ALL ") +
      " ORDER BY pct"

  /** Percentile-ranks oracle: exact % of match-set t0 values ≤ each probe
    * — the SQL mirror of IndexReader.percentileRanksAgg.
    */
  def percentileRanksOracleSql(term: String, values: Seq[Double]): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", j AS (SELECT t0 FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id) " +
      values.map(x =>
        s"SELECT CAST($x AS DOUBLE) AS value, round(100.0 * " +
          s"(SELECT count(*) FROM j WHERE t0 <= $x) / (SELECT count(*) FROM j), 4) AS pct")
        .mkString(" UNION ALL ") +
      " ORDER BY value"

  /** Extended-stats oracle: stats + sum-of-squares + population variance/σ
    * + avg ± sigma·σ bounds over match-set t0 — the SQL mirror of
    * IndexReader.extendedStatsAgg.
    */
  def extendedStatsOracleSql(term: String, sigma: Double): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", j AS (SELECT t0 FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id)" +
      " SELECT CAST(count(*) AS BIGINT) AS n, min(t0) AS min_v, max(t0) AS max_v," +
      " round(sum(t0), 4) AS sum_v, round(avg(t0), 4) AS avg_v," +
      " round(sum(t0 * t0), 4) AS sum_sq, round(var_pop(t0), 4) AS variance," +
      " round(stddev_pop(t0), 4) AS std_dev," +
      s" round(avg(t0) + $sigma * stddev_pop(t0), 4) AS std_upper," +
      s" round(avg(t0) - $sigma * stddev_pop(t0), 4) AS std_lower FROM j"

  /** Weighted-average oracle: Σ(t0·w)/Σ(w) with the deterministic per-conv
    * weight (conv ordinal % 7) + 1 — the SQL mirror of
    * IndexReader.weightedAvgAgg over [[t0wMeta]]'s frame.
    */
  def weightedAvgOracleSql(term: String): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", j AS (SELECT t0, (CAST(substr(c.conv_id, 2) AS INT) % 7) + 1 AS w" +
      " FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id)" +
      " SELECT round(sum(t0 * w) / sum(w), 4) AS w_avg FROM j"

  /** Median-absolute-deviation oracle: median(|t0 − median(t0)|), both
    * medians linear-interpolated (quantile_cont ≡ Spark `percentile`) —
    * the SQL mirror of IndexReader.madAgg.
    */
  def madOracleSql(term: String): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", j AS (SELECT t0 FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id)" +
      " SELECT round(quantile_cont(abs(t0 -" +
      " (SELECT quantile_cont(t0, 0.5) FROM j)), 0.5), 4) AS mad FROM j"

  /** String-stats oracle: count / min / max / avg length plus base-2 Shannon
    * entropy of the character distribution over the per-conv string value
    * (first turn's tool) across the match set — the SQL mirror of
    * IndexReader.stringStatsAgg.
    */
  def stringStatsOracleSql(term: String): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", convs AS (SELECT printf('c%05d', doc_id // 5) AS conv_id," +
      " arg_min(source, doc_id) AS sv FROM documents GROUP BY 1)" +
      ", j AS (SELECT sv FROM hits h JOIN convs c ON h.conv_id = c.conv_id)" +
      ", ch AS (SELECT unnest(string_split(sv, '')) AS c FROM j)" +
      ", cc AS (SELECT c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1)" +
      " SELECT (SELECT CAST(count(*) AS BIGINT) FROM j) AS n," +
      " (SELECT min(len(sv)) FROM j) AS min_len," +
      " (SELECT max(len(sv)) FROM j) AS max_len," +
      " (SELECT round(avg(len(sv)), 4) FROM j) AS avg_len," +
      " round(-sum(n * log2(n)) / sum(n) + log2(sum(n)), 4) AS entropy FROM cc"

  /** Cardinality oracle: exact distinct count of the turn-level `source`
    * values across the matching conversations.
    */
  def cardinalityOracleSql(term: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, source, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      " SELECT CAST(count(DISTINCT t.source) AS BIGINT) AS n_distinct" +
      " FROM t2 t JOIN hits h ON t.conv_id = h.conv_id"

  /** [[plainScoredCtes]] with suffixed CTE names over the SAME shared
    * tf/dl/stats, so several sub-queries' full scored sets coexist in one
    * statement (dis_max).
    */
  private def scoredCtesSfx(sfx: String, terms: Seq[String]): String = {
    val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    s", q$sfx(term, tidx) AS (VALUES $vals)" +
      s", qdf$sfx AS (SELECT q$sfx.term, q$sfx.tidx, count(tf.conv_id) AS df FROM q$sfx LEFT JOIN tf ON tf.term = q$sfx.term GROUP BY 1, 2)" +
      s", contrib$sfx AS (SELECT tf.conv_id, " +
      "ln(1.0 + ((SELECT n FROM stats) - d.df + 0.5) / (d.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / (SELECT avgdl FROM stats))) AS c " +
      s"FROM tf JOIN qdf$sfx d ON tf.term = d.term JOIN dl l ON tf.conv_id = l.conv_id)" +
      s", scored$sfx AS (SELECT conv_id, sum(c) AS s FROM contrib$sfx GROUP BY conv_id)"
  }

  /** Dis-max oracle: best sub-query score + tie × the rest, the SQL mirror
    * of IndexReader.disMaxTopK for two sub-queries.
    */
  def disMaxOracleSql(q1: Seq[String], q2: Seq[String], tie: Double, k: Int): String =
    TurnsCte + TfCtes + scoredCtesSfx("_a", q1) + scoredCtesSfx("_b", q2) +
      ", uni AS (SELECT conv_id, s FROM scored_a UNION ALL SELECT conv_id, s FROM scored_b)" +
      s", comb AS (SELECT conv_id, max(s) + $tie * (sum(s) - max(s)) AS s FROM uni GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM comb ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** Random-score oracle: the identical md5(seed ‖ conv_id) rank key. */
  def randomScoreOracleSql(term: String, seed: String, k: Int): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      s", r AS (SELECT conv_id, md5('$seed' || conv_id) AS rnd FROM hits)" +
      s" SELECT conv_id, rnd FROM r ORDER BY rnd ASC, conv_id ASC LIMIT $k"

  /** Terms-aggregation oracle: per `source` value, how many matching convs
    * carry it (conv counted once per value), top-`size` by count desc then
    * value asc.
    */
  def termsAggOracleSql(term: String, size: Int): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, source, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", pairs AS (SELECT DISTINCT t.conv_id, t.source AS value FROM t2 t JOIN hits h ON t.conv_id = h.conv_id)" +
      " SELECT value, CAST(count(*) AS BIGINT) AS n_docs FROM pairs GROUP BY 1" +
      s" ORDER BY n_docs DESC, value ASC LIMIT $size"

  /** Fixed-interval histogram oracle over t0. */
  def histogramOracleSql(term: String, interval: Double): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      s" SELECT floor(c.t0 / $interval) * $interval AS bucket, CAST(count(*) AS BIGINT) AS hits" +
      " FROM hits h JOIN convt0 c ON h.conv_id = c.conv_id GROUP BY 1 ORDER BY 1"

  /** Composite-aggregation oracle: (role, source) doc counts in key order
    * with optional after-key pagination — role derived per turn from the
    * deterministic doc_id % 2 rule, a conv counted once per distinct pair.
    */
  def compositeOracleSql(term: String, size: Int,
      after: Option[(String, String)]): String = {
    val afterPred = after match {
      case Some((a1, a2)) =>
        s" WHERE k1 > '$a1' OR (k1 = '$a1' AND k2 > '$a2')"
      case None => ""
    }
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, source, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", pairs AS (SELECT DISTINCT t.conv_id, t.role AS k1, t.source AS k2 FROM t2 t JOIN hits h ON t.conv_id = h.conv_id)" +
      s", paged AS (SELECT * FROM pairs$afterPred)" +
      " SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_docs FROM paged GROUP BY 1, 2" +
      s" ORDER BY k1 ASC, k2 ASC LIMIT $size"
  }

  /** Turn-level (conv_id, role, tool) doc-values frame for the composite
    * aggregation.
    */
  def roleToolMeta(spark: SparkSession, sfDir: String): DataFrame =
    transcripts(spark, sfDir).select("conv_id", "role", "tool")

  /** Decay-scored oracle (function_score gauss/exp/linear, boost_mode
    * multiply). The decay constants are computed HERE in the JVM and
    * embedded as double literals, so both engines multiply by the identical
    * constant (shortest-roundtrip repr re-parses to the same double) — the
    * only cross-engine float seam left is exp()'s final ulp, absorbed by the
    * 4-digit display rounding.
    */
  def decayOracleSql(terms: Seq[String], k: Int, origin: Double, scale: Double,
      offset: Double, decay: Double, fn: String): String = {
    val mult = fn match {
      case "gauss" => s"exp(d.d * d.d * ${math.log(decay) / (scale * scale)})"
      case "exp" => s"exp(d.d * ${math.log(decay) / scale})"
      case "linear" =>
        s"greatest(CAST(0.0 AS DOUBLE), 1.0 - d.d * ${(1.0 - decay) / scale})"
      case other => throw new IllegalArgumentException(s"unknown decay fn: $other")
    }
    TurnsCte + TfCtes + plainScoredCtes(terms) + ConvT0Cte +
      s", dd AS (SELECT conv_id, greatest(CAST(0.0 AS DOUBLE), abs(t0 - $origin) - $offset) AS d FROM convt0)" +
      s", dmul AS (SELECT s.conv_id, s.s * $mult AS s FROM scored s JOIN dd d ON s.conv_id = d.conv_id)" +
      s", top AS (SELECT conv_id, s FROM dmul ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** Field-value-factor oracle: score × ln(1 + factor · t0), the SQL mirror
    * of IndexReader.fieldValueFactorTopK(modifier = "ln1p").
    */
  def fieldValueFactorOracleSql(terms: Seq[String], k: Int, factor: Double): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) + ConvT0Cte +
      s", fmul AS (SELECT s.conv_id, s.s * ln(1.0 + c.t0 * $factor) AS s FROM scored s JOIN convt0 c ON s.conv_id = c.conv_id)" +
      s", top AS (SELECT conv_id, s FROM fmul ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** Boosting-query oracle: positive full scored set, negative matches
    * multiplied by negativeBoost (demotion, not exclusion).
    */
  def boostingOracleSql(positive: Seq[String], negative: Seq[String],
      negativeBoost: Double, k: Int): String = {
    val negIn = negative.map(t => s"'$t'").mkString(", ")
    TurnsCte + TfCtes + plainScoredCtes(positive) +
      s", negset AS (SELECT DISTINCT conv_id FROM tok2 WHERE term IN ($negIn))" +
      s", dem AS (SELECT s.conv_id, CASE WHEN n.conv_id IS NOT NULL THEN s.s * $negativeBoost ELSE s.s END AS s" +
      " FROM scored s LEFT JOIN negset n ON s.conv_id = n.conv_id)" +
      s", top AS (SELECT conv_id, s FROM dem ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** Collapse-with-inner-hits oracle: top-n per group of the exact scored
    * set, with the in-group rank emitted.
    */
  def collapseTopNOracleSql(terms: Seq[String], nGroups: Int, n: Int): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) +
      s", grps AS (SELECT conv_id, 'g' || CAST(CAST(substr(conv_id, 2) AS INT) % $nGroups AS VARCHAR) AS grp FROM (SELECT DISTINCT conv_id FROM turns))" +
      ", ranked AS (SELECT g.grp, s.conv_id, s.s, row_number() OVER (PARTITION BY g.grp ORDER BY s.s DESC, s.conv_id ASC) AS rn " +
      "FROM scored s JOIN grps g ON s.conv_id = g.conv_id)" +
      s" SELECT grp, CAST(rn AS INT) AS rn, conv_id, round(s, 4) AS score FROM ranked WHERE rn <= $n ORDER BY grp ASC, rn ASC"

  /** The per-role scored-CTE family with suffixed names, so two corpora can
    * coexist in one oracle query (multi-field BM25).
    */
  private def roleScoredCtes(sfx: String, rolePred: String, terms: Seq[String]): String = {
    val vals = terms.map(t => s"('$t')").mkString(", ")
    s"turns$sfx AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, text FROM documents WHERE $rolePred), " +
      s"toks$sfx AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM turns$sfx), " +
      s"tok2$sfx AS (SELECT conv_id, term FROM toks$sfx WHERE term <> ''), " +
      s"tf$sfx AS (SELECT conv_id, term, count(*) AS tf FROM tok2$sfx GROUP BY 1, 2), " +
      s"dl$sfx AS (SELECT conv_id, sum(tf) AS dl FROM tf$sfx GROUP BY 1), " +
      s"stats$sfx AS (SELECT (SELECT count(DISTINCT conv_id) FROM turns$sfx) AS n, " +
      s"(SELECT CAST(sum(dl) AS DOUBLE) FROM dl$sfx) / (SELECT count(DISTINCT conv_id) FROM turns$sfx) AS avgdl), " +
      s"q$sfx(term) AS (VALUES $vals), " +
      s"qdf$sfx AS (SELECT q$sfx.term, count(tf$sfx.conv_id) AS df FROM q$sfx LEFT JOIN tf$sfx ON tf$sfx.term = q$sfx.term GROUP BY 1), " +
      s"contrib$sfx AS (SELECT t.conv_id, d.term AS term, " +
      s"ln(1.0 + ((SELECT n FROM stats$sfx) - d.df + 0.5) / (d.df + 0.5)) * (1.2 + 1.0) * t.tf " +
      s"/ (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / (SELECT avgdl FROM stats$sfx))) AS c " +
      s"FROM tf$sfx t JOIN qdf$sfx d ON t.term = d.term JOIN dl$sfx l ON t.conv_id = l.conv_id), " +
      s"scored$sfx AS (SELECT conv_id, sum(c) AS s FROM contrib$sfx GROUP BY conv_id)"
  }

  /** Multi-field boosted BM25 oracle: each role corpus scores with its OWN
    * N/avgdl/df, full scored sets union under the boosts, sum per conv,
    * global top-k — the SQL recomputation of FieldIndexes.multiFieldBm25.
    */
  def multiFieldOracleSql(userBoost: Double, assistantBoost: Double,
      terms: Seq[String], k: Int): String =
    "WITH " + roleScoredCtes("_u", "doc_id % 2 = 0", terms) + ", " +
      roleScoredCtes("_a", "doc_id % 2 = 1", terms) +
      s", uni AS (SELECT conv_id, s * $userBoost AS s FROM scored_u " +
      s"UNION ALL SELECT conv_id, s * $assistantBoost AS s FROM scored_a)" +
      ", comb AS (SELECT conv_id, sum(s) AS s FROM uni GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM comb ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** cross_fields multi_match oracle (term-centric): each term's best
    * per-role contribution (each role corpus under its OWN stats), summed
    * per doc — the SQL mirror of FieldIndexes.crossFieldsBm25.
    */
  def crossFieldsOracleSql(terms: Seq[String], k: Int): String =
    "WITH " + roleScoredCtes("_u", "doc_id % 2 = 0", terms) + ", " +
      roleScoredCtes("_a", "doc_id % 2 = 1", terms) +
      ", uni AS (SELECT conv_id, term, c FROM contrib_u" +
      " UNION ALL SELECT conv_id, term, c FROM contrib_a)" +
      ", best AS (SELECT conv_id, term, max(c) AS b FROM uni GROUP BY 1, 2)" +
      ", comb AS (SELECT conv_id, sum(b) AS s FROM best GROUP BY 1)" +
      s", top AS (SELECT conv_id, s FROM comb ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** combined_fields (BM25F) oracle: weighted per-role tf blended into ONE
    * virtual field (tf* = Σ w_f·tf_f), weighted blended doc length over the
    * UNION doc set (dl* = Σ w_f·dl_f, absent role → 0), union df, N and
    * avgdl* of the blend — the SQL recomputation of
    * FieldIndexes.combinedFieldsBm25's documented model.
    */
  def combinedFieldsOracleSql(wUser: Double, wAssistant: Double,
      terms: Seq[String], k: Int): String = {
    val vals = terms.map(t => s"('$t')").mkString(", ")
    "WITH turns_u AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, text FROM documents WHERE doc_id % 2 = 0)" +
      ", turns_a AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, text FROM documents WHERE doc_id % 2 = 1)" +
      ", tf_u AS (SELECT conv_id, term, count(*) AS tf FROM (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM turns_u) WHERE term <> '' GROUP BY 1, 2)" +
      ", tf_a AS (SELECT conv_id, term, count(*) AS tf FROM (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM turns_a) WHERE term <> '' GROUP BY 1, 2)" +
      ", dl_u AS (SELECT conv_id, sum(tf) AS dl FROM tf_u GROUP BY 1)" +
      ", dl_a AS (SELECT conv_id, sum(tf) AS dl FROM tf_a GROUP BY 1)" +
      s", norms AS (SELECT coalesce(u.conv_id, a.conv_id) AS conv_id, $wUser * coalesce(u.dl, 0) + $wAssistant * coalesce(a.dl, 0) AS dlc" +
      " FROM dl_u u FULL OUTER JOIN dl_a a ON u.conv_id = a.conv_id)" +
      ", stats AS (SELECT count(*) AS n, avg(dlc) AS avgdl FROM norms)" +
      s", q(term) AS (VALUES $vals)" +
      s", tfc AS (SELECT b.conv_id, b.term, sum(b.wtf) AS tfc FROM (SELECT conv_id, term, $wUser * tf AS wtf FROM tf_u UNION ALL SELECT conv_id, term, $wAssistant * tf AS wtf FROM tf_a) b JOIN q ON b.term = q.term GROUP BY 1, 2)" +
      ", qdf AS (SELECT q.term, count(tfc.conv_id) AS df FROM q LEFT JOIN tfc ON tfc.term = q.term GROUP BY 1)" +
      ", contrib AS (SELECT t.conv_id, ln(1.0 + ((SELECT n FROM stats) - d.df + 0.5) / (d.df + 0.5)) * (1.2 + 1.0) * t.tfc" +
      " / (t.tfc + 1.2 * ((1.0 - 0.75) + 0.75 * nm.dlc / (SELECT avgdl FROM stats))) AS c" +
      " FROM tfc t JOIN qdf d ON t.term = d.term JOIN norms nm ON t.conv_id = nm.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY 1)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** RRF hybrid-search oracle: the BM25 top-`window` ranking fused with the
    * conv-level cosine ranking (conv vector = the conv's first doc's
    * embedding, query = vec 0's embedding, vec 0's own conv excluded from
    * the vector source exactly like Ann.bruteForceTopK's self-exclusion) by
    * score = Σ 1/(c + rank). Vector ranks order on the 4dp-ROUNDED cosine
    * (the Spark side's bruteForceTopK convention), lexical ranks on the
    * exact BM25 doubles — both bit-reproducible cross-engine.
    */
  def rrfOracleSql(terms: Seq[String], k: Int, window: Int, c: Int): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) +
      s", lex AS (SELECT conv_id, lr FROM (SELECT conv_id, row_number() OVER (ORDER BY s DESC, conv_id ASC) AS lr FROM scored) WHERE lr <= $window)" +
      ", ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id % 5 = 0)" +
      ", qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id = 0)" +
      ", vs AS (SELECT ev.vec_id, round(list_dot_product(ev.v, qv.v) / (sqrt(list_dot_product(ev.v, ev.v)) * sqrt(list_dot_product(qv.v, qv.v))), 4) AS cosine" +
      " FROM ev, qv WHERE ev.vec_id <> 0)" +
      s", vrk AS (SELECT conv_id, vr FROM (SELECT printf('c%05d', vec_id // 5) AS conv_id, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS vr FROM vs) WHERE vr <= $window)" +
      s", fused AS (SELECT coalesce(l.conv_id, v.conv_id) AS conv_id," +
      s" coalesce(1.0 / ($c + l.lr), 0.0) + coalesce(1.0 / ($c + v.vr), 0.0) AS s" +
      " FROM lex l FULL OUTER JOIN vrk v ON l.conv_id = v.conv_id)" +
      s", top AS (SELECT conv_id, s FROM fused ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** Date-histogram oracle: docs matching the term, bucketed by the conv's
    * min ts truncated to the minute, counted — ts reproduced from the
    * deterministic `2024-01-01 + doc_id seconds` derivation.
    */
  def dateHistogramOracleSql(term: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      " SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, " +
      "CAST(count(*) AS BIGINT) AS hits " +
      "FROM hits h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1 ORDER BY 1"

  /** Shared date-histogram CTE chain ending in `hist(bucket, hits)` — the
    * parent every pipeline-agg oracle runs over.
    */
  private def histCtes(term: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      ", hist AS (SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, " +
      "CAST(count(*) AS BIGINT) AS hits " +
      "FROM hits h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1)"

  /** rank_eval oracle: per query, the bm25 top-k rank list (same scoring
    * CTE chain as [[bm25OracleSql]]) joined to that query's judged-relevant
    * VALUES — precision@k, recall@k, MRR. One self-contained subquery per
    * query, UNION ALL'd.
    */
  def rankEvalOracleSql(queries: Seq[(String, Seq[String], Seq[String])],
      k: Int): String =
    queries.map { case (qid, terms, relIds) =>
      val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
      val jvals = relIds.map(c => s"('$c')").mkString(", ")
      "SELECT * FROM (" +
        TurnsCte + TfCtes +
        s", q(term, tidx) AS (VALUES $vals)" +
        ", qdf AS (SELECT q.term, q.tidx, count(tf.conv_id) AS df FROM q" +
        " LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
        ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
        "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * " +
        "tf.tf / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
        "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
        ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
        ", top AS (SELECT conv_id, row_number() OVER (ORDER BY s DESC, conv_id ASC)" +
        s" AS rank FROM scored QUALIFY rank <= $k)" +
        s", j(conv_id) AS (VALUES $jvals)" +
        ", m AS (SELECT count(*) AS hits, min(rank) AS fr FROM top JOIN j USING (conv_id))" +
        s" SELECT '$qid' AS query_id, round(hits / $k.0, 4) AS precision_k," +
        s" round(hits / ${relIds.length}.0, 4) AS recall_k," +
        " round(coalesce(1.0 / fr, 0.0), 4) AS mrr FROM m)"
    }.mkString(" UNION ALL ") + " ORDER BY query_id"

  /** Graded rank_eval oracle: DCG@k over the replayed BM25 top-k with
    * (conv, grade) judgments, normalized by the ideal DCG of the judgment
    * list (grades desc, conv asc, top k) — the `dcg` metric with
    * `normalize: true`.
    */
  def rankEvalNdcgOracleSql(
      queries: Seq[(String, Seq[String], Seq[(String, Double)])],
      k: Int): String =
    queries.map { case (qid, terms, graded) =>
      val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
      val jvals = graded.map { case (c, g) => s"('$c', $g)" }.mkString(", ")
      "SELECT * FROM (" +
        TurnsCte + TfCtes +
        s", q(term, tidx) AS (VALUES $vals)" +
        ", qdf AS (SELECT q.term, q.tidx, count(tf.conv_id) AS df FROM q" +
        " LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
        ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
        "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * " +
        "tf.tf / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
        "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
        ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
        ", top AS (SELECT conv_id, row_number() OVER (ORDER BY s DESC, conv_id ASC)" +
        s" AS rank FROM scored QUALIFY rank <= $k)" +
        s", j(conv_id, g) AS (VALUES $jvals)" +
        ", jd AS (SELECT conv_id, max(g) AS g FROM j GROUP BY 1)" +
        ", dcgv AS (SELECT coalesce(sum((pow(2.0, jd.g) - 1.0) / log2(t.rank + 1.0)), 0.0) AS dcg" +
        " FROM top t JOIN jd USING (conv_id))" +
        ", ideal AS (SELECT coalesce(sum((pow(2.0, g) - 1.0) / log2(irank + 1.0)), 0.0) AS idcg" +
        " FROM (SELECT g, row_number() OVER (ORDER BY g DESC, conv_id ASC) AS irank FROM jd)" +
        s" WHERE irank <= $k)" +
        s" SELECT '$qid' AS query_id, round(dcg, 4) AS dcg_k," +
        " round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 4) AS ndcg_k" +
        " FROM dcgv, ideal)"
    }.mkString(" UNION ALL ") + " ORDER BY query_id"

  /** LTR feature-extraction oracle: the BM25 chain widened to carry tf,
    * dl, and pure idf per (doc, term), folded per doc, top-k by the exact
    * score — the identical feature definitions recomputed independently.
    */
  def ltrFeaturesOracleSql(queries: Seq[(String, Seq[String])],
      k: Int): String =
    queries.map { case (qid, terms) =>
      val vals = terms.map(t => s"('$t')").mkString(", ")
      "SELECT * FROM (" +
        TurnsCte + TfCtes +
        s", q(term) AS (VALUES $vals)" +
        ", qdf AS (SELECT q.term, count(tf.conv_id) AS df FROM q" +
        " LEFT JOIN tf ON tf.term = q.term GROUP BY 1)" +
        ", rws AS (SELECT tf.conv_id, tf.tf, dl.dl," +
        " ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) AS idf," +
        " ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * " +
        "tf.tf / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
        "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
        ", f AS (SELECT conv_id, sum(c) AS s, count(*) AS nm," +
        " CAST(sum(tf) AS BIGINT) AS sum_tf, sum(idf) AS sidf," +
        " CAST(max(dl) AS BIGINT) AS dl FROM rws GROUP BY 1)" +
        ", top AS (SELECT *, row_number() OVER (ORDER BY s DESC, conv_id ASC)" +
        s" AS rank FROM f QUALIFY rank <= $k)" +
        s" SELECT '$qid' AS query_id, CAST(rank AS INT) AS rank, conv_id," +
        " round(s, 4) AS score, CAST(nm AS BIGINT) AS n_matched, sum_tf," +
        " round(sidf, 4) AS sum_idf, dl FROM top)"
    }.mkString(" UNION ALL ") + " ORDER BY query_id, rank"

  /** Gap-filled date-histogram oracle (minute unit): the [lo, hi] ladder
    * from generate_series full-outer-joined to the sparse histogram, zero
    * hits filled — the min_doc_count:0 + extended_bounds contract.
    */
  def dateHistogramFilledOracleSql(term: String, lo: String, hi: String): String =
    histCtes(term) +
      s", ladder AS (SELECT strftime(g, '%Y-%m-%d %H:%M:%S') AS bucket" +
      s" FROM generate_series(TIMESTAMP '$lo', TIMESTAMP '$hi'," +
      " INTERVAL 1 MINUTE) AS s(g))" +
      " SELECT coalesce(l.bucket, h.bucket) AS bucket," +
      " CAST(coalesce(h.hits, 0) AS BIGINT) AS hits" +
      " FROM ladder l FULL OUTER JOIN hist h ON l.bucket = h.bucket" +
      " ORDER BY bucket"

  /** bucket_selector + bucket_sort oracle: surviving histogram buckets
    * (hits ≥ minHits), top `topN` by hits desc then bucket asc.
    */
  def bucketSelectorOracleSql(term: String, minHits: Long, topN: Int): String =
    histCtes(term) +
      s" SELECT bucket, hits FROM hist WHERE hits >= $minHits" +
      s" ORDER BY hits DESC, bucket ASC LIMIT $topN"

  /** Pseudo-relevance-feedback oracle: base top-fbDocs page → expansion
    * term selection (Σtf desc, df asc, term asc over the feedback docs'
    * term vectors, originals excluded, df·100 ≤ N·maxDfPct) → boosted
    * re-query — the SQL mirror of IndexReader.prfTopK.
    */
  def prfOracleSql(terms: Seq[String], k: Int, fbDocs: Int, fbTerms: Int,
      beta: Double, maxDfPct: Int): String = {
    val vals0 = terms.map(t => s"('$t')").mkString(", ")
    val inList = terms.map(t => s"'$t'").mkString(", ")
    TurnsCte + TfCtes +
      s", q0(term) AS (VALUES $vals0)" +
      ", qdf0 AS (SELECT q0.term, count(tf.conv_id) AS df FROM q0" +
      " LEFT JOIN tf ON tf.term = q0.term GROUP BY 1)" +
      ", contrib0 AS (SELECT tf.conv_id, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf0.df + 0.5) / (qdf0.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf0 ON tf.term = qdf0.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", fb AS (SELECT conv_id FROM (SELECT conv_id, sum(c) AS s FROM contrib0 GROUP BY 1)" +
      s" ORDER BY s DESC, conv_id ASC LIMIT $fbDocs)" +
      s", ev AS (SELECT tf.term, CAST(sum(tf.tf) AS BIGINT) AS stf FROM tf JOIN fb USING (conv_id)" +
      s" WHERE tf.term NOT IN ($inList) GROUP BY 1)" +
      // tf holds one row per (conv, term), so count(*) per term IS its df
      ", edf AS (SELECT ev.term, ev.stf, count(*) AS df FROM ev JOIN tf ON tf.term = ev.term GROUP BY 1, 2)" +
      s", expt AS (SELECT term FROM edf WHERE df * 100 <= (SELECT n FROM stats) * $maxDfPct" +
      s" ORDER BY stf DESC, df ASC, term ASC LIMIT $fbTerms)" +
      ", q(term, boost) AS (SELECT term, CAST(1.0 AS DOUBLE) FROM q0" +
      s" UNION ALL SELECT term, CAST($beta AS DOUBLE) FROM expt)" +
      ", qdf AS (SELECT q.term, q.boost, count(tf.conv_id) AS df FROM q" +
      " LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
      ", contrib AS (SELECT tf.conv_id, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * qdf.boost * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** DSIR oracle: 256-bucket hashed-unigram importance weights, target =
    * assistant turns (doc_id % 2 = 1), add-one smoothing, top-n — the SQL
    * mirror of Dedup.dsirTopN.
    */
  def dsirOracleSql(n: Int): String =
    TurnsCte + TfCtes +
      ", tb AS (SELECT conv_id, substr(md5(term), 1, 2) AS b FROM tok2)" +
      ", raw AS (SELECT b, count(*) AS rc FROM tb GROUP BY 1)" +
      ", rawtot AS (SELECT CAST(sum(rc) AS DOUBLE) AS t FROM raw)" +
      ", gt AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents WHERE doc_id % 2 = 1)" +
      ", gtb AS (SELECT substr(md5(term), 1, 2) AS b FROM gt WHERE term <> '')" +
      ", tgt AS (SELECT b, count(*) AS tc FROM gtb GROUP BY 1)" +
      ", tgttot AS (SELECT CAST(sum(tc) AS DOUBLE) AS t FROM tgt)" +
      ", diff AS (SELECT r.b, ln(CAST(coalesce(g.tc, 0) + 1 AS DOUBLE) / ((SELECT t FROM tgttot) + 256))" +
      " - ln(CAST(r.rc + 1 AS DOUBLE) / ((SELECT t FROM rawtot) + 256)) AS d" +
      " FROM raw r LEFT JOIN tgt g ON r.b = g.b)" +
      ", docb AS (SELECT conv_id, b, count(*) AS c FROM tb GROUP BY 1, 2)" +
      ", w AS (SELECT conv_id, sum(c * d) AS w FROM docb JOIN diff USING (b) GROUP BY 1)" +
      s", top AS (SELECT conv_id, w FROM w ORDER BY w DESC, conv_id ASC LIMIT $n)" +
      " SELECT conv_id, round(w, 4) AS weight FROM top ORDER BY weight DESC, conv_id ASC"

  /** bucket_correlation oracle: Pearson correlation between the two sibling
    * minute histograms' counts over the UNION bucket set, absent buckets 0 —
    * the SQL mirror of IndexReader.bucketCorrelation.
    */
  def bucketCorrelationOracleSql(termA: String, termB: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      s", hitsa AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$termA')" +
      s", hitsb AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$termB')" +
      ", hista AS (SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, " +
      "CAST(count(*) AS BIGINT) AS hits FROM hitsa h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1)" +
      ", histb AS (SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, " +
      "CAST(count(*) AS BIGINT) AS hits FROM hitsb h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1)" +
      ", j AS (SELECT CAST(coalesce(a.hits, 0) AS DOUBLE) AS ha, " +
      "CAST(coalesce(b.hits, 0) AS DOUBLE) AS hb " +
      "FROM hista a FULL OUTER JOIN histb b ON a.bucket = b.bucket)" +
      // explicit covar_samp/(sa*sb) with a zero-variance guard — the same
      // formula (and null case) the engine computes
      " SELECT count(*) AS n_buckets, round(CASE WHEN stddev_samp(ha) > 0 AND stddev_samp(hb) > 0" +
      " THEN covar_samp(ha, hb) / (stddev_samp(ha) * stddev_samp(hb)) END, 4) AS correlation FROM j"

  /** indices_boost oracle: the single-corpus BM25 scoring chain with each
    * conv's score scaled by its SHARD's boost (the shardReaders split:
    * conv ordinal % 2), then top-k of the boosted order — the SQL mirror of
    * ShardedSearch.bm25TopKIndicesBoost over [[shardReaders]].
    */
  def indicesBoostOracleSql(terms: Seq[String], k: Int,
      boostEven: Double, boostOdd: Double): String = {
    val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    TurnsCte + TfCtes +
      s", q(term, tidx) AS (VALUES $vals)" +
      ", qdf AS (SELECT q.term, q.tidx, count(tf.conv_id) AS df FROM q" +
      " LEFT JOIN tf ON tf.term = q.term GROUP BY 1, 2)" +
      ", contrib AS (SELECT tf.conv_id, qdf.tidx, " +
      "ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf " +
      "/ (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c " +
      "FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) * (CASE WHEN CAST(substring(conv_id, 2) AS INT) % 2 = 0 " +
      s"THEN $boostEven ELSE $boostOdd END) AS s FROM contrib GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** stats_bucket oracle: scalar stats over the histogram's hit counts. */
  def statsBucketOracleSql(term: String): String =
    histCtes(term) +
      " SELECT CAST(count(*) AS BIGINT) AS n_buckets," +
      " CAST(min(hits) AS BIGINT) AS min_hits," +
      " CAST(max(hits) AS BIGINT) AS max_hits," +
      " round(avg(hits), 4) AS avg_hits," +
      " CAST(sum(hits) AS BIGINT) AS sum_hits FROM hist"

  /** max_bucket oracle: the histogram's max hit count plus the comma-joined
    * ascending keys attaining it (every selected row holds the max, so the
    * max() re-fold is the identity).
    */
  def maxBucketOracleSql(term: String): String =
    histCtes(term) +
      " SELECT string_agg(bucket, ',' ORDER BY bucket) AS keys," +
      " CAST(max(hits) AS BIGINT) AS value FROM hist" +
      " WHERE hits = (SELECT max(hits) FROM hist)"

  /** value_count oracle: non-null turn-level `source` values carried by the
    * matching convs, value nulled under the deterministic doc_id % 3 = 0
    * rule (count(v) skips nulls — the agg's whole point).
    */
  def valueCountOracleSql(term: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, source, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", vals AS (SELECT conv_id, CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS v FROM t2)" +
      " SELECT CAST(count(v.v) AS BIGINT) AS n_values" +
      " FROM vals v JOIN hits h ON v.conv_id = h.conv_id"

  /** date_range oracle: matching convs bucketed by which [from, to)
    * interval their min ts falls in — ES from-inclusive / to-exclusive,
    * "from-to" labels with "*" at the open ends. `bounds` are the literal
    * "yyyy-MM-dd HH:mm:ss" boundary strings, ascending.
    */
  def dateRangeOracleSql(term: String, bounds: Seq[String]): String = {
    val edges = (None +: bounds.map(Option(_))) :+ None
    val cases = edges.sliding(2).collect { case Seq(lo, hi) =>
      val name = s"${lo.getOrElse("*")}-${hi.getOrElse("*")}"
      val cond = (lo.map(b => s"c.ts >= TIMESTAMP '$b'") ++
        hi.map(b => s"c.ts < TIMESTAMP '$b'")).mkString(" AND ")
      s"WHEN $cond THEN '$name'"
    }.mkString(" ")
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      s" SELECT CASE $cases END AS bucket, CAST(count(*) AS BIGINT) AS hits" +
      " FROM hits h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1 ORDER BY 1"
  }

  /** global-agg oracle: scoped count + avg doc length of the matches next
    * to the corpus-global pair.
    */
  def globalAggOracleSql(term: String): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      " SELECT (SELECT CAST(count(*) AS BIGINT) FROM hits) AS hits," +
      " (SELECT round(avg(dl), 4) FROM dl JOIN hits USING (conv_id)) AS avg_v," +
      " (SELECT CAST(count(*) AS BIGINT) FROM dl) AS global_docs," +
      " (SELECT round(avg(dl), 4) FROM dl) AS global_avg_v"

  /** Span-corruption oracle: the identical md5-seeded mask rule, island
    * grouping, sentinel numbering, and closing-sentinel convention replayed
    * in SQL — positions enumerated by the ppos list-lambda recipe.
    */
  def spanCorruptOracleSql: String =
    "WITH g AS (SELECT doc_id, unnest(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), (x, i) -> struct_pack(tok := x, ord := i))) AS t FROM documents)" +
      ", tk AS (SELECT doc_id, t.tok AS tok, row_number() OVER (PARTITION BY doc_id ORDER BY t.ord) - 1 AS pos FROM g)" +
      ", tm AS (SELECT *, substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 1) IN ('0', '1') AS m FROM tk)" +
      ", mk AS (SELECT *, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM tm WHERE m)" +
      ", isl AS (SELECT *, dense_rank() OVER (PARTITION BY doc_id ORDER BY grp) - 1 AS k," +
      " row_number() OVER (PARTITION BY doc_id, grp ORDER BY pos) = 1 AS strt FROM mk)" +
      ", ip AS (SELECT doc_id, pos, tok AS piece FROM tm WHERE NOT m" +
      " UNION ALL SELECT doc_id, pos, '<extra_id_' || CAST(k AS VARCHAR) || '>' FROM isl WHERE strt)" +
      ", inp AS (SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input FROM ip GROUP BY 1)" +
      ", tp AS (SELECT doc_id, pos * 2 AS sp, '<extra_id_' || CAST(k AS VARCHAR) || '>' AS piece FROM isl WHERE strt" +
      " UNION ALL SELECT doc_id, pos * 2 + 1, tok FROM isl)" +
      ", ni AS (SELECT doc_id, count(*) AS n FROM isl WHERE strt GROUP BY 1)" +
      ", tgt AS (SELECT t.doc_id, string_agg(piece, ' ' ORDER BY sp) || ' <extra_id_' || CAST(n AS VARCHAR) || '>' AS target" +
      " FROM tp t JOIN ni USING (doc_id) GROUP BY t.doc_id, n)" +
      " SELECT i.doc_id, i.input, coalesce(t.target, '') AS target" +
      " FROM inp i LEFT JOIN tgt t USING (doc_id) ORDER BY doc_id"

  /** FIM oracle: the identical md5-hex cut-point derivation and
    * sentinel-list re-serialization replayed with DuckDB list slicing
    * (toks[a:b] is inclusive-bounds, so slice(toks, s, len) maps to
    * toks[s : s + len - 1]).
    */
  def fimOracleSql: String =
    "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents)" +
      ", c AS (SELECT doc_id, toks, len(toks) AS n," +
      " CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':fim1'), 1, 8)) AS BIGINT) % (len(toks) + 1) AS c1 FROM w)" +
      ", c2t AS (SELECT doc_id, toks, n, c1," +
      " c1 + CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':fim2'), 1, 8)) AS BIGINT) % (n - c1 + 1) AS c2 FROM c)" +
      " SELECT doc_id, array_to_string(" +
      "['<fim_prefix>'] || toks[1 : c1] || ['<fim_suffix>'] || toks[c2 + 1 : n]" +
      " || ['<fim_middle>'] || toks[c1 + 1 : c2], ' ') AS psm," +
      " CAST(c2 - c1 AS BIGINT) AS n_middle FROM c2t ORDER BY doc_id"

  /** multi_terms oracle: (role, source) doc counts, top `size` by count
    * desc with ties on the key pair asc — the count-ordered companion to
    * [[compositeOracleSql]].
    */
  def multiTermsOracleSql(term: String, size: Int): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, source, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", pairs AS (SELECT DISTINCT t.conv_id, t.role AS k1, t.source AS k2 FROM t2 t JOIN hits h ON t.conv_id = h.conv_id)" +
      " SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_docs FROM pairs GROUP BY 1, 2" +
      s" ORDER BY n_docs DESC, k1 ASC, k2 ASC LIMIT $size"

  /** Missing-agg oracle: matching convs whose doc value is null under the
    * deterministic conv-ordinal % 3 = 0 nulling rule.
    */
  def missingAggOracleSql(term: String): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      " SELECT CAST(count(*) AS BIGINT) AS n_missing FROM hits" +
      " WHERE CAST(substr(conv_id, 2) AS INT) % 3 = 0"

  /** Pipeline-agg oracle over the date histogram: the parent histogram plus
    * running total, first difference (null in the first bucket), and the
    * trailing `movingWindow`-bucket average rounded 4dp — the SQL mirror of
    * IndexReader.dateHistogramPipeline.
    */
  def dateHistogramPipelineOracleSql(term: String, movingWindow: Int): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      ", hist AS (SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, " +
      "CAST(count(*) AS BIGINT) AS hits " +
      "FROM hits h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1)" +
      " SELECT bucket, hits, CAST(sum(hits) OVER (ORDER BY bucket) AS BIGINT) AS cum_hits," +
      " hits - lag(hits) OVER (ORDER BY bucket) AS deriv," +
      s" round(avg(hits) OVER (ORDER BY bucket ROWS BETWEEN ${movingWindow - 1} PRECEDING AND CURRENT ROW), 4) AS mavg" +
      " FROM hist ORDER BY bucket"

  /** serial_diff oracle: hits minus the hits `lagN` buckets earlier over the
    * minute histogram; first `lagN` buckets null (ES semantics).
    */
  def serialDiffOracleSql(term: String, lagN: Int): String =
    histCtes(term) +
      s" SELECT bucket, hits, hits - lag(hits, $lagN) OVER (ORDER BY bucket) AS sdiff" +
      " FROM hist ORDER BY bucket"

  /** moving_percentiles oracle: trailing-window quantile_cont (the same
    * (n−1)·p interpolation the engine computes) over the minute histogram.
    */
  def movingPercentilesOracleSql(term: String, window: Int): String =
    histCtes(term) +
      s" SELECT bucket, hits," +
      s" round(quantile_cont(hits, 0.5) OVER (ORDER BY bucket ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW), 4) AS p50," +
      s" round(quantile_cont(hits, 0.95) OVER (ORDER BY bucket ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW), 4) AS p95" +
      " FROM hist ORDER BY bucket"

  /** bucket_script oracle: per minute-bucket share of `termA`'s hits among
    * `termA`+`termB` hits, absent sides coalesced to 0.
    */
  def bucketScriptOracleSql(termA: String, termB: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      s", ha AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$termA')" +
      s", hb AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$termB')" +
      ", hista AS (SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, CAST(count(*) AS BIGINT) AS hits_a FROM ha h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1)" +
      ", histb AS (SELECT strftime(date_trunc('minute', c.ts), '%Y-%m-%d %H:%M:%S') AS bucket, CAST(count(*) AS BIGINT) AS hits_b FROM hb h JOIN convts c ON h.conv_id = c.conv_id GROUP BY 1)" +
      ", j AS (SELECT coalesce(a.bucket, b.bucket) AS bucket, coalesce(a.hits_a, 0) AS hits_a, coalesce(b.hits_b, 0) AS hits_b FROM hista a FULL OUTER JOIN histb b ON a.bucket = b.bucket)" +
      " SELECT bucket, CAST(hits_a AS BIGINT) AS hits_a, CAST(hits_b AS BIGINT) AS hits_b," +
      " round(CAST(hits_a AS DOUBLE) / nullif(hits_a + hits_b, 0), 4) AS ratio" +
      " FROM j ORDER BY bucket"

  /** normalize (percent_of_sum) oracle: each bucket's share of total hits. */
  def normalizeOracleSql(term: String): String =
    histCtes(term) +
      " SELECT bucket, hits," +
      " round(CAST(hits AS DOUBLE) / sum(hits) OVER (), 4) AS norm" +
      " FROM hist ORDER BY bucket"

  /** Turn-granularity histogram CTEs for the matching convs' turns (ts =
    * epoch + doc_id seconds, minute buckets) — the cumulative_cardinality /
    * rate oracles' shared base.
    */
  private def turnHistCtes(term: String): String =
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", tb AS (SELECT t2.conv_id, strftime(date_trunc('minute', TIMESTAMP '2024-01-01 00:00:00' + to_seconds(t2.doc_id)), '%Y-%m-%d %H:%M:%S') AS bucket" +
      " FROM t2 JOIN hits h ON t2.conv_id = h.conv_id)"

  /** cumulative_cardinality oracle: distinct matching convs seen in turn
    * buckets up to and including each bucket (first-seen cumulative form).
    */
  def cumulativeCardinalityOracleSql(term: String): String =
    turnHistCtes(term) +
      ", fs AS (SELECT conv_id, min(bucket) AS fb FROM tb GROUP BY 1)" +
      ", fsb AS (SELECT fb AS bucket, count(*) AS nf FROM fs GROUP BY 1)" +
      ", ab AS (SELECT DISTINCT bucket FROM tb)" +
      " SELECT ab.bucket, CAST(sum(coalesce(fsb.nf, 0)) OVER" +
      " (ORDER BY ab.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccard" +
      " FROM ab LEFT JOIN fsb ON ab.bucket = fsb.bucket ORDER BY ab.bucket"

  /** rate oracle: matching turns per minute bucket, reported per second. */
  def rateOracleSql(term: String): String =
    turnHistCtes(term) +
      ", h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS hits FROM tb GROUP BY 1)" +
      " SELECT bucket, hits, round(hits / 60.0, 4) AS rate FROM h ORDER BY bucket"

  /** boxplot oracle: exact linearly-interpolated five-number summary of the
    * matching convs' doc lengths (DuckDB quantile_cont = Spark percentile).
    */
  def boxplotOracleSql(term: String): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", v AS (SELECT CAST(dl.dl AS DOUBLE) AS x FROM hits h JOIN dl ON h.conv_id = dl.conv_id)" +
      " SELECT CAST(count(*) AS BIGINT) AS n, round(min(x), 4) AS min_v," +
      " round(quantile_cont(x, 0.25), 4) AS q1, round(quantile_cont(x, 0.5), 4) AS median," +
      " round(quantile_cont(x, 0.75), 4) AS q3, round(max(x), 4) AS max_v FROM v"

  /** distance_feature oracle: BM25 plus boost · pivot/(pivot + |t0 −
    * origin|) where t0 = seconds of the conv's min doc_id after the corpus
    * epoch (the deterministic ts derivation).
    */
  def distanceFeatureOracleSql(terms: Seq[String], k: Int, originSecs: Long,
      pivot: Double, boost: Double): String = {
    val tvals = terms.map(t => s"('$t')").mkString(", ")
    TurnsCte + TfCtes +
      s", q(term) AS (VALUES $tvals)" +
      ", qdf AS (SELECT q.term, count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1)" +
      ", contrib AS (SELECT tf.conv_id, ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf" +
      " / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c" +
      " FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", lex AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      ", t0 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, min(doc_id) AS t0 FROM documents GROUP BY 1)" +
      s", tot AS (SELECT l.conv_id, l.s + $boost * $pivot / ($pivot + abs(t0.t0 - $originSecs)) AS s" +
      " FROM lex l JOIN t0 ON l.conv_id = t0.conv_id)" +
      s", top AS (SELECT conv_id, s FROM tot ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** percentiles_bucket oracle: exact interpolated quartiles of the
    * histogram's per-bucket hit counts.
    */
  def percentilesBucketOracleSql(term: String): String =
    histCtes(term) +
      " SELECT round(quantile_cont(hits, 0.25), 4) AS p25," +
      " round(quantile_cont(hits, 0.5), 4) AS p50," +
      " round(quantile_cont(hits, 0.75), 4) AS p75 FROM hist"

  /** t_test (Welch) oracle: unpaired heteroscedastic t between the two
    * match sets' doc lengths, sample variances.
    */
  def tTestOracleSql(termA: String, termB: String): String =
    TurnsCte + TfCtes +
      s", ha AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$termA')" +
      s", hb AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$termB')" +
      ", sa AS (SELECT CAST(count(*) AS BIGINT) AS n_a, avg(CAST(dl.dl AS DOUBLE)) AS mean_a," +
      " var_samp(CAST(dl.dl AS DOUBLE)) AS var_a FROM ha JOIN dl ON ha.conv_id = dl.conv_id)" +
      ", sb AS (SELECT CAST(count(*) AS BIGINT) AS n_b, avg(CAST(dl.dl AS DOUBLE)) AS mean_b," +
      " var_samp(CAST(dl.dl AS DOUBLE)) AS var_b FROM hb JOIN dl ON hb.conv_id = dl.conv_id)" +
      " SELECT n_a, n_b, round(mean_a, 4) AS mean_a, round(mean_b, 4) AS mean_b," +
      " round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 4) AS t FROM sa, sb"

  /** change_point oracle: argmax over split points of |mean(left) −
    * mean(right)| on the minute histogram, ties on the earliest bucket.
    */
  def changePointOracleSql(term: String): String =
    histCtes(term) +
      ", o AS (SELECT bucket, hits, row_number() OVER (ORDER BY bucket) AS i," +
      " count(*) OVER () AS n, sum(hits) OVER (ORDER BY bucket" +
      " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum," +
      " sum(hits) OVER () AS tot FROM hist)" +
      ", s AS (SELECT bucket, CAST(cum - hits AS DOUBLE) / (i - 1) AS lm," +
      " CAST(tot - cum + hits AS DOUBLE) / (n - i + 1) AS rm FROM o WHERE i >= 2)" +
      " SELECT bucket, round(lm, 4) AS left_mean, round(rm, 4) AS right_mean," +
      " round(abs(lm - rm), 4) AS diff FROM s" +
      " ORDER BY abs(lm - rm) DESC, bucket ASC LIMIT 1"

  /** categorize_text oracle: digit-masked first-n-token templates of the
    * matching convs' turns, top buckets by turn count.
    */
  def categorizeTextOracleSql(term: String, nTokens: Int, size: Int): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", cat AS (SELECT array_to_string(list_slice(string_split(" +
      s"regexp_replace(t.text, '[0-9]+', '<num>', 'g'), ' '), 1, $nTokens), ' ') AS category" +
      " FROM turns t JOIN hits h ON t.conv_id = h.conv_id)" +
      " SELECT category, CAST(count(*) AS BIGINT) AS n_turns FROM cat" +
      " WHERE length(category) > 0 GROUP BY 1" +
      s" ORDER BY n_turns DESC, category ASC LIMIT $size"

  /** random_sampler oracle: md5(seed ‖ conv) first-byte sample of the match
    * set, count/sum of dl scaled by 256/numerator.
    */
  def randomSamplerOracleSql(term: String, numerator: Int, seed: String): String = {
    // mirror of the engine's 256-keeps-all boundary
    val where = if (numerator == 256) ""
      else f" WHERE substr(md5('$seed' || h.conv_id), 1, 2) < '$numerator%02x'"
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", smp AS (SELECT h.conv_id, CAST(dl.dl AS DOUBLE) AS v FROM hits h" +
      s" JOIN dl ON h.conv_id = dl.conv_id$where)" +
      " SELECT CAST(count(*) AS BIGINT) AS n_sampled," +
      s" round(count(*) * 256.0 / $numerator, 4) AS est_n_docs," +
      s" round(sum(v) * 256.0 / $numerator, 4) AS est_sum FROM smp"
  }

  /** variable_width_histogram oracle: SQL-standard NTILE equal-depth
    * buckets over (dl, conv) order, per-bucket count/min/centroid/max.
    */
  def varWidthHistOracleSql(term: String, buckets: Int): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", v AS (SELECT h.conv_id, CAST(dl.dl AS DOUBLE) AS x FROM hits h" +
      " JOIN dl ON h.conv_id = dl.conv_id)" +
      s", t AS (SELECT x, CAST(ntile($buckets) OVER (ORDER BY x, conv_id) AS BIGINT) AS bucket FROM v)" +
      " SELECT bucket, CAST(count(*) AS BIGINT) AS n, round(min(x), 4) AS min_v," +
      " round(avg(x), 4) AS centroid, round(max(x), 4) AS max_v FROM t" +
      " GROUP BY 1 ORDER BY 1"

  /** ids/mget oracle over the time-travel root's LIVE corpus (conv ordinal
    * % 10 = 0 deleted): found + stored dl per requested id.
    */
  def idsOracleSql(ids: Seq[String]): String = {
    val vals = ids.distinct.map(id => s"('$id')").mkString(", ")
    TurnsCte + TfCtes +
      ", alive AS (SELECT conv_id, CAST(dl AS BIGINT) AS dl FROM dl" +
      " WHERE CAST(substring(conv_id, 2) AS INT) % 10 <> 0)" +
      s", req(conv_id) AS (VALUES $vals)" +
      " SELECT r.conv_id, a.dl IS NOT NULL AS found, a.dl AS dl" +
      " FROM req r LEFT JOIN alive a ON r.conv_id = a.conv_id" +
      " ORDER BY r.conv_id"
  }

  /** has_child (min_children) oracle: parents by count of distinct turns
    * containing the term, floor applied.
    */
  def hasChildOracleSql(term: String, minChildren: Int): String =
    TurnsNestedCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      " SELECT split_part(conv_id, '#', 1) AS conv_id," +
      " CAST(count(*) AS BIGINT) AS n_children FROM hits GROUP BY 1" +
      s" HAVING count(*) >= $minChildren ORDER BY conv_id"

  /** has_parent oracle: every turn of each conv matching ALL terms at the
    * conversation level.
    */
  def hasParentOracleSql(terms: Seq[String]): String =
    TurnsCte + TfCtes +
      terms.zipWithIndex.map { case (t, i) =>
        s", h$i AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$t')"
      }.mkString +
      ", hit AS (" +
      terms.indices.map(i => s"SELECT conv_id FROM h$i").mkString(" INTERSECT ") +
      ") SELECT t.conv_id, t.turn_idx FROM turns t JOIN hit p" +
      " ON t.conv_id = p.conv_id ORDER BY t.conv_id, t.turn_idx"

  /** top_metrics oracle: per first-turn tool value of the matching convs,
    * the dl of the top conv under (min-ts desc, conv asc).
    */
  def topMetricsOracleSql(term: String): String =
    TurnsCte + TfCtes +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, source FROM documents)" +
      ", keyv AS (SELECT conv_id, min_by(source, doc_id) AS value FROM t2 GROUP BY 1)" +
      ", convts AS (SELECT conv_id, TIMESTAMP '2024-01-01 00:00:00' + to_seconds(min(doc_id)) AS ts FROM t2 GROUP BY 1)" +
      ", j AS (SELECT h.conv_id, k.value, c.ts AS sort_v, CAST(dl.dl AS DOUBLE) AS metric" +
      " FROM hits h JOIN keyv k ON h.conv_id = k.conv_id" +
      " JOIN convts c ON h.conv_id = c.conv_id JOIN dl ON h.conv_id = dl.conv_id" +
      " WHERE k.value IS NOT NULL)" +
      ", r AS (SELECT *, row_number() OVER (PARTITION BY value ORDER BY sort_v DESC, conv_id ASC) AS rn FROM j)" +
      " SELECT value, conv_id, strftime(sort_v, '%Y-%m-%d %H:%M:%S') AS sort_v," +
      " round(metric, 4) AS metric FROM r WHERE rn = 1 ORDER BY value"

  /** pinned oracle: live promoted ids first in given order (null score),
    * then the organic BM25 top-(k − pinned) with the pinned ids removed.
    */
  def pinnedOracleSql(promoted: Seq[String], terms: Seq[String], k: Int): String = {
    val pvals = promoted.zipWithIndex.map { case (p, i) => s"('$p', $i)" }.mkString(", ")
    val tvals = terms.map(t => s"('$t')").mkString(", ")
    val notIn = promoted.map(p => s"'$p'").mkString("(", ", ", ")")
    TurnsCte + TfCtes +
      s", promo(conv_id, pidx) AS (VALUES $pvals)" +
      ", live AS (SELECT p.conv_id, p.pidx FROM promo p" +
      " WHERE p.conv_id IN (SELECT DISTINCT conv_id FROM turns))" +
      ", lr AS (SELECT conv_id, CAST(row_number() OVER (ORDER BY pidx) AS BIGINT) AS rank FROM live)" +
      s", q(term) AS (VALUES $tvals)" +
      ", qdf AS (SELECT q.term, count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1)" +
      ", contrib AS (SELECT tf.conv_id, ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf" +
      " / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c" +
      " FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      s", scored AS (SELECT conv_id, sum(c) AS s FROM contrib WHERE conv_id NOT IN $notIn GROUP BY conv_id)" +
      ", org AS (SELECT conv_id, round(s, 4) AS score," +
      " CAST(row_number() OVER (ORDER BY s DESC, conv_id ASC) + (SELECT count(*) FROM live) AS BIGINT) AS rank FROM scored)" +
      " SELECT rank, conv_id, CAST(NULL AS DOUBLE) AS score FROM lr" +
      s" UNION ALL SELECT rank, conv_id, score FROM org WHERE rank <= $k" +
      " ORDER BY rank"
  }

  /** rank_feature (saturation over dl) oracle: BM25 plus
    * boost · dl/(dl + pivot), top-k.
    */
  def rankFeatureOracleSql(terms: Seq[String], k: Int, pivot: Double,
      boost: Double): String = {
    val tvals = terms.map(t => s"('$t')").mkString(", ")
    TurnsCte + TfCtes +
      s", q(term) AS (VALUES $tvals)" +
      ", qdf AS (SELECT q.term, count(tf.conv_id) AS df FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY 1)" +
      ", contrib AS (SELECT tf.conv_id, ln(1.0 + ((SELECT n FROM stats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * tf.tf" +
      " / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (SELECT avgdl FROM stats))) AS c" +
      " FROM tf JOIN qdf ON tf.term = qdf.term JOIN dl ON tf.conv_id = dl.conv_id)" +
      ", lex AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      s", tot AS (SELECT l.conv_id, l.s + $boost * dl.dl / (dl.dl + $pivot) AS s" +
      " FROM lex l JOIN dl ON l.conv_id = dl.conv_id)" +
      s", top AS (SELECT conv_id, s FROM tot ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** Per-conv doc-values frame: t0 = seconds since the corpus epoch of the
    * conv's first turn (= min doc_id under the deterministic ts derivation —
    * the Spark mirror of [[ConvT0Cte]]).
    */
  def t0Meta(spark: SparkSession, sfDir: String): DataFrame =
    transcripts(spark, sfDir).groupBy("conv_id")
      .agg((min(unix_timestamp(col("ts"))) -
        unix_timestamp(lit("2024-01-01 00:00:00"))).cast("double").as("t0"))

  /** [[t0Meta]] plus the deterministic per-conv weight (conv ordinal % 7)
    * + 1 — the weighted_avg test frame.
    */
  def t0wMeta(spark: SparkSession, sfDir: String): DataFrame =
    t0Meta(spark, sfDir).withColumn("w",
      expr("CAST(substring(conv_id, 2) AS INT) % 7 + 1").cast("double"))

  /** Per-conv string doc value: the first turn's tool — the string_stats
    * test frame (mirror of the oracle's arg_min(source, doc_id)).
    */
  def toolMeta(spark: SparkSession, sfDir: String): DataFrame =
    transcripts(spark, sfDir).groupBy("conv_id")
      .agg(min_by(col("tool"), col("turn_idx")).as("sv"))

  /** Transcripts view over the driver's documents table (Spark side). */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      format_string("c%05d", expr("doc_id div 5")).as("conv_id"),
      (col("doc_id") % 5).cast("int").as("turn_idx"),
      when(col("doc_id") % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
      col("text"),
      col("source").as("tool"),
      expr("timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, doc_id)").as("ts"))

  // one built index per (sfDir) per JVM — queries share it
  private val cache = TrieMap.empty[String, String]

  def indexRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(sfDir, {
      val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val root = s"/root/repo/target/idxcache/$safe"
      // fresh build each JVM: stale caches from older code versions must not
      // leak into verification
      val dir = new java.io.File(root)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      root
    })

  def reader(spark: SparkSession, sfDir: String): IndexReader =
    new IndexReader(spark, indexRoot(spark, sfDir), conf)

  /** The shared index root with the positional index additionally built
    * (phrase queries; content of the main index is untouched).
    */
  def posRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#pos", {
      val root = indexRoot(spark, sfDir)
      new IndexWriter(spark, root, conf).buildPositions(transcripts(spark, sfDir), "pos1")
      root
    })

  /** The analyzed-index fixture chain: lowercase + the six hottest corpus
    * stopwords + the S-stemmer ("minimal_english").
    */
  val analyzedChain: killa.tokenize.Analyzer.Chain =
    killa.tokenize.Analyzer.Chain(lowercase = true,
      stopwords = Seq("the", "a", "of", "and", "to", "in"), sStemmer = true)

  /** An ANALYZED index root: the same corpus built over
    * Analyzer.textCol(analyzedChain) — a plain fullBuild over transformed
    * input (the analyzed token stream re-joined on spaces round-trips
    * identically through the whitespace tokenizer), so every query and
    * maintenance path is inherited unchanged.
    */
  def analyzedRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#analyzed", {
      val root = freshRoot(sfDir, "analyzed")
      val t = transcripts(spark, sfDir).withColumn("text",
        killa.tokenize.Analyzer.textCol(col("text"), analyzedChain))
      new IndexWriter(spark, root, conf).fullBuild(t, "ab0")
      root
    })

  /** Analyzed index built on a 3-of-5-turns subset, then brought to the
    * full corpus via ONE ordinary maintenance batch whose text runs
    * through the SAME analyzer chain — the analyzed root needs no special
    * maintenance path precisely because analysis is a pure per-row text
    * transform ahead of the writer, and this fixture gates that the
    * composition really holds (stemmed tf merges and stopword-free dl
    * update correctly through the Indexer.Update diff).
    */
  def analyzedIncrRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#anincr", {
      val root = freshRoot(sfDir, "anincr")
      val all = transcripts(spark, sfDir).withColumn("text",
        killa.tokenize.Analyzer.textCol(col("text"), analyzedChain))
      new IndexWriter(spark, root, conf)
        .fullBuild(all.where(col("turn_idx") < 3), "ab0")
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .applyChanges(all, batchId = "ad1")
      root
    })

  /** Two shard roots over a conv-parity split of the SAME corpus — the
    * sharded dfs_query_then_fetch fixture: merged-stats search over these
    * must hash-match the single-corpus oracle.
    */
  /** A rolled-over index group over the full corpus: three conv-ordinal
    * batches ingested under a 40-live-doc cap — at sf0.01 (100 convs) the
    * first two batches share r000000 (34 + 34 docs; the cap is evaluated
    * before each batch, ES semantics), the third rolls to r000001. Search
    * over the group must hash-match the single-corpus oracle.
    */
  def rolloverGroup(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#rollover", {
      import org.apache.spark.sql.functions.expr
      val group = freshRoot(sfDir, "rollover")
      val t = transcripts(spark, sfDir)
      Seq((0, 34), (34, 68), (68, Int.MaxValue)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          val b = t.where(expr(
            s"CAST(substring(conv_id, 2) AS INT) >= $lo AND CAST(substring(conv_id, 2) AS INT) < $hi"))
          if (!b.isEmpty)
            killa.maintain.Rollover.ingest(spark, group, conf, b, 40L, s"roll$i")
      }
      group
    })

  def shardReaders(spark: SparkSession, sfDir: String): Seq[IndexReader] = {
    import org.apache.spark.sql.functions.expr
    val roots = Seq(0, 1).map { par =>
      cache.getOrElseUpdate(s"$sfDir#shard$par", {
        val r = freshRoot(sfDir, s"shard$par")
        val part = transcripts(spark, sfDir)
          .where(expr(s"CAST(substring(conv_id, 2) AS INT) % 2 = $par"))
        new IndexWriter(spark, r, conf).fullBuild(part, s"b-shard$par")
        r
      })
    }
    roots.map(new IndexReader(spark, _, conf))
  }

  /** A reader resolved through an index ALIAS that was flipped from a
    * partial root to the full corpus root — the zero-downtime reindex gate:
    * queries through the alias must see the post-flip corpus exactly.
    */
  def aliasedReader(spark: SparkSession, sfDir: String): IndexReader = {
    val dir = cache.getOrElseUpdate(s"$sfDir#aliasdir", {
      val d = freshRoot(sfDir, "aliasmeta")
      val partial = freshRoot(sfDir, "aliaspartial")
      new IndexWriter(spark, partial, conf)
        .fullBuild(transcripts(spark, sfDir).where(col("turn_idx") < 2), "b-part")
      killa.store.AliasStore.set(spark, d, "serve", partial)
      // the flip: the stable name re-points to the full index atomically
      killa.store.AliasStore.set(spark, d, "serve", indexRoot(spark, sfDir))
      d
    })
    killa.store.AliasStore.reader(spark, dir, "serve", conf)
  }

  /** Two shard roots built by the ROUTER's hash from a partial corpus, then
    * one routed maintenance batch bringing them to the full corpus — the
    * write-side sharding fixture: sharded search over these must hash-match
    * the single-corpus oracle.
    */
  def shardIncrReaders(spark: SparkSession, sfDir: String): Seq[IndexReader] = {
    val tag = s"$sfDir#shardincr"
    val roots = cache.synchronized {
      if (cache.contains(s"$tag-0")) Seq(cache(s"$tag-0"), cache(s"$tag-1"))
      else {
        val rs = Seq(0, 1).map(i => freshRoot(sfDir, s"shardincr$i"))
        val all = transcripts(spark, sfDir)
        killa.maintain.ShardRouter.fullBuild(spark, rs,
          all.where(col("turn_idx") < 3), conf)
        killa.maintain.ShardRouter.applyChanges(spark, rs, all, conf, "d1")
        rs.zipWithIndex.foreach { case (r, i) => cache.put(s"$tag-$i", r) }
        rs
      }
    }
    roots.map(new IndexReader(spark, _, conf))
  }

  /** Child (turn-granularity) index for nested same-turn queries — its own
    * root: the nested corpus has different docs/stats than the conv index.
    */
  def nestedReader(spark: SparkSession, sfDir: String): IndexReader = {
    val root = cache.getOrElseUpdate(s"$sfDir#nested", {
      val r = freshRoot(sfDir, "nested")
      killa.build.NestedIndex.build(spark, r, transcripts(spark, sfDir), conf)
      r
    })
    new IndexReader(spark, root, conf)
  }

  private def freshRoot(sfDir: String, variant: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val root = s"/root/repo/target/idxcache/$safe-$variant"
    val dir = new java.io.File(root)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    root
  }

  /** Index + positional index built on a 3-of-5-turns subset, then brought
    * to the full corpus via one incremental batch — the maintainer's
    * positions step (affected-bucket rewrite) must leave phrase queries
    * matching the full-corpus oracle exactly, with no positional rebuild.
    */
  def incrPhraseRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#iph", {
      val root = freshRoot(sfDir, "iph")
      val all = transcripts(spark, sfDir)
      val partial = all.where(col("turn_idx") < 3)
      new IndexWriter(spark, root, conf).fullBuild(partial, "b0")
      new IndexWriter(spark, root, conf).buildPositions(partial, "pos0")
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .applyChanges(all, batchId = "d1")
      root
    })

  /** Index built on a 3-of-5-turns subset, then brought to the full corpus
    * via one incremental update batch (Indexer.Update diff path) — queries
    * against it must match full-corpus oracles exactly.
    */
  def incrUpdateRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#upd", {
      val root = freshRoot(sfDir, "upd")
      val all = transcripts(spark, sfDir)
      new IndexWriter(spark, root, conf)
        .fullBuild(all.where(col("turn_idx") < 3), "b0")
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .applyChanges(all, batchId = "d1")
      root
    })

  /** Full index, then delete every 10th conversation incrementally. */
  def incrDeleteRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#del", {
      val root = freshRoot(sfDir, "del")
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      val victims = transcripts(spark, sfDir).select("conv_id").distinct()
        .where(expr("CAST(substring(conv_id, 2) AS INT) % 10 = 0"))
        .collect().map(_.getString(0)).toSeq
      new killa.maintain.IndexMaintainer(spark, root, conf).remove(victims, "d1")
      root
    })

  /** Full index, then remove a term subset from one doc (Indexer.Remove(doc,
    * terms) — SURVEY §2 op 7): df readback must equal the corpus minus
    * exactly those (conv, term) postings, with BM25-consistent dl shrink.
    */
  def removeTermsRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#rmt", {
      val root = freshRoot(sfDir, "rmt")
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .removeTerms("c00002", Seq("spark", "the"), "d1")
      root
    })

  /** Full index + positional index, then a multi-batch delete churn under a
    * TIGHT auto-compaction threshold (compactLogDirs = 3): the batch that
    * crosses the threshold folds the docs/forward logs AND reclaims the
    * dead docs' position rows mid-sequence; a final explicit compact picks
    * up the tail batch. Queries against the result must match the
    * final-corpus (every-10th-conv-deleted) oracle exactly — the driver
    * gate over VERDICT r3 missing #1 + #2.
    */
  def compactRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#cmp", {
      val root = freshRoot(sfDir, "cmp")
      val all = transcripts(spark, sfDir)
      new IndexWriter(spark, root, conf).fullBuild(all, "b0")
      new IndexWriter(spark, root, conf).buildPositions(all, "pos0")
      val maint = new killa.maintain.IndexMaintainer(spark, root,
        conf.copy(compactLogDirs = 3))
      val victims = transcripts(spark, sfDir).select("conv_id").distinct()
        .where(expr("CAST(substring(conv_id, 2) AS INT) % 10 = 0"))
        .collect().map(_.getString(0)).sorted.toSeq
      // 4 delete batches — the third crosses the 3-dir threshold
      victims.zipWithIndex.groupBy(_._2 % 4).toSeq.sortBy(_._1).foreach {
        case (g, vs) => maint.remove(vs.map(_._1), s"d$g")
      }
      maint.compact("final")
      root
    })

  /** Full index, then delete_by_query("spark"): every conv containing the
    * term leaves the index via the distributed match-set removal — searches
    * for any other term must match the spark-free corpus oracle exactly.
    */
  def dbqRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#dbq", {
      val root = freshRoot(sfDir, "dbq")
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .deleteByQuery(Seq("spark"), "d1")
      root
    })

  /** Resharding layout for the reindex gate: twice the buckets, much
    * smaller ranges/blocks than [[conf]] — every layout knob changes, so an
    * accidental dependence on the source layout cannot pass.
    */
  val reindexConf: Conf = conf.copy(nBuckets = 16, rangeDocs = 8, blockSize = 16)

  /** The plain corpus reindexed into [[reindexConf]] from the forward log
    * alone (no source table) — queries on the new root must match the
    * plain-corpus oracles exactly.
    */
  def reindexRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#reidx", {
      val src = indexRoot(spark, sfDir)
      val dst = freshRoot(sfDir, "reidx")
      new killa.maintain.IndexMaintainer(spark, src, conf)
        .reindexTo(dst, reindexConf)
      dst
    })

  /** Full index, then update_by_query("spark" → token rewrite to "meteor"):
    * every matching conv re-indexes through the minimal-diff update path;
    * searches on the mutated root must match the rewritten-corpus oracle.
    */
  def ubqRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#ubq", {
      val root = freshRoot(sfDir, "ubq")
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .updateByQuery(Seq("spark"), transcripts(spark, sfDir),
          expr("array_join(transform(split(text, ' '), x -> CASE WHEN x = 'spark' THEN 'meteor' ELSE x END), ' ')"),
          "u1")
      root
    })

  /** Transcripts CTE with the update-by-query token rewrite applied to the
    * matching convs — the corpus [[ubqRoot]]'s index must answer from.
    */
  val TurnsUbqCte: String =
    "WITH t0 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CAST(doc_id % 5 AS INT) AS turn_idx, text FROM documents)" +
      ", htoks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t0)" +
      ", hitconvs AS (SELECT DISTINCT conv_id FROM htoks WHERE term = 'spark')" +
      ", turns AS (SELECT conv_id, turn_idx, CASE WHEN conv_id IN (SELECT conv_id FROM hitconvs)" +
      " THEN array_to_string(list_transform(string_split(text, ' '), x -> CASE WHEN x = 'spark' THEN 'meteor' ELSE x END), ' ')" +
      " ELSE text END AS text FROM t0)"

  /** Per-role field indexes (killa.build.FieldIndexes) over the transcripts:
    * one sub-index per role value, each with its own restricted BM25 stats.
    */
  def fieldRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#fld", {
      val root = freshRoot(sfDir, "fld")
      killa.build.FieldIndexes.build(spark, root, transcripts(spark, sfDir), "role", conf)
      root
    })

  /** Per-role field indexes built on a 3-of-5-turns subset, then brought to
    * the full corpus via ONE maintenance batch routed through
    * FieldIndexes.applyChanges (VERDICT r4 missing #1: field sub-indexes had
    * no incremental path) — field-scoped queries against it must match the
    * full-corpus assistant oracle exactly, with the sub-index's own
    * incrementally-maintained stats.
    */
  def fieldIncrRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#fldincr", {
      val root = freshRoot(sfDir, "fldincr")
      val all = transcripts(spark, sfDir)
      val values = killa.build.FieldIndexes.build(
        spark, root, all.where(col("turn_idx") < 3), "role", conf)
      killa.build.FieldIndexes.applyChanges(
        spark, root, "role", values, all, batchId = "d1", conf = conf)
      root
    })

  /** Reversed-term sub-index (killa.build.ReverseIndex) over the
    * transcripts — suffix and leading-wildcard search.
    */
  def reverseIdxRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#rev", {
      val root = freshRoot(sfDir, "rev")
      killa.build.ReverseIndex.build(spark, root, transcripts(spark, sfDir), conf)
      root
    })

  /** Reversed index built on a 3-of-5-turns subset, then brought to the
    * full corpus via ONE maintenance batch routed through
    * ReverseIndex.applyChanges — suffix queries against it must match the
    * full-corpus oracle exactly (the same incremental gate field indexes
    * have).
    */
  def reverseIncrRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#revincr", {
      val root = freshRoot(sfDir, "revincr")
      val all = transcripts(spark, sfDir)
      killa.build.ReverseIndex.build(spark, root,
        all.where(col("turn_idx") < 3), conf)
      killa.build.ReverseIndex.applyChanges(spark, root, all,
        batchId = "d1", conf = conf)
      root
    })

  /** The shared index root with the trigram dictionary sub-index
    * additionally built (infix wildcard queries; main tree untouched).
    */
  def gramIdxRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#gram", {
      val root = indexRoot(spark, sfDir)
      killa.build.GramIndex.build(spark, root, conf)
      root
    })

  /** Gram index built over a 3-of-5-turns main index, then the main index
    * brought to the full corpus via one maintenance batch and the gram
    * index refreshed from the grown dictionary — infix queries against it
    * must match the full-corpus oracle exactly (the owed-maintenance gate
    * every sub-index carries).
    */
  def gramIncrRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#gramincr", {
      val root = freshRoot(sfDir, "gramincr")
      val all = transcripts(spark, sfDir)
      new IndexWriter(spark, root, conf).fullBuild(all.where(col("turn_idx") < 3), "b0")
      killa.build.GramIndex.build(spark, root, conf)
      new killa.maintain.IndexMaintainer(spark, root, conf)
        .applyChangesDf(all, None, batchId = "d1")
      killa.build.GramIndex.refresh(spark, root, conf)
      root
    })

  /** Time-travel root: full build, version captured, then every 10th conv
    * deleted — a reader pinned to the captured version must answer from the
    * PRE-delete corpus (Iceberg snapshot-read semantics; the engine's
    * manifest versions are exactly expire-able snapshots).
    */
  def ttRootVersion(spark: SparkSession, sfDir: String): (String, Int) = {
    val key = s"$sfDir#tt"
    val enc = cache.getOrElseUpdate(key, {
      val root = freshRoot(sfDir, "tt")
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      val v0 = killa.store.SegmentStore.latestVersion(spark, root)
        .getOrElse(sys.error(s"no committed snapshot at $root"))
      val victims = transcripts(spark, sfDir).select("conv_id").distinct()
        .where(expr("CAST(substring(conv_id, 2) AS INT) % 10 = 0"))
        .collect().map(_.getString(0)).toSeq
      new killa.maintain.IndexMaintainer(spark, root, conf).remove(victims, "d1")
      s"$root|$v0"
    })
    val Array(root, v) = enc.split('|')
    (root, v.toInt)
  }

  /** Full index, then rename c00001 → z99999 (Indexer.Switch rename path). */
  def incrRenameRoot(spark: SparkSession, sfDir: String): String =
    cache.getOrElseUpdate(s"$sfDir#ren", {
      val root = freshRoot(sfDir, "ren")
      new IndexWriter(spark, root, conf).fullBuild(transcripts(spark, sfDir), "b0")
      new killa.maintain.IndexMaintainer(spark, root, conf).rename("c00001", "z99999", "d1")
      root
    })

  /** Analyzed-token CTE chain: tok2 re-analyzed under [[analyzedChain]]
    * (lowercase → stop → S-stem), with its own tf/dl/stats — the oracle's
    * independent recomputation of the analyzed index's statistics space.
    */
  def analyzedTfCtes: String = {
    val stops = analyzedChain.stopwords.map(w => s"'$w'").mkString(", ")
    val stemmed = killa.tokenize.Analyzer.stemSql("lower(term)")
    s", atok0 AS (SELECT conv_id, $stemmed AS term FROM tok2 WHERE lower(term) NOT IN ($stops))" +
      // a bare "s" stems to "" and is dropped like an empty token
      ", atok AS (SELECT conv_id, term FROM atok0 WHERE term <> '')" +
      ", atf AS (SELECT conv_id, term, count(*) AS tf FROM atok GROUP BY 1, 2)" +
      ", adl AS (SELECT conv_id, sum(tf) AS dl FROM atf GROUP BY 1)" +
      ", astats AS (SELECT (SELECT count(DISTINCT conv_id) FROM turns) AS n, " +
      "(SELECT CAST(sum(dl) AS DOUBLE) FROM adl) / (SELECT count(DISTINCT conv_id) FROM turns) AS avgdl)"
  }

  /** BM25 oracle over the ANALYZED statistics space (terms already
    * query-side analyzed by the caller).
    */
  def analyzedBm25OracleSql(terms: Seq[String], k: Int): String = {
    val vals = terms.zipWithIndex.map { case (t, i) => s"('$t', $i)" }.mkString(", ")
    TurnsCte + TfCtes + analyzedTfCtes +
      s", q(term, tidx) AS (VALUES $vals)" +
      ", qdf AS (SELECT q.term, q.tidx, count(atf.conv_id) AS df FROM q LEFT JOIN atf ON atf.term = q.term GROUP BY 1, 2)" +
      ", contrib AS (SELECT atf.conv_id, qdf.tidx, " +
      "ln(1.0 + ((SELECT n FROM astats) - qdf.df + 0.5) / (qdf.df + 0.5)) * (1.2 + 1.0) * atf.tf " +
      "/ (atf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * adl.dl / (SELECT avgdl FROM astats))) AS c " +
      "FROM atf JOIN qdf ON atf.term = qdf.term JOIN adl ON atf.conv_id = adl.conv_id)" +
      ", scored AS (SELECT conv_id, sum(c) AS s FROM contrib GROUP BY conv_id)" +
      s", top AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"
  }

  /** Top-hits oracle: per-role top-`nPer` of the exact scored set with
    * in-bucket ranks — the SQL mirror of IndexReader.topHitsAgg over the
    * deterministic doc_id%2 role derivation.
    */
  def topHitsOracleSql(terms: Seq[String], nPer: Int): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) +
      ", rolev AS (SELECT DISTINCT printf('c%05d', doc_id // 5) AS conv_id, " +
      "CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS value FROM documents)" +
      ", ranked AS (SELECT r.value, s.conv_id, s.s, " +
      "row_number() OVER (PARTITION BY r.value ORDER BY s.s DESC, s.conv_id ASC) AS rn " +
      "FROM scored s JOIN rolev r ON s.conv_id = r.conv_id)" +
      s" SELECT value, CAST(rn AS INT) AS rank, conv_id, round(s, 4) AS score" +
      s" FROM ranked WHERE rn <= $nPer ORDER BY value ASC, rank ASC"

  /** Sampler-terms oracle: the terms agg (value = per-turn source) computed
    * over only the exact top-`sampleSize` hits.
    */
  def samplerTermsOracleSql(terms: Seq[String], sampleSize: Int, size: Int): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) +
      s", samp AS (SELECT conv_id FROM scored ORDER BY s DESC, conv_id ASC LIMIT $sampleSize)" +
      ", vals AS (SELECT DISTINCT printf('c%05d', doc_id // 5) AS conv_id, source AS value FROM documents WHERE source IS NOT NULL)" +
      ", cnt AS (SELECT v.value, CAST(count(*) AS BIGINT) AS n_docs FROM samp p JOIN vals v ON p.conv_id = v.conv_id GROUP BY 1)" +
      s" SELECT value, n_docs FROM cnt ORDER BY n_docs DESC, value ASC LIMIT $size"

  /** Diversified-sampler oracle: per-group (conv ordinal % 7 — one group per
    * conv) contribution capped at `maxPer` before the top-`sampleSize`
    * sample, then the same terms agg.
    */
  def diversifiedTermsOracleSql(terms: Seq[String], maxPer: Int,
      sampleSize: Int, size: Int): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) +
      ", grps AS (SELECT conv_id, 'g' || CAST(CAST(substr(conv_id, 2) AS INT) % 7 AS VARCHAR) AS dk FROM (SELECT DISTINCT conv_id FROM turns))" +
      ", dranked AS (SELECT s.conv_id, s.s, row_number() OVER (PARTITION BY g.dk ORDER BY s.s DESC, s.conv_id ASC) AS dr " +
      "FROM scored s JOIN grps g ON s.conv_id = g.conv_id)" +
      s", samp AS (SELECT conv_id FROM dranked WHERE dr <= $maxPer ORDER BY s DESC, conv_id ASC LIMIT $sampleSize)" +
      ", vals AS (SELECT DISTINCT printf('c%05d', doc_id // 5) AS conv_id, source AS value FROM documents WHERE source IS NOT NULL)" +
      ", cnt AS (SELECT v.value, CAST(count(*) AS BIGINT) AS n_docs FROM samp p JOIN vals v ON p.conv_id = v.conv_id GROUP BY 1)" +
      s" SELECT value, n_docs FROM cnt ORDER BY n_docs DESC, value ASC LIMIT $size"

  /** Auto-date-histogram oracle: the same fixed interval ladder, the same
    * span-bucket fit rule floor(hi/i) − floor(lo/i) + 1 ≤ target, epochs
    * reproduced from the deterministic `2024-01-01 + doc_id seconds`
    * derivation (corpus epoch 1704067200).
    */
  def autoDateHistogramOracleSql(term: String, target: Int): String = {
    val ladder = Seq(1L, 60L, 3600L, 86400L, 7L * 86400L, 30L * 86400L,
      365L * 86400L)
    val cases = ladder.init.map(i =>
      s"WHEN hi // $i - lo // $i + 1 <= $target THEN $i").mkString(" ")
    "WITH t2 AS (SELECT printf('c%05d', doc_id // 5) AS conv_id, doc_id, text FROM documents)" +
      ", toks AS (SELECT conv_id, unnest(string_split(text, ' ')) AS term FROM t2)" +
      s", hits AS (SELECT DISTINCT conv_id FROM toks WHERE term = '$term')" +
      ", conve AS (SELECT conv_id, 1704067200 + min(doc_id) AS e FROM t2 GROUP BY 1)" +
      ", me AS (SELECT c.conv_id, c.e FROM conve c JOIN hits h ON c.conv_id = h.conv_id)" +
      ", mm AS (SELECT min(e) AS lo, max(e) AS hi FROM me)" +
      s", iv AS (SELECT CASE $cases ELSE ${ladder.last} END AS i FROM mm)" +
      " SELECT strftime(TIMESTAMP '1970-01-01 00:00:00' + to_seconds((e // (SELECT i FROM iv)) * (SELECT i FROM iv)), '%Y-%m-%d %H:%M:%S') AS bucket, " +
      "CAST(count(*) AS BIGINT) AS hits, CAST((SELECT i FROM iv) AS BIGINT) AS interval_secs " +
      "FROM me GROUP BY 1 ORDER BY 1"
  }

  /** Matrix-stats oracle: sample moments between t0 and the deterministic
    * per-conv weight over the match set — the SQL mirror of
    * IndexReader.matrixStatsAgg on the t0wMeta frame.
    */
  def matrixStatsOracleSql(term: String): String =
    TurnsCte + TfCtes + ConvT0Cte +
      s", hits AS (SELECT DISTINCT conv_id FROM tok2 WHERE term = '$term')" +
      ", mw AS (SELECT c.conv_id, c.t0, CAST(CAST(substr(c.conv_id, 2) AS INT) % 7 + 1 AS DOUBLE) AS wv " +
      "FROM convt0 c JOIN hits h ON c.conv_id = h.conv_id)" +
      " SELECT CAST(count(*) AS BIGINT) AS n, round(avg(t0), 4) AS mean1, " +
      "round(avg(wv), 4) AS mean2, round(var_samp(t0), 4) AS var1, " +
      "round(var_samp(wv), 4) AS var2, round(covar_samp(t0, wv), 4) AS covar, " +
      "round(corr(t0, wv), 4) AS pearson FROM mw"

  /** Significant-text oracle: significantTermsOracleSql's JLH chain with the
    * foreground sampled to the exact BM25 top-`sampleSize` of the probe
    * term's scored set.
    */
  def significantTextOracleSql(term: String, sampleSize: Int, n: Int): String =
    TurnsCte + TfCtes + plainScoredCtes(Seq(term)) +
      s", fg AS (SELECT conv_id FROM scored ORDER BY s DESC, conv_id ASC LIMIT $sampleSize)" +
      ", fgn AS (SELECT CAST(count(*) AS DOUBLE) AS fn FROM fg)" +
      ", fgdf AS (SELECT tf.term, count(*) AS fg_df FROM tf JOIN fg ON tf.conv_id = fg.conv_id GROUP BY 1)" +
      ", bgdf AS (SELECT term, count(*) AS bg_df FROM tf GROUP BY 1)" +
      ", r AS (SELECT f.term, f.fg_df, b.bg_df," +
      " CAST(f.fg_df AS DOUBLE) / (SELECT fn FROM fgn) AS fr," +
      " CAST(b.bg_df AS DOUBLE) / CAST((SELECT n FROM stats) AS DOUBLE) AS br" +
      s" FROM fgdf f JOIN bgdf b ON f.term = b.term WHERE f.term <> '$term')" +
      ", sx AS (SELECT term, fg_df, bg_df, (fr - br) * (fr / br) AS sc FROM r WHERE fr > br)" +
      s", top AS (SELECT * FROM sx ORDER BY sc DESC, term ASC LIMIT $n)" +
      " SELECT term, fg_df, bg_df, round(sc, 4) AS score FROM top" +
      " ORDER BY score DESC, term ASC"

  /** Linear-retriever oracle: both sources' top-`window` scores min-max
    * normalized within their window (all-equal → 1.0), weighted sum over the
    * outer join — the SQL mirror of IndexReader.linearHybridTopK with the
    * same conv-level cosine source as rrfOracleSql (4dp-rounded cosines,
    * bruteForceTopK's convention).
    */
  def linearHybridOracleSql(terms: Seq[String], k: Int, window: Int,
      wLex: Double, wOther: Double): String =
    TurnsCte + TfCtes + plainScoredCtes(terms) +
      s", lexw AS (SELECT conv_id, s FROM scored ORDER BY s DESC, conv_id ASC LIMIT $window)" +
      ", lexn AS (SELECT conv_id, CASE WHEN (SELECT max(s) FROM lexw) = (SELECT min(s) FROM lexw) THEN 1.0 " +
      "ELSE (s - (SELECT min(s) FROM lexw)) / ((SELECT max(s) FROM lexw) - (SELECT min(s) FROM lexw)) END AS nl FROM lexw)" +
      ", ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id % 5 = 0)" +
      ", qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings WHERE vec_id = 0)" +
      ", vsx AS (SELECT printf('c%05d', vec_id // 5) AS conv_id, " +
      "round(list_dot_product(ev.v, qv.v) / (sqrt(list_dot_product(ev.v, ev.v)) * sqrt(list_dot_product(qv.v, qv.v))), 4) AS cs" +
      " FROM ev, qv WHERE ev.vec_id <> 0)" +
      s", vw AS (SELECT conv_id, cs FROM vsx ORDER BY cs DESC, conv_id ASC LIMIT $window)" +
      ", vn AS (SELECT conv_id, CASE WHEN (SELECT max(cs) FROM vw) = (SELECT min(cs) FROM vw) THEN 1.0 " +
      "ELSE (cs - (SELECT min(cs) FROM vw)) / ((SELECT max(cs) FROM vw) - (SELECT min(cs) FROM vw)) END AS nv FROM vw)" +
      s", fused AS (SELECT coalesce(l.conv_id, v.conv_id) AS conv_id," +
      s" $wLex * coalesce(l.nl, 0.0) + $wOther * coalesce(v.nv, 0.0) AS s" +
      " FROM lexn l FULL OUTER JOIN vn v ON l.conv_id = v.conv_id)" +
      s", top AS (SELECT conv_id, s FROM fused ORDER BY s DESC, conv_id ASC LIMIT $k)" +
      " SELECT conv_id, round(s, 4) AS score FROM top ORDER BY score DESC, conv_id ASC"

  /** Final presentation ordering shared with the oracles: selection happens
    * on exact scores inside the engine; display rounds to 4dp and re-sorts on
    * (rounded score desc, conv_id asc) so both sides order identically even
    * when rounding collapses near-ties.
    */
  def present(hits: DataFrame): DataFrame =
    hits.withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("conv_id").asc)
}

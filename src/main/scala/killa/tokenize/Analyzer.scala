package killa.tokenize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Analysis chain on top of the reference's whitespace tokenizer — the
  * Elasticsearch analyzer model (char filters → tokenizer → token filters)
  * with the three workhorse token filters: `lowercase`, `stop` (stopword
  * removal), and a light English stemmer. The reference indexes raw tokens
  * only (WhitespaceTokenizer.cs:8-10); ES search quality comes largely from
  * this layer, so the engine exposes it as a PRE-INDEX text transform plus
  * the matching query-time term analysis — the two sides must use the same
  * chain, exactly like ES ties `analyzer`/`search_analyzer` to a field.
  *
  * The stemmer is Harman's S-stemmer ("minimal_english" in ES terms), chosen
  * over Porter deliberately: its three suffix rules are expressible as pure
  * codegen Column CASEs AND as portable SQL, so analyzed indexes stay
  * independently oracle-checkable; Porter's 60-rule cascade is not.
  *
  *  - `…ies → …y`   unless ending `eies` / `aies`   (studies → study)
  *  - `…es  → …e`   unless ending `aes` / `ees` / `oes`  (tables → table)
  *  - `…s   → …`    unless ending `us` / `ss`       (scans → scan, class stays)
  *
  * Everything here is a Column (whole-stage codegen; the analyzed build's
  * tokenize stage stays UDF-free) with scalar twins for the query side,
  * property-pinned equal in AnalyzerSpec part of Round5qSpec.
  */
object Analyzer {

  /** One analysis chain: applied in ES filter order — lowercase, then stop,
    * then stem (stopwords are matched on the lowercased form).
    */
  final case class Chain(
      lowercase: Boolean = true,
      stopwords: Seq[String] = Nil,
      sStemmer: Boolean = false) extends Serializable {
    require(stopwords.forall(w => w != null && w.nonEmpty),
      "stopwords must be non-empty strings")
  }

  /** S-stemmer over one token column. Rule selection is on the ENDING
    * alone and terminal (Harman's original): a word ending `…oes` hits the
    * `es` rule, fails its exception, and stays UNCHANGED — it must not fall
    * through to the bare-`s` rule ("goes" stays "goes", never "goe").
    */
  def stemCol(w: Column): Column = {
    val n = length(w)
    when(w.endsWith("ies"),
      when(!w.endsWith("eies") && !w.endsWith("aies"),
        concat(w.substr(lit(1), n - 3), lit("y"))).otherwise(w))
      .when(w.endsWith("es"),
        when(!w.endsWith("aes") && !w.endsWith("ees") && !w.endsWith("oes"),
          w.substr(lit(1), n - 1)).otherwise(w))
      .when(w.endsWith("s"),
        when(!w.endsWith("us") && !w.endsWith("ss"),
          w.substr(lit(1), n - 1)).otherwise(w))
      .otherwise(w)
  }

  /** Scalar twin of [[stemCol]] (query-side analysis + property tests). */
  def stem(w: String): String = {
    def ends(sfx: String) = w.endsWith(sfx)
    if (ends("ies"))
      if (!ends("eies") && !ends("aies")) w.substring(0, w.length - 3) + "y" else w
    else if (ends("es"))
      if (!ends("aes") && !ends("ees") && !ends("oes")) w.substring(0, w.length - 1) else w
    else if (ends("s"))
      if (!ends("us") && !ends("ss")) w.substring(0, w.length - 1) else w
    else w
  }

  /** Analyzed token array of a text column: whitespace tokenize, then the
    * chain's filters, all inside codegen (split + higher-order
    * transform/filter — no UDF).
    */
  def termsCol(text: Column, chain: Chain): Column = {
    var arr = Tokenize.termsCol(text)
    if (chain.lowercase) arr = transform(arr, t => lower(t))
    if (chain.stopwords.nonEmpty) {
      val stops = chain.stopwords.map(_.toLowerCase)
      arr = filter(arr, t => !t.isin(stops: _*))
    }
    if (chain.sStemmer) {
      // the bare token "s" stems to "" — drop it like the tokenizer would
      arr = filter(transform(arr, t => stemCol(t)), t => length(t) > 0)
    }
    arr
  }

  /** Analyzed TEXT column: the analyzed tokens re-joined on single spaces.
    * Because the index tokenizer is exactly "split on one space, drop
    * empties", indexing this text is identical to indexing the analyzed
    * token stream — the analyzed index is a plain [[killa.build.IndexWriter]]
    * build over transformed input, no writer changes, every maintenance and
    * query path inherited unchanged.
    */
  def textCol(text: Column, chain: Chain): Column =
    concat_ws(" ", termsCol(text, chain))

  /** Query-side term analysis: the same chain applied to one query term.
    * None ⇒ the term analyzed away entirely (it was a stopword) — ES
    * convention: such a clause matches nothing on its own and drops out of
    * disjunctions.
    */
  def analyzeTerm(term: String, chain: Chain): Option[String] = {
    if (term == null || term.isEmpty) return None
    var t = term
    if (chain.lowercase) t = t.toLowerCase
    if (chain.stopwords.exists(_.equalsIgnoreCase(t))) return None
    if (chain.sStemmer) t = stem(t)
    if (t.isEmpty) None else Some(t)
  }

  /** Scalar twin of [[termsCol]] (tests + driver-side probes). */
  def analyze(text: String, chain: Chain): Seq[String] =
    WhitespaceTokenizer.tokenize(text).toSeq
      .flatMap(t => analyzeTerm(t, chain))

  /** DuckDB SQL expression mirroring [[stemCol]] over a column expression
    * `e` — used by the oracle builders so analyzed-index queries stay
    * independently checkable.
    */
  def stemSql(e: String): String =
    s"CASE WHEN $e LIKE '%ies' THEN" +
      s" (CASE WHEN $e NOT LIKE '%eies' AND $e NOT LIKE '%aies'" +
      s" THEN substr($e, 1, length($e) - 3) || 'y' ELSE $e END)" +
      s" WHEN $e LIKE '%es' THEN" +
      s" (CASE WHEN $e NOT LIKE '%aes' AND $e NOT LIKE '%ees' AND $e NOT LIKE '%oes'" +
      s" THEN substr($e, 1, length($e) - 1) ELSE $e END)" +
      s" WHEN $e LIKE '%s' THEN" +
      s" (CASE WHEN $e NOT LIKE '%us' AND $e NOT LIKE '%ss'" +
      s" THEN substr($e, 1, length($e) - 1) ELSE $e END)" +
      s" ELSE $e END"
}

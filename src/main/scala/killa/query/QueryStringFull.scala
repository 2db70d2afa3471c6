package killa.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full query-string language — the Elasticsearch `query_string` query
  * (Lucene classic QueryParser), the strict superset of
  * [[QueryString]]'s simple dialect: everything a reference user can type
  * into `q=` compiles onto the engine's existing pruned surfaces.
  *
  * Grammar on top of the simple dialect:
  *   - `AND` / `&&`, `OR` / `||`, `NOT` keyword operators (the classic
  *     parser's spelling of `+` / `|` / `-`; mixed spellings compose)
  *   - `field:value` scopes a clause to a field sub-index
  *     ([[killa.build.FieldIndexes]]): it matches conversations holding at
  *     least one turn with that field value. FILTER context — it
  *     constrains, it does not score (the ES bool `filter` clause
  *     semantics; a per-value sub-index has its own statistics, so folding
  *     its scores into the main ranking would mix incomparable weight
  *     spaces — [[killa.build.FieldIndexes.multiFieldBm25]] is the scored
  *     cross-field surface).
  *   - `[a TO b]` / `{a TO b}` term-range clauses, bounds inclusive /
  *     exclusive per bracket, `*` for an open bound. Filter context
  *     (Lucene rewrites multi-term queries constant-score; here they
  *     simply don't contribute BM25 terms).
  *   - `word~` / `word~1` / `word~2` fuzzy clauses — OSA distance (the ES
  *     fuzziness family default, transpositions count one edit), bare `~`
  *     = distance 2 (Lucene's default). Filter context.
  *   - `w?rd` / `w*rd*` wildcard clauses (`?` one char, `*` any run
  *     anywhere but not a pure trailing run). Filter context. A TRAILING
  *     `*` alone stays a scoring prefix clause (the simple dialect's
  *     deterministic dictionary expansion).
  *   - `(...)^2` group boosts — the boost multiplies every scoring term
  *     inside the group (nested groups multiply through).
  *
  * Scoring: positive plain terms, phrase members, and prefix expansions
  * contribute standard global-stats BM25 exactly as [[QueryString]];
  * filter-context clauses shape the match set only. A query with NO
  * scoring terms (pure filter, e.g. `role:assistant AND [so TO st]`)
  * returns its match set constant-scored at 1.0, conv asc — Lucene's
  * ConstantScore(filter) with the default boost.
  *
  * Shape at scale: every leaf is a pruned engine surface (membership /
  * range / wildcard / fuzzy scans, sub-index metadata), the set algebra
  * stays distributed, and ranking rides the DAAT kernel with the match
  * set as an include cursor ([[IndexReader.bm25TopKFiltered]]) — pruning
  * stays exact, nothing is post-filtered.
  *
  * Default operator is OR (`defaultAnd = false`) — the ES `query_string`
  * default, unlike the simple dialect's AND.
  */
object QueryStringFull {

  sealed trait Node
  final case class Term(t: String, boost: Double = 1.0) extends Node
  final case class Prefix(p: String, boost: Double = 1.0) extends Node
  final case class Phrase(terms: Seq[String], slop: Int = 0,
      boost: Double = 1.0) extends Node
  final case class Fuzzy(t: String, maxDist: Int) extends Node
  final case class Wildcard(mask: String) extends Node
  final case class Range(lo: Option[String], hi: Option[String],
      incLo: Boolean, incHi: Boolean) extends Node
  final case class Scoped(field: String, value: String) extends Node
  final case class Group(pos: Seq[(Boolean, Node)], neg: Seq[Node],
      boost: Double = 1.0) extends Node

  // ---- lexer ----------------------------------------------------------------

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private final case class RANGE(lo: String, hi: String, incLo: Boolean,
      incHi: Boolean) extends Tok
  private case object PIPE extends Tok
  private case object PLUS extends Tok
  private case object MINUS extends Tok
  private final case class WORD(w: String) extends Tok
  private final case class QUOTED(terms: Seq[String], slop: Int) extends Tok
  private final case class BOOST(b: Double) extends Tok // ^N after ')'

  private def lex(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = q.length
    def isWordChar(c: Char): Boolean =
      !c.isWhitespace && "()[]{}\"|".indexOf(c) < 0
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') {
        i += 1
        // group boost: )^2.5 binds to the group just closed
        if (i < n && q(i) == '^') {
          val s = i + 1
          var j = s
          while (j < n && isWordChar(q(j))) j += 1
          val b = try q.substring(s, j).toDouble catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"bad group boost '${q.substring(s, j)}' in: $q")
          }
          require(b > 0.0, s"group boost must be > 0 in: $q")
          out += RP; out += BOOST(b); i = j
        } else out += RP
      } else if (c == '[' || c == '{') {
        val incLo = c == '['
        val close = q.indexWhere(ch => ch == ']' || ch == '}', i)
        require(close > i, s"unclosed range starting at '$c' in: $q")
        val incHi = q(close) == ']'
        val body = q.substring(i + 1, close).trim.split("\\s+").toSeq
        require(body.length == 3 && body(1).equalsIgnoreCase("TO"),
          s"range must be '[lo TO hi]': '${q.substring(i, close + 1)}'")
        out += RANGE(body(0), body(2), incLo, incHi)
        i = close + 1
      } else if (c == '"') {
        val close = q.indexOf('"', i + 1)
        require(close > i, s"unclosed quote in: $q")
        val terms = q.substring(i + 1, close).trim.split("\\s+")
          .filter(_.nonEmpty).toSeq
        i = close + 1
        var slop = 0
        if (i < n && q(i) == '~') {
          val s = i + 1
          var j = s
          while (j < n && q(j).isDigit) j += 1
          require(j > s, s"'~' after a phrase needs a slop number in: $q")
          slop = q.substring(s, j).toInt
          i = j
        }
        out += QUOTED(terms, slop)
      } else if (c == '|') { out += PIPE; i += (if (i + 1 < n && q(i + 1) == '|') 2 else 1) }
      else if (c == '&' && i + 1 < n && q(i + 1) == '&') { out += PLUS; i += 2 }
      else if (c == '+') { out += PLUS; i += 1 }
      else if (c == '-') { out += MINUS; i += 1 }
      else {
        var j = i
        while (j < n && isWordChar(q(j))) j += 1
        require(j > i, s"unexpected character '$c' at $i in: $q")
        q.substring(i, j) match {
          case "AND" => out += PLUS
          case "OR"  => out += PIPE
          case "NOT" => out += MINUS
          case w     => out += WORD(w)
        }
        i = j
      }
    }
    out.result()
  }

  // ---- parser ---------------------------------------------------------------

  def parse(q: String, defaultAnd: Boolean = false): Group = {
    val (g, rest) = parseGroup(lex(q), defaultAnd, inner = false)
    require(rest.isEmpty, s"unbalanced ')' in: $q")
    g
  }

  private def parseGroup(toks: List[Tok], defaultAnd: Boolean,
      inner: Boolean): (Group, List[Tok]) = {
    val pos = Seq.newBuilder[(Boolean, Node)]
    val neg = Seq.newBuilder[Node]
    var nPos = 0
    var rest = toks
    var pendingOr: Option[Boolean] = None
    var pendingNeg = false
    while (rest.nonEmpty && rest.head != RP) {
      rest.head match {
        case PIPE => require(!pendingNeg, "operator after NOT"); pendingOr = Some(true); rest = rest.tail
        case PLUS => require(!pendingNeg, "operator after NOT"); pendingOr = Some(false); rest = rest.tail
        case MINUS => pendingNeg = true; rest = rest.tail
        case _ =>
          val (node, r2) = parseAtom(rest, defaultAnd)
          rest = r2
          if (pendingNeg) neg += node
          else {
            pos += ((nPos > 0 && pendingOr.getOrElse(!defaultAnd), node))
            nPos += 1
          }
          pendingOr = None
          pendingNeg = false
      }
    }
    require(!pendingNeg && pendingOr.isEmpty, "dangling operator at end of group")
    require(rest.nonEmpty || !inner, "unbalanced '(': group never closed")
    if (rest.nonEmpty) rest = rest.tail // consume RP
    (Group(pos.result(), neg.result()), rest)
  }

  private def parseAtom(toks: List[Tok], defaultAnd: Boolean): (Node, List[Tok]) =
    toks match {
      case LP :: t =>
        val (g, rest) = parseGroup(t, defaultAnd, inner = true)
        rest match {
          case BOOST(b) :: r2 => (g.copy(boost = b), r2)
          case _              => (g, rest)
        }
      case QUOTED(terms, slop) :: t =>
        require(terms.nonEmpty, "empty phrase")
        (Phrase(terms, slop), t)
      case RANGE(lo, hi, il, ih) :: t =>
        val loB = if (lo == "*") None else Some(lo)
        val hiB = if (hi == "*") None else Some(hi)
        (Range(loB, hiB, il, ih), t)
      case WORD(w0) :: t =>
        (word(w0), t)
      case other =>
        throw new IllegalArgumentException(s"expected a clause, got $other")
    }

  /** One bare word → leaf node: field scope, then ^boost, then ~fuzz, then
    * wildcard/prefix classification.
    */
  private def word(w0: String): Node = {
    // field scope: a single ':' with literal field and value parts
    val colonIx = w0.indexOf(':')
    if (colonIx > 0) {
      val f = w0.substring(0, colonIx)
      val v = w0.substring(colonIx + 1)
      require(v.nonEmpty && !v.contains(':'), s"bad field clause '$w0'")
      require(!f.exists("*?~^".contains(_)) && !v.exists("*?~^".contains(_)),
        s"field clauses take no operators: '$w0'")
      return Scoped(f, v)
    }
    // ^boost suffix
    val (w1, boost) = w0.lastIndexOf('^') match {
      case -1 => (w0, 1.0)
      case ix =>
        val b = w0.substring(ix + 1)
        val d = try b.toDouble catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"bad boost '$b' in '$w0'")
        }
        require(d > 0.0, s"boost must be > 0 in '$w0'")
        (w0.substring(0, ix), d)
    }
    require(w1.nonEmpty, s"empty term in '$w0'")
    // ~fuzz suffix (bare ~ = Lucene's default distance 2)
    val tildeIx = w1.lastIndexOf('~')
    if (tildeIx >= 0) {
      require(boost == 1.0, "fuzzy clauses take no boost")
      val base = w1.substring(0, tildeIx)
      val d = w1.substring(tildeIx + 1)
      require(base.nonEmpty && !base.exists("*?~".contains(_)),
        s"bad fuzzy clause '$w0'")
      val dist = if (d.isEmpty) 2 else {
        require(d.forall(_.isDigit), s"bad fuzzy distance '$d' in '$w0'")
        d.toInt
      }
      require(dist >= 1 && dist <= 2, s"fuzzy distance must be 1 or 2: '$w0'")
      return Fuzzy(base, dist)
    }
    val isTrailingPrefix = w1.endsWith("*") &&
      !w1.dropRight(1).exists("*?".contains(_)) && !w1.contains("?")
    if (isTrailingPrefix) {
      require(boost == 1.0, "prefix clauses take no boost")
      val p = w1.dropRight(1)
      require(p.nonEmpty, "bare '*' is not a clause")
      Prefix(p)
    } else if (w1.exists("*?".contains(_))) {
      require(boost == 1.0, "wildcard clauses take no boost")
      Wildcard(w1)
    } else Term(w1, boost)
  }

  // ---- planner --------------------------------------------------------------

  /** Resolves a `field:value` clause to its sub-index reader, or None if the
    * field/value pair has no built sub-index (then the clause matches
    * nothing — ES's behavior for an unmapped field).
    */
  type FieldResolver = (String, String) => Option[IndexReader]

  /** No fields mapped — scoped clauses match nothing. */
  val noFields: FieldResolver = (_, _) => None

  def matchSet(reader: IndexReader, node: Node, fields: FieldResolver,
      maxExpansions: Int = 50): DataFrame = node match {
    case Term(t, _)    => reader.membership(t)
    case Prefix(p, _)  => reader.membershipAny(reader.expandPrefix(p, maxExpansions))
    case Phrase(ts, s, _) => reader.phrase(ts, s).select("conv_id").distinct()
    case Fuzzy(t, d)   => reader.membershipFuzzy(t, d, transpositions = true)
    case Wildcard(m)   => reader.membershipWildcard(m)
    case Range(lo, hi, il, ih) => reader.membershipTermRangeBounds(lo, hi, il, ih)
    case Scoped(f, v)  =>
      fields(f, v).map(_.allMembers).getOrElse(reader.emptyMemberSet)
    case Group(pos, neg, _) =>
      if (pos.isEmpty) return reader.emptyMemberSet
      val folded = pos.map { case (or, c) => (or, matchSet(reader, c, fields, maxExpansions)) }
        .reduceLeft[(Boolean, DataFrame)] { case ((_, acc), (or, df)) =>
          (or, if (or) acc.union(df).distinct() else acc.intersect(df))
        }._2
      if (neg.isEmpty) folded
      else folded.except(neg.map(matchSet(reader, _, fields, maxExpansions))
        .reduce(_ union _))
  }

  /** Positive scoring terms with multiplied-through group boosts; filter-
    * context leaves (fuzzy / wildcard / range / scoped) contribute nothing.
    */
  def scoringTerms(reader: IndexReader, node: Node,
      maxExpansions: Int = 50): (Seq[String], Map[String, Double]) = {
    def walk(n: Node, mult: Double): Seq[(String, Double)] = n match {
      case Term(t, b)       => Seq(t -> b * mult)
      case Prefix(p, b)     => reader.expandPrefix(p, maxExpansions).map(_ -> b * mult)
      case Phrase(ts, _, b) => ts.map(_ -> b * mult)
      case Group(pos, _, b) => pos.flatMap { case (_, c) => walk(c, mult * b) }
      case _                => Nil // filter context
    }
    val pairs = walk(node, 1.0)
    val boosts = pairs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    (pairs.map(_._1).distinct, boosts.filter(_._2 != 1.0))
  }

  /** Parse + rank: exact top-`k` BM25 over the full-dialect match set. A
    * pure-filter query (no scoring terms) returns the match set constant-
    * scored at 1.0, conv asc, limited to k.
    */
  def topK(reader: IndexReader, q: String, k: Int,
      fields: FieldResolver = noFields, defaultAnd: Boolean = false,
      maxExpansions: Int = 50): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val g = parse(q, defaultAnd)
    if (g.pos.isEmpty) return reader.emptyHitsSet
    val (terms, boosts) = scoringTerms(reader, g, maxExpansions)
    if (terms.isEmpty)
      matchSet(reader, g, fields, maxExpansions)
        .withColumn("score", lit(1.0))
        .orderBy("conv_id").limit(k)
    else
      reader.bm25TopKFiltered(terms, k, matchSet(reader, g, fields, maxExpansions),
        conjunctive = false, boosts = boosts)
  }
}

package killa.query

import org.apache.spark.sql.DataFrame

/** Query-string mini-language — the Elasticsearch `simple_query_string` /
  * Lucene SimpleQueryParser surface: one human-typed string compiles onto
  * the engine's existing boolean/phrase/prefix/BM25 machinery.
  *
  * Syntax (Lucene SimpleQueryParser's operator set):
  *   - bare words are term clauses; adjacent clauses combine with the
  *     DEFAULT operator (AND unless `defaultAnd = false`)
  *   - `+` joins the next clause conjunctively, `|` disjunctively —
  *     left-to-right, equal precedence (SimpleQueryParser folds the same
  *     way; there is deliberately no AND-over-OR precedence table)
  *   - `-` at a clause head negates that clause. Negation is PER GROUP,
  *     Lucene bool semantics: every negative clause of a group excludes
  *     from that group's whole positive result regardless of where it sits
  *     in the `|`/`+` chain (`a | -b` ≡ a AND NOT b, because a Lucene
  *     MUST_NOT applies to the enclosing bool, not to one branch). A group
  *     with only negative clauses matches nothing (Lucene: a bool query of
  *     pure MUST_NOT matches no docs).
  *   - `(`…`)` groups
  *   - `"w1 w2"` is an exact-phrase clause; `"w1 w2"~N` allows slop N
  *   - a trailing `*` makes the word a prefix clause, rewritten
  *     `scoring_boolean`-style: the first `maxExpansions` dictionary terms
  *     in lexicographic order (the [[IndexReader.phrasePrefix]] expansion
  *     rule) — the expansion both matches AND scores, unlike Lucene's
  *     default constant-score rewrite
  *   - `word^2.5` boosts that term's scoring contribution (must be > 0)
  *
  * Scoring (ES bool semantics): the match set is the boolean algebra above;
  * every POSITIVE term — plain terms, phrase members, prefix expansions —
  * contributes standard BM25 to each matching doc that contains it, summed.
  * Filter-shaped structure never changes statistics: scores are the same
  * global-stats contributions [[IndexReader.bm25TopK]] computes.
  *
  * Shape at scale: leaves are the engine's pruned surfaces (membership /
  * phrase / prefix scans), set algebra stays distributed (intersect / union
  * / left-anti on conv sets), and the final ranking is
  * [[IndexReader.bm25TopKFiltered]] — the match set rides the DAAT kernel
  * as an include cursor, so block-max pruning stays exact and nothing is
  * post-filtered. Flat all-term queries skip the filter entirely and hit
  * the plain kernel fast paths.
  */
object QueryString {

  // ---- AST ----------------------------------------------------------------

  sealed trait Node
  /** A plain term clause; `boost` multiplies its scoring contribution. */
  final case class Term(t: String, boost: Double = 1.0) extends Node
  /** A trailing-`*` prefix clause. */
  final case class Prefix(p: String) extends Node
  /** A quoted phrase clause with optional slop. */
  final case class Phrase(terms: Seq[String], slop: Int = 0) extends Node
  /** One parenthesis level: ordered positive clauses (each tagged with how
    * it joins the previous one) plus the group's negative clauses. */
  final case class Group(pos: Seq[(Boolean, Node)], neg: Seq[Node]) extends Node
  // pos: (orWithPrev, node) — head's flag is ignored

  // ---- lexer --------------------------------------------------------------

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object PIPE extends Tok
  private case object PLUS extends Tok
  private case object MINUS extends Tok
  private final case class WORD(w: String) extends Tok
  private final case class QUOTED(terms: Seq[String], slop: Int) extends Tok

  private def lex(q: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    var atClauseHead = true // '-' is an operator only here (mid-word '-' is data)
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => atClauseHead = true; i += 1
        case '(' => out += LP; atClauseHead = true; i += 1
        case ')' => out += RP; atClauseHead = false; i += 1
        case '|' => out += PIPE; atClauseHead = true; i += 1
        case '+' => out += PLUS; atClauseHead = true; i += 1
        case '-' if atClauseHead => out += MINUS; i += 1
        case '"' =>
          val end = q.indexOf('"', i + 1)
          require(end >= 0, s"unterminated quote at offset $i in: $q")
          val inner = q.substring(i + 1, end)
          i = end + 1
          var slop = 0
          if (i < n && q.charAt(i) == '~') {
            var j = i + 1
            while (j < n && q.charAt(j).isDigit) j += 1
            require(j > i + 1, s"'~' must carry a slop number at offset $i in: $q")
            slop = q.substring(i + 1, j).toInt
            i = j
          }
          out += QUOTED(inner.split(" ").filter(_.nonEmpty).toSeq, slop)
          atClauseHead = false
        case _ =>
          val sb = new StringBuilder
          while (i < n && !" \t\n\r()|+\"".contains(q.charAt(i))) {
            sb += q.charAt(i); i += 1
          }
          out += WORD(sb.toString)
          atClauseHead = false
      }
    }
    out.result()
  }

  // ---- parser -------------------------------------------------------------

  /** Parse a query string. `defaultAnd` sets the implicit operator between
    * adjacent clauses (ES `default_operator`; true = AND). */
  def parse(q: String, defaultAnd: Boolean = true): Group = {
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
    var pendingOr: Option[Boolean] = None // explicit | or + seen before next clause
    var pendingNeg = false
    while (rest.nonEmpty && rest.head != RP) {
      rest.head match {
        case PIPE => require(!pendingNeg, "operator after '-'"); pendingOr = Some(true); rest = rest.tail
        case PLUS => require(!pendingNeg, "operator after '-'"); pendingOr = Some(false); rest = rest.tail
        case MINUS => pendingNeg = true; rest = rest.tail
        case _ =>
          val (node, r2) = parseAtom(rest, defaultAnd)
          rest = r2
          if (pendingNeg) neg += node
          else {
            // the group head has no previous clause: its flag is fixed false
            pos += ((nPos > 0 && pendingOr.getOrElse(!defaultAnd), node))
            nPos += 1
          }
          pendingOr = None
          pendingNeg = false
      }
    }
    require(!pendingNeg && pendingOr.isEmpty, "dangling operator at end of group")
    require(rest.nonEmpty || !inner, "unbalanced '(': group never closed")
    if (rest.nonEmpty) rest = rest.tail // consume the RP
    (Group(pos.result(), neg.result()), rest)
  }

  private def parseAtom(toks: List[Tok], defaultAnd: Boolean): (Node, List[Tok]) =
    toks match {
      case LP :: t =>
        val (g, rest) = parseGroup(t, defaultAnd, inner = true)
        (g, rest)
      case QUOTED(terms, slop) :: t =>
        require(terms.nonEmpty, "empty phrase")
        (Phrase(terms, slop), t)
      case WORD(w0) :: t =>
        // ^boost suffix, then trailing-* prefix marker
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
        require(!w1.contains("*") || w1.endsWith("*"),
          s"'*' is only a trailing prefix marker: '$w0'")
        if (w1.endsWith("*")) {
          require(boost == 1.0, "prefix clauses take no boost")
          val p = w1.dropRight(1)
          require(p.nonEmpty, "bare '*' is not a clause")
          require(!p.contains("*"), s"'*' is only a trailing prefix marker: '$w0'")
          (Prefix(p), t)
        } else (Term(w1, boost), t)
      case other =>
        throw new IllegalArgumentException(s"expected a clause, got $other")
    }

  // ---- planner ------------------------------------------------------------

  /** The boolean match set of a parsed query: one `conv_id` column,
    * distinct. Pure membership algebra — no scoring. */
  def matchSet(reader: IndexReader, node: Node,
      maxExpansions: Int = 50): DataFrame = node match {
    case Term(t, _)   => reader.membership(t)
    case Prefix(p)    => reader.membershipAny(reader.expandPrefix(p, maxExpansions))
    case Phrase(ts, s) => reader.phrase(ts, s).select("conv_id").distinct()
    case Group(pos, neg) =>
      if (pos.isEmpty) return reader.emptyMemberSet // pure-negative: nothing
      val folded = pos.map { case (or, n) => (or, matchSet(reader, n, maxExpansions)) }
        .reduceLeft[(Boolean, DataFrame)] { case ((_, acc), (or, df)) =>
          (or, if (or) acc.union(df).distinct() else acc.intersect(df))
        }._2
      if (neg.isEmpty) folded
      else {
        val ex = neg.map(matchSet(reader, _, maxExpansions))
          .reduce(_ union _)
        folded.except(ex) // except dedups; membership sets are sets already
      }
  }

  /** Positive scoring terms of the query — plain terms, phrase members,
    * prefix expansions — with merged boosts (a term listed twice keeps the
    * max boost; phrase/prefix members carry 1.0). Negative clauses
    * contribute nothing (they only exclude). */
  def scoringTerms(reader: IndexReader, node: Node,
      maxExpansions: Int = 50): (Seq[String], Map[String, Double]) = {
    def walk(n: Node): Seq[(String, Double)] = n match {
      case Term(t, b)    => Seq(t -> b)
      case Prefix(p)     => reader.expandPrefix(p, maxExpansions).map(_ -> 1.0)
      case Phrase(ts, _) => ts.map(_ -> 1.0)
      case Group(pos, _) => pos.flatMap { case (_, c) => walk(c) }
    }
    val pairs = walk(node)
    val boosts = pairs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    (pairs.map(_._1).distinct, boosts.filter(_._2 != 1.0))
  }

  /** Parse + rank: exact top-`k` BM25 over the query string's boolean match
    * set — (conv_id, score), (score desc, conv_id asc). Flat all-term
    * groups take the plain kernel fast paths (no include cursor); anything
    * structural rides [[IndexReader.bm25TopKFiltered]]. */
  def topK(reader: IndexReader, q: String, k: Int, defaultAnd: Boolean = true,
      maxExpansions: Int = 50): DataFrame = {
    val g = parse(q, defaultAnd)
    val (terms, boosts) = scoringTerms(reader, g, maxExpansions)
    if (g.pos.isEmpty || terms.isEmpty) return reader.emptyHitsSet
    val flatTerms = g.pos.forall(_._2.isInstanceOf[Term]) &&
      g.neg.forall(_.isInstanceOf[Term])
    val negTerms = g.neg.collect { case Term(t, _) => t }
    if (flatTerms && g.pos.tail.forall(!_._1)) // pure conjunction
      reader.bm25TopK(terms, k, conjunctive = true, mustNot = negTerms,
        boosts = boosts)
    else if (flatTerms && g.pos.tail.forall(_._1)) // pure disjunction
      reader.bm25TopK(terms, k, conjunctive = false, mustNot = negTerms,
        boosts = boosts)
    else
      reader.bm25TopKFiltered(terms, k, matchSet(reader, g, maxExpansions),
        conjunctive = false, boosts = boosts)
  }
}

package killa.util

/** Glob-mask helpers shared by wildcard search and mask subscriptions —
  * reference mask semantics (FileAnalyzer.cs:100: masks lower-cased;
  * FileAnalyzerTests.cs:54-84 pin `*`/`?` matching): `*` = any run,
  * `?` = any one char, everything else literal.
  */
object Glob {

  /** Anchored Java/Spark-rlike regex for a glob mask. */
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()<>+-=!$^|,".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** Longest wildcard-free prefix — the pushdown-able range part of a mask. */
  def literalPrefix(glob: String): String =
    glob.takeWhile(c => c != '*' && c != '?')

  def matches(glob: String, s: String): Boolean = s.matches(toRegex(glob))
}

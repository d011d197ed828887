package graft.rules

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Pattern, PatternSyntaxException}

/**
 * POSIX-ERE-compatible regex support on the JVM.
 *
 * The reference validates `pattern` / `format` with POSIX extended regexes
 * compiled REG_EXTENDED|REG_NOSUB and matched with an UNANCHORED search
 * (json_schema_validate.c:188, :963-989). Java regex is a superset of ERE for
 * the constructs the reference's tests use, except POSIX bracket classes
 * ([:alpha:] etc.), which we translate. Matching uses Matcher.find() to mirror
 * regexec's substring search.
 *
 * Compiled patterns are memoized JVM-wide — the analogue of the reference's
 * session regex cache (json_schema_validate.c:81-92,143-199), minus its
 * 256-byte key-truncation bug (deliberately not reproduced, SURVEY.md §4).
 * Invalid patterns are cached as None: the reference silently skips checks
 * whose pattern fails to compile (json_schema_validate.c:972).
 *
 * The cache is SIZE-BOUNDED: format:"regex" and the per-row RegexIsValid
 * expression feed DOCUMENT-derived strings through here, and the reference
 * compiles-and-frees doc-supplied regexes (c:1816-1829) rather than caching
 * them — an unbounded map would leak executor memory on a long-lived scan
 * over high-cardinality data. Policy is RESET-ON-FULL: when the cap is
 * reached the cache is cleared and the new entry inserted, so hot
 * schema-originated patterns (a small fixed set) re-enter immediately after
 * a document-noise flush; the transient recompile burst is bounded by
 * MaxEntries (see the inline note at the insert site).
 */
object PosixRegex {
  private val MaxEntries = 4096
  private val cache = new ConcurrentHashMap[String, Option[Pattern]]()

  private val posixClasses = Map(
    "alpha" -> "\\p{Alpha}", "digit" -> "\\p{Digit}", "alnum" -> "\\p{Alnum}",
    "upper" -> "\\p{Upper}", "lower" -> "\\p{Lower}", "space" -> "\\s",
    "blank" -> "\\p{Blank}", "punct" -> "\\p{Punct}", "cntrl" -> "\\p{Cntrl}",
    "xdigit" -> "\\p{XDigit}", "print" -> "\\p{Print}", "graph" -> "\\p{Graph}")

  /** Translate POSIX bracket classes to Java regex equivalents. */
  def translate(posix: String): String = {
    var out = posix
    posixClasses.foreach { case (name, repl) =>
      out = out.replace(s"[:$name:]", repl)
    }
    out
  }

  def compile(posix: String): Option[Pattern] = {
    val cached = cache.get(posix)
    if (cached != null) return cached
    val result =
      try Some(Pattern.compile(translate(posix)))
      catch { case _: PatternSyntaxException => None }
    // bounded with reset-on-full rather than insert-refusal: refusing inserts
    // would permanently lock out schema patterns first seen AFTER document
    // noise filled the cache (per-row recompiles forever); clearing lets the
    // hot patterns re-enter immediately, and the transient recompile burst is
    // bounded by MaxEntries
    if (cache.size >= MaxEntries) cache.clear()
    cache.putIfAbsent(posix, result)
    result
  }

  /** Unanchored search, like regexec. None = invalid pattern (caller skips check). */
  def find(posix: String, s: String): Option[Boolean] =
    compile(posix).map(_.matcher(s).find())

  def isValid(posix: String): Boolean = compile(posix).isDefined
}

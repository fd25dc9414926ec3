package graft.sql

import scala.collection.mutable.ArrayBuffer

/** Postgres-flavored SQL → Spark SQL translation for the `transform` /
  * `run_raw_sql` surface.
  *
  * The reference passed dialect SQL through to whatever warehouse engine
  * backed the table (`sql/operators/transform.py:55-72` — no translation,
  * the engine's dialect IS the contract); on Spark the engine dialect is
  * Spark SQL, so users bringing Postgres-flavored queries need the
  * common dialect forms mapped. This is a TOKEN-level translator — it
  * never parses full SQL, it rewrites exactly the constructs whose
  * Postgres spelling Spark rejects, and passes everything else through
  * untouched (unknown constructs then fail with Spark's own error,
  * never silently change meaning):
  *
  *  - `expr::type` postfix casts (chained ok) → `CAST(expr AS type)`,
  *    with Postgres type names mapped (int4/int8/float8/text/bool/
  *    bytea/timestamptz/"double precision"/"character varying"...);
  *    the same type map applies inside explicit `CAST(x AS int8)`.
  *  - `"quoted identifiers"` → Spark backtick identifiers (in Spark,
  *    double quotes are string literals).
  *  - `$tag$dollar-quoted strings$tag$` → standard quoted literals.
  *  - regex operators: `a ~ p` → `a RLIKE p`, `a !~ p` → `a NOT RLIKE
  *    p`, `a ~* p` → `upper(a) RLIKE upper(p)` (and the `!~*`
  *    negation). Unary bitwise `~` is left alone (operand-context
  *    detection).
  *  - function renames: `now()` → `current_timestamp()`, `random()` →
  *    `rand()`, `strpos` → `instr`, `string_agg` → `listagg`,
  *    `to_char(ts, 'fmt')` → `date_format(ts, '<mapped fmt>')` with the
  *    Postgres format tokens (YYYY/MM/DD/HH24/MI/SS/...) mapped to
  *    java.time patterns when the format is a literal.
  *  - `ILIKE`, `||` concat, `IS DISTINCT FROM`, `LIMIT/OFFSET`,
  *    `SUBSTRING(x FROM y FOR z)`, `POSITION(a IN b)`, `split_part`,
  *    `left`/`right` need no rewrite — Spark 4 accepts them natively —
  *    and are covered by SqlDialectSpec so the pass-through stays pinned.
  *
  * Documented out of scope (pass through unchanged, Spark errors):
  * `SIMILAR TO`, `E'...'` escape strings, `generate_series`, arrays'
  * `ANY/ALL(array)` forms, `DISTINCT ON`.
  */
object SqlDialect {

  /** Translate `sql` from `dialect` to Spark SQL — one entry per
    * warehouse the reference SDK supported:
    *  - "spark"/"ansi": identity.
    *  - "postgres"/"postgresql": the base machinery.
    *  - "snowflake" (the reference's primary warehouse): adds IFF/
    *    GETDATE/DATEADD/DATEDIFF/TO_VARCHAR/ZEROIFNULL/NULLIFZERO and
    *    the NUMBER/TIMESTAMP_LTZ type names.
    *  - "redshift": Redshift IS Postgres-dialect-based and also uses
    *    the GETDATE/DATEADD/DATEDIFF call forms — the Snowflake mode
    *    covers both, so it's an alias.
    *  - "bigquery": SAFE_CAST/SAFE_DIVIDE → try_*, FORMAT_DATE/
    *    FORMAT_TIMESTAMP (strftime tokens, format-first arg order),
    *    TIMESTAMP_DIFF/DATE_DIFF (end-minus-start arg reorder),
    *    DATE_ADD/DATE_SUB with INTERVAL → `+`/`-` arithmetic,
    *    ARRAY_LENGTH → size, INT64/FLOAT64/BYTES type names; double
    *    quotes lex as STRINGS (BigQuery semantics), backtick
    *    identifiers are already Spark-native.
    * MSSQL is documented out of scope (TOP-n is structural; T-SQL's
    * 2-arg ISNULL collides with Spark's 1-arg isnull). */
  def toSparkSql(sql: String, dialect: String): String =
    dialect.toLowerCase match {
      case "spark" | "ansi" | "" => sql
      case "postgres" | "postgresql" => translate(sql, Pg)
      case "snowflake" | "redshift" => translate(sql, Sf)
      case "bigquery" => translate(sql, Bq)
      case other => throw new IllegalArgumentException(
        s"Unsupported SQL dialect: $other " +
          "(supported: spark, postgres, redshift, snowflake, bigquery)")
    }

  private sealed trait Mode
  private case object Pg extends Mode
  private case object Sf extends Mode
  private case object Bq extends Mode

  // ------------------------------------------------------------------
  // tokens
  // ------------------------------------------------------------------
  private sealed trait Tok { def text: String }
  private final case class Word(text: String) extends Tok
  private final case class Num(text: String) extends Tok
  private final case class Str(text: String) extends Tok   // quoted, Spark form
  private final case class QIdent(text: String) extends Tok // backticked, Spark form
  private final case class Sym(text: String) extends Tok
  private final case class Ws(text: String) extends Tok
  /** Already-rewritten Spark SQL fragment — opaque to later passes. */
  private final case class Raw(text: String) extends Tok

  private val multiSyms = Seq("!~*", "!~", "~*", "::", "||", "<=", ">=", "<>", "!=")

  /** Lex dialect SQL. Strings and quoted identifiers are converted to
    * their SPARK spelling at lex time ('' stays '', `"x"` → `` `x` ``
    * — or to a string when `dqAsString` (BigQuery semantics) —
    * dollar-quoting → single quotes with doubling). */
  private def lex(sql: String, dqAsString: Boolean = false): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def isWordStart(c: Char) = c.isLetter || c == '_'
    def isWordPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) {
        val j = { var k = i; while (k < n && sql(k).isWhitespace) k += 1; k }
        out += Ws(sql.substring(i, j)); i = j
      } else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        val j = sql.indexOf('\n', i) match { case -1 => n; case x => x }
        out += Ws(sql.substring(i, j)); i = j
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        // Postgres block comments nest
        var depth = 1; var j = i + 2
        while (j < n && depth > 0) {
          if (j + 1 < n && sql(j) == '/' && sql(j + 1) == '*') { depth += 1; j += 2 }
          else if (j + 1 < n && sql(j) == '*' && sql(j + 1) == '/') { depth -= 1; j += 2 }
          else j += 1
        }
        out += Ws(sql.substring(i, j)); i = j
      } else if (c == '\'') {
        var j = i + 1
        val b = new StringBuilder
        var closed = false
        while (j < n && !closed) {
          if (sql(j) == '\'' && j + 1 < n && sql(j + 1) == '\'') { b.append("''"); j += 2 }
          else if (sql(j) == '\'') { closed = true; j += 1 }
          else { b.append(sql(j)); j += 1 }
        }
        if (!closed) throw new IllegalArgumentException(
          s"Unterminated string literal at offset $i")
        out += Str("'" + b.toString + "'"); i = j
      } else if (c == '`') {
        // backtick identifier (our OWN output on a fixpoint re-lex):
        // pass through verbatim, `` stays the escape
        var j = i + 1
        var closed = false
        while (j < n && !closed) {
          if (sql(j) == '`' && j + 1 < n && sql(j + 1) == '`') j += 2
          else if (sql(j) == '`') { closed = true; j += 1 }
          else j += 1
        }
        if (!closed) throw new IllegalArgumentException(
          s"Unterminated backtick identifier at offset $i")
        out += QIdent(sql.substring(i, j)); i = j
      } else if (c == '"') {
        var j = i + 1
        val b = new StringBuilder
        var closed = false
        while (j < n && !closed) {
          if (sql(j) == '"' && j + 1 < n && sql(j + 1) == '"') { b.append('"'); j += 2 }
          else if (sql(j) == '"') { closed = true; j += 1 }
          else { b.append(sql(j)); j += 1 }
        }
        if (!closed) throw new IllegalArgumentException(
          s"Unterminated double-quoted token at offset $i")
        if (dqAsString) out += Str("'" + b.toString.replace("'", "''") + "'")
        else out += QIdent("`" + b.toString.replace("`", "``") + "`")
        i = j
      } else if (c == '$' && {
        // dollar-quoted string: $tag$ ... $tag$ (tag may be empty)
        val e = sql.indexOf('$', i + 1)
        e > i && sql.substring(i + 1, e).forall(ch => ch.isLetterOrDigit || ch == '_')
      }) {
        val e = sql.indexOf('$', i + 1)
        val delim = sql.substring(i, e + 1)
        val close = sql.indexOf(delim, e + 1)
        if (close < 0) throw new IllegalArgumentException(
          s"Unterminated dollar-quoted string at offset $i")
        val body = sql.substring(e + 1, close)
        out += Str("'" + body.replace("'", "''") + "'")
        i = close + delim.length
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql(i + 1).isDigit)) {
        var j = i
        while (j < n && (sql(j).isDigit || sql(j) == '.')) j += 1
        if (j < n && (sql(j) == 'e' || sql(j) == 'E')) {
          var k = j + 1
          if (k < n && (sql(k) == '+' || sql(k) == '-')) k += 1
          if (k < n && sql(k).isDigit) { while (k < n && sql(k).isDigit) k += 1; j = k }
        }
        out += Num(sql.substring(i, j)); i = j
      } else if (isWordStart(c)) {
        var j = i + 1
        while (j < n && isWordPart(sql(j))) j += 1
        out += Word(sql.substring(i, j)); i = j
      } else {
        multiSyms.find(s => sql.startsWith(s, i)) match {
          case Some(s) => out += Sym(s); i += s.length
          case None => out += Sym(c.toString); i += 1
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // rewrites
  // ------------------------------------------------------------------

  /** Postgres → Spark type-name map (applied to `::type` and the type
    * position of explicit CASTs). Unlisted names pass through. */
  private val typeMap = Map(
    "int2" -> "smallint", "int4" -> "int", "int8" -> "bigint",
    "serial" -> "int", "bigserial" -> "bigint",
    "float4" -> "float", "float8" -> "double",
    "real" -> "float",
    "text" -> "string", "bpchar" -> "string", "name" -> "string",
    "bool" -> "boolean",
    "bytea" -> "binary",
    "timestamptz" -> "timestamp",
    // Snowflake spellings (only ever consulted in type positions)
    "number" -> "decimal",
    "timestamp_ltz" -> "timestamp", "timestamp_tz" -> "timestamp",
    // BigQuery spellings
    "int64" -> "bigint", "float64" -> "double", "bytes" -> "binary",
    "numeric" -> "decimal")

  /** Two-word Postgres type names (checked before the one-word map). */
  private val twoWordTypes = Map(
    ("double", "precision") -> "double",
    ("character", "varying") -> "string")

  private val fnRename = Map(
    "now" -> "current_timestamp",
    "random" -> "rand",
    "strpos" -> "instr",
    "string_agg" -> "listagg")

  /** Snowflake-only straight renames (arity-compatible); ZEROIFNULL /
    * NULLIFZERO / TO_VARCHAR need argument rewrites and are handled
    * structurally in pass 3. */
  private val snowflakeFnRename = Map(
    "iff" -> "if",
    "getdate" -> "current_timestamp",
    "systimestamp" -> "current_timestamp",
    "dateadd" -> "timestampadd",
    "datediff" -> "timestampdiff")

  /** BigQuery straight renames (arity-compatible); FORMAT_DATE /
    * *_DIFF / *_ADD / *_SUB need argument rewrites — pass 3. */
  private val bigqueryFnRename = Map(
    "safe_cast" -> "try_cast",
    "safe_divide" -> "try_divide",
    "array_length" -> "size",
    "generate_uuid" -> "uuid",
    "current_datetime" -> "current_timestamp",
    "ifnull" -> "coalesce")

  /** BigQuery strftime-style format tokens → java.time patterns. */
  private val strftimeTokens = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%e" -> "d", "%H" -> "HH", "%I" -> "hh", "%M" -> "mm", "%S" -> "ss",
    "%j" -> "DDD", "%b" -> "MMM", "%B" -> "MMMM", "%a" -> "EEE",
    "%A" -> "EEEE", "%p" -> "a", "%Z" -> "z", "%%" -> "%")

  private def mapStrftimeFormat(lit: String): String = {
    val body = lit.substring(1, lit.length - 1)
    val b = new StringBuilder
    var i = 0
    while (i < body.length) {
      strftimeTokens.find { case (t, _) => body.startsWith(t, i) } match {
        case Some((t, jt)) => b.append(jt); i += t.length
        case None =>
          val c = body.charAt(i)
          if (c.isLetter) b.append('\'').append(c).append('\'') else b.append(c)
          i += 1
      }
    }
    "'" + b.toString + "'"
  }

  /** Postgres to_char patterns → java.time patterns, longest-first. */
  private val toCharTokens = Seq(
    "HH24" -> "HH", "HH12" -> "hh", "YYYY" -> "yyyy", "Month" -> "MMMM",
    "MON" -> "MMM", "Mon" -> "MMM", "DDD" -> "DDD", "Day" -> "EEEE",
    "Dy" -> "EEE", "MS" -> "SSS", "YY" -> "yy", "MM" -> "MM",
    "DD" -> "dd", "MI" -> "mm", "SS" -> "ss", "TZ" -> "z", "AM" -> "a",
    "PM" -> "a")

  private def mapToCharFormat(lit: String): String = {
    // lit includes the surrounding quotes
    val body = lit.substring(1, lit.length - 1)
    val b = new StringBuilder
    var i = 0
    while (i < body.length) {
      toCharTokens.find { case (pg, _) => body.startsWith(pg, i) } match {
        case Some((pg, jt)) => b.append(jt); i += pg.length
        case None =>
          val c = body.charAt(i)
          // literal text in a java.time pattern must be quoted if alpha
          if (c.isLetter) b.append('\'').append(c).append('\'') else b.append(c)
          i += 1
      }
    }
    "'" + b.toString + "'"
  }

  /** Keywords that can directly precede a unary operator — a `~` after
    * one of these is bitwise NOT, not the binary regex match. */
  private val preUnaryKeywords = Set(
    "select", "where", "and", "or", "not", "on", "when", "then", "else",
    "case", "end", "by", "having", "from", "join", "in", "like", "ilike",
    "between", "is", "as", "union", "all", "distinct", "intersect",
    "except", "limit", "offset", "order", "group", "values", "set",
    "exists", "any", "some", "returning")

  private def isOperandEnd(t: Tok): Boolean = t match {
    case Word(w) => !preUnaryKeywords.contains(w.toLowerCase)
    case Num(_) | Str(_) | QIdent(_) | Raw(_) => true
    case Sym(")") | Sym("]") => true
    case _ => false
  }

  /** Index of the previous/next non-whitespace token, or -1. */
  private def prevIdx(ts: ArrayBuffer[Tok], i: Int): Int = {
    var j = i - 1; while (j >= 0 && ts(j).isInstanceOf[Ws]) j -= 1; j
  }
  private def nextIdx(ts: ArrayBuffer[Tok], i: Int): Int = {
    var j = i + 1; while (j < ts.length && ts(j).isInstanceOf[Ws]) j += 1
    if (j < ts.length) j else -1
  }

  /** Start index of the primary expression ENDING at `end` (inclusive):
    * a single atom, a balanced (...) group, or a function call
    * name(...). Used by the `::` and `~*` rewrites. */
  private def primaryStart(ts: ArrayBuffer[Tok], end: Int): Int = ts(end) match {
    case Sym(")") =>
      var depth = 1; var j = end - 1
      while (j >= 0 && depth > 0) {
        ts(j) match {
          case Sym(")") => depth += 1
          case Sym("(") => depth -= 1
          case _ =>
        }
        if (depth > 0) j -= 1
      }
      if (j < 0) throw new IllegalArgumentException("Unbalanced parentheses")
      val p = prevIdx(ts, j)
      // a preceding non-keyword Word is the call's function name; a
      // keyword (SELECT/WHERE/AND/...) means the group stands alone
      ts.lift(p) match {
        case Some(Word(w)) if !preUnaryKeywords.contains(w.toLowerCase) => p
        case _ => j
      }
    case _ => end
  }

  /** End index of the primary expression STARTING at `start` (inclusive):
    * an atom, a parenthesized group, or name(...). */
  private def primaryEnd(ts: ArrayBuffer[Tok], start: Int): Int = ts(start) match {
    case Sym("(") =>
      var depth = 1; var j = start + 1
      while (j < ts.length && depth > 0) {
        ts(j) match {
          case Sym("(") => depth += 1
          case Sym(")") => depth -= 1
          case _ =>
        }
        if (depth > 0) j += 1
      }
      if (j >= ts.length) throw new IllegalArgumentException("Unbalanced parentheses")
      j
    case Word(_) =>
      val nx = nextIdx(ts, start)
      if (nx >= 0 && ts(nx) == Sym("(")) primaryEnd(ts, nx) else start
    case _ => start
  }

  private def text(ts: collection.Seq[Tok]): String = ts.map(_.text).mkString

  /** Replace ts[from..to] (inclusive) with one Raw token. */
  private def splice(ts: ArrayBuffer[Tok], from: Int, to: Int, raw: String): Unit = {
    ts.remove(from, to - from + 1)
    ts.insert(from, Raw(raw))
  }

  /** Index of the first depth-0 comma between `open` (a "(") and its
    * matching `close`, or -1. */
  private def topLevelComma(ts: ArrayBuffer[Tok], open: Int, close: Int): Int = {
    var depth = 0; var j = open + 1
    while (j < close) {
      ts(j) match {
        case Sym("(") => depth += 1
        case Sym(")") => depth -= 1
        case Sym(",") if depth == 0 => return j
        case _ =>
      }
      j += 1
    }
    -1
  }

  /** Consume a type name at `i` (skipping nothing — callers pass a
    * non-ws index): returns (mapped Spark type text, last index used). */
  private def mapTypeAt(ts: ArrayBuffer[Tok], i: Int): (String, Int) = {
    val w1 = ts(i) match {
      case Word(t) => t
      case other => throw new IllegalArgumentException(
        s"Expected a type name after ::, got '${other.text}'")
    }
    val n1 = nextIdx(ts, i)
    // two-word types
    if (n1 >= 0) ts(n1) match {
      case Word(w2) if twoWordTypes.contains((w1.toLowerCase, w2.toLowerCase)) =>
        return (twoWordTypes((w1.toLowerCase, w2.toLowerCase)), n1)
      case _ =>
    }
    val base = typeMap.getOrElse(w1.toLowerCase, w1)
    // parenthesized precision: varchar(10), decimal(10,2)
    if (n1 >= 0 && ts(n1) == Sym("(")) {
      val close = primaryEnd(ts, n1)
      (base + text(ts.slice(n1, close + 1)), close)
    } else (base, i)
  }

  /** Run single-pass translation to a fixpoint: a pass's rewrites emit
    * opaque fragments whose INTERIOR tokens (nested dialect calls inside
    * a `::` cast operand, a ZEROIFNULL argument, …) the same pass can no
    * longer see — re-lexing the output turns them back into live tokens
    * for the next pass. Every rewrite produces a form that is not itself
    * a rewrite candidate (CAST/RLIKE/date_format/…), so this converges;
    * the guard bounds pathological input. */
  private def translate(sql: String, mode: Mode): String = {
    var cur = sql
    var prev: String = null
    var guard = 0
    while (cur != prev && guard < 16) {
      prev = cur
      cur = translateOnce(cur, mode)
      guard += 1
    }
    cur
  }

  private def translateOnce(sql: String, mode: Mode): String = {
    val ts = ArrayBuffer(lex(sql, dqAsString = mode == Bq): _*)

    // 1) `::` postfix casts, innermost-first via repeated single-pass
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < ts.length && !changed) {
        if (ts(i) == Sym("::")) {
          val opEnd = prevIdx(ts, i)
          if (opEnd < 0) throw new IllegalArgumentException("'::' with no operand")
          val opStart = primaryStart(ts, opEnd)
          val tIdx = nextIdx(ts, i)
          if (tIdx < 0) throw new IllegalArgumentException("'::' with no type")
          val (tpe, tEnd) = mapTypeAt(ts, tIdx)
          val operand = text(ts.slice(opStart, opEnd + 1))
          splice(ts, opStart, tEnd, s"CAST($operand AS $tpe)")
          changed = true
        }
        i += 1
      }
    }

    // 2) regex operators (binary only: previous token must end an operand)
    var i = 0
    while (i < ts.length) {
      ts(i) match {
        case Sym(op @ ("~" | "~*" | "!~" | "!~*")) =>
          val p = prevIdx(ts, i)
          if (p >= 0 && isOperandEnd(ts(p))) {
            if (op == "~") { ts(i) = Raw(" RLIKE "); }
            else if (op == "!~") { ts(i) = Raw(" NOT RLIKE ") }
            else {
              // case-insensitive: wrap both primaries in upper()
              val lStart = primaryStart(ts, p)
              val rStart = nextIdx(ts, i)
              if (rStart < 0) throw new IllegalArgumentException(s"'$op' with no pattern")
              val rEnd = primaryEnd(ts, rStart)
              val lhs = text(ts.slice(lStart, p + 1))
              val rhs = text(ts.slice(rStart, rEnd + 1))
              val neg = if (op == "!~*") "NOT " else ""
              splice(ts, lStart, rEnd, s"${neg}upper($lhs) RLIKE upper($rhs)")
              i = lStart
            }
          }
        case _ =>
      }
      i += 1
    }

    // 3) function renames + to_char format mapping + CAST type mapping
    //    (+ the Snowflake-only call rewrites)
    i = 0
    while (i < ts.length) {
      ts(i) match {
        case Word(w) =>
          val nx = nextIdx(ts, i)
          val isCall = nx >= 0 && ts(nx) == Sym("(")
          val wl = w.toLowerCase
          if (isCall && mode == Sf && snowflakeFnRename.contains(wl)) {
            ts(i) = Raw(snowflakeFnRename(wl))
            if (wl == "dateadd" || wl == "datediff") {
              // Snowflake allows a QUOTED part name — timestampadd/-diff
              // need a bare unit identifier
              val a1 = nextIdx(ts, nx)
              if (a1 >= 0) ts(a1) match {
                case Str(s) => ts(a1) = Raw(s.substring(1, s.length - 1))
                case _ =>
              }
            }
          } else if (isCall && mode == Sf &&
              (wl == "zeroifnull" || wl == "nullifzero" || wl == "to_varchar")) {
            // token-preserving rewrites: only the NAME and the fixed
            // pieces change, the argument tokens stay live so nested
            // dialect calls inside them still translate in this pass
            val close = primaryEnd(ts, nx)
            wl match {
              case "zeroifnull" =>
                ts(i) = Raw("coalesce"); ts.insert(close, Raw(", 0"))
              case "nullifzero" =>
                ts(i) = Raw("nullif"); ts.insert(close, Raw(", 0"))
              case _ =>
                // TO_VARCHAR(x) → CAST(x AS string); TO_VARCHAR(x, 'fmt')
                // with a literal format → date_format (same token map as
                // to_char); non-literal formats pass through untouched
                val comma = topLevelComma(ts, nx, close)
                if (comma < 0) {
                  ts(i) = Raw("CAST"); ts.insert(close, Raw(" AS string"))
                } else {
                  val fIdx = nextIdx(ts, comma)
                  if (fIdx > 0 && fIdx == prevIdx(ts, close) && ts(fIdx).isInstanceOf[Str]) {
                    ts(fIdx) = Raw(mapToCharFormat(ts(fIdx).text))
                    ts(i) = Raw("date_format")
                  }
                }
            }
          } else if (isCall && mode == Bq && bigqueryFnRename.contains(wl)) {
            ts(i) = Raw(bigqueryFnRename(wl))
          } else if (isCall && mode == Bq &&
              (wl == "format_date" || wl == "format_timestamp" ||
               wl == "format_datetime")) {
            // FORMAT_DATE('%Y-%m', d): format comes FIRST in BigQuery —
            // map the strftime tokens and swap to date_format(d, fmt)
            val close = primaryEnd(ts, nx)
            val comma = topLevelComma(ts, nx, close)
            if (comma > 0) {
              val fIdx = nextIdx(ts, nx)
              if (fIdx == prevIdx(ts, comma) && ts(fIdx).isInstanceOf[Str]) {
                val mapped = mapStrftimeFormat(ts(fIdx).text)
                val rest = text(ts.slice(comma + 1, close)).trim
                splice(ts, i, close, s"date_format($rest, $mapped)")
              }
            }
          } else if (isCall && mode == Bq &&
              (wl == "timestamp_diff" || wl == "date_diff" ||
               wl == "datetime_diff")) {
            // X_DIFF(end, start, part) = end − start →
            // timestampdiff(part, start, end) (same sign convention)
            val close = primaryEnd(ts, nx)
            val c1 = topLevelComma(ts, nx, close)
            val c2 = if (c1 > 0) topLevelComma(ts, c1, close) else -1
            if (c1 > 0 && c2 > 0) {
              val endArg = text(ts.slice(nx + 1, c1)).trim
              val startArg = text(ts.slice(c1 + 1, c2)).trim
              val part = text(ts.slice(c2 + 1, close)).trim
              splice(ts, i, close, s"timestampdiff($part, $startArg, $endArg)")
            }
          } else if (isCall && mode == Bq &&
              (wl == "date_add" || wl == "timestamp_add" || wl == "datetime_add" ||
               wl == "date_sub" || wl == "timestamp_sub" || wl == "datetime_sub")) {
            // X_ADD(d, INTERVAL n unit) → (d + INTERVAL n unit); without
            // INTERVAL, Spark's own 2-arg date_add already applies
            val close = primaryEnd(ts, nx)
            val comma = topLevelComma(ts, nx, close)
            if (comma > 0) {
              val second = nextIdx(ts, comma)
              val isInterval = second > 0 && (ts(second) match {
                case Word(w2) => w2.equalsIgnoreCase("interval")
                case _ => false
              })
              if (isInterval) {
                val d = text(ts.slice(nx + 1, comma)).trim
                val iv = text(ts.slice(comma + 1, close)).trim
                val op = if (wl.endsWith("_sub")) "-" else "+"
                splice(ts, i, close, s"($d $op $iv)")
              }
            }
          } else if (isCall && fnRename.contains(wl)) {
            ts(i) = Raw(fnRename(wl))
          } else if (isCall && w.toLowerCase == "to_char") {
            // to_char(expr, 'fmt') with a LITERAL format → date_format
            val close = primaryEnd(ts, nx)
            val comma = topLevelComma(ts, nx, close)
            val fIdx = if (comma > 0) nextIdx(ts, comma) else -1
            if (fIdx > 0 && fIdx == prevIdx(ts, close) && ts(fIdx).isInstanceOf[Str]) {
              ts(fIdx) = Raw(mapToCharFormat(ts(fIdx).text))
              ts(i) = Raw("date_format")
            }
          } else if (isCall && (wl == "cast" || wl == "try_cast")) {
            // CAST(x AS int8) / TRY_CAST: map the type after the top-level AS
            val close = primaryEnd(ts, nx)
            var depth = 0; var asIdx = -1
            var j = nx + 1
            while (j < close) {
              ts(j) match {
                case Sym("(") => depth += 1
                case Sym(")") => depth -= 1
                case Word(a) if depth == 0 && a.equalsIgnoreCase("as") => asIdx = j
                case _ =>
              }
              j += 1
            }
            if (asIdx > 0) {
              val tIdx = nextIdx(ts, asIdx)
              if (tIdx > 0 && tIdx < close) ts(tIdx) match {
                case Word(t) =>
                  val n1 = nextIdx(ts, tIdx)
                  val two = if (n1 >= 0 && n1 < close) ts(n1) match {
                    case Word(t2) => twoWordTypes.get((t.toLowerCase, t2.toLowerCase))
                      .map(m => (m, n1))
                    case _ => None
                  } else None
                  two match {
                    case Some((m, endT)) => splice(ts, tIdx, endT, m)
                    case None => typeMap.get(t.toLowerCase)
                      .foreach(m => ts(tIdx) = Raw(m))
                  }
                case _ =>
              }
            }
          }
        case _ =>
      }
      i += 1
    }

    text(ts.toSeq)
  }
}

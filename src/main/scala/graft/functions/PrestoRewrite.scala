package graft.functions

/** The pre-parse rewrite pipeline: Presto spellings Spark's grammar
  * rejects (ARRAY[..] literals, 1-based subscripts, CROSS JOIN UNNEST,
  * AT TIME ZONE, TIME/TIMESTAMP-zone/DECIMAL literals, TABLESAMPLE,
  * CREATE FUNCTION characteristics, bare VARCHAR) rewritten textually
  * before `spark.sql(...)`. Split out of Registry.scala in r7.
  *
  * Every scanner shares ONE masking convention, [[stringMask]]: a
  * position inside a single-quoted SQL string literal (quotes included)
  * is never rewritten, matched, or depth-counted. Doubled quotes
  * (`''`) read as two adjacent literals, which masks identically.
  */
private[functions] object PrestoRewrite {

  /** mask(i) = true when position i sits inside a string literal
    * (quotes included) — the shared convention of every scanner here
    * and of the statement router's placeholder/argument scans. */
  private[functions] def stringMask(q: String): Array[Boolean] = {
    val mask = new Array[Boolean](q.length)
    var inS = false
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (inS) { mask(i) = true; if (c == '\'') inS = false }
      else if (c == '\'') { mask(i) = true; inS = true }
      i += 1
    }
    mask
  }

  // Presto's literal-unit spelling date_add('day', n, x): Spark's grammar
  // reserves the name (unit validated pre-resolution), so the registry
  // can't intercept it — rename pre-parse instead. Only the quote-led
  // (Presto) form matches; Spark's own date_add(start, days) is untouched.
  // Anchored on a known unit keyword after the opening quote so that
  // Spark's own 2-arg date_add('2020-01-01', 3) (string-literal start
  // date) and occurrences of the bare names inside other text are left
  // alone — only the Presto 3-arg literal-unit spelling matches.
  private val prestoDateFnRe =
    ("""(?i)\b(date_add|date_diff)\s*\(\s*'""" +
      """(millisecond|second|minute|hour|day|week|month|quarter|year)'""").r

  // Presto's unparameterized VARCHAR (`cast(x as varchar)`) is unbounded;
  // Spark's grammar requires a length there (its plain-`varchar` is only
  // valid in DDL). `varchar(n)` forms are left alone — both dialects agree.
  private val bareVarcharRe = """(?i)\b(as\s+)varchar(\s*\))""".r

  /** Pre-parse rewrite absorbing the Presto spellings the grammar blocks
    * from registry-level absorption (reserved names, type grammar). Apply
    * to raw Presto SQL before `spark.sql(...)` (RegistrySql.sql does). */
  // Presto TIME 'HH:MM:SS[.fff]' literals: Spark has no time-of-day
  // type, so times ride as TIMESTAMP_NTZ on the epoch date — ordering,
  // extraction (hour/minute/second), and date_diff all behave as
  // Presto's TIME within a day.
  private val timeLiteralRe =
    """(?i)\bTIME\s+'(\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?)'""".r

  // Presto TIME WITH TIME ZONE literals — `TIME '08:30:15 +05:30'`
  // (SqlBase.g4 typeConstructor; TimeWithTimeZoneType.java) — r8,
  // closing the last descoped type: the wall clock rides on the epoch
  // date in the zoned struct layer (utc = wall − offset), so the
  // ZonedInstantComparison rule gives the reference's UTC-instant
  // comparison/ordering semantics and zoned_local/zoned_timezone_hour
  // extract the wall-time fields. Offset spellings only (the
  // reference's TIME WITH TIME ZONE is offset-based; gate ql9).
  private val timeTzLiteralRe =
    ("""(?i)\bTIME\s+'(\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?)""" +
      """\s*([+-]\d{2}:\d{2})'""").r

  // Presto TIMESTAMP-WITH-TIME-ZONE literals — `TIMESTAMP
  // '2020-06-10 15:30:00 +05:30'` / `... Asia/Kolkata'`
  // (SqlBase.g4 primaryExpression typeConstructor;
  // TimestampWithTimeZoneType.java): the wall clock is interpreted IN
  // the named zone and the value carries that zone — exactly the
  // struct<utc, tz> zoned layer (qp1), so the literal rewrites to
  // named_struct('utc', to_utc_timestamp(wall, zone), 'tz', zone).
  // Plain TIMESTAMP literals (no zone suffix) don't match and parse
  // natively. NOTE struct equality compares (utc, tz) pairs — instant
  // comparison across zones spells zoned_instant (ledger, qp1).
  private val timestampTzLiteralRe =
    ("""(?i)\bTIMESTAMP\s+'(\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}""" +
      """(?:\.\d{1,6})?)\s+([+-]\d{2}:\d{2}|[A-Za-z][\w/+-]*)'""").r

  // Presto DECIMAL 'd.dd' literals: precision = digit count, scale =
  // fractional digits (DecimalType.java literal rules).
  private val decimalLiteralRe =
    """(?i)\bDECIMAL\s+'([+-]?\d+(?:\.\d+)?)'""".r

  // Presto TABLESAMPLE BERNOULLI(p) / SYSTEM(p) (SqlBase.g4
  // sampledRelation) → Spark's percent form. Spark samples per-split
  // Bernoulli either way, which IS Presto's BERNOULLI; Presto's SYSTEM
  // (split-granularity) maps to the same — a documented approximation
  // (both are "approximately p% of rows" by contract).
  private val tablesampleRe =
    """(?i)\bTABLESAMPLE\s+(BERNOULLI|SYSTEM)\s*\(\s*(\d+(?:\.\d+)?)\s*\)""".r

  /** Character spans of `VALUES (...), (...)` tuple lists (inline
    * tables), string-mask aware: balanced paren groups after each
    * VALUES keyword, across comma-separated tuples. Used to keep
    * non-foldable wrappers out of inline-table tuples, whose analysis
    * evaluates every expression eagerly. */
  private[functions] def valuesSpans(q: String): Seq[(Int, Int)] = {
    val mask = stringMask(q)
    val re = """(?i)\bVALUES\b""".r
    re.findAllMatchIn(q).toSeq.filter(m => !mask(m.start)).flatMap { m =>
      var i = m.end
      var end = -1
      var more = true
      while (more) {
        while (i < q.length && q.charAt(i).isWhitespace) i += 1
        if (i < q.length && q.charAt(i) == '(') {
          var depth = 0
          var j = i
          while (j < q.length && (depth > 0 || j == i)) {
            if (!mask(j)) {
              if (q.charAt(j) == '(') depth += 1
              else if (q.charAt(j) == ')') depth -= 1
            }
            j += 1
          }
          end = j
          i = j
          // another tuple after a comma?
          var k = i
          while (k < q.length && q.charAt(k).isWhitespace) k += 1
          if (k < q.length && q.charAt(k) == ',') i = k + 1
          else more = false
        } else more = false
      }
      if (end > m.start) Seq((m.start, end)) else Nil
    }
  }

  /** replaceAllIn with the shared string mask: a match starting inside
    * a literal is kept verbatim. Replacement text is taken literally
    * (no $-group interpretation). */
  private[functions] def maskedReplaceAll(q: String,
      re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    val mask = stringMask(q)
    re.replaceAllIn(q, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (mask(m.start)) m.matched else f(m)))
  }

  // ——— aggregate-internal ORDER BY (SqlBase.g4:356 #functionCall —
  // `fn '(' args (ORDER BY sortItem...)? ')'`, a Presto grammar Spark
  // lacks entirely) ———————————————————————————————————————————————————
  //
  // Semantics (presto-main AggregationAnalyzer + the accumulators'
  // sorted-input path): rows feed the aggregate in sorted order. Only
  // ORDER-SENSITIVE aggregates observe it — array_agg's output order is
  // the CONTRACT; every other aggregate is either order-insensitive
  // (sum/avg/min/max/count/...) or documented "arbitrary" under ties
  // (map_agg's duplicate-key choice, arbitrary()), so for those the
  // clause is result-identical to drop.
  //
  // Spark-first: array_agg(x ORDER BY k...) becomes
  //   transform(array_sort(collect_list(named_struct(keys..., value)),
  //     (l, r) -> <multi-key comparator>), s -> s._v)
  // — one pass, the same per-group O(n log n) the reference pays, all
  // codegen'd builtins, DISTINCT via array_distinct on the pairs (the
  // reference's rule that ORDER BY must equal the argument is
  // enforced). Presto's default null ordering is NULLS LAST for both
  // directions (SortItem.NullOrdering default via
  // ExpressionAnalyzer/OrderingScheme) — the comparator encodes that.
  private val aggOrderByRe = """(?i)\bORDER\s+BY\b""".r
  // Aggregates whose RESULT cannot depend on feed order, plus the ones
  // whose order-dependent choice the reference documents as arbitrary
  // (map_agg duplicate keys, arbitrary(), any_value): ORDER BY is
  // result-identical to drop for these. Anything else order-sensitive
  // fails loudly rather than silently diverging.
  private val OrderInsensitiveAggs = Set(
    "sum", "avg", "count", "count_if", "min", "max", "min_by", "max_by",
    "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop",
    "var_samp", "skewness", "kurtosis", "corr", "covar_pop",
    "covar_samp", "regr_intercept", "regr_slope", "geometric_mean",
    "bool_and", "bool_or", "every", "bitwise_and_agg", "bitwise_or_agg",
    "approx_distinct", "approx_percentile", "approx_set", "merge",
    "checksum", "histogram", "map_agg", "map_union", "set_agg",
    "set_union", "arbitrary", "any_value", "collect_set")

  private val aggOrderKeywords = Set("OVER", "GROUP", "AS", "IN", "ON",
    "AND", "OR", "NOT", "WHERE", "FROM", "JOIN", "SELECT", "WHEN",
    "THEN", "ELSE", "EXISTS", "VALUES", "ALL", "ANY", "SOME", "BY",
    "UNION", "INTERSECT", "EXCEPT", "HAVING", "LIKE", "BETWEEN",
    "CASE", "END", "WITH", "LATERAL", "USING", "FILTER", "PARTITION")

  private def splitTopLevel(s: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach { c =>
      if (inStr) { if (c == '\'') inStr = false; sb += c }
      else c match {
        case '\'' => inStr = true; sb += c
        case '(' | '[' => depth += 1; sb += c
        case ')' | ']' => depth -= 1; sb += c
        case ',' if depth == 0 => parts += sb.toString; sb.clear()
        case other => sb += other
      }
    }
    if (sb.nonEmpty) parts += sb.toString
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  private val sortItemRe =
    """(?is)^(.*?)\s*(?:\b(ASC|DESC)\b)?\s*(?:\bNULLS\s+(FIRST|LAST)\b)?\s*$""".r

  private def rewriteAggOrderBy(q0: String): String = {
    var q = q0
    var progress = true
    while (progress) {
      progress = false
      val mask = stringMask(q)
      @inline def identChar(c: Char): Boolean =
        c.isLetterOrDigit || c == '_' || c == '.'
      val hit = aggOrderByRe.findAllMatchIn(q)
        .filter(m => !mask(m.start)).flatMap { m =>
          // the unmatched '(' this ORDER BY sits inside
          var depth = 0
          var opener = -1
          var i = m.start - 1
          while (i >= 0 && opener < 0) {
            if (!mask(i)) {
              if (q.charAt(i) == ')') depth += 1
              else if (q.charAt(i) == '(') {
                if (depth == 0) opener = i else depth -= 1
              }
            }
            i -= 1
          }
          if (opener < 0) None
          else {
            // the identifier immediately before the '(' — a function
            // name if this is a call
            var e = opener - 1
            while (e >= 0 && q.charAt(e).isWhitespace) e -= 1
            var b = e
            while (b >= 0 && identChar(q.charAt(b))) b -= 1
            val fn = if (e < 0 || b == e) "" else q.substring(b + 1, e + 1)
            // first token after the opener: a subquery is not a call
            var f = opener + 1
            while (f < q.length && q.charAt(f).isWhitespace) f += 1
            val sub = q.substring(f, math.min(q.length, f + 6))
              .toUpperCase
            val isCall = fn.nonEmpty &&
              !aggOrderKeywords(fn.toUpperCase) &&
              !sub.startsWith("SELECT") && !sub.startsWith("WITH")
            if (isCall) Some((m, opener, fn, b + 1)) else None
          }
        }.toSeq.headOption
      hit.foreach { case (m, opener, fn, nameStart) =>
        // the call's closing ')'
        var depth = 0
        var closer = -1
        var j = m.end
        while (j < q.length && closer < 0) {
          if (!mask(j)) {
            if (q.charAt(j) == '(') depth += 1
            else if (q.charAt(j) == ')') {
              if (depth == 0) closer = j else depth -= 1
            }
          }
          j += 1
        }
        require(closer > 0, s"unbalanced aggregate ORDER BY in: $q")
        val argsText = q.substring(opener + 1, m.start).trim
        val keysText = q.substring(m.end, closer).trim
        // a trailing FILTER (WHERE ...) belongs to the AGGREGATE — it
        // must ride the inner collect_list, not the transform wrapper
        val filterRe = """(?is)^\s*FILTER\s*\(""".r
        val (filterText, spanEnd) =
          filterRe.findFirstMatchIn(q.substring(closer + 1)) match {
            case Some(fm) =>
              var d = 1
              var k = closer + 1 + fm.end
              while (k < q.length && d > 0) {
                if (!mask(k)) {
                  if (q.charAt(k) == '(') d += 1
                  else if (q.charAt(k) == ')') d -= 1
                }
                k += 1
              }
              (" " + q.substring(closer + 1, k).trim, k - 1)
            case None => ("", closer)
          }
        // the reference REJECTS the windowed form outright
        // (StatementAnalyzer.java:1484) — raise its exact text instead
        // of letting the rewritten call hit Spark's parser with a
        // dangling OVER
        if ("""(?is)^\s*(?:(?:IGNORE|RESPECT)\s+NULLS\s+)?OVER\b""".r
            .findFirstIn(q.substring(spanEnd + 1)).isDefined)
          sys.error("Window function with ORDER BY is not supported")
        def parsedKeys: Seq[(String, Boolean, Boolean)] = {
          val keys = splitTopLevel(keysText).map {
            case sortItemRe(e, dir, no) =>
              val asc = dir == null || dir.equalsIgnoreCase("ASC")
              val nullsLast =
                if (no == null) true else no.equalsIgnoreCase("LAST")
              (e.trim, asc, nullsLast)
          }
          require(keys.nonEmpty, "empty aggregate ORDER BY")
          keys
        }
        def comparator(keys: Seq[(String, Boolean, Boolean)]): String =
          keys.zipWithIndex.foldRight("0") {
            case (((_, asc, nullsLast), i), inner) =>
              val l = s"l._o${i + 1}"
              val r = s"r._o${i + 1}"
              val (lt, gt) = if (asc) (-1, 1) else (1, -1)
              val (ln, rn) =
                if (nullsLast) (1, -1) else (-1, 1)
              s"CASE WHEN $l IS NULL AND $r IS NULL THEN $inner " +
                s"WHEN $l IS NULL THEN $ln " +
                s"WHEN $r IS NULL THEN $rn " +
                s"WHEN $l < $r THEN $lt " +
                s"WHEN $l > $r THEN $gt ELSE $inner END"
          }
        def keyFields(keys: Seq[(String, Boolean, Boolean)]): String =
          keys.zipWithIndex
            .map { case ((e, _, _), i) => s"'_o${i + 1}', $e" }
            .mkString(", ")
        val replacement =
          if (fn.equalsIgnoreCase("array_agg")) {
            val distinct = argsText.toUpperCase.startsWith("DISTINCT")
            val arg = if (distinct)
              argsText.substring("DISTINCT".length).trim else argsText
            val keys = parsedKeys
            if (distinct)
              // AggregationAnalyzer: DISTINCT restricts ORDER BY to the
              // arguments themselves
              require(keys.map(_._1.toLowerCase) ==
                  Seq(arg.toLowerCase),
                "For aggregate function with DISTINCT, ORDER BY " +
                  "expressions must appear in arguments")
            val collected =
              s"collect_list(named_struct(${keyFields(keys)}, " +
                s"'_v', $arg))" + filterText
            val deduped =
              if (distinct) s"array_distinct($collected)" else collected
            s"transform(array_sort($deduped, " +
              s"(l, r) -> ${comparator(keys)}), s -> s._v)"
          } else if (fn.equalsIgnoreCase("multimap_agg")) {
            // multimap_agg(k, v ORDER BY ...) — the VALUE ORDER per key
            // is observable, so the ordering must be real: sort the
            // (keys, k, v) structs once, then build map<k, array<v>>
            // from the sorted pairs. The sorted aggregate text repeats,
            // but Spark dedups identical aggregate expressions, so the
            // collect runs once; the per-group rebuild is
            // O(distinct_keys × n) post-aggregation — same group-local
            // materialization the reference's ordered accumulator pays.
            val args = splitTopLevel(argsText)
            require(args.size == 2,
              s"multimap_agg takes (key, value), got: $argsText")
            val keys = parsedKeys
            val sorted = s"array_sort(collect_list(named_struct(" +
              s"${keyFields(keys)}, '_k', ${args(0)}, '_v', ${args(1)}))" +
              s"$filterText, (l, r) -> ${comparator(keys)})"
            s"map_from_entries(transform(" +
              s"array_distinct(transform($sorted, p -> p._k)), " +
              s"kk -> struct(kk, transform(" +
              s"filter($sorted, p -> p._k <=> kk), p -> p._v))))"
          } else if (OrderInsensitiveAggs(fn.toLowerCase)) {
            // order-insensitive, or the reference documents the
            // order-dependent choice as arbitrary (map_agg's duplicate
            // key, arbitrary()): the clause is result-identical to
            // drop; the call's own FILTER stays in place
            s"$fn($argsText)" + filterText
          } else {
            // an order-SENSITIVE aggregate we have not re-expressed:
            // silently dropping the clause would change observable
            // results — fail loudly instead
            sys.error(s"aggregate ORDER BY is not supported for " +
              s"$fn (supported: array_agg, multimap_agg; " +
              "order-insensitive aggregates ignore the clause)")
          }
        q = q.substring(0, nameStart) + replacement +
          q.substring(spanEnd + 1)
        progress = true
      }
    }
    q
  }

  /** Presto parametric TYPE spellings inside CAST targets →
    * Spark's angle-bracket grammar (TypeSignature.java vs Spark DDL):
    * `row(x bigint, y double)` → `struct<x: bigint, y: double>`,
    * `array(T)` → `array<T>`, `map(K, V)` → `map<K, V>`, recursively.
    * Only the type position of CAST/TRY_CAST is touched — `array(1, 2)`
    * anywhere else is the constructor FUNCTION and must not rewrite.
    * Non-parametric names and `decimal(p,s)`/`varchar(n)` (same spelling
    * in both grammars) pass through. Unnamed ROW fields are left as-is
    * (loud downstream — Spark structs need field names). */
  private[functions] def transformPrestoType(t0: String): String = {
    val t = t0.trim
    val m = """(?is)^(row|array|map)\s*\((.*)\)$""".r.findFirstMatchIn(t)
    m match {
      case None => t.toLowerCase match {
        // Presto base spellings Spark's type grammar rejects or renames
        // (unparameterized varchar is only legal in Presto)
        case "varchar" => "string"
        case "varbinary" => "binary"
        case "json" => "string"
        case _ => t
      }
      case Some(mm) =>
        val kind = mm.group(1).toLowerCase
        val inner = mm.group(2)
        // split top-level commas (no string literals inside type text)
        val parts = {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var depth = 0
          var start = 0
          var i = 0
          while (i < inner.length) {
            inner.charAt(i) match {
              case '(' | '<' => depth += 1
              case ')' | '>' => depth -= 1
              case ',' if depth == 0 =>
                out += inner.substring(start, i); start = i + 1
              case _ =>
            }
            i += 1
          }
          out += inner.substring(start)
          out.map(_.trim).toSeq
        }
        kind match {
          case "array" if parts.length == 1 =>
            s"array<${transformPrestoType(parts.head)}>"
          case "map" if parts.length == 2 =>
            s"map<${transformPrestoType(parts(0))}, " +
              s"${transformPrestoType(parts(1))}>"
          case "row" if parts.forall(_.contains(" ")) =>
            val fields = parts.map { p =>
              val sp = p.indexOf(' ')
              val name = p.substring(0, sp).trim
              val typ = transformPrestoType(p.substring(sp + 1))
              s"$name: $typ"
            }
            s"struct<${fields.mkString(", ")}>"
          case _ => t // unnamed row / arity mismatch: leave, fail loudly
        }
    }
  }

  /** Rewrite the TYPE position of every CAST/TRY_CAST through
    * [[transformPrestoType]] (masked, depth-aware `AS` search). Each
    * cast site is visited once left-to-right; casts nested in the value
    * expression start later in the string and get their own visit,
    * while types nested inside the TYPE text recurse in the
    * transformer. */
  private def rewriteCastTypes(q0: String): String = {
    val castRe = """(?i)\b(?:try_)?cast\s*\(""".r
    @inline def identChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'
    var q = q0
    var idx = 0
    var continue = true
    while (continue) {
      val mask = stringMask(q)
      castRe.findAllMatchIn(q).find(m => m.start >= idx && !mask(m.start)) match {
        case None => continue = false
        case Some(m) =>
          var depth = 1
          var i = m.end
          var asPos = -1
          while (i < q.length && depth > 0) {
            val c = q.charAt(i)
            if (!mask(i)) {
              if (c == '(') depth += 1
              else if (c == ')') depth -= 1
              else if (depth == 1 && i + 2 < q.length &&
                q.regionMatches(true, i, "AS", 0, 2) &&
                !identChar(q.charAt(i - 1)) &&
                Character.isWhitespace(q.charAt(i + 2)))
                asPos = i // keep the LAST top-level AS
            }
            i += 1
          }
          if (depth == 0 && asPos >= 0) {
            val close = i - 1
            val typeText = q.substring(asPos + 2, close)
            // whole-type bare varchar is bareVarcharRe's job (which
            // preserves the original spacing); here only parametric
            // spellings and NESTED varchar/varbinary/json rewrite
            val rewritten =
              if (typeText.trim.equalsIgnoreCase("varchar")) typeText.trim
              else transformPrestoType(typeText)
            if (rewritten != typeText.trim)
              q = q.substring(0, asPos + 2) + " " + rewritten +
                q.substring(close)
          }
          // positions before m.end are unaffected by the splice
          idx = m.end
      }
    }
    q
  }

  /** Presto `ARRAY[...]` literals → Spark `array(...)`: bracket-depth
    * scan (subscripts like a[1] nest correctly), string literals
    * skipped, nested ARRAY[ handled by re-scanning. */
  private def rewriteArrayLiterals(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val mask = stringMask(q)
      var i = 0
      var found = -1
      while (i < q.length && found < 0) {
        if (!mask(i) && q.regionMatches(true, i, "ARRAY[", 0, 6) &&
          (i == 0 || {
            val p = q.charAt(i - 1)
            !Character.isLetterOrDigit(p) && p != '_'
          })) found = i
        i += 1
      }
      if (found >= 0) {
        var j = found + 6
        var depth = 1
        while (j < q.length && depth > 0) {
          val c = q.charAt(j)
          if (!mask(j)) {
            if (c == '[') depth += 1
            else if (c == ']') depth -= 1
          }
          if (depth > 0) j += 1
        }
        require(depth == 0, "rewritePrestoSql: unbalanced ARRAY[ literal")
        q = q.substring(0, found) + "array(" +
          q.substring(found + 6, j) + ")" + q.substring(j + 1)
        changed = true
      }
    }
    q
  }

  /** Presto `CREATE FUNCTION` spellings (SqlBase.g4:62-69;
    * presto-function-namespace-managers): qualified names
    * (`catalog.schema.fn` — namespace-manager routing; this engine's
    * functions are session-scoped, so the name collapses to its last
    * segment and TEMPORARY is forced), `RETURNS NULL ON NULL INPUT`
    * (not in Spark's SQL-UDF grammar — absorbed by wrapping the body in
    * an any-argument-null guard, which IS the semantics), and
    * `CALLED ON NULL INPUT` (Spark's default — dropped). `LANGUAGE
    * SQL`/`DETERMINISTIC`/`COMMENT` pass through (Spark 4 accepts
    * them). `RETURNS VARCHAR` widens to STRING like the cast rewrite. */
  private[functions] val createFnRe =
    ("""(?is)\bCREATE\s+(OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?FUNCTION\s+""" +
      """([A-Za-z_][\w.]*)\s*\(([^)]*)\)\s*RETURNS\s+""").r

  private def rewriteCreateFunction(q0: String): String = {
    val m = createFnRe.findFirstMatchIn(q0).getOrElse(return q0)
    val orReplace = Option(m.group(1)).map(_ => "OR REPLACE ").getOrElse("")
    val name = m.group(2).split('.').last
    val params = m.group(3)
    var rest = q0.substring(m.end) // "<type> [characteristics] RETURN <body>"
    val nullOnNull =
      """(?is)\bRETURNS\s+NULL\s+ON\s+NULL\s+INPUT\b""".r
        .findFirstIn(rest).isDefined
    rest = rest
      .replaceAll("(?is)\\bRETURNS\\s+NULL\\s+ON\\s+NULL\\s+INPUT\\b", " ")
      .replaceAll("(?is)\\bCALLED\\s+ON\\s+NULL\\s+INPUT\\b", " ")
    if (nullOnNull) {
      val retM = """(?is)\bRETURN\b""".r.findFirstMatchIn(rest).getOrElse(
        sys.error("rewritePrestoSql: CREATE FUNCTION without RETURN"))
      val argNames = params.split(',').map(_.trim).filter(_.nonEmpty)
        .map(_.split("\\s+")(0))
      val guard = argNames.map(a => s"$a IS NULL").mkString(" OR ")
      val body = rest.substring(retM.end).trim
      rest = rest.substring(0, retM.end) +
        (if (argNames.isEmpty) s" $body"
         else s" CASE WHEN $guard THEN NULL ELSE ($body) END")
    }
    val retVarchar = """(?is)^(\s*)VARCHAR\b""".r
    rest = retVarchar.replaceFirstIn(rest, "$1STRING")
    s"CREATE ${orReplace}TEMPORARY FUNCTION $name($params) RETURNS " + rest
  }

  /** Presto `expr AT TIME ZONE 'zone'` (SqlBase.g4 valueExpression
    * #atTimeZone; presto-main DateTimeOperators): rewritten pre-parse
    * onto the per-value zoned layer. The receiver — a plain TIMESTAMP,
    * which the reference interprets in the session zone (UTC here) —
    * becomes struct<utc, tz> at the target zone: same instant, new
    * display zone, composable with every zoned_* function (qp1).
    * Receiver matched backward through the same postfix units as the
    * subscript rewrite (qualified names, call/paren groups) plus
    * `timestamp '...'` literals. Already-zoned struct values spell
    * zoned_at_timezone; INTERVAL-literal zones stay unsupported (loud
    * parse failure, not a wrong answer). */
  private val atTimeZoneRe = """(?is)\bAT\s+TIME\s+ZONE\s+('[^']*')""".r
  // the grammar's OTHER zone spelling (SqlBase.g4:393-395
  // #timeZoneInterval): `AT TIME ZONE INTERVAL '[-]H[:MM]' HOUR [TO
  // MINUTE]` — a fixed-offset zone (DateTimeFunctions resolves the
  // interval to a TimeZoneKey offset). Normalized here to the string
  // form and handled by the machinery below.
  private val atTzIntervalRe =
    ("""(?is)\bAT\s+TIME\s+ZONE\s+INTERVAL\s+(-)?\s*'(-)?""" +
      """(\d{1,2})(?::(\d{2}))?'\s+HOUR(?:\s+TO\s+MINUTE)?\b""").r
  private def rewriteAtTimeZone(q0: String): String = {
    var q = maskedReplaceAll(q0, atTzIntervalRe) { m =>
      val neg = m.group(1) != null ^ m.group(2) != null
      val h = m.group(3).toInt
      val mi = Option(m.group(4)).map(_.toInt).getOrElse(0)
      require(h <= 14 && mi <= 59,
        s"invalid time zone offset interval: ${m.matched}")
      f"AT TIME ZONE '${if (neg) "-" else "+"}$h%02d:$mi%02d'"
    }
    var changed = true
    while (changed) {
      changed = false
      val mask = stringMask(q)
      @inline def identChar(c: Char): Boolean =
        Character.isLetterOrDigit(c) || c == '_'
      def groupStart(end: Int): Int = {
        var d = 1
        var k = end - 1
        while (k >= 0 && d > 0) {
          val c = q.charAt(k)
          if (!mask(k)) { if (c == ')') d += 1 else if (c == '(') d -= 1 }
          if (d > 0) k -= 1
        }
        require(d == 0, "rewritePrestoSql: unbalanced group before AT TIME ZONE")
        k
      }
      atTimeZoneRe.findAllMatchIn(q).find(mm => !mask(mm.start)).foreach { mm =>
        var p = mm.start - 1
        while (p >= 0 && Character.isWhitespace(q.charAt(p))) p -= 1
        require(p >= 0, "rewritePrestoSql: AT TIME ZONE without a receiver")
        var rs = p
        if (q.charAt(rs) == '\'') {
          // string-literal receiver: swallow the literal, then an
          // optional type keyword (timestamp '...' / date '...')
          rs -= 1
          while (rs >= 0 && mask(rs)) rs -= 1
          rs += 1
          var k = rs - 1
          while (k >= 0 && Character.isWhitespace(q.charAt(k))) k -= 1
          if (k >= 0 && identChar(q.charAt(k))) {
            var w = k
            while (w > 0 && identChar(q.charAt(w - 1))) w -= 1
            val word = q.substring(w, k + 1).toUpperCase
            if (word == "TIMESTAMP" || word == "DATE") rs = w
          }
        } else {
          var more = true
          while (more) {
            more = false
            if (q.charAt(rs) == ')') rs = groupStart(rs)
            if (q.charAt(rs) == '(' || identChar(q.charAt(rs))) {
              while (rs > 0 && identChar(q.charAt(rs - 1))) rs -= 1
            }
            if (rs > 1 && q.charAt(rs - 1) == '.' && !mask(rs - 1) && {
              val c = q.charAt(rs - 2)
              (identChar(c) || c == ')') && !mask(rs - 2)
            }) { rs -= 2; more = true }
          }
        }
        val recv = q.substring(rs, p + 1)
        val zone = mm.group(1)
        q = q.substring(0, rs) +
          s"named_struct('utc', cast(($recv) as timestamp_ntz), 'tz', $zone)" +
          q.substring(mm.end)
        changed = true
      }
    }
    q
  }

  /** Presto bracket subscripts `expr[i]` → `element_at(expr, i)`:
    * Presto's `[]` is 1-based and errors out-of-bounds
    * (`presto-main/.../scalar/ArraySubscriptOperator.java`), Spark's is
    * 0-based — a verbatim Presto query with `arr[1]` would otherwise
    * silently read the wrong element. Runs AFTER the ARRAY-literal
    * rewrite, so any remaining `[` preceded by an identifier, `)`, or
    * `]` is a subscript. The receiver is matched backward through
    * qualified-identifier chains (`t.xs`), call/paren groups
    * (`split(s, '.')`), and chained subscripts; string literals are
    * masked on every scan. Slice syntax (`a[i:j]`, not Presto) and `[`
    * with no receiver are left untouched. */
  private def rewriteSubscripts(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val mask = stringMask(q)
      // backward scan to the opener matching the close at `end`
      def groupStart(end: Int): Int = {
        val close = q.charAt(end)
        val open = if (close == ')') '(' else '['
        var d = 1
        var k = end - 1
        while (k >= 0 && d > 0) {
          val c = q.charAt(k)
          if (!mask(k)) {
            if (c == close) d += 1 else if (c == open) d -= 1
          }
          if (d > 0) k -= 1
        }
        require(d == 0, "rewritePrestoSql: unbalanced group before subscript")
        k
      }
      @inline def identChar(c: Char): Boolean =
        Character.isLetterOrDigit(c) || c == '_'
      var i = 0
      while (i < q.length && !changed) {
        if (q.charAt(i) == '[' && !mask(i)) {
          var p = i - 1
          while (p >= 0 && Character.isWhitespace(q.charAt(p))) p -= 1
          val hasRecv = p >= 0 && !mask(p) && {
            val c = q.charAt(p)
            identChar(c) || c == ')' || c == ']'
          }
          if (hasRecv) {
            // matching `]` + top-level `:` slice guard
            var j = i + 1
            var depth = 1
            var sliced = false
            while (j < q.length && depth > 0) {
              val c = q.charAt(j)
              if (!mask(j)) {
                if (c == '[') depth += 1
                else if (c == ']') depth -= 1
                else if (c == ':' && depth == 1) sliced = true
              }
              if (depth > 0) j += 1
            }
            require(depth == 0, "rewritePrestoSql: unbalanced subscript")
            if (!sliced) {
              // receiver start: walk back through postfix units
              var rs = p
              var more = true
              while (more) {
                more = false
                if (q.charAt(rs) == ')' || q.charAt(rs) == ']')
                  rs = groupStart(rs)
                if (q.charAt(rs) == '(' || identChar(q.charAt(rs))) {
                  while (rs > 0 && identChar(q.charAt(rs - 1))) rs -= 1
                }
                if (rs > 1 && q.charAt(rs - 1) == '.' && !mask(rs - 1) && {
                  val c = q.charAt(rs - 2)
                  (identChar(c) || c == ')' || c == ']') && !mask(rs - 2)
                }) { rs -= 2; more = true }
              }
              val recv = q.substring(rs, p + 1)
              val inner = q.substring(i + 1, j)
              // presto_subscript = element_at with the reference's LOUD
              // out-of-bounds / missing-key semantics (PrestoSubscript)
              q = q.substring(0, rs) + "presto_subscript(" + recv + ", " +
                inner + ")" + q.substring(j + 1)
              changed = true
            }
          }
        }
        i += 1
      }
    }
    q
  }

  /** Presto `CROSS JOIN UNNEST(expr) AS t(c1[, c2])` → Spark
    * `LATERAL VIEW explode(expr) t AS c1[, c2]`. Single-expression
    * UNNEST only (array → 1 column, map → 2); multi-array zip and WITH
    * ORDINALITY pass through untouched (they fail at parse exactly as
    * before — no partial rewrites). The argument is matched with a
    * paren-depth scan, so nested calls and string literals survive. */
  private def rewriteUnnest(q0: String): String = {
    var q = q0
    var changed = true
    val head = "CROSS JOIN UNNEST".toLowerCase
    while (changed) {
      changed = false
      val mask = stringMask(q)
      var i = 0
      var found = -1
      while (i < q.length && found < 0) {
        if (!mask(i) && q.regionMatches(true, i, "CROSS", 0, 5) &&
          q.substring(i).take(40).toLowerCase.replaceAll("\\s+", " ")
            .startsWith(head.replaceAll("\\s+", " "))) found = i
        i += 1
      }
      if (found >= 0) {
        val open = q.indexOf('(', found)
        if (open < 0) return q
        var j = open + 1
        var depth = 1
        while (j < q.length && depth > 0) {
          val c = q.charAt(j)
          if (!mask(j)) {
            if (c == '(') depth += 1
            else if (c == ')') depth -= 1
          }
          if (depth > 0) j += 1
        }
        if (depth != 0) return q
        val arg = q.substring(open + 1, j)
        // top-level comma = multi-array zip; ordinality also unsupported
        val argMask = stringMask(arg)
        var k = 0; var d = 0; var topComma = false
        while (k < arg.length) {
          val c = arg.charAt(k)
          if (!argMask(k)) {
            if (c == '(') d += 1
            else if (c == ')') d -= 1
            else if (c == ',' && d == 0) topComma = true
          }
          k += 1
        }
        val tail = q.substring(j + 1)
        val aliasRe =
          """(?is)^\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*\(\s*([A-Za-z0-9_]+(?:\s*,\s*[A-Za-z0-9_]+)?)\s*\)""".r
        val ord = tail.take(30).toUpperCase.replaceAll("\\s+", " ")
          .startsWith(" WITH ORDINALITY") ||
          tail.toUpperCase.replaceAll("\\s+", " ").startsWith("WITH ORDINALITY")
        aliasRe.findFirstMatchIn(tail) match {
          case Some(m) if !topComma && !ord =>
            q = q.substring(0, found) +
              s"LATERAL VIEW explode($arg) ${m.group(1)} AS ${m.group(2)}" +
              tail.substring(m.end)
            changed = true
          case _ => return q // unsupported shape: leave verbatim
        }
      }
    }
    q
  }

  def rewritePrestoSql(q: String): String = {
    // Every regex pass goes through maskedReplaceAll — a match starting
    // inside a string literal is inert (the RewritePropertySuite
    // identity property; bareVarchar/TABLESAMPLE once rewrote literal
    // CONTENT because their patterns carry no quote anchor).
    val fnned = rewriteCreateFunction(rewriteAggOrderBy(q))
    val dated = maskedReplaceAll(fnned, prestoDateFnRe)(
      m => "presto_" + m.group(1).toLowerCase + "('" +
        m.group(2).toLowerCase + "'")
    // presto_zoned_shield: non-foldable wrapper so a both-sides-literal
    // zoned comparison survives ConstantFolding on driver-provided
    // sessions until ZonedInstantComparison rewrites it (which then
    // strips the shield) — see plans/ZonedComparison.scala (r10).
    // NOT inside VALUES inline tables: their analysis requires every
    // tuple expression foldable (and a tuple element is a value, not a
    // predicate, so nothing is lost).
    val datedValues = valuesSpans(dated)
    def zonedCtor(at: Int, wall: String, zone: String): String = {
      val ctor = s"named_struct('utc', to_utc_timestamp(" +
        s"cast('$wall' as timestamp_ntz), '$zone'), 'tz', '$zone')"
      if (datedValues.exists(s => at >= s._1 && at < s._2)) ctor
      else s"presto_zoned_shield($ctor)"
    }
    val tstz = maskedReplaceAll(dated, timestampTzLiteralRe)(m =>
      zonedCtor(m.start, m.group(1), m.group(2)))
    val ttz = maskedReplaceAll(tstz, timeTzLiteralRe)(m =>
      // positions shifted by the previous pass — recompute lazily only
      // if a TIME WITH TIME ZONE literal is actually present
      if (valuesSpans(tstz).exists(s => m.start >= s._1 && m.start < s._2))
        s"named_struct('utc', to_utc_timestamp(" +
          s"cast('1970-01-01 ${m.group(1)}' as timestamp_ntz), " +
          s"'${m.group(2)}'), 'tz', '${m.group(2)}')"
      else
        s"presto_zoned_shield(named_struct('utc', to_utc_timestamp(" +
          s"cast('1970-01-01 ${m.group(1)}' as timestamp_ntz), " +
          s"'${m.group(2)}'), 'tz', '${m.group(2)}'))")
    val timed = maskedReplaceAll(ttz, timeLiteralRe)(
      m => s"cast('1970-01-01 ${m.group(1)}' as timestamp_ntz)")
    val decimaled = maskedReplaceAll(timed, decimalLiteralRe) { m =>
      val s = m.group(1)
      val dot = s.indexOf('.')
      val scale = if (dot < 0) 0 else s.length - dot - 1
      // Presto's Decimals.parse excludes leading zeros from precision:
      // DECIMAL '0.1' is decimal(1,1), '0.05' decimal(2,2) — counting all
      // digits would widen result types of downstream decimal arithmetic.
      val integral = (if (dot < 0) s else s.substring(0, dot))
        .dropWhile(c => c == '0' || c == '-' || c == '+')
      val precision = math.max(integral.length + scale, 1)
      s"cast('$s' as decimal($precision, $scale))"
    }
    val sampled = maskedReplaceAll(decimaled, tablesampleRe)(
      m => s"TABLESAMPLE (${m.group(2)} PERCENT)")
    maskedReplaceAll(
      rewriteCastTypes(rewriteSubscripts(rewriteAtTimeZone(
        rewriteUnnest(rewriteArrayLiterals(sampled))))), bareVarcharRe)(
      m => m.group(1) + "string" + m.group(2))
  }
}

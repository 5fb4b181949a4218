package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateMap, DateFormatClass, Expression, ExpressionInfo, FormatString, Literal, RuntimeReplaceable, TimestampAdd, TimestampDiff, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType, StringType, TimestampType}

/** SQL-visible registry of PrestoDB function names, so reference SQL runs
  * against `spark.sql(...)` unmodified (SURVEY §7.1 `Registry.scala`).
  *
  * Every function is an expression TEMPLATE: a SQL fragment parsed once and
  * re-instantiated per call site with the argument expressions substituted
  * for `__a`/`__b`/`__c` placeholders. The result is a tree of Spark
  * built-in expressions — fully codegen'd, no UDFs, indistinguishable from
  * hand-written `functions._` calls after analysis. Functions whose Presto
  * name and semantics already exist in Spark (length, reverse, power,
  * split_part, width_bucket, …) are intentionally absent.
  *
  * Name sources: `presto-main/.../scalar/StringFunctions.java`,
  * `MathFunctions.java`, `DateTimeFunctions.java`, `UrlFunctions.java`,
  * `VarbinaryFunctions.java`; aggregate names from
  * `presto-main/.../aggregation/`.
  */
object Registry {

  // parse_duration's '<num><unit>' grammar (DateTimeFunctions.java
  // parseDuration; Duration.java VALID_UNITS) — SQL-literal regex, so
  // doubled backslashes survive Spark's string-escape processing.
  private val durationRe =
    "'^\\\\s*([0-9]+(?:\\\\.[0-9]+)?)\\\\s*(ns|us|ms|s|m|h|d)\\\\s*$'"
  private val durationSecs =
    s"cast(regexp_extract(__a, $durationRe, 1) as double) * " +
      s"CASE regexp_extract(__a, $durationRe, 2) " +
      "WHEN 'ns' THEN 0.000000001 WHEN 'us' THEN 0.000001 " +
      "WHEN 'ms' THEN 0.001 WHEN 's' THEN 1.0 WHEN 'm' THEN 60.0 " +
      "WHEN 'h' THEN 3600.0 WHEN 'd' THEN 86400.0 END"

  // One '<n> <unit>[s]' segment of human_readable_seconds; NULL when the
  // count is zero so concat_ws drops it.
  private def hrSegment(count: String, unit: String): String =
    s"CASE WHEN $count > 0 THEN concat($count, " +
      s"CASE WHEN $count = 1 THEN ' $unit' ELSE ' ${unit}s' END) END"

  // Wilson score interval bound (MathFunctions.java wilsonIntervalLower/
  // Upper): identical arithmetic tree on the oracle side gives bitwise-
  // equal doubles, so qe9 compares unrounded.
  // __c (the z-score) is forced to double: a bare 1.96 literal parses as
  // DECIMAL in both engines but decimal division scale rules differ, so
  // the arithmetic must happen in IEEE doubles on both sides.
  private def wilson(sign: String): String =
    "CASE WHEN __b <= 0 OR __a < 0 OR __a > __b OR __c < 0 THEN " +
      "raise_error('wilson_interval: requires 0 <= successes <= trials, " +
      "z >= 0') ELSE " +
      "(cast(__a as double) / __b " +
      "+ cast(__c as double) * cast(__c as double) / (2 * __b) " +
      s"$sign cast(__c as double) * sqrt(cast(__a as double) / __b * " +
      "(1 - cast(__a as double) / __b) / __b " +
      "+ cast(__c as double) * cast(__c as double) / " +
      "(4 * cast(__b as double) * __b))) " +
      "/ (1 + cast(__c as double) * cast(__c as double) / __b) END"

  // Zoned-timestamp template helpers: trailing zone recognizer (Z,
  // ±HH:MM, or a space-separated IANA name like Asia/Kolkata — the same
  // alternative timestampTzLiteralRe accepts; ADVICE r6: named zones
  // previously fell through to a silent NULL), the zone-of-literal
  // extractor (Z → UTC), and the signed whole-minute offset of a
  // struct<utc,tz> value at its own instant (exact: zone offsets are
  // whole minutes, so div 60 is exact and % keeps the dividend's sign —
  // (-3,-30) for a -03:30 zone).
  private val zonedTailRe =
    "(Z|[+-][0-9]{2}:[0-9]{2}|[ ][A-Za-z][A-Za-z_0-9/+-]*)$"
  private def zonedZoneOf(a: String): String =
    s"coalesce(nullif(regexp_extract($a, '([+-][0-9]{2}:[0-9]{2})$$', 1)," +
      s" ''), nullif(regexp_extract($a, '[ ]([A-Za-z][A-Za-z_0-9/+-]*)$$'," +
      " 1), ''), 'UTC')"
  private def zonedOffMin(a: String): String =
    s"((cast(cast(from_utc_timestamp($a.utc, $a.tz) as timestamp) as long)" +
      s" - cast(cast($a.utc as timestamp) as long)) div 60)"

  // Shoelace signed-sum fold over an implicit-closed ring of
  // struct<x,y> vertices — shared by st_area and st_centroid. All terms
  // are products/sums of the inputs, so on a dyadic-coordinate fixture
  // the fold is exact in double and the oracle replays it bitwise.
  private def cross(i: String): String =
    s"element_at(__a, $i).x * element_at(__a, $i % size(__a) + 1).y - " +
      s"element_at(__a, $i % size(__a) + 1).x * element_at(__a, $i).y"
  private val shoelace =
    s"aggregate(sequence(1, size(__a)), 0D, (s, i) -> s + ${cross("i")})"
  // explicit closure = the structural model's polygon tag (see the
  // structural-geometry template block)
  private val ringClosed =
    "(size(__a) >= 4 AND element_at(__a, 1).x = element_at(__a, size(__a)).x " +
      "AND element_at(__a, 1).y = element_at(__a, size(__a)).y)"
  // Σ (c_i + c_{i+1}) * cross_i for coordinate c — the polygon-centroid
  // numerator (the /6 is folded into the 3 * shoelace denominator since
  // shoelace here is twice the signed area).
  private def centroidSum(c: String): String =
    s"aggregate(sequence(1, size(__a)), 0D, (s, i) -> s + " +
      s"(element_at(__a, i).$c + element_at(__a, i % size(__a) + 1).$c) * " +
      s"(${cross("i")}))"

  /** Presto name → (arity, SQL template over __a/__b/__c). */
  private val templates: Seq[(String, Int, String)] = Seq(
    // --- string (StringFunctions.java) ---
    ("strpos", 2, "instr(__a, __b)"),
    ("codepoint", 1, "ascii(__a)"),
    ("chr", 1, "char(__a)"),
    ("levenshtein_distance", 2, "levenshtein(__a, __b)"),
    ("starts_with", 2, "startswith(__a, __b)"),
    ("ends_with", 2, "endswith(__a, __b)"),
    ("regexp_like", 2, "__a rlike __b"),
    ("split_to_map", 3, "str_to_map(__a, __b, __c)"),
    // multimap_from_entries (MultimapFromEntriesFunction.java): entries
    // are row(key, value) structs; duplicate keys collect values in
    // entry order. Same distinct-keys transform as split_to_multimap.
    ("multimap_from_entries", 1,
      "map_from_entries(transform(" +
        "array_distinct(transform(__a, e -> e.key)), " +
        "k -> struct(k AS key, transform(" +
        "filter(__a, e -> e.key = k), e -> e.value) AS value)))"),
    // --- JSON extras (JsonFunctions.java) ---
    // json_size: element count of the array/object at path, 0 for
    // scalars, NULL when the path misses.
    ("json_size", 2,
      "cast(CASE WHEN get_json_object(__a, __b) IS NULL THEN NULL " +
        "WHEN startswith(ltrim(get_json_object(__a, __b)), '[') " +
        "THEN json_array_length(get_json_object(__a, __b)) " +
        "WHEN startswith(ltrim(get_json_object(__a, __b)), '{') " +
        "THEN size(json_object_keys(get_json_object(__a, __b))) " +
        "ELSE 0 END as bigint)"),
    // json_array_get with Presto's negative-index-from-end; scalars come
    // back unquoted (get_json_object rendering — the reference returns
    // the JSON-quoted form for string elements; divergence documented).
    ("json_array_get", 2,
      "get_json_object(__a, concat('$[', " +
        "CASE WHEN __b < 0 THEN json_array_length(__a) + __b " +
        "ELSE __b END, ']'))"),
    // json_array_contains via string-normalized element compare (the
    // reference has per-type overloads; '1.0' vs '1' style numeric
    // renderings can diverge — exact for strings/booleans/integers).
    ("json_array_contains", 2,
      "exists(from_json(__a, 'array<string>'), " +
        "x -> x = cast(__b as string))"),
    // --- Teradata compat plugin (presto-teradata-functions/
    // .../TeradataStringFunctions.java): index = strpos; char2hexint =
    // uppercase hex of the UTF-16BE encoding ---
    ("index", 2, "instr(__a, __b)"),
    ("char2hexint", 1, "upper(hex(encode(__a, 'UTF-16BE')))"),
    // split_to_multimap (SplitToMultimapFunction.java): entries keep
    // duplicate keys as an array of values in entry order; each entry
    // splits at its FIRST key-value delimiter. Distinct-keys transform is
    // O(k^2) per row in the worst case — fine for config-string shapes.
    ("split_to_multimap", 3,
      "map_from_entries(transform(" +
        "array_distinct(transform(split(__a, __b), " +
        "kv -> split_part(kv, __c, 1))), " +
        "k -> struct(k AS key, transform(" +
        "filter(split(__a, __b), kv -> split_part(kv, __c, 1) = k), " +
        "kv -> substring(kv, instr(kv, __c) + length(__c))) AS value)))"),
    // parse_presto_data_size (DataSizeFunctions.java): binary (1024-base)
    // unit factors, case-sensitive unit symbols, error on malformed input.
    // Values kept <= TB stay exact in double; reference returns
    // decimal(38,0), bigint covers the practical range.
    ("parse_presto_data_size", 1,
      "CASE WHEN __a rlike '^\\\\s*([0-9]+(?:\\\\.[0-9]+)?)\\\\s*([kMGTPEZY]?B)\\\\s*$' THEN " +
        "cast(round(cast(regexp_extract(__a, " +
        "'^\\\\s*([0-9]+(?:\\\\.[0-9]+)?)\\\\s*([kMGTPEZY]?B)\\\\s*$', 1) as double) * " +
        "CASE regexp_extract(__a, " +
        "'^\\\\s*([0-9]+(?:\\\\.[0-9]+)?)\\\\s*([kMGTPEZY]?B)\\\\s*$', 2) " +
        "WHEN 'B' THEN 1.0 WHEN 'kB' THEN 1024.0 WHEN 'MB' THEN 1048576.0 " +
        "WHEN 'GB' THEN 1073741824.0 WHEN 'TB' THEN 1099511627776.0 " +
        "WHEN 'PB' THEN 1125899906842624.0 " +
        "WHEN 'EB' THEN 1152921504606846976.0 " +
        "ELSE raise_error(concat('Invalid data size: ', __a)) END) as bigint) " +
        "ELSE raise_error(concat('Invalid data size: ', __a)) END"),
    // --- math (MathFunctions.java) ---
    ("from_base", 2, "cast(conv(__a, __b, 10) as bigint)"),
    ("to_base", 2, "lower(conv(cast(__a as string), 10, __b))"),
    ("infinity", 0, "cast('Infinity' as double)"),
    ("nan", 0, "cast('NaN' as double)"),
    // Spark's isnan(NULL) is FALSE; the reference's primitive-double
    // @ScalarFunction is RETURN_NULL_ON_NULL — wrap to preserve it.
    ("is_nan", 1,
      "CASE WHEN __a IS NULL THEN NULL ELSE isnan(cast(__a as double)) END"),
    ("is_finite", 1,
      "not isnan(cast(__a as double)) and abs(cast(__a as double)) <> cast('Infinity' as double)"),
    ("is_infinite", 1, "abs(cast(__a as double)) = cast('Infinity' as double)"),
    ("truncate", 1, "sign(__a) * floor(abs(__a))"),
    // cosine_similarity / dot_product / l2_distance are registered below
    // as native codegen expressions (VectorExpressions), not templates.
    // --- bitwise (BitwiseFunctions.java) ---
    ("bitwise_and", 2, "cast(__a as bigint) & cast(__b as bigint)"),
    ("bitwise_or", 2, "cast(__a as bigint) | cast(__b as bigint)"),
    ("bitwise_xor", 2, "cast(__a as bigint) ^ cast(__b as bigint)"),
    ("bitwise_not", 1, "~cast(__a as bigint)"),
    ("bitwise_left_shift", 2, "shiftleft(cast(__a as bigint), cast(__b as int))"),
    ("bitwise_right_shift", 2, "shiftright(cast(__a as bigint), cast(__b as int))"),
    // --- date/time (DateTimeFunctions.java); ISO day numbering ---
    ("day_of_week", 1, "((dayofweek(__a) + 5) % 7) + 1"),
    ("dow", 1, "((dayofweek(__a) + 5) % 7) + 1"),
    ("day_of_year", 1, "dayofyear(__a)"),
    ("doy", 1, "dayofyear(__a)"),
    ("week_of_year", 1, "weekofyear(__a)"),
    ("year_of_week", 1, "extract(YEAROFWEEK FROM __a)"),
    ("yow", 1, "extract(YEAROFWEEK FROM __a)"),
    ("to_unixtime", 1, "cast(unix_micros(cast(__a as timestamp)) as double) / 1e6"),
    ("last_day_of_month", 1, "last_day(__a)"),
    ("from_iso8601_date", 1, "to_date(__a)"),
    ("from_iso8601_timestamp", 1, "to_timestamp(__a)"),
    ("regexp_split", 2, "split(__a, __b)"),
    // Timezone surface (DateTimeFunctions.java at_timezone/with_timezone,
    // timezone_hour/timezone_minute). Spark timestamps carry no zone, so
    // the 1-arg Presto forms (which read the value's embedded zone) become
    // 2-arg (ts, zone) spellings over the UTC session: at_timezone shifts
    // an instant to the zone's wall clock, with_timezone interprets a wall
    // clock IN the zone as an instant; the offset extractors truncate
    // toward zero so -3:30 zones report (-3, -30) like the reference.
    ("at_timezone", 2, "convert_timezone('UTC', __b, __a)"),
    ("with_timezone", 2, "convert_timezone(__b, 'UTC', __a)"),
    ("timezone_hour", 2,
      "(cast(cast(convert_timezone('UTC', __b, __a) as timestamp) as long) " +
        "- cast(cast(__a as timestamp) as long)) div 3600"),
    ("timezone_minute", 2,
      "((cast(cast(convert_timezone('UTC', __b, __a) as timestamp) as long) " +
        "- cast(cast(__a as timestamp) as long)) % 3600) div 60"),
    // Per-VALUE zoned timestamps (TimestampWithTimeZoneType.java;
    // DateTimeEncoding.java packs millis+zoneKey into one long). The
    // Spark-first shape is struct<utc: timestamp_ntz, tz: string> — the
    // instant plus its zone, carried column-wise — and every operation
    // is a pure SQL template over Spark's zone machinery (codegen'd, no
    // UDF): ordering/equality on the instant via zoned_instant, wall-
    // clock extraction via zoned_local, offsets truncated toward zero
    // like the reference. The session stays UTC; only these columns
    // carry zones.
    ("zoned_timestamp", 1,
      // wall clock that still fails to parse after the zone tail is
      // stripped raises with a controlled message (loud-failure stance,
      // ADVICE r6) instead of a silent NULL-utc struct; try_to_timestamp
      // keeps the probe from throwing Spark's ANSI error first
      s"named_struct('utc', CASE WHEN __a IS NULL THEN " +
        s"try_to_timestamp(NULL) WHEN try_to_timestamp(" +
        s"regexp_replace(__a, '$zonedTailRe', '')) IS NULL THEN " +
        "raise_error(concat('zoned_timestamp: cannot parse ', __a)) " +
        s"ELSE to_utc_timestamp(try_to_timestamp(" +
        s"regexp_replace(__a, '$zonedTailRe', '')), ${zonedZoneOf("__a")})" +
        s" END, 'tz', ${zonedZoneOf("__a")})"),
    ("zoned_at_timezone", 2, "named_struct('utc', __a.utc, 'tz', __b)"),
    ("zoned_with_timezone", 2,
      "named_struct('utc', to_utc_timestamp(__a, __b), 'tz', __b)"),
    ("zoned_local", 1, "from_utc_timestamp(__a.utc, __a.tz)"),
    ("zoned_instant", 1, "__a.utc"),
    ("zoned_timezone_hour", 1,
      s"(${zonedOffMin("__a")} - (${zonedOffMin("__a")} % 60)) div 60"),
    ("zoned_timezone_minute", 1, s"${zonedOffMin("__a")} % 60"),
    ("zoned_to_iso8601", 1,
      "concat(date_format(from_utc_timestamp(__a.utc, __a.tz), " +
        "\"yyyy-MM-dd'T'HH:mm:ss\"), " +
        s"CASE WHEN ${zonedOffMin("__a")} >= 0 THEN '+' ELSE '-' END, " +
        s"lpad(cast(abs(${zonedOffMin("__a")}) div 60 as string), 2, '0')," +
        s" ':', " +
        s"lpad(cast(abs(${zonedOffMin("__a")}) % 60 as string), 2, '0'))"),
    // parse_duration('2.25h') → day-time interval; invalid strings raise,
    // as Presto's INVALID_FUNCTION_ARGUMENT (no silent nulls).
    ("parse_duration", 1,
      s"CASE WHEN __a rlike $durationRe THEN " +
        s"make_dt_interval(0, 0, 0, $durationSecs) " +
        "ELSE raise_error(concat('duration is not a valid data duration " +
        "string: ', __a)) END"),
    // to_milliseconds(interval): whole seconds via the bigint cast (Spark
    // truncates to the SECOND end field) plus the sub-second remainder of
    // EXTRACT(SECOND), which keeps the fraction.
    ("to_milliseconds", 1,
      "cast(cast(__a as bigint) * 1000 + " +
        "round((extract(second from __a) % 1) * 1000) as bigint)"),
    ("human_readable_seconds", 1,
      "CASE WHEN __a < 0 THEN raise_error('human_readable_seconds: " +
        "negative duration') " +
        "WHEN cast(round(__a) as bigint) = 0 THEN '0 seconds' " +
        "ELSE concat_ws(', ', " +
        hrSegment("(cast(round(__a) as bigint) div 604800)", "week") + ", " +
        hrSegment("(cast(round(__a) as bigint) % 604800 div 86400)", "day") +
        ", " +
        hrSegment("(cast(round(__a) as bigint) % 86400 div 3600)", "hour") +
        ", " +
        hrSegment("(cast(round(__a) as bigint) % 3600 div 60)", "minute") +
        ", " +
        hrSegment("cast(round(__a) as bigint) % 60", "second") + ") END"),
    ("wilson_interval_lower", 3, wilson("-")),
    ("wilson_interval_upper", 3, wilson("+")),
    // NOT registered: Presto's from_unixtime (returns timestamp) and
    // contains (array membership) share names with Spark builtins of
    // DIFFERENT semantics (string from_unixtime, string contains) — and in
    // Spark 4 the Column API resolves builtin names through the session
    // registry too, so shadowing them would silently break every other
    // query in the session. Use timestamp_seconds / array_contains.
    // --- array (ArrayFunctions + lambdas) ---
    // zip (ZipFunction.java): pairs by position, null-padded to the longer
    // side, row fields named field0/field1 as in the reference.
    ("zip", 2,
      "zip_with(__a, __b, (x, y) -> struct(x AS field0, y AS field1))"),
    // When n exceeds the array length the reference clamps n to the
    // length and returns a single n-gram of the whole array
    // (ArrayNgramsFunction.java: ngrams(['a'], 2) = [['a']]).
    ("ngrams", 2,
      "case when size(__a) >= __b then " +
        "transform(sequence(1, size(__a) - __b + 1), i -> slice(__a, i, __b)) " +
        "else array(__a) end"),
    ("array_sum", 1, "aggregate(__a, 0D, (s, x) -> s + cast(x as double))"),
    ("array_average", 1,
      "aggregate(__a, 0D, (s, x) -> s + cast(x as double)) / size(__a)"),
    // --- JSON / URL (JsonFunctions.java, UrlFunctions.java) ---
    ("json_extract_scalar", 2, "get_json_object(__a, __b)"),
    ("url_extract_protocol", 1, "parse_url(__a, 'PROTOCOL')"),
    ("url_extract_host", 1, "parse_url(__a, 'HOST')"),
    ("url_extract_path", 1, "parse_url(__a, 'PATH')"),
    ("url_extract_query", 1, "parse_url(__a, 'QUERY')"),
    ("url_extract_parameter", 2, "parse_url(__a, 'QUERY', __b)"),
    // --- binary (VarbinaryFunctions.java; Presto returns varbinary) ---
    ("to_hex", 1, "upper(hex(__a))"),
    ("from_hex", 1, "unhex(__a)"),
    ("to_utf8", 1, "encode(__a, 'UTF-8')"),
    ("from_utf8", 1, "decode(__a, 'UTF-8')"),
    ("sha256", 1, "unhex(sha2(__a, 256))"),
    // --- aggregates (aggregation/*.java) ---
    ("arbitrary", 1, "any_value(__a)"),
    ("approx_distinct", 1, "approx_count_distinct(__a)"),
    // set_agg / set_union (SetAggregationFunction.java /
    // SetUnionFunction.java). Presto leaves element order unspecified;
    // sorted output is a valid instance and makes results deterministic
    // under any partitioning. set_union's collect_list-then-flatten keeps
    // it a single aggregate expression; distinct-state partial
    // aggregation still bounds what shuffles when inputs repeat.
    ("set_agg", 1, "sort_array(collect_set(__a))"),
    ("set_union", 1,
      "sort_array(array_distinct(flatten(collect_list(__a))))"),
    ("geometric_mean", 1, "exp(avg(ln(__a)))"),
    // entropy(c) over per-row counts (EntropyAggregation.java): Shannon
    // entropy in bits, algebraic over (sum c, sum c*log2 c) so it rides
    // partial aggregation; zero counts contribute nothing, as there.
    ("entropy", 1,
      "log2(sum(cast(__a as double))) - " +
        "sum(CASE WHEN __a > 0 THEN cast(__a as double) * log2(__a) " +
        "ELSE 0.0D END) / sum(cast(__a as double))"),
    // checksum(x) (ChecksumAggregationFunction.java): order-independent
    // digest via XOR of per-row hashes. Same contract (any permutation of
    // the same multiset collides; nulls skipped), different bytes: the
    // reference XORs its block hashes into varbinary, here it's the
    // md5-derived 60-bit int so the DuckDB oracle can replay it exactly.
    ("checksum", 1,
      "bit_xor(cast(conv(substring(md5(cast(__a as string)), 1, 15), 16, 10) " +
        "as bigint))"),
    // --- IP functions (IpPrefixFunctions.java; IPv4 over varchar —
    // Presto's IPADDRESS/IPPREFIX types carry the same dotted-quad
    // text form). Pure integer bit math, fully codegen'd; the repeated
    // dotted-quad parse collapses under codegen subexpression
    // elimination. ---
    ("ip_prefix", 2, {
      val m = IpTemplates.masked("__a", "__b")
      s"concat(${IpTemplates.ntoa(m)}, '/', cast(__b as string))"
    }),
    ("is_subnet_of", 2, {
      val bits = "cast(element_at(split(__a, '/'), 2) as bigint)"
      val paddr = "element_at(split(__a, '/'), 1)"
      s"${IpTemplates.masked(paddr, bits)} = ${IpTemplates.masked("__b", bits)}"
    }),
    // --- geospatial core (presto-geospatial GeoFunctions.java; point
    // subset). A point is a struct<x:double,y:double> — the Spark-native
    // re-expression of Presto's GEOMETRY type for the point workflows
    // (the full Esri geometry model stays descoped, SURVEY §2). Every
    // template compiles to builtin arithmetic: codegen'd, pushdown-safe,
    // no UDF. ---
    // localtime (DateTimeFunctions.java): time-of-day in the epoch-date
    // TIMESTAMP_NTZ representation (the TIME mapping in
    // rewritePrestoSql). Spelling divergence: Presto's grammar makes it
    // a niladic special form (`localtime`); here it is `localtime()` —
    // Spark's parser resolves the bare word as a column.
    ("localtime", 0,
      "cast(concat('1970-01-01 ', date_format(localtimestamp(), " +
        "'HH:mm:ss.SSS')) as timestamp_ntz)"),
    ("st_point", 2,
      "named_struct('x', cast(__a as double), 'y', cast(__b as double))"),
    ("st_x", 1, "__a.x"),
    ("st_y", 1, "__a.y"),
    ("st_astext", 1,
      "concat('POINT (', cast(__a.x as string), ' ', cast(__a.y as string), ')')"),
    ("st_geometryfromtext", 1,
      "named_struct(" +
        "'x', cast(regexp_extract(__a, 'POINT \\\\(([-0-9.]+) ([-0-9.]+)\\\\)', 1) as double), " +
        "'y', cast(regexp_extract(__a, 'POINT \\\\(([-0-9.]+) ([-0-9.]+)\\\\)', 2) as double))"),
    ("st_distance", 2,
      "sqrt((__a.x - __b.x) * (__a.x - __b.x) + (__a.y - __b.y) * (__a.y - __b.y))"),
    ("st_equals", 2, "__a.x = __b.x and __a.y = __b.y"),
    // great_circle_distance(lat1, lon1, lat2, lon2) in km — the Vincenty
    // arctan form of SphericalGeographyUtils.greatCircleDistance:82 with
    // its EARTH_RADIUS_KM = 6371.01.
    ("great_circle_distance", 4,
      "atan2(sqrt(" +
        "pow(cos(radians(__c)) * sin(radians(__b) - radians(__d)), 2) + " +
        "pow(cos(radians(__a)) * sin(radians(__c)) - " +
        "sin(radians(__a)) * cos(radians(__c)) * cos(radians(__b) - radians(__d)), 2)), " +
        "sin(radians(__a)) * sin(radians(__c)) + " +
        "cos(radians(__a)) * cos(radians(__c)) * cos(radians(__b) - radians(__d))" +
        ") * 6371.01"),
    // Polygon/linestring measures over array<point> rings (GeoFunctions
    // ST_Area / ST_Centroid / ST_Length). The ring is implicit-closed
    // (first vertex not repeated), matching the shoelace wraparound
    // i % n + 1. HOF folds are CodegenFallback, but run once per row over
    // small vertex arrays — geometry scalar work, not a hot aggregate.
    ("st_area", 1, s"abs($shoelace) / 2"),
    ("st_centroid", 1,
      "named_struct(" +
        s"'x', ${centroidSum("x")} / (3 * $shoelace), " +
        s"'y', ${centroidSum("y")} / (3 * $shoelace))"),
    ("st_length", 1,
      "aggregate(sequence(2, size(__a)), 0D, (s, i) -> s + sqrt(" +
        "(element_at(__a, i).x - element_at(__a, i - 1).x) * " +
        "(element_at(__a, i).x - element_at(__a, i - 1).x) + " +
        "(element_at(__a, i).y - element_at(__a, i - 1).y) * " +
        "(element_at(__a, i).y - element_at(__a, i - 1).y)))"),
    // Linestring/ring accessors (GeoFunctions ST_NumPoints/ST_PointN/
    // ST_StartPoint/ST_EndPoint/ST_IsClosed/ST_IsEmpty and the envelope
    // family) over the pack's array<struct<x,y>> representation.
    // ST_PointN is 1-based and NULL out of range, like the reference.
    ("st_numpoints", 1, "cast(size(__a) as bigint)"),
    ("st_pointn", 2,
      "CASE WHEN cast(__b as int) BETWEEN 1 AND size(__a) " +
        "THEN element_at(__a, cast(__b as int)) ELSE NULL END"),
    ("st_startpoint", 1,
      "CASE WHEN size(__a) >= 1 THEN element_at(__a, 1) ELSE NULL END"),
    ("st_endpoint", 1,
      "CASE WHEN size(__a) >= 1 THEN element_at(__a, size(__a)) ELSE NULL END"),
    ("st_isclosed", 1,
      "size(__a) >= 2 AND element_at(__a, 1).x = element_at(__a, size(__a)).x " +
        "AND element_at(__a, 1).y = element_at(__a, size(__a)).y"),
    ("st_isempty", 1, "size(__a) = 0"),
    ("st_xmin", 1, "array_min(transform(__a, p -> p.x))"),
    ("st_xmax", 1, "array_max(transform(__a, p -> p.x))"),
    ("st_ymin", 1, "array_min(transform(__a, p -> p.y))"),
    ("st_ymax", 1, "array_max(transform(__a, p -> p.y))"),
    // ST_Envelope: the bounding box as this pack's implicit-closed ring
    // (4 corners CCW) — composable with st_area/st_centroid/st_contains.
    // ST_EnvelopeAsPts: the reference's 2-point (min, max) multipoint.
    ("st_envelope", 1,
      "array(" +
        "named_struct('x', array_min(transform(__a, p -> p.x)), 'y', array_min(transform(__a, p -> p.y))), " +
        "named_struct('x', array_max(transform(__a, p -> p.x)), 'y', array_min(transform(__a, p -> p.y))), " +
        "named_struct('x', array_max(transform(__a, p -> p.x)), 'y', array_max(transform(__a, p -> p.y))), " +
        "named_struct('x', array_min(transform(__a, p -> p.x)), 'y', array_max(transform(__a, p -> p.y))))"),
    ("st_envelopeaspts", 1,
      "array(" +
        "named_struct('x', array_min(transform(__a, p -> p.x)), 'y', array_min(transform(__a, p -> p.y))), " +
        "named_struct('x', array_max(transform(__a, p -> p.x)), 'y', array_max(transform(__a, p -> p.y))))"),
    // expand_envelope(geom, d): the bounding ring grown by d on every
    // side (GeoFunctions expandEnvelope). st_coorddim is always 2 for
    // this pack's planar geometries; st_numinteriorring is 0 — holes
    // are unrepresentable here, so the answer is exact for every
    // geometry the engine can hold (both match the reference on those).
    ("expand_envelope", 2,
      "array(" +
        "named_struct('x', array_min(transform(__a, p -> p.x)) - __b, 'y', array_min(transform(__a, p -> p.y)) - __b), " +
        "named_struct('x', array_max(transform(__a, p -> p.x)) + __b, 'y', array_min(transform(__a, p -> p.y)) - __b), " +
        "named_struct('x', array_max(transform(__a, p -> p.x)) + __b, 'y', array_max(transform(__a, p -> p.y)) + __b), " +
        "named_struct('x', array_min(transform(__a, p -> p.x)) - __b, 'y', array_max(transform(__a, p -> p.y)) + __b))"),
    ("st_coorddim", 1, "cast(2 as tinyint)"),
    ("st_numinteriorring", 1, "cast(0 as bigint)"),
    // Structural geometry surface over the array<point> model
    // (GeoFunctions.java ST_Dimension/ST_GeometryType/ST_Boundary/
    // ST_Points/ST_ExteriorRing/ST_InteriorRing*/ST_NumGeometries/
    // ST_GeometryN/ST_Geometries/ST_MultiPoint/ST_Polygon and the
    // to_geometry/to_spherical_geography casts). Polygon-vs-linestring
    // is EXPLICIT closure (first vertex = last) — the only type tag the
    // structural model carries (st_polygon emits explicit-closed rings;
    // the shoelace templates accept both, the wraparound term of an
    // explicit-closed ring being zero). Holes are unrepresentable, so
    // the interior-ring answers are exact for every representable
    // geometry.
    ("st_dimension", 1, s"cast(CASE WHEN $ringClosed THEN 2 ELSE 1 END as bigint)"),
    ("st_geometrytype", 1,
      s"CASE WHEN $ringClosed THEN 'ST_Polygon' ELSE 'ST_LineString' END"),
    // boundary of a ring is empty; of a linestring, its two endpoints
    ("st_boundary", 1,
      s"CASE WHEN $ringClosed THEN slice(__a, 1, 0) " +
        "ELSE array(element_at(__a, 1), element_at(__a, size(__a))) END"),
    ("st_points", 1, "__a"),
    ("st_exteriorring", 1, "__a"),
    ("st_interiorrings", 1, "slice(array(__a), 1, 0)"),
    ("st_interiorringn", 2, "CASE WHEN false THEN __a ELSE NULL END"),
    ("st_numgeometries", 1, "cast(size(__a) as bigint)"),
    ("st_geometryn", 2,
      "CASE WHEN cast(__b as int) BETWEEN 1 AND size(__a) " +
        "THEN element_at(__a, cast(__b as int)) ELSE NULL END"),
    ("st_geometries", 1, "__a"),
    ("st_multipoint", 1, "__a"),
    // WKT polygon parse (single exterior ring, explicit-closed kept as
    // the polygon tag per above)
    ("st_polygon", 1,
      "transform(split(regexp_extract(__a, " +
        "'POLYGON \\\\(\\\\(([^)]+)\\\\)\\\\)', 1), ', '), s -> " +
        "named_struct('x', cast(element_at(split(s, ' '), 1) as double), " +
        "'y', cast(element_at(split(s, ' '), 2) as double)))"),
    ("to_geometry", 1, "__a"),
    // planar coordinates pass through; out-of-range lat/lon rejected
    // like the reference's toSphericalGeography validation
    ("to_spherical_geography", 1,
      "CASE WHEN forall(__a, p -> abs(p.x) <= 180D AND abs(p.y) <= 90D) " +
        "THEN __a ELSE raise_error(concat('to_spherical_geography: ', " +
        "'longitude must be in [-180,180], latitude in [-90,90]')) END"),
    // point buffer as a 32-gon ring (the reference's Esri buffer is a
    // denser curve approximation; vertex layout diverges, area/contains
    // semantics agree to the n-gon tolerance — documented divergence)
    ("st_buffer", 2,
      "transform(sequence(0, 31), i -> named_struct(" +
        "'x', __a.x + cast(__b as double) * cos(pi() * i / 16D), " +
        "'y', __a.y + cast(__b as double) * sin(pi() * i / 16D)))"),
    // geometry_to_bing_tiles(ring, zoom) (BingTileFunctions.java:252):
    // the tile cover of the geometry's ENVELOPE (the reference prunes
    // tiles not touching the geometry itself — envelope cover is the
    // documented superset; exact for rectangles). Web-Mercator y axis
    // inverts latitude: ymax → smallest tile y.
    ("geometry_to_bing_tiles", 2, {
      val xmin = "array_min(transform(__a, p -> p.x))"
      val xmax = "array_max(transform(__a, p -> p.x))"
      val ymin = "array_min(transform(__a, p -> p.y))"
      val ymax = "array_max(transform(__a, p -> p.y))"
      s"flatten(transform(sequence(${bingTileX(xmin, "__b")}, " +
        s"${bingTileX(xmax, "__b")}), xx -> " +
        s"transform(sequence(${bingTileY(ymax, "__b")}, " +
        s"${bingTileY(ymin, "__b")}), yy -> " +
        "named_struct('x', cast(xx as int), 'y', cast(yy as int), " +
        "'zoom', cast(__b as int)))))"
    }),
    // ST_LineFromText / ST_LineString: WKT 'LINESTRING (x y, x y, …)'
    // parse, and the array<point> constructor (identity here).
    ("st_linefromtext", 1,
      "transform(split(regexp_extract(__a, 'LINESTRING\\\\s*\\\\((.+)\\\\)', 1), ','), " +
        "s -> named_struct(" +
        "'x', cast(element_at(split(trim(s), ' '), 1) as double), " +
        "'y', cast(element_at(split(trim(s), ' '), 2) as double)))"),
    ("st_linestring", 1, "__a"),
    // ST_Contains(ring, point) for ARBITRARY simple polygons — even-odd
    // ray casting over the implicit-closed ring (replaces the pack's
    // earlier convex-only edge-sign operator; non-convex rings now work).
    // When the parity test's edge straddles the scanline, y_i != y_j, so
    // the crossing-x division is never by zero. Boundary points are
    // parity-undefined, as in every even-odd implementation — the
    // reference's OGC contains() also excludes the boundary.
    ("st_contains", 2,
      "aggregate(sequence(1, size(__a)), false, (acc, i) -> " +
        "CASE WHEN ((element_at(__a, i).y > __b.y) != " +
        "(element_at(__a, i % size(__a) + 1).y > __b.y)) AND " +
        "(__b.x < (element_at(__a, i % size(__a) + 1).x - element_at(__a, i).x) * " +
        "(__b.y - element_at(__a, i).y) / " +
        "(element_at(__a, i % size(__a) + 1).y - element_at(__a, i).y) + " +
        "element_at(__a, i).x) THEN NOT acc ELSE acc END)"),
    ("st_within", 2,
      "aggregate(sequence(1, size(__b)), false, (acc, i) -> " +
        "CASE WHEN ((element_at(__b, i).y > __a.y) != " +
        "(element_at(__b, i % size(__b) + 1).y > __a.y)) AND " +
        "(__a.x < (element_at(__b, i % size(__b) + 1).x - element_at(__b, i).x) * " +
        "(__a.y - element_at(__b, i).y) / " +
        "(element_at(__b, i % size(__b) + 1).y - element_at(__b, i).y) + " +
        "element_at(__b, i).x) THEN NOT acc ELSE acc END)"),

    // --- round-5 coverage-audit batch (names surfaced by diffing the
    // reference's @ScalarFunction annotations against this registry;
    // tools/scala/ProbeCoverage.scala) ---
    // strrpos (StringFunctions.java): LAST occurrence, 1-based, 0 if absent
    ("strrpos", 2,
      "CASE WHEN instr(reverse(__a), reverse(__b)) = 0 THEN 0L " +
        "ELSE cast(length(__a) - instr(reverse(__a), reverse(__b)) " +
        "- length(__b) + 2 as bigint) END"),
    // URL-safe base64 (VarbinaryFunctions.java to/fromBase64Url)
    ("to_base64url", 1, "translate(base64(__a), '+/', '-_')"),
    ("from_base64url", 1, "unbase64(translate(__a, '-_', '+/'))"),
    // big-endian two's-complement byte images (VarbinaryFunctions.java)
    ("to_big_endian_64", 1, "unhex(lpad(hex(cast(__a as bigint)), 16, '0'))"),
    ("from_big_endian_64", 1,
      beSigned("__a", "9223372036854775807", "18446744073709551616", "bigint")),
    ("to_big_endian_32", 1,
      "unhex(lpad(hex(cast(__a as bigint) & 4294967295), 8, '0'))"),
    ("from_big_endian_32", 1,
      beSigned("__a", "2147483647", "4294967296", "int")),
    // CombineHashFunction.java:28 — the hash-chaining primitive
    ("combine_hash", 2, "31 * cast(__a as bigint) + cast(__b as bigint)"),
    // MathFunctions.random: 0-arg uniform double, 1-arg integer [0, n)
    ("random", 0, "rand()"),
    ("random", 1, "cast(floor(rand() * __a) as bigint)"),
    // FailureFunction.java — fail(message) / fail(code, message)
    ("fail", 1, "raise_error(__a)"),
    ("fail", 2, "raise_error(__b)"),
    // Joda-pattern datetime render/parse (DateTimeFunctions
    // format_datetime/parse_datetime): the common directive set
    // (y M d H m s S E) coincides with java.time; exotic Joda
    // directives (x, w-with-locale) are out of scope and documented.
    ("format_datetime", 2, "date_format(__a, __b)"),
    ("parse_datetime", 2, "to_timestamp(__a, __b)"),
    ("url_extract_fragment", 1, "parse_url(__a, 'REF')"),
    ("url_extract_port", 1,
      "cast(nullif(regexp_extract(__a, " +
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*:([0-9]+)', 1), '') as bigint)"),
    // JsonFunctions.isJsonScalar: true only for valid number/string/
    // boolean/null JSON text
    ("is_json_scalar", 1,
      "CASE WHEN substr(ltrim(__a), 1, 1) IN ('[', '{') THEN false " +
        "ELSE get_json_object(__a, '$') IS NOT NULL END"),
    // Presto base64 spellings (VarbinaryFunctions.java)
    ("to_base64", 1, "base64(__a)"),
    ("from_base64", 1, "unbase64(__a)"),
    ("sha512", 1, "unhex(sha2(__a, 512))"),
    ("week", 1, "weekofyear(__a)"),
    ("millisecond", 1,
      "cast((unix_micros(cast(__a as timestamp)) % 1000000) div 1000 " +
        "as bigint)"),
    // to_iso8601 (DateTimeFunctions.java): timestamp render; DATE inputs
    // get the timestamp form (type-dispatch by name alone can't see the
    // argument type — divergence documented)
    ("to_iso8601", 1,
      "date_format(__a, 'yyyy-MM-dd''T''HH:mm:ss.SSS')"),
    // json_extract ~ get_json_object (JsonPath subset; object rendering
    // is Spark's); json_parse/json_format are identity over the string
    // representation (Spark has no JSON type — divergence documented)
    ("json_extract", 2, "get_json_object(__a, __b)"),
    ("json_parse", 1, "__a"),
    ("json_format", 1, "cast(__a as string)"),
    // IPv4 subnet bounds over 'a.b.c.d/n' prefix strings
    // (IpPrefixFunctions.java ip_subnet_min/max/range)
    ("ip_subnet_min", 1, IpTemplates.subnetMin),
    ("ip_subnet_max", 1, IpTemplates.subnetMax),
    ("ip_subnet_range", 1,
      s"array(${IpTemplates.subnetMin}, ${IpTemplates.subnetMax})"),
    // 3-arg masked shifts (BitwiseFunctions.java:82-122); bits=64 is the
    // plain 64-bit op
    ("bitwise_shift_left", 3,
      "CASE WHEN cast(__c as int) = 64 " +
        "THEN shiftleft(cast(__a as bigint), cast(__b as int)) " +
        "ELSE shiftleft(cast(__a as bigint), cast(__b as int)) & " +
        "(shiftleft(cast(1 as bigint), cast(__c as int)) - 1) END"),
    ("bitwise_logical_shift_right", 3,
      "CASE WHEN cast(__c as int) = 64 " +
        "THEN shiftrightunsigned(cast(__a as bigint), cast(__b as int)) " +
        "ELSE shiftrightunsigned(cast(__a as bigint) & " +
        "(shiftleft(cast(1 as bigint), cast(__c as int)) - 1), " +
        "cast(__b as int)) END"),
    ("bitwise_arithmetic_shift_right", 2,
      "shiftright(cast(__a as bigint), cast(__b as int))"),
    // bit_and/bit_or aggregate spellings (BitwiseAndAggregation.java,
    // BitwiseOrAggregation.java)
    ("bitwise_and_agg", 1, "bit_and(cast(__a as bigint))"),
    ("bitwise_or_agg", 1, "bit_or(cast(__a as bigint))"),
    // Bing tile functions (presto-geospatial BingTileFunctions.java:115-376,
    // BingTile.java:86-124; Web-Mercator math per the Microsoft quadkey
    // spec). A tile is struct<x:int, y:int, zoom:int> — the same struct
    // convention as the st_* point pack; Presto's opaque BingTile type and
    // its bigint cast are a storage detail we don't reproduce.
    ("bing_tile", 3,
      "named_struct('x', cast(__a as int), 'y', cast(__b as int), " +
        "'zoom', cast(__c as int))"),
    // quadkey → tile (BingTile.fromQuadKey): char i (1-indexed, most
    // significant first) contributes bit (zoom - i) of x (digit & 1) and
    // y ((digit >> 1) & 1).
    ("bing_tile", 1,
      "named_struct(" +
        "'x', cast(case when length(__a) = 0 then 0 else aggregate(" +
        "sequence(1, length(__a)), 0, (s, i) -> s + shiftleft(" +
        "(ascii(substr(__a, i, 1)) - 48) & 1, length(__a) - i)) end as int), " +
        "'y', cast(case when length(__a) = 0 then 0 else aggregate(" +
        "sequence(1, length(__a)), 0, (s, i) -> s + shiftleft(" +
        "shiftright(ascii(substr(__a, i, 1)) - 48, 1) & 1, length(__a) - i)) " +
        "end as int), " +
        "'zoom', length(__a))"),
    ("bing_tile_quadkey", 1,
      "case when __a.zoom = 0 then '' else array_join(transform(" +
        "sequence(__a.zoom, 1, -1), i -> cast(" +
        "(shiftright(__a.x, i - 1) & 1) + 2 * (shiftright(__a.y, i - 1) & 1) " +
        "as string)), '') end"),
    ("bing_tile_coordinates", 1, "named_struct('x', __a.x, 'y', __a.y)"),
    ("bing_tile_zoom_level", 1, "__a.zoom"),
    // bing_tile_at(lat, lon, zoom): pixel-axis projection then truncating
    // division by the 256-pixel tile size, with the reference's clip to
    // [0, mapSize-1] (BingTileFunctions.java:637-658).
    ("bing_tile_at", 3,
      s"named_struct('x', cast(${bingTileX("__b", "__c")} as int), " +
        s"'y', cast(${bingTileY("__a", "__c")} as int), " +
        "'zoom', cast(__c as int))"),
    // 3x3 neighborhood clipped to the tile grid (BingTileFunctions.java:198).
    ("bing_tiles_around", 3,
      "filter(transform(sequence(0, 8), k -> named_struct(" +
        s"'x', cast(${bingTileX("__b", "__c")} + (k % 3) - 1 as int), " +
        s"'y', cast(${bingTileY("__a", "__c")} + (k div 3) - 1 as int), " +
        "'zoom', cast(__c as int))), t -> " +
        "t.x >= 0 and t.x <= shiftleft(1, cast(__c as int)) - 1 and " +
        "t.y >= 0 and t.y <= shiftleft(1, cast(__c as int)) - 1)"),
    // Tile envelope as a closed CCW ring of our struct points (the geo
    // pack's polygon convention, composable with st_area/st_length);
    // corner latitudes via the inverse Mercator (BingTileFunctions.java:601).
    ("bing_tile_polygon", 1,
      "array(" +
        s"named_struct('x', ${bingTileLon("__a.x")}, 'y', ${bingTileLat("__a.y + 1")}), " +
        s"named_struct('x', ${bingTileLon("__a.x + 1")}, 'y', ${bingTileLat("__a.y + 1")}), " +
        s"named_struct('x', ${bingTileLon("__a.x + 1")}, 'y', ${bingTileLat("__a.y")}), " +
        s"named_struct('x', ${bingTileLon("__a.x")}, 'y', ${bingTileLat("__a.y")}), " +
        s"named_struct('x', ${bingTileLon("__a.x")}, 'y', ${bingTileLat("__a.y + 1")}))")
  )

  // Signed reinterpretation of a big-endian unsigned byte image: conv()
  // yields the unsigned value as a decimal string; subtract the modulus
  // when past the signed max (from_big_endian_32/64).
  private def beSigned(arg: String, max: String, modulus: String,
      outType: String): String = {
    val unsigned = s"cast(conv(hex($arg), 16, 10) as decimal(20,0))"
    s"cast(CASE WHEN $unsigned > $max THEN $unsigned - $modulus " +
      s"ELSE $unsigned END as $outType)"
  }

  // Web-Mercator building blocks for the bing_tile templates. `zoom` is an
  // int-typed SQL fragment; axis values are clipped to [0, mapSize-1] then
  // truncated and divided by the 256-pixel tile size, exactly the
  // reference's axisToCoordinates (BingTileFunctions.java:655).
  private def bingMapSize(zoom: String): String =
    s"shiftleft(cast(256 as bigint), cast($zoom as int))"
  private def bingAxisToTile(axis: String, zoom: String): String =
    s"(cast(least(greatest(($axis) * ${bingMapSize(zoom)}, 0D), " +
      s"cast(${bingMapSize(zoom)} - 1 as double)) as bigint) div 256)"
  private def bingTileX(lon: String, zoom: String): String =
    bingAxisToTile(s"(($lon) + 180D) / 360D", zoom)
  private def bingTileY(lat: String, zoom: String): String =
    bingAxisToTile(
      s"0.5D - ln((1D + sin(($lat) * pi() / 180D)) / " +
        s"(1D - sin(($lat) * pi() / 180D))) / (4D * pi())",
      zoom)
  // Inverse: tile corner → lon/lat (BingTileFunctions.java:601-610).
  private def bingTileLon(x: String): String =
    s"360D * (cast($x as double) / " +
      "shiftleft(cast(1 as bigint), __a.zoom) - 0.5D)"
  private def bingTileLat(y: String): String =
    s"90D - 360D * atan(exp(-(0.5D - cast($y as double) / " +
      "shiftleft(cast(1 as bigint), __a.zoom)) * 2D * pi())) / pi()"

  private val argNames = Seq("__a", "__b", "__c", "__d")

  // Weak keys: sessions are compared by identity (no equals override) and
  // must not be pinned for the JVM lifetime once stopped.
  private val installed =
    new java.util.WeakHashMap[SparkSession, Boolean]()

  /** Installs every Presto-named function into the session's
    * FunctionRegistry (temp functions — they win name resolution but touch
    * no global state). Idempotent per session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!installed.containsKey(spark)) {
      // Instant semantics for zoned-value comparisons (the runtime-
      // injectable optimizer hook — see ZonedInstantComparison's doc).
      if (!spark.experimental.extraOptimizations
          .contains(graft.plans.ZonedInstantComparison))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+
            graft.plans.ZonedInstantComparison
      // ConvertToLocalRelation eagerly evaluates VALUES-backed
      // projections in the operator batch — BEFORE user rules — which
      // would bake pair semantics into literal-table zoned comparisons.
      // Excluding it defers local-relation evaluation to runtime (same
      // results, negligible cost at any scale: it only ever touches
      // literal-sized plans).
      locally {
        val key = "spark.sql.optimizer.excludedRules"
        val rule =
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"
        val cur = spark.conf.getOption(key).getOrElse("")
        if (!cur.contains(rule))
          spark.conf.set(key, if (cur.isEmpty) rule else s"$cur,$rule")
      }
      val registry = spark.sessionState.functionRegistry
      // Same-name templates with different arities are overloads (Presto
      // overloads e.g. bing_tile(x, y, zoom) / bing_tile(quadkey)); the
      // one registered builder dispatches on argument count.
      templates.groupBy(_._1).foreach { case (name, overloads) =>
        val byArity = overloads.map { case (_, arity, sql) =>
          arity -> spark.sessionState.sqlParser.parseExpression(sql)
        }.toMap
        val builder: Seq[Expression] => Expression = { args =>
          val template = byArity.getOrElse(args.length, sys.error(
            s"$name expects ${byArity.keys.toSeq.sorted.mkString(" or ")} " +
              s"args, got ${args.length}"))
          template.transformUp {
            case UnresolvedAttribute(Seq(n)) if argNames.contains(n) =>
              args(argNames.indexOf(n))
            // `__a.x` parses as ONE multi-part attribute: substitute the
            // head and turn the remaining parts into field extraction
            // (struct-typed args, e.g. the geo point templates).
            case UnresolvedAttribute(n +: rest)
                if rest.nonEmpty && argNames.contains(n) =>
              rest.foldLeft(args(argNames.indexOf(n))) { (e, field) =>
                org.apache.spark.sql.catalyst.analysis
                  .UnresolvedExtractValue(e, Literal(field))
              }
            // Inside a lambda body the parser wraps every name as a
            // lambda variable, so placeholders there arrive as
            // UnresolvedNamedLambdaVariable, not UnresolvedAttribute.
            case UnresolvedNamedLambdaVariable(Seq(n)) if argNames.contains(n) =>
              args(argNames.indexOf(n))
            // ... and `__a.x` inside a lambda arrives as a MULTI-part
            // lambda variable (the bing_tile templates hit this).
            case UnresolvedNamedLambdaVariable(n +: rest)
                if rest.nonEmpty && argNames.contains(n) =>
              rest.foldLeft(args(argNames.indexOf(n))) { (e, field) =>
                org.apache.spark.sql.catalyst.analysis
                  .UnresolvedExtractValue(e, Literal(field))
              }
          }
        }
        registry.registerFunction(FunctionIdentifier(name),
          new ExpressionInfo(getClass.getCanonicalName, name), builder)
      }
      // date_parse / date_format translate the (literal) MySQL pattern at
      // plan time, then delegate to Spark's java.time expressions.
      // date_format shadows a Spark builtin of the same name, so its
      // delegate must be the Catalyst expression class directly — a
      // name-based template would resolve back into this registry and loop.
      def mysqlPatternFn(name: String)
                        (delegate: (Expression, String) => Expression): Unit = {
        val builder: Seq[Expression] => Expression = { args =>
          val pattern = args(1) match {
            // Translate only MySQL-style patterns ('%' directives). A
            // plain java.time pattern passes through untouched: in Spark 4
            // the Column API resolves `date_format` through this registry
            // too, and re-translating an already-Java pattern would quote
            // its letters into garbage.
            case Literal(v, StringType) if v.toString.contains("%") =>
              PrestoScalars.mysqlToJavaPattern(v.toString)
            case Literal(v, StringType) => v.toString
            case other => sys.error(
              s"$name requires a literal pattern, got $other")
          }
          delegate(args.head, pattern)
        }
        registry.registerFunction(FunctionIdentifier(name),
          new ExpressionInfo(getClass.getCanonicalName, name), builder)
      }
      mysqlPatternFn("date_parse") { (arg, pattern) =>
        // The translated pattern can contain single quotes (java.time
        // quoting of literal letters, e.g. %YT%m -> yyyy'T'MM) — escape
        // them for the SQL string literal or parseExpression throws.
        val quoted = pattern.replace("'", "''")
        spark.sessionState.sqlParser
          .parseExpression(s"to_timestamp(__a, '$quoted')")
          .transformUp { case UnresolvedAttribute(Seq("__a")) => arg }
      }
      mysqlPatternFn("date_format") { (arg, pattern) =>
        DateFormatClass(arg, Literal(pattern))
      }
      // approx_percentile: Spark builtin of the same name takes an
      // optional accuracy — mirror both arities, defaulting to Presto's
      // effective precision, so shadowing stays semantics-compatible.
      // Presto ALSO spells its weighted variant with three args —
      // approx_percentile(x, w, percentage) — which is indistinguishable
      // from Spark's (col, percentage, accuracy) by name alone; a
      // fractional literal in 3rd position can only be the weighted form
      // (accuracy is an integer there), so route it to Spark's exact
      // percentile(col, p, frequency) with frequency = weight — the
      // weighted-multiset percentile, and exact results trivially
      // satisfy the approximate contract (r6; was a loud reject since
      // ADVICE r3). At 100 TB swap in a weighted mergeable sketch; the
      // exact aggregate holds per-group sorted state.
      locally {
        val name = "approx_percentile"
        // a fractional literal can only be a percentage/accuracy — a
        // weight in that position would truncate to 0 and skip every row
        def fractionalLit(e: Expression): Boolean = e match {
          case Literal(_, DoubleType | FloatType | _: DecimalType) => true
          case _ => false
        }
        val builder: Seq[Expression] => Expression = { args =>
          // Disambiguation (ADVICE r6): Presto's UNWEIGHTED 3-arg form
          // approx_percentile(x, percentage, accuracy) has a fractional
          // percentage in 2nd position (ApproximateDoublePercentile-
          // Aggregations.java:48-55 — accuracy is DOUBLE too, so the 3rd
          // arg alone can't discriminate); the WEIGHTED form
          // approx_percentile(x, w, percentage) has a weight column /
          // integral expression there. Route on args(1).
          val weighted = args.length == 3 && fractionalLit(args(2)) &&
            !fractionalLit(args(1)) &&
            !args(1).dataType.isInstanceOf[ArrayType] // array of percentages
          if (weighted) {
            args(1) match {
              case Literal(w: Number, _) if w.longValue() == 0 =>
                throw new IllegalArgumentException(
                  "approx_percentile: literal weight 0 would skip every " +
                    "row — a percentage belongs in 2nd position only in " +
                    "the unweighted (x, percentage, accuracy) form")
              case _ =>
            }
            // flat-array exact aggregate (WeightedPercentile.scala):
            // same semantics as Spark's percentile(x, p, frequency)
            // but append/arraycopy state instead of a boxed per-value
            // hash map — 5.9 s → sub-second on the qp4 shape.
            WeightedPercentileAgg(args(0), Cast(args(1), LongType),
              args(2)).toAggregateExpression()
          } else {
            val full = if (args.length == 2) args :+ Literal(10000) else args
            // Presto accuracy is a max-rank-error fraction in (0, 1);
            // percentile_approx wants a positive int ~ 1/relative-error
            val acc = full(2) match {
              case l @ Literal(_, DoubleType | FloatType | _: DecimalType) =>
                val d = Cast(l, DoubleType).eval().asInstanceOf[Double]
                require(d > 0 && d < 1,
                  s"approx_percentile: accuracy must be in (0, 1), got $d")
                Literal(math.max(1L, math.round(1.0 / d)).toInt)
              case other => other
            }
            val mapped = Seq(full(0), full(1), acc)
            spark.sessionState.sqlParser
              .parseExpression("percentile_approx(__a, __b, __c)")
              .transformUp {
                case UnresolvedAttribute(Seq(n)) if argNames.contains(n) =>
                  mapped(argNames.indexOf(n))
              }
          }
        }
        registry.registerFunction(FunctionIdentifier(name),
          new ExpressionInfo(getClass.getCanonicalName, name), builder)
      }
      // Native codegen'd vector math (see VectorExpressions) — the one
      // place composition genuinely can't match a fused primitive loop.
      def vectorFn(name: String)(mk: (Expression, Expression) => Expression): Unit = {
        val builder: Seq[Expression] => Expression = { args =>
          val Seq(a, b) = args.map(e => Cast(e, ArrayType(DoubleType)))
          mk(a, b)
        }
        registry.registerFunction(FunctionIdentifier(name),
          new ExpressionInfo(getClass.getCanonicalName, name), builder)
      }
      vectorFn("cosine_similarity")(CosineSimilarity(_, _))
      vectorFn("dot_product")(DotProduct(_, _))
      vectorFn("l2_distance")(L2Distance(_, _))
      // Presto color/render/bar pack (ColorFunctions.java) — native
      // expressions; arity-dispatching builders mirror the reference
      // overload sets.
      def colorPack(name: String)(mk: Seq[Expression] => Expression): Unit =
        registry.registerFunction(FunctionIdentifier(name),
          new ExpressionInfo(getClass.getCanonicalName, name), mk)
      colorPack("color") {
        case Seq(a) => ColorFromString(a)
        case Seq(f, lo, hi) =>
          ColorInterpolate(Cast(f, DoubleType), Cast(lo, LongType),
            Cast(hi, LongType))
        // color(value, low, high, lowColor, highColor): rescale then
        // interpolate (ColorFunctions.java:126-134)
        case Seq(v, low, high, lc, hc) =>
          import org.apache.spark.sql.catalyst.expressions.{Divide, Subtract}
          ColorInterpolate(
            Divide(Subtract(Cast(v, DoubleType), Cast(low, DoubleType)),
              Subtract(Cast(high, DoubleType), Cast(low, DoubleType))),
            Cast(lc, LongType), Cast(hc, LongType))
        case args => sys.error(s"color expects 1, 3 or 5 args, got ${args.length}")
      }
      colorPack("rgb") {
        case Seq(r, g, b) =>
          RgbColor(Cast(r, LongType), Cast(g, LongType), Cast(b, LongType))
        case args => sys.error(s"rgb expects 3 args, got ${args.length}")
      }
      colorPack("render") {
        case Seq(b) => RenderBoolean(b)
        case Seq(v, c) => RenderColor(Cast(v, StringType), Cast(c, LongType))
        case args => sys.error(s"render expects 1 or 2 args, got ${args.length}")
      }
      colorPack("bar") {
        // 2-arg default gradient red -> green (ColorFunctions.java:196)
        case Seq(p, w) => AnsiBar(Seq(Cast(p, DoubleType), Cast(w, LongType),
          Literal(0xFF0000L), Literal(0x00FF00L)))
        case Seq(p, w, lo, hi) => AnsiBar(Seq(Cast(p, DoubleType),
          Cast(w, LongType), Cast(lo, LongType), Cast(hi, LongType)))
        case args => sys.error(s"bar expects 2 or 4 args, got ${args.length}")
      }
      // split: Presto's delimiter is a LITERAL string, Spark's a regex —
      // silently different results for '.', '|', '+' delimiters, so this
      // shadow \Q..\E-quotes the delimiter. Must resolve DIRECTLY to the
      // Catalyst StringSplit class: a name-based template would resolve
      // 'split' back through this registry and loop. Spark's Column-API
      // split() builds the expression without registry lookup, so
      // DataFrame-side callers keep regex semantics.
      colorPack("split") { args =>
        import org.apache.spark.sql.catalyst.expressions.{Concat, StringSplit}
        require(args.length == 2 || args.length == 3,
          s"split expects 2 or 3 args, got ${args.length}")
        val quoted = Concat(Seq(Literal("\\Q"), args(1), Literal("\\E")))
        val limit = if (args.length == 3) Cast(args(2), IntegerType)
          else Literal(-1)
        StringSplit(args(0), quoted, limit)
      }
      // Statistical distribution scalars — bit-identical to the reference
      // via the same commons-math3 calls (StatDistributions.scala).
      def tern(name: String)
          (mk: (Expression, Expression, Expression) => Expression): Unit =
        colorPack(name) {
          case Seq(a, b, c) => mk(Cast(a, DoubleType), Cast(b, DoubleType),
            Cast(c, DoubleType))
          case args => sys.error(s"$name expects 3 args, got ${args.length}")
        }
      tern("normal_cdf")(NormalCdf)
      tern("inverse_normal_cdf")(InverseNormalCdf)
      tern("beta_cdf")(BetaCdf)
      tern("inverse_beta_cdf")(InverseBetaCdf)
      // IEEE-754 bit images (BinaryBits.scala)
      colorPack("to_ieee754_64") {
        case Seq(a) => ToIeee754_64(Cast(a, DoubleType))
        case args => sys.error(s"to_ieee754_64 expects 1 arg, got ${args.length}")
      }
      colorPack("from_ieee754_64") {
        case Seq(a) => FromIeee754_64(a)
        case args => sys.error(s"from_ieee754_64 expects 1 arg, got ${args.length}")
      }
      colorPack("to_ieee754_32") {
        case Seq(a) => ToIeee754_32(Cast(a, org.apache.spark.sql.types.FloatType))
        case args => sys.error(s"to_ieee754_32 expects 1 arg, got ${args.length}")
      }
      colorPack("from_ieee754_32") {
        case Seq(a) => FromIeee754_32(a)
        case args => sys.error(s"from_ieee754_32 expects 1 arg, got ${args.length}")
      }
      // Vector digest lookups (TDigestFunctions.java values_at_quantiles /
      // QuantileDigestFunctions.java valuesAtQuantiles + the inverse)
      colorPack("values_at_quantiles") {
        case Seq(sk, qs) => DigestValuesAt(sk,
          Cast(qs, ArrayType(DoubleType)))
        case args => sys.error(
          s"values_at_quantiles expects 2 args, got ${args.length}")
      }
      colorPack("quantiles_at_values") {
        case Seq(sk, xs) => DigestQuantilesAt(sk,
          Cast(xs, ArrayType(DoubleType)))
        case args => sys.error(
          s"quantiles_at_values expects 2 args, got ${args.length}")
      }
      // Scalar digest lookups by their Presto SQL names — the vector
      // forms' element-0 (one deserialize, same code path, both digest
      // families via the header discriminator).
      def digestScalar(name: String)
          (mk: (Expression, Expression) => Expression): Unit =
        colorPack(name) {
          case Seq(sk, x) =>
            import org.apache.spark.sql.catalyst.expressions.{CreateArray, GetArrayItem}
            GetArrayItem(mk(sk, CreateArray(Seq(Cast(x, DoubleType)))),
              Literal(0))
          case args => sys.error(s"$name expects 2 args, got ${args.length}")
        }
      digestScalar("value_at_quantile")(DigestValuesAt)
      digestScalar("quantile_at_value")(DigestQuantilesAt)
      // Lambda matchers (ArrayAllMatchFunction.java / AnyMatch / NoneMatch)
      // must resolve DIRECTLY to the Catalyst HOF classes (a template
      // would orphan the LambdaFunction argument, like `reduce`).
      locally {
        import org.apache.spark.sql.catalyst.expressions.{ArrayExists, ArrayForAll, Not}
        colorPack("all_match") {
          case Seq(a, f) => ArrayForAll(a, f)
          case args => sys.error(s"all_match expects 2 args, got ${args.length}")
        }
        colorPack("any_match") {
          case Seq(a, f) => ArrayExists(a, f)
          case args => sys.error(s"any_match expects 2 args, got ${args.length}")
        }
        // none_match = all_match with the predicate negated INSIDE the
        // lambda: wrapping the HOF itself in Not() leaves the lambda's
        // parent a non-HOF and analysis rejects it.
        colorPack("none_match") {
          case Seq(a, f: org.apache.spark.sql.catalyst.expressions.LambdaFunction) =>
            ArrayForAll(a, f.copy(function = Not(f.function)))
          case args => sys.error(s"none_match expects (array, lambda), got $args")
        }
      }
      // approx_set / merge / merge_hll — Presto's HLL workflow mapped onto
      // the engine's KMV SetDigest family (same build/merge/cardinality
      // API; exact below saturation, KMV estimator above — the same
      // API-compatible-estimator stance as the KHyperLogLog pack, and it
      // keeps cardinality()'s binary leg consistent). Presto overloads
      // `merge` across hll/qdigest/tdigest; name-only resolution can't
      // see types, so `merge` here is the set-digest merge (digest merges
      // have merge_tdigest / the Column API).
      colorPack("approx_set") {
        case Seq(v) => SetDigestAgg(v, SetDigest.DefaultK).toAggregateExpression()
        case args => sys.error(s"approx_set expects 1 arg, got ${args.length}")
      }
      colorPack("merge") {
        case Seq(v) => SetDigestMergeAgg(v).toAggregateExpression()
        case args => sys.error(s"merge expects 1 arg, got ${args.length}")
      }
      colorPack("merge_hll") {
        case Seq(v) => SetDigestMergeAgg(v).toAggregateExpression()
        case args => sys.error(s"merge_hll expects 1 arg, got ${args.length}")
      }
      // empty_approx_set() — the empty-sketch constant (ApproximateSet
      // Aggregation's identity element), a plain binary literal here
      colorPack("empty_approx_set") {
        case Seq() =>
          Literal(new SetDigest.State(SetDigest.DefaultK).serialize(),
            org.apache.spark.sql.types.BinaryType)
        case args => sys.error(
          s"empty_approx_set expects 0 args, got ${args.length}")
      }
      colorPack("scale_qdigest") {
        case Seq(sk, f) => DDSketchScale(sk, Cast(f, DoubleType))
        case args => sys.error(s"scale_qdigest expects 2 args, got ${args.length}")
      }
      // numeric_histogram(buckets, x) — bucket count must be a literal
      // (it sizes the aggregation state, like approx_most_frequent)
      colorPack("numeric_histogram") {
        case Seq(Literal(b: Int, IntegerType), v) =>
          NumericHistogramAgg(b, v).toAggregateExpression()
        case Seq(Literal(b: Long, LongType), v) =>
          NumericHistogramAgg(b.toInt, v).toAggregateExpression()
        case args => sys.error("numeric_histogram expects " +
          s"(literal buckets, value), got ${args.length} args")
      }
      // reduce: Presto's name for Spark's 4-arg aggregate HOF — must
      // resolve DIRECTLY to the Catalyst HigherOrderFunction class: a
      // template would return a nested UnresolvedFunction, and the
      // analyzer rejects LambdaFunction arguments whose parent isn't a
      // resolved higher-order function.
      registry.registerFunction(FunctionIdentifier("reduce"),
        new ExpressionInfo(getClass.getCanonicalName, "reduce"),
        (args: Seq[Expression]) => {
          require(args.length == 4,
            s"reduce expects 4 args (array, init, merge, finish), got ${args.length}")
          org.apache.spark.sql.catalyst.expressions.ArrayAggregate(
            args(0), args(1), args(2), args(3))
        })
      // hamming_distance: native codegen expression (TextExpressions).
      registry.registerFunction(FunctionIdentifier("hamming_distance"),
        new ExpressionInfo(getClass.getCanonicalName, "hamming_distance"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"hamming_distance expects 2 args, got ${args.length}")
          HammingDistance(args(0), args(1))
        })
      // format(fmt, args...) is variadic — delegate to FormatString.
      registry.registerFunction(FunctionIdentifier("format"),
        new ExpressionInfo(getClass.getCanonicalName, "format"),
        (args: Seq[Expression]) => FormatString(args: _*))
      // Presto date_add('unit', n, ts) / date_diff('unit', a, b): Spark's
      // grammar special-cases these names as timestampadd/timestampdiff
      // aliases and validates the unit BEFORE function resolution, so a
      // registry override never sees the call. `rewritePrestoSql` renames
      // the literal-unit spelling to presto_date_add/_diff pre-parse;
      // these builders then supply Presto semantics. Builders run only
      // once argument expressions are resolved (the analyzer resolves
      // functions bottom-up), so the input's type is available: Presto
      // preserves DATE-ness under date_add, and rejects sub-day units on
      // DATE inputs (`DateTimeFunctions.java` @SqlType sql_date paths).
      def unitOf(e: Expression, fn: String): String = e match {
        case Literal(u, StringType) => u.toString.toLowerCase
        case other => sys.error(s"$fn: unit must be a string literal, got $other")
      }
      locally {
        val builder: Seq[Expression] => Expression = { args =>
          require(args.length == 3, s"date_add expects 3 args, got ${args.length}")
          PrestoDateAdd(unitOf(args(0), "date_add"), args(1), args(2))
        }
        registry.registerFunction(FunctionIdentifier("presto_date_add"),
          new ExpressionInfo(getClass.getCanonicalName, "presto_date_add"),
          builder)
      }
      locally {
        val builder: Seq[Expression] => Expression = { args =>
          require(args.length == 3, s"date_diff expects 3 args, got ${args.length}")
          PrestoDateDiff(unitOf(args(0), "date_diff"), args(1), args(2))
        }
        registry.registerFunction(FunctionIdentifier("presto_date_diff"),
          new ExpressionInfo(getClass.getCanonicalName, "presto_date_diff"),
          builder)
      }
      // word_stem (WordStemFunction.java:82; English/Porter only) and
      // normalize (StringFunctions.java) — native expressions, see
      // graft.functions.Stemmer.
      locally {
        val builder: Seq[Expression] => Expression = {
          case Seq(w) => WordStem(w)
          case Seq(w, Literal(lang, StringType)) if lang.toString == "en" =>
            WordStem(w)
          case Seq(_, l) =>
            sys.error(s"word_stem: only language 'en' is supported, got $l")
          case args =>
            sys.error(s"word_stem expects 1-2 args, got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("word_stem"),
          new ExpressionInfo(getClass.getCanonicalName, "word_stem"), builder)
      }
      locally {
        val builder: Seq[Expression] => Expression = {
          case Seq(s0) => NormalizeString(s0, "NFC")
          case Seq(s0, Literal(f, StringType)) =>
            NormalizeString(s0, f.toString.toUpperCase)
          case args => sys.error(
            s"normalize expects 1-2 args (literal form), got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("normalize"),
          new ExpressionInfo(getClass.getCanonicalName, "normalize"), builder)
      }
      // approx_most_frequent(buckets, value, capacity)
      // (ApproxMostFrequent.java) — space-saving sketch aggregate; buckets
      // and capacity must be literals (they size the state, as there).
      locally {
        def lit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) => v.toInt
          case other =>
            sys.error(s"approx_most_frequent: $what must be an integer " +
              s"literal, got $other")
        }
        val builder: Seq[Expression] => Expression = {
          case Seq(b, v, cap) =>
            ApproxMostFrequentAgg(v, lit(b, "buckets"), lit(cap, "capacity"))
              .toAggregateExpression()
          case args =>
            sys.error(s"approx_most_frequent expects 3 args, got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("approx_most_frequent"),
          new ExpressionInfo(getClass.getCanonicalName, "approx_most_frequent"),
          builder)
      }
      // differential_entropy (DifferentialEntropyAggregation.java) — the
      // deterministic fixed_histogram_mle strategy; bucket count, method,
      // min and max must be literals (they size/shape the state). The
      // 2/3-arg reservoir forms and the jacknife are rejected loudly (see
      // DifferentialEntropyAgg doc), not silently approximated.
      locally {
        def numLit(e: Expression, what: String): Double = e match {
          case Literal(v: Int, IntegerType) => v.toDouble
          case Literal(v: Long, LongType) => v.toDouble
          case Literal(v: Double, DoubleType) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
            v.toDouble
          case other => sys.error(
            s"differential_entropy: $what must be a numeric literal, got $other")
        }
        def strLit(e: Expression): String = e match {
          case Literal(s, StringType) if s != null => s.toString
          case other =>
            sys.error(s"differential_entropy: method must be a string literal, got $other")
        }
        val builder: Seq[Expression] => Expression = {
          case Seq(b, sample, weight, method, mn, mx) =>
            strLit(method) match {
              case "fixed_histogram_mle" =>
                DifferentialEntropyAgg(numLit(b, "bucket count").toInt,
                  numLit(mn, "min"), numLit(mx, "max"), sample, weight)
                  .toAggregateExpression()
              case "fixed_histogram_jacknife" =>
                DifferentialEntropyJacknifeAgg(numLit(b, "bucket count").toInt,
                  numLit(mn, "min"), numLit(mx, "max"), sample, weight)
                  .toAggregateExpression()
              case m => sys.error("differential_entropy: only the " +
                "deterministic fixed_histogram strategies (mle, jacknife) " +
                s"are supported, got '$m' — the reservoir strategies are " +
                "sampling-based (nondeterministic by construction)")
            }
          case args => sys.error("differential_entropy expects (buckets, " +
            "sample, weight, 'fixed_histogram_mle', min, max); the " +
            s"${args.length}-arg reservoir forms are nondeterministic by " +
            "construction and intentionally unsupported")
        }
        registry.registerFunction(FunctionIdentifier("differential_entropy"),
          new ExpressionInfo(getClass.getCanonicalName, "differential_entropy"),
          builder)
      }
      // classification_* array aggregates (PrecisionRecallAggregation.java
      // + five subclasses): (buckets, outcome, pred[, weight]) →
      // array<double>, one entry per threshold bucket while true weight
      // remains. Bucket count literal, weight defaults to 1.0.
      ClassificationMetricAgg.Metrics.foreach { metric =>
        val name = s"classification_$metric"
        def mk(b: Expression, o: Expression, p: Expression,
            w: Expression): Expression = {
          val n = b match {
            case Literal(v: Int, IntegerType) => v
            case Literal(v: Long, LongType) => v.toInt
            case other => sys.error(
              s"$name: bucket count must be an integer literal, got $other")
          }
          ClassificationMetricAgg(metric, n, o, p, w).toAggregateExpression()
        }
        val builder: Seq[Expression] => Expression = {
          case Seq(b, o, p) => mk(b, o, p, Literal(1.0, DoubleType))
          case Seq(b, o, p, w) => mk(b, o, p, w)
          case args => sys.error(
            s"$name expects (buckets, outcome, pred[, weight]), got ${args.length} args")
        }
        registry.registerFunction(FunctionIdentifier(name),
          new ExpressionInfo(getClass.getCanonicalName, name), builder)
      }
      // presto-ml surface (MLFunctions.java, MLFeaturesFunctions.java,
      // Learn*Aggregation.java): features() builds the map<bigint,double>
      // encoding; learn_* train closed-form models (OLS /
      // nearest-centroid — model family documented in LinearModel); the
      // learn_libsvm_* spellings accept and ignore the libsvm params
      // string (no libsvm in a from-scratch distributed engine — the
      // closed-form model is the honest scale-correct substitute).
      locally {
        colorPack("features") { args =>
          require(args.nonEmpty && args.length <= 10,
            s"features expects 1-10 args, got ${args.length}")
          CreateMap(args.zipWithIndex.flatMap { case (a, i) =>
            Seq(Literal(i.toLong, LongType), Cast(a, DoubleType))
          })
        }
        def twoArgAgg(name: String)(mk: (Expression, Expression) => Expression)
            : Unit = {
          val builder: Seq[Expression] => Expression = {
            case Seq(a, b) => mk(a, b)
            case Seq(a, b, _) => mk(a, b) // libsvm params string, ignored
            case args => sys.error(s"$name expects 2 args, got ${args.length}")
          }
          registry.registerFunction(FunctionIdentifier(name),
            new ExpressionInfo(getClass.getCanonicalName, name), builder)
        }
        twoArgAgg("learn_regressor")((l, f) =>
          LearnRegressorAgg(Cast(l, DoubleType), f).toAggregateExpression())
        twoArgAgg("learn_libsvm_regressor")((l, f) =>
          LearnRegressorAgg(Cast(l, DoubleType), f).toAggregateExpression())
        twoArgAgg("learn_classifier")((l, f) =>
          LearnClassifierAgg(l, f).toAggregateExpression())
        twoArgAgg("learn_libsvm_classifier")((l, f) =>
          LearnClassifierAgg(l, f).toAggregateExpression())
        // Presto ROW(a, b, ...) constructor (RowType.java): Spark spells
        // it struct(); positional cast to ROW(x T, y U) then works the
        // same on both engines.
        colorPack("row") { args =>
          require(args.nonEmpty, "row expects at least 1 arg")
          org.apache.spark.sql.catalyst.expressions.CreateStruct(args)
        }
        colorPack("regress") {
          case Seq(f, m) => RegressPredict(f, m)
          case args => sys.error(s"regress expects 2 args, got ${args.length}")
        }
        colorPack("classify") {
          case Seq(f, m) => ClassifyPredict(f, m)
          case args => sys.error(s"classify expects 2 args, got ${args.length}")
        }
        colorPack("evaluate_classifier_predictions") {
          case Seq(t, p) => EvaluatePredictionsAgg(t, p).toAggregateExpression()
          case args => sys.error(
            s"evaluate_classifier_predictions expects 2 args, got ${args.length}")
        }
      }
      // FNV hashes + HMACs (FnvHash.java / HmacFunctions.java) and
      // combinations (ArrayCombinationsFunction.java) — native
      // expressions; combinations' size must be a literal (it shapes the
      // result like approx_most_frequent's capacity).
      locally {
        HashCombinatorics.FnvVariants.keys.foreach { name =>
          val builder: Seq[Expression] => Expression = {
            case Seq(v) => FnvHashExpr(v, name)
            case args => sys.error(s"$name expects 1 arg, got ${args.length}")
          }
          registry.registerFunction(FunctionIdentifier(name),
            new ExpressionInfo(getClass.getCanonicalName, name), builder)
        }
        HashCombinatorics.HmacAlgos.keys.foreach { name =>
          val builder: Seq[Expression] => Expression = {
            case Seq(d, k) => HmacExpr(d, k, name)
            case args => sys.error(s"$name expects 2 args, got ${args.length}")
          }
          registry.registerFunction(FunctionIdentifier(name),
            new ExpressionInfo(getClass.getCanonicalName, name), builder)
        }
        // spooky_hash_v2_32/64 (VarbinaryFunctions.java:306,316) — native
        // SpookyHash V2, big-endian varbinary image like the reference.
        Seq("spooky_hash_v2_32" -> true, "spooky_hash_v2_64" -> false)
          .foreach { case (name, is32) =>
            val builder: Seq[Expression] => Expression = {
              case Seq(v) => SpookyHashExpr(v, is32)
              case args => sys.error(s"$name expects 1 arg, got ${args.length}")
            }
            registry.registerFunction(FunctionIdentifier(name),
              new ExpressionInfo(getClass.getCanonicalName, name), builder)
          }
        // st_intersects / st_disjoint over array<struct<x,y>> linestrings
        // (GeoFunctions.java; native segment-pair orientation tests —
        // see SegmentsIntersect).
        Seq("st_intersects" -> false, "st_disjoint" -> true)
          .foreach { case (name, negate) =>
            val builder: Seq[Expression] => Expression = {
              case Seq(a, b) =>
                val e = SegmentsIntersect(a, b)
                if (negate) org.apache.spark.sql.catalyst.expressions.Not(e)
                else e
              case args => sys.error(s"$name expects 2 args, got ${args.length}")
            }
            registry.registerFunction(FunctionIdentifier(name),
              new ExpressionInfo(getClass.getCanonicalName, name), builder)
          }
        // line_locate_point / line_interpolate_point (GeoFunctions.java
        // :437,:462) and simplify_geometry (:758) — length-indexed line
        // ops + Douglas-Peucker, native expressions.
        locally {
          val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
            "line_locate_point" -> {
              case Seq(l, p) => LineLocatePoint(l, p)
              case args =>
                sys.error(s"line_locate_point expects 2 args, got ${args.length}")
            },
            "line_interpolate_point" -> {
              case Seq(l, f) => LineInterpolatePoint(l, Cast(f, DoubleType))
              case args => sys.error(
                s"line_interpolate_point expects 2 args, got ${args.length}")
            },
            "simplify_geometry" -> {
              case Seq(l, t) => SimplifyGeometry(l, Cast(t, DoubleType))
              case args => sys.error(
                s"simplify_geometry expects 2 args, got ${args.length}")
            })
          builders.foreach { case (name, b) =>
            registry.registerFunction(FunctionIdentifier(name),
              new ExpressionInfo(getClass.getCanonicalName, name), b)
          }
        }
        // Convex-hull / clipping / segment-relate / simplicity / WKB
        // algebra (GeomAlgebra.scala; GeoFunctions.java ST_ConvexHull,
        // ST_Intersection, ST_Crosses/Touches/Overlaps, ST_IsSimple/
        // IsRing/IsValid, geometry_invalid_reason, ST_AsBinary/
        // ST_GeomFromBinary + ConvexHullAggregation.java).
        locally {
          def one(name: String)(mk: Expression => Expression): Unit =
            registry.registerFunction(FunctionIdentifier(name),
              new ExpressionInfo(getClass.getCanonicalName, name), {
                case Seq(a) => mk(a)
                case args => sys.error(s"$name expects 1 arg, got ${args.length}")
              })
          def two(name: String)(mk: (Expression, Expression) => Expression): Unit =
            registry.registerFunction(FunctionIdentifier(name),
              new ExpressionInfo(getClass.getCanonicalName, name), {
                case Seq(a, b) => mk(a, b)
                case args => sys.error(s"$name expects 2 args, got ${args.length}")
              })
          one("st_convexhull")(ConvexHull)
          one("convex_hull_agg")(a =>
            ConvexHullAgg(a).toAggregateExpression())
          two("st_intersection")(ConvexClip)
          Seq("crosses", "touches", "overlaps").foreach(m =>
            two(s"st_$m")(SegmentRelation(_, _, m)))
          // polygon boolean algebra (Greiner–Hormann; GeomBoolean.scala)
          // → multipolygon array<ring>; degenerate configs fail loudly
          two("st_union")(PolyBool(_, _, "union"))
          two("st_difference")(PolyBool(_, _, "difference"))
          two("st_symdifference")(PolyBool(_, _, "symdifference"))
          // difference whose result carries interior rings → the holed
          // structural type (GeoFunctions.java:921 configuration)
          two("st_polygon_difference")(PolyHoledDifference(_, _))
          one("geometry_union")(GeometryUnionAll)
          one("geometry_union_agg")(a =>
            GeometryUnionAgg(a).toAggregateExpression())
          registry.registerFunction(FunctionIdentifier("st_relate"),
            new ExpressionInfo(getClass.getCanonicalName, "st_relate"), {
              case Seq(a, b, p) => StRelate(a, b, p)
              case args =>
                sys.error(s"st_relate expects 3 args, got ${args.length}")
            })
          one("st_issimple")(LineSimplicity(_, "simple"))
          one("st_isring")(LineSimplicity(_, "ring"))
          one("st_isvalid")(LineSimplicity(_, "valid"))
          one("geometry_invalid_reason")(LineSimplicity(_, "reason"))
          one("st_asbinary")(WkbWrite)
          one("st_geomfrombinary")(WkbRead)
          // polygon-with-holes structural layer ([exterior, holes...]
          // as array<ring>; GeoFunctions.java:581,921 handle interior
          // rings via Esri — here area/centroid/contains generalize)
          one("st_polygon_from_binary")(WkbPolygonRead)
          one("st_polygon_as_binary")(WkbPolygonWrite)
          one("st_polygon_area")(HoledPolygon(_, "area"))
          one("st_polygon_centroid")(HoledPolygon(_, "centroid"))
          two("st_polygon_contains")(HoledContains)
        }
        val builder: Seq[Expression] => Expression = {
          case Seq(a, Literal(k: Int, IntegerType)) => ArrayCombinations(a, k)
          case Seq(a, Literal(k: Long, LongType)) =>
            ArrayCombinations(a, k.toInt)
          case Seq(_, other) => sys.error(
            s"combinations: size must be an integer literal, got $other")
          case args =>
            sys.error(s"combinations expects 2 args, got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("combinations"),
          new ExpressionInfo(getClass.getCanonicalName, "combinations"),
          builder)
      }
      // SetDigest family (SetDigestFunctions.java / SetDigest.java):
      // make_set_digest / merge_set_digest aggregates plus jaccard_index /
      // intersection_cardinality scalars, and the binary leg of Presto's
      // cardinality() overload (array/map inputs keep Spark's builtin via
      // CardinalityDispatch — semantics-compatible shadowing).
      locally {
        def agg1(name: String)(mk: Expression => Expression): Unit = {
          val builder: Seq[Expression] => Expression = {
            case Seq(v) => mk(v)
            case args => sys.error(s"$name expects 1 arg, got ${args.length}")
          }
          registry.registerFunction(FunctionIdentifier(name),
            new ExpressionInfo(getClass.getCanonicalName, name), builder)
        }
        agg1("make_set_digest")(v =>
          SetDigestAgg(v, SetDigest.DefaultK).toAggregateExpression())
        agg1("merge_set_digest")(v =>
          SetDigestMergeAgg(v).toAggregateExpression())
        agg1("cardinality")(CardinalityDispatch)
        def bin2(name: String)(mk: (Expression, Expression) => Expression): Unit = {
          val builder: Seq[Expression] => Expression = {
            case Seq(a, b) => mk(a, b)
            case args => sys.error(s"$name expects 2 args, got ${args.length}")
          }
          registry.registerFunction(FunctionIdentifier(name),
            new ExpressionInfo(getClass.getCanonicalName, name), builder)
        }
        bin2("jaccard_index")(JaccardIndexExpr)
        bin2("intersection_cardinality")(IntersectionCardinality)
      }
      // Presto TRY(expr) special form (scalar/TryFunction.java): NULL on
      // runtime error instead of failing the query. Syntactically a
      // function call, so the registry absorbs it directly — Spark's
      // TryEval supplies the catch (the same codegen try/catch the
      // try_* family compiles to), so verbatim Presto TRY text runs.
      locally {
        val builder: Seq[Expression] => Expression = {
          case Seq(e) => org.apache.spark.sql.catalyst.expressions.TryEval(e)
          case args => sys.error(s"try expects 1 arg, got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("try"),
          new ExpressionInfo(getClass.getCanonicalName, "try"), builder)
      }
      // KHyperLogLog (type/khyperloglog/KHyperLogLogFunctions.java):
      // khyperloglog_agg(x, uii), merge_khll (the reference's
      // type-overloaded `merge`), uniqueness_distribution,
      // reidentification_potential; cardinality / jaccard_index /
      // intersection_cardinality above accept both digest kinds.
      locally {
        val agg2: Seq[Expression] => Expression = {
          case Seq(x, u) =>
            KHllAgg(x, u, KHll.DefaultMaxSize).toAggregateExpression()
          case args =>
            sys.error(s"khyperloglog_agg expects 2 args, got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("khyperloglog_agg"),
          new ExpressionInfo(getClass.getCanonicalName, "khyperloglog_agg"),
          agg2)
        val mergeB: Seq[Expression] => Expression = {
          case Seq(v) => KHllMergeAgg(v).toAggregateExpression()
          case args =>
            sys.error(s"merge_khll expects 1 arg, got ${args.length}")
        }
        registry.registerFunction(FunctionIdentifier("merge_khll"),
          new ExpressionInfo(getClass.getCanonicalName, "merge_khll"), mergeB)
        val uniq: Seq[Expression] => Expression = {
          case Seq(d) => UniquenessDistribution(d, Cast(Literal(256), LongType))
          case Seq(d, s0) => UniquenessDistribution(d, Cast(s0, LongType))
          case args => sys.error(
            s"uniqueness_distribution expects 1-2 args, got ${args.length}")
        }
        registry.registerFunction(
          FunctionIdentifier("uniqueness_distribution"),
          new ExpressionInfo(getClass.getCanonicalName,
            "uniqueness_distribution"), uniq)
        val reid: Seq[Expression] => Expression = {
          case Seq(d, t) => ReidentificationPotential(d, Cast(t, LongType))
          case args => sys.error(
            s"reidentification_potential expects 2 args, got ${args.length}")
        }
        registry.registerFunction(
          FunctionIdentifier("reidentification_potential"),
          new ExpressionInfo(getClass.getCanonicalName,
            "reidentification_potential"), reid)
      }
      installed.put(spark, true)
    }
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
  // Presto's TIME within a day. TIME WITH TIME ZONE stays descoped.
  private val timeLiteralRe =
    """(?i)\bTIME\s+'(\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?)'""".r

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

  /** Presto `ARRAY[...]` literals → Spark `array(...)`: bracket-depth
    * scan (subscripts like a[1] nest correctly), string literals
    * skipped, nested ARRAY[ handled by re-scanning. */
  private def rewriteArrayLiterals(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      var inStr = false
      var found = -1
      while (i < q.length && found < 0) {
        val c = q.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (q.regionMatches(true, i, "ARRAY[", 0, 6) &&
          (i == 0 || {
            val p = q.charAt(i - 1)
            !Character.isLetterOrDigit(p) && p != '_'
          })) found = i
        i += 1
      }
      if (found >= 0) {
        var j = found + 6
        var depth = 1
        var inS = false
        while (j < q.length && depth > 0) {
          val c = q.charAt(j)
          if (inS) { if (c == '\'') inS = false }
          else if (c == '\'') inS = true
          else if (c == '[') depth += 1
          else if (c == ']') depth -= 1
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
  private val createFnRe =
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
  private def rewriteAtTimeZone(q0: String): String = {
    var q = q0
    var changed = true
    while (changed) {
      changed = false
      val mask = new Array[Boolean](q.length)
      var inS = false
      var m = 0
      while (m < q.length) {
        val c = q.charAt(m)
        if (inS) { mask(m) = true; if (c == '\'') inS = false }
        else if (c == '\'') { mask(m) = true; inS = true }
        m += 1
      }
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
      // mask(i) = inside a string literal (quotes included)
      val mask = new Array[Boolean](q.length)
      var inS = false
      var m = 0
      while (m < q.length) {
        val c = q.charAt(m)
        if (inS) { mask(m) = true; if (c == '\'') inS = false }
        else if (c == '\'') { mask(m) = true; inS = true }
        m += 1
      }
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
              q = q.substring(0, rs) + "element_at(" + recv + ", " +
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
      var i = 0
      var inStr = false
      var found = -1
      while (i < q.length && found < 0) {
        val c = q.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (q.regionMatches(true, i, "CROSS", 0, 5) &&
          q.substring(i).take(40).toLowerCase.replaceAll("\\s+", " ")
            .startsWith(head.replaceAll("\\s+", " "))) found = i
        i += 1
      }
      if (found >= 0) {
        val open = q.indexOf('(', found)
        if (open < 0) return q
        var j = open + 1
        var depth = 1
        var inS = false
        while (j < q.length && depth > 0) {
          val c = q.charAt(j)
          if (inS) { if (c == '\'') inS = false }
          else if (c == '\'') inS = true
          else if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) j += 1
        }
        if (depth != 0) return q
        val arg = q.substring(open + 1, j)
        // top-level comma = multi-array zip; ordinality also unsupported
        var k = 0; var d = 0; var s = false; var topComma = false
        while (k < arg.length) {
          val c = arg.charAt(k)
          if (s) { if (c == '\'') s = false }
          else if (c == '\'') s = true
          else if (c == '(') d += 1
          else if (c == ')') d -= 1
          else if (c == ',' && d == 0) topComma = true
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

  // Presto PREPARE / EXECUTE ... USING (SqlBase.g4 prepare/execute;
  // presto-main QueryPreparer): session-scoped statement store keyed by
  // the session itself (weak keys, the Tables.register stance — no
  // leak, identity semantics). EXECUTE substitutes `?` placeholders
  // positionally with the USING argument texts (string-literal-masked
  // scan, top-level comma split), then runs through the full
  // rewritePrestoSql pipeline — plan-once-bind-later collapses to
  // bind-then-plan, which Spark's codegen cache makes equivalent in
  // practice at session scope.
  private val preparedStmts =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()

  private val prepareRe = """(?is)^\s*PREPARE\s+([A-Za-z_]\w*)\s+FROM\s+(.+)$""".r
  private val executeRe = """(?is)^\s*EXECUTE\s+([A-Za-z_]\w*)(?:\s+USING\s+(.+))?\s*$""".r
  private val deallocRe = """(?is)^\s*DEALLOCATE\s+PREPARE\s+([A-Za-z_]\w*)\s*$""".r

  /** Split an argument list on top-level commas (strings masked, parens
    * and brackets depth-tracked). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inS = false
    s.foreach { c =>
      if (inS) { cur += c; if (c == '\'') inS = false }
      else c match {
        case '\'' => cur += c; inS = true
        case '(' | '[' => depth += 1; cur += c
        case ')' | ']' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.map(_.trim).toSeq
  }

  // Statement-metadata surface (presto-main/.../sql/rewrite/
  // StatementRewrite.java registers DescribeInputRewrite,
  // DescribeOutputRewrite, ExplainRewrite, ShowQueriesRewrite): the
  // reference rewrites these statements into plain queries over
  // metadata; this engine does the same, producing DataFrames straight
  // from catalog/session state — no data scan in any of them.

  /** Session-property store (SystemSessionProperties.java). Curated
    * defs mirror the reference's names; the two that map onto real
    * engine behavior are wired through to Spark confs —
    * `hash_partition_count` → `spark.sql.shuffle.partitions` (both are
    * the shuffle fan-out knob) and `join_distribution_type=PARTITIONED`
    * → broadcast threshold -1 (forces shuffle joins, exactly Presto's
    * semantics). SET on an unknown name fails loudly like the
    * reference's "Session property %s does not exist". */
  private case class PropDef(name: String, default: String, typ: String,
      desc: String)
  private val sessionPropDefs = Seq(
    PropDef("hash_partition_count", "100", "integer",
      "Number of partitions for distributed joins and aggregations"),
    PropDef("join_distribution_type", "AUTOMATIC", "varchar",
      "The join method to use. Options are BROADCAST, PARTITIONED, AUTOMATIC"),
    PropDef("task_concurrency", "16", "integer",
      "Default number of local parallel jobs per worker"),
    PropDef("query_max_run_time", "100.00d", "varchar",
      "The maximum elapsed time a query may run"),
    PropDef("optimize_hash_generation", "true", "boolean",
      "Compute hash codes for distribution, joins, and aggregations early in query plan"))

  private val sessionProps =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()
  // Conf values captured before the first SET so RESET restores the
  // session's own prior state, not a global constant.
  private val sessionPropSaved =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()
  // Original CREATE VIEW / CREATE FUNCTION texts for SHOW CREATE
  // (ShowQueriesRewrite visitShowCreate*): the reference reconstructs
  // from metadata; session-scoped objects here replay the text.
  private val createdViewTexts =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()
  private val createdFnTexts =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]()

  private def sessionMap(
      store: java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]],
      spark: SparkSession): scala.collection.mutable.Map[String, String] =
    synchronized {
      store.computeIfAbsent(spark, _ => scala.collection.mutable.Map.empty)
    }

  /** Presto type-signature rendering of a Spark DataType
    * (presto-common TypeSignature display names: varchar, bigint,
    * varbinary, row(...), map(k, v)). */
  def prestoTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "varchar"
      case LongType => "bigint"
      case IntegerType => "integer"
      case ShortType => "smallint"
      case ByteType => "tinyint"
      case DoubleType => "double"
      case FloatType => "real"
      case BooleanType => "boolean"
      case BinaryType => "varbinary"
      case DateType => "date"
      case _: TimestampNTZType | _: TimestampType => "timestamp"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case ArrayType(e, _) => s"array(${prestoTypeName(e)})"
      case MapType(k, v, _) =>
        s"map(${prestoTypeName(k)}, ${prestoTypeName(v)})"
      case s: StructType =>
        s.fields.map(f => s"${f.name} ${prestoTypeName(f.dataType)}")
          .mkString("row(", ", ", ")")
      case other => other.simpleString
    }
  }

  /** Fixed-width byte size per FixedWidthType.getFixedSize; 0 for
    * variable-width, matching DescribeOutputRewrite's null→0 stance. */
  private def prestoTypeSize(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | DoubleType | _: TimestampNTZType | _: TimestampType => 8
      case IntegerType | FloatType | DateType => 4
      case ShortType => 2
      case ByteType | BooleanType => 1
      case d: DecimalType if d.precision <= 18 => 8
      case _: DecimalType => 16
      case _ => 0
    }
  }

  private val descInputRe =
    """(?is)^\s*DESCRIBE\s+INPUT\s+([A-Za-z_]\w*)\s*$""".r
  private val descOutputRe =
    """(?is)^\s*DESCRIBE\s+OUTPUT\s+([A-Za-z_]\w*)\s*$""".r
  private val describeRe =
    """(?is)^\s*DESC(?:RIBE)?\s+([A-Za-z_][\w.]*)\s*$""".r
  private val explainRe =
    """(?is)^\s*EXPLAIN\b(\s+ANALYZE\b)?(\s+VERBOSE\b)?\s*(?:\(([^)]*)\))?\s*(.+)$""".r
  private val showCreateTableRe =
    """(?is)^\s*SHOW\s+CREATE\s+TABLE\s+([A-Za-z_][\w.]*)\s*$""".r
  private val showCreateViewRe =
    """(?is)^\s*SHOW\s+CREATE\s+VIEW\s+([A-Za-z_][\w.]*)\s*$""".r
  private val showCreateFnRe =
    """(?is)^\s*SHOW\s+CREATE\s+FUNCTION\s+([A-Za-z_][\w.]*)\s*$""".r
  private val showCatalogsRe =
    """(?is)^\s*SHOW\s+CATALOGS(?:\s+LIKE\s+'([^']*)')?\s*$""".r
  private val setSessionRe =
    """(?is)^\s*SET\s+SESSION\s+([A-Za-z_][\w.]*)\s*=\s*(.+?)\s*$""".r
  private val resetSessionRe =
    """(?is)^\s*RESET\s+SESSION\s+([A-Za-z_][\w.]*)\s*$""".r
  private val showSessionRe = """(?is)^\s*SHOW\s+SESSION\s*$""".r
  private val txRe =
    """(?is)^\s*(START\s+TRANSACTION(?:\s+\w+(?:\s+\w+)*)?|COMMIT(?:\s+WORK)?|ROLLBACK(?:\s+WORK)?)\s*$""".r
  private val dropFnRe =
    """(?is)^\s*DROP\s+FUNCTION\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*$""".r
  private val analyzeTableRe =
    """(?is)^\s*ANALYZE\s+([A-Za-z_][\w.]*)(?:\s+WITH\s*\([^)]*\))?\s*$""".r
  private val useRe =
    """(?is)^\s*USE\s+([A-Za-z_][\w.]*)\s*$""".r
  private val showStatsRe =
    """(?is)^\s*SHOW\s+STATS\s+FOR\s+(.+?)\s*$""".r
  private val createViewDetectRe =
    """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+([A-Za-z_][\w.]*)""".r

  /** One-row status result, the shape PREPARE/DEALLOCATE already use. */
  private def statusDf(spark: SparkSession, v: String): org.apache.spark.sql.DataFrame =
    spark.sql(s"SELECT '${v.replace("'", "''")}' AS result")

  /** Count `?` placeholders with string literals masked. */
  private def countPlaceholders(body: String): Int = {
    var n = 0; var inS = false
    body.foreach { c =>
      if (inS) { if (c == '\'') inS = false }
      else if (c == '\'') inS = true
      else if (c == '?') n += 1
    }
    n
  }

  private def storedStatement(spark: SparkSession, name: String): String =
    synchronized {
      Option(preparedStmts.get(spark)).flatMap(_.get(name.toLowerCase))
    }.getOrElse(sys.error(s"prepared statement not found: $name"))

  /** True for statement bodies that are queries (lazy in spark.sql);
    * commands (DDL/DML) execute eagerly there, so EXPLAIN routes them
    * through Spark's native EXPLAIN instead. */
  private def isQueryShaped(body: String): Boolean = {
    val head = body.trim.takeWhile(c => !c.isWhitespace && c != '(').toUpperCase
    head == "SELECT" || head == "WITH" || head == "VALUES" ||
      head == "TABLE" || body.trim.startsWith("(")
  }

  private def explainStatement(spark: SparkSession, analyze: Boolean,
      opts: String, body: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val typeRe = """(?i)TYPE\s+(LOGICAL|DISTRIBUTED|VALIDATE|IO)""".r
    val planType = typeRe.findFirstMatchIn(opts)
      .map(_.group(1).toUpperCase).getOrElse("DISTRIBUTED")
    val inner = rewritePrestoSql(body)
    if (analyze) {
      // EXPLAIN ANALYZE executes, then renders the plan with runtime
      // metrics (the reference annotates PlanPrinter output with
      // operator stats). Executing THIS queryExecution's RDD (not a
      // derived write/count plan) is what populates its SQLMetrics;
      // nothing materializes driver-side. AQE wraps the tree in an
      // AdaptiveSparkPlanExec with no visible children — unwrap to the
      // final plan for the metric walk.
      val qe = spark.sql(inner).queryExecution
      qe.toRdd.foreachPartition(_ => ())
      val exec = qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // AQE query stages are LEAF nodes wrapping their materialized
      // subtree — a plain tree collect stops at them; descend through
      // QueryStageExec.plan explicitly.
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case other => other.children
        }
        p +: kids.flatMap(walk)
      }
      val metrics = walk(exec).filter(_.metrics.nonEmpty).map { n =>
        n.nodeName + ": " + n.metrics.map { case (k, m) =>
          s"$k=${m.value}"
        }.toSeq.sorted.mkString(", ")
      }
      val text = exec.toString + "\n== Runtime Metrics ==\n" +
        metrics.mkString("\n")
      Seq(text).toDF("Query Plan")
    } else if (planType == "VALIDATE") {
      // ExplainRewrite: VALIDATE analyzes only and returns Valid=true
      // (analysis failures propagate as errors, same as the reference).
      if (isQueryShaped(body)) spark.sql(inner).queryExecution.assertAnalyzed()
      else {
        val txt = spark.sql(s"EXPLAIN $inner").collect().map(_.getString(0))
          .mkString("\n")
        require(!txt.contains("Exception"), s"EXPLAIN VALIDATE failed:\n$txt")
      }
      Seq(true).toDF("Valid")
    } else if (planType == "IO") {
      // IOPlanPrinter emits JSON listing input tables; derive it from
      // the analyzed plan's catalog-resolvable aliases (SQL-local
      // aliases don't resolve in the catalog and drop out).
      require(isQueryShaped(body), s"EXPLAIN (TYPE IO) supports queries, got: $body")
      val analyzed = spark.sql(inner).queryExecution.analyzed
      val names = analyzed.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          s.identifier.name
      }.distinct.filter(n => spark.catalog.tableExists(n)).sorted
      val json = names.map(n => "\"" + n + "\"")
        .mkString("{\"inputTables\":[", ",", "]}")
      Seq(json).toDF("Query Plan")
    } else {
      val text =
        if (isQueryShaped(body)) {
          val qe = spark.sql(inner).queryExecution
          if (planType == "LOGICAL") qe.optimizedPlan.toString
          else qe.executedPlan.toString
        } else spark.sql(s"EXPLAIN $inner").collect()
          .map(_.getString(0)).mkString("\n")
      Seq(text).toDF("Query Plan")
    }
  }

  /** SHOW STATS FOR table | (query) (SqlBase.g4:107 showStats /
    * showStatsForQuery; presto-main ShowStatsRewrite): one row per
    * column — column_name, data_size (string columns), distinct_values_
    * count, nulls_fraction, low/high — plus the row_count summary row,
    * the reference's exact shape. Stats compute EXACTLY over the
    * relation (the gate needs determinism); NDVs run as one separate
    * pass per column — packing countDistincts on different columns into
    * one aggregate plans an Expand (row x N) through ObjectHashAggregate,
    * measured 4x slower (the qj0/q85 lesson, SURVEY §2.4). A production
    * deployment answers from catalog statistics (ANALYZE, qq6) or
    * approx_count_distinct — this is interactive metadata, not a data
    * path. */
  private def showStatsStatement(spark: SparkSession,
      target0: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    val target = target0.trim
    val df =
      if (target.startsWith("(")) {
        require(target.endsWith(")"),
          s"SHOW STATS FOR: unbalanced query parentheses: $target")
        spark.sql(rewritePrestoSql(target.substring(1, target.length - 1)))
      } else spark.table(target.split('.').last)
    val n = df.count()
    val colRows = df.schema.fields.toSeq.map { f =>
      val c = F.col(s"`${f.name}`")
      val statable = f.dataType match {
        case _: NumericType | StringType | DateType | TimestampType |
            org.apache.spark.sql.types.TimestampNTZType |
            org.apache.spark.sql.types.BooleanType => true
        case _ => false // arrays/maps/structs: stats render NULL
      }
      if (!statable)
        (f.name, None: Option[Long], None: Option[Long],
          None: Option[Double], None: Option[Long],
          None: Option[String], None: Option[String])
      else {
        val isStr = f.dataType == StringType
        val r = df.agg(
          F.count(c).as("nn"), F.countDistinct(c).as("ndv"),
          F.min(c).cast("string").as("lo"),
          F.max(c).cast("string").as("hi"),
          (if (isStr) F.sum(F.length(c)) else F.lit(null).cast("bigint"))
            .as("sz")).head()
        (f.name,
          if (isStr && !r.isNullAt(4)) Some(r.getLong(4)) else None,
          Some(r.getLong(1)),
          Some(if (n == 0) 0.0 else 1.0 - r.getLong(0).toDouble / n),
          None: Option[Long],
          Option(r.getString(2)), Option(r.getString(3)))
      }
    }
    val summary = (null: String, None: Option[Long], None: Option[Long],
      None: Option[Double], Some(n), None: Option[String],
      None: Option[String])
    (colRows :+ summary).toDF("column_name", "data_size",
      "distinct_values_count", "nulls_fraction", "row_count",
      "low_value", "high_value")
  }

  /** Entry point for statement-level Presto SQL: handles PREPARE /
    * EXECUTE / DEALLOCATE, DESCRIBE (incl. INPUT/OUTPUT), EXPLAIN,
    * SHOW CREATE/CATALOGS/SESSION, SET/RESET SESSION, transaction
    * no-ops, USE, SHOW STATS, and DROP FUNCTION; everything else falls
    * through to `spark.sql(rewritePrestoSql(...))`. */
  def prestoStatement(spark: SparkSession, sqlText: String): org.apache.spark.sql.DataFrame =
    sqlText match {
      case prepareRe(name, body) =>
        synchronized {
          preparedStmts.computeIfAbsent(spark,
            _ => scala.collection.mutable.Map.empty)
            .update(name.toLowerCase, body.trim)
        }
        spark.sql(s"SELECT 'PREPARE' AS result, '${name.toLowerCase}' AS statement")
      case deallocRe(name) =>
        synchronized {
          Option(preparedStmts.get(spark)).foreach(_.remove(name.toLowerCase))
        }
        spark.sql("SELECT 'DEALLOCATE' AS result")
      case executeRe(name, argsOrNull) =>
        val body = synchronized {
          Option(preparedStmts.get(spark)).flatMap(_.get(name.toLowerCase))
        }.getOrElse(sys.error(s"prepared statement not found: $name"))
        val args = Option(argsOrNull).map(splitTopLevel).getOrElse(Seq.empty)
        // positional ?-substitution, string literals masked
        val out = new StringBuilder
        var inS = false
        var i = 0
        var next = 0
        body.foreach { c =>
          if (inS) { out += c; if (c == '\'') inS = false }
          else if (c == '\'') { out += c; inS = true }
          else if (c == '?') {
            require(next < args.length,
              s"EXECUTE $name: statement has more ? parameters than " +
                s"USING arguments (${args.length})")
            out.append("(").append(args(next)).append(")")
            next += 1
          } else out += c
          i += 1
        }
        require(next == args.length,
          s"EXECUTE $name: ${args.length} USING arguments for $next " +
            "? parameters")
        spark.sql(rewritePrestoSql(out.toString))

      case descInputRe(name) =>
        // DescribeInputRewrite.java:123 — (Position, Type) per `?`,
        // 0-based, ordered by Position. The reference coerces types
        // from analysis context; placeholders here report "unknown"
        // (the reference's own rendering when no coercion applies) —
        // ledger divergence, SURVEY §2.3.
        import spark.implicits._
        val n = countPlaceholders(storedStatement(spark, name))
        if (n == 0)
          spark.sql("SELECT cast(null as int) AS Position, cast(null as string) AS Type LIMIT 0")
        else (0 until n).map(i => (i, "unknown")).toDF("Position", "Type")

      case descOutputRe(name) =>
        // DescribeOutputRewrite.java:115 — one row per output column
        // of the prepared statement, schema from analysis only (no
        // execution): placeholders bind NULL for analysis, Catalog/
        // Schema/Table render empty and Aliased true (the rendering
        // the reference uses for computed/aliased columns).
        import spark.implicits._
        val body = storedStatement(spark, name)
        val masked = new StringBuilder
        var inS = false
        body.foreach { c =>
          if (inS) { masked += c; if (c == '\'') inS = false }
          else if (c == '\'') { masked += c; inS = true }
          else if (c == '?') masked.append("(null)")
          else masked += c
        }
        val schema = spark.sql(rewritePrestoSql(masked.toString)).schema
        schema.fields.toSeq.map { f =>
          (f.name, "", "", "", prestoTypeName(f.dataType),
            prestoTypeSize(f.dataType), true)
        }.toDF("Column Name", "Catalog", "Schema", "Table", "Type",
          "Type Size", "Aliased")

      case explainRe(analyze, _, optsOrNull, body) =>
        // A leading parenthesized QUERY (`EXPLAIN (SELECT 1)`) is not
        // an option list — only TYPE/FORMAT keywords are.
        val optsLikely = Option(optsOrNull)
          .filter(o => """(?i)^\s*(TYPE|FORMAT)\b""".r.findFirstIn(o).isDefined)
        val fullBody =
          if (optsOrNull != null && optsLikely.isEmpty) s"($optsOrNull) $body"
          else body
        explainStatement(spark, analyze != null,
          optsLikely.getOrElse(""), fullBody)

      case showCreateTableRe(name) =>
        // ShowQueriesRewrite visitShowCreateTable: reconstructed DDL
        // from catalog metadata (columns + types), Presto's layout.
        val base = name.split('.').last
        val cols = spark.table(base).schema.fields
          .map(f => s"""   "${f.name}" ${prestoTypeName(f.dataType)}""")
          .mkString(",\n")
        statusDf(spark, s"CREATE TABLE $base (\n$cols\n)")
          .withColumnRenamed("result", "Create Table")

      case showCreateViewRe(name) =>
        val base = name.split('.').last.toLowerCase
        val text = sessionMap(createdViewTexts, spark).getOrElse(base,
          sys.error(s"SHOW CREATE VIEW: view not created this session: $base"))
        statusDf(spark, text).withColumnRenamed("result", "Create View")

      case showCreateFnRe(name) =>
        val base = name.split('.').last.toLowerCase
        val text = sessionMap(createdFnTexts, spark).getOrElse(base,
          sys.error(s"SHOW CREATE FUNCTION: function not created this session: $base"))
        statusDf(spark, text).withColumnRenamed("result", "Create Function")

      case showCatalogsRe(patOrNull) =>
        val df = spark.sql("SHOW CATALOGS")
          .withColumnRenamed("catalog", "Catalog")
        Option(patOrNull) match {
          case Some(p) =>
            df.filter(org.apache.spark.sql.functions.col("Catalog").like(p))
          case None => df
        }

      case describeRe(name)
          if !name.equalsIgnoreCase("INPUT") && !name.equalsIgnoreCase("OUTPUT") =>
        // DESCRIBE/DESC = SHOW COLUMNS (SqlBase.g4 aliases all three to
        // #showColumns): Column/Type/Extra/Comment from catalog
        // metadata, no scan.
        import spark.implicits._
        spark.table(name.split('.').last).schema.fields.toSeq
          .map(f => (f.name, prestoTypeName(f.dataType), "", ""))
          .toDF("Column", "Type", "Extra", "Comment")

      case setSessionRe(name0, rawValue) =>
        val name = name0.split('.').last.toLowerCase
        require(sessionPropDefs.exists(_.name == name),
          s"Session property $name does not exist")
        val value = rawValue.trim.stripPrefix("'").stripSuffix("'")
        val saved = sessionMap(sessionPropSaved, spark)
        name match {
          case "hash_partition_count" =>
            if (!saved.contains(name))
              saved(name) = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", value.toInt.toString)
          case "join_distribution_type" =>
            if (!saved.contains(name))
              saved(name) = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            value.toUpperCase match {
              case "PARTITIONED" =>
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
              case "BROADCAST" | "AUTOMATIC" =>
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved(name))
              case other => sys.error(s"join_distribution_type: $other")
            }
          case _ => () // stored only; no engine knob behind it
        }
        sessionMap(sessionProps, spark)(name) = value
        statusDf(spark, "SET SESSION")

      case resetSessionRe(name0) =>
        val name = name0.split('.').last.toLowerCase
        val saved = sessionMap(sessionPropSaved, spark)
        name match {
          case "hash_partition_count" =>
            saved.remove(name).foreach(v =>
              spark.conf.set("spark.sql.shuffle.partitions", v))
          case "join_distribution_type" =>
            saved.remove(name).foreach(v =>
              spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
          case _ => ()
        }
        sessionMap(sessionProps, spark).remove(name)
        statusDf(spark, "RESET SESSION")

      case showSessionRe() =>
        // ShowQueriesRewrite visitShowSession: Name/Value/Default/Type/
        // Description over the property registry; Value reflects SET.
        import spark.implicits._
        val set = sessionMap(sessionProps, spark)
        sessionPropDefs.map { d =>
          (d.name, set.getOrElse(d.name, d.default), d.default, d.typ, d.desc)
        }.toDF("Name", "Value", "Default", "Type", "Description")

      case txRe(stmt) =>
        // START TRANSACTION / COMMIT / ROLLBACK accepted as autocommit
        // no-ops: every statement commits on success, the stance of the
        // reference's non-transactional connectors (hive). Ledger
        // divergence — SURVEY §2.3.
        statusDf(spark,
          if (stmt.trim.toUpperCase.startsWith("START")) "START TRANSACTION"
          else stmt.trim.split("\\s+")(0).toUpperCase)

      case analyzeTableRe(name) =>
        // ANALYZE (SqlBase.g4 #analyze; presto-main AnalyzeTask →
        // connector stats collection): Spark's catalog-stats ANALYZE —
        // row count + per-column ndv/min/max/nulls into the catalog,
        // feeding the CBO the way Presto's stats feed its optimizer.
        // WITH (...) properties are connector-specific; accepted and
        // dropped (Spark's stats have no equivalent knobs).
        spark.sql(s"ANALYZE TABLE ${name.split('.').last} " +
          "COMPUTE STATISTICS FOR ALL COLUMNS")
        statusDf(spark, "ANALYZE")

      case dropFnRe(ifExists, name) =>
        val base = name.split('.').last.toLowerCase
        spark.sql(s"DROP TEMPORARY FUNCTION ${if (ifExists != null) "IF EXISTS " else ""}$base")
        sessionMap(createdFnTexts, spark).remove(base)
        statusDf(spark, "DROP FUNCTION")

      case useRe(name) =>
        // USE schema / USE catalog.schema (SqlBase.g4:35-36): a
        // qualified catalog.schema collapses to the schema (one Spark
        // catalog); an unknown schema fails loudly through Spark's own
        // USE. Subsequent unqualified table names resolve in the new
        // schema (session temp views still win, as in Spark).
        spark.sql(s"USE ${name.split('.').last}")
        statusDf(spark, "USE")

      case showStatsRe(target) =>
        showStatsStatement(spark, target)

      case other =>
        // Record original texts for SHOW CREATE VIEW / FUNCTION before
        // the rewrite pipeline consumes them.
        createViewDetectRe.findFirstMatchIn(other).foreach { m =>
          sessionMap(createdViewTexts, spark)
            .update(m.group(1).split('.').last.toLowerCase, other.trim)
        }
        createFnRe.findFirstMatchIn(other).foreach { m =>
          sessionMap(createdFnTexts, spark)
            .update(m.group(2).split('.').last.toLowerCase, other.trim)
        }
        spark.sql(rewritePrestoSql(other))
    }

  def rewritePrestoSql(q: String): String = {
    val fnned = rewriteCreateFunction(q)
    val dated = prestoDateFnRe.replaceAllIn(fnned,
      m => "presto_" + m.group(1).toLowerCase + "('" +
        m.group(2).toLowerCase + "'")
    val tstz = timestampTzLiteralRe.replaceAllIn(dated, m => {
      val wall = m.group(1)
      val zone = m.group(2)
      s"named_struct('utc', to_utc_timestamp(" +
        s"cast('$wall' as timestamp_ntz), '$zone'), 'tz', '$zone')"
    })
    val timed = timeLiteralRe.replaceAllIn(tstz,
      m => s"cast('1970-01-01 ${m.group(1)}' as timestamp_ntz)")
    val decimaled = decimalLiteralRe.replaceAllIn(timed, m => {
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
    })
    val sampled = tablesampleRe.replaceAllIn(decimaled,
      m => s"TABLESAMPLE (${m.group(2)} PERCENT)")
    bareVarcharRe.replaceAllIn(
      rewriteSubscripts(rewriteAtTimeZone(
        rewriteUnnest(rewriteArrayLiterals(sampled)))),
      m => m.group(1) + "string" + m.group(2))
  }
}

/** SQL-fragment builders for the IPv4 templates: dotted-quad → bigint,
  * prefix masking, bigint → dotted-quad. Kept as plain strings so the
  * registry's template machinery (parse once, substitute args) applies
  * unchanged. */
private[functions] object IpTemplates {
  /** a.b.c.d → 32-bit integer (as bigint). The '.' delimiter is literal:
    * these templates resolve through the registry's Presto-semantics
    * `split` shadow (which \\Q-quotes), not Spark's regex split. */
  def aton(e: String): String =
    s"(cast(element_at(split($e, '.'), 1) as bigint) * 16777216 + " +
      s"cast(element_at(split($e, '.'), 2) as bigint) * 65536 + " +
      s"cast(element_at(split($e, '.'), 3) as bigint) * 256 + " +
      s"cast(element_at(split($e, '.'), 4) as bigint))"

  /** Network address of `ip` under a `bits`-wide prefix. */
  def masked(ip: String, bits: String): String =
    s"shiftleft(shiftright(${aton(ip)}, cast(32 - $bits as int)), " +
      s"cast(32 - $bits as int))"

  /** 32-bit integer expression `m` → dotted-quad string. */
  def ntoa(m: String): String =
    s"concat(cast(shiftright($m, 24) & 255 as string), '.', " +
      s"cast(shiftright($m, 16) & 255 as string), '.', " +
      s"cast(shiftright($m, 8) & 255 as string), '.', " +
      s"cast($m & 255 as string))"

  // 'a.b.c.d/n' prefix string → network / broadcast dotted-quads
  // (ip_subnet_min / ip_subnet_max)
  private val prefixAddr = "element_at(split(__a, '/'), 1)"
  private val prefixBits = "cast(element_at(split(__a, '/'), 2) as int)"
  def subnetMin: String = ntoa(masked(prefixAddr, prefixBits))
  def subnetMax: String = ntoa(
    s"(${masked(prefixAddr, prefixBits)} | " +
      s"(shiftleft(cast(1 as bigint), 32 - $prefixBits) - 1))")
}

/** Presto `date_add('unit', n, x)` (`DateTimeFunctions.java`): delegates
  * to Spark's TimestampAdd but preserves DATE-ness — Presto returns DATE
  * for DATE inputs and rejects sub-day units on them. RuntimeReplaceable:
  * the replacement is built after analysis, when the input's type is
  * known; all casts and the timezone are explicit because the optimizer's
  * ReplaceExpressions substitution happens after type coercion and
  * timezone resolution have already run. */
case class PrestoDateAdd(unit: String, quantity: Expression, ts: Expression)
    extends Expression with RuntimeReplaceable {

  private val dateUnits = Set("day", "week", "month", "quarter", "year")

  override def children: Seq[Expression] = Seq(quantity, ts)
  override def prettyName: String = "date_add"

  override lazy val replacement: Expression = {
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    val add = TimestampAdd(unit, Cast(quantity, LongType),
      Cast(ts, TimestampType, tz), tz)
    if (ts.dataType == DateType) {
      require(dateUnits.contains(unit),
        s"date_add: unit '$unit' is invalid for a DATE input")
      Cast(add, DateType, tz)
    } else add
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(quantity = newChildren(0), ts = newChildren(1))
}

/** Presto `date_diff('unit', t1, t2)` = t2 - t1 in whole units, matching
  * Spark's TimestampDiff(unit, start, end) argument order. */
case class PrestoDateDiff(unit: String, start: Expression, end: Expression)
    extends Expression with RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(start, end)
  override def prettyName: String = "date_diff"

  override lazy val replacement: Expression = {
    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    TimestampDiff(unit, Cast(start, TimestampType, tz),
      Cast(end, TimestampType, tz), tz)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(start = newChildren(0), end = newChildren(1))
}

package graft.queries

import graft.Tables
import graft.functions.Registry

/** Queries written as raw Presto SQL against `spark.sql(...)` — proof that
  * the `Registry` makes reference SQL run unmodified (SURVEY §7.1). Every
  * function name below is a Presto name with no Spark builtin equivalent
  * (or different semantics), resolved through the expression-template
  * registry into pure built-in Catalyst trees (codegen'd, no UDFs).
  *
  * Reference names: `presto-main/.../scalar/StringFunctions.java`,
  * `MathFunctions.java`, `DateTimeFunctions.java` (ISO dow/doy numbering),
  * `BitwiseFunctions.java`.
  */
object RegistrySql extends QueryPack {

  private def sql(s: org.apache.spark.sql.SparkSession, dir: String,
                  q: String) = {
    Tables.register(s, dir)
    Registry.install(s)
    s.sql(Registry.rewritePrestoSql(q))
  }

  override def defs: Map[String, Q] = Map(
    // String/math/bitwise Presto names over `part`.
    "qa1_presto_sql_scalars" -> ((s, dir) => sql(s, dir,
      """SELECT p_partkey,
        |  cast(strpos(p_type, 'BRASS') as bigint) AS pos_brass,
        |  to_base(p_size, 2) AS size_bin,
        |  from_base(to_base(p_size, 16), 16) AS size_roundtrip,
        |  truncate(p_retailprice / 100.0) AS price_h,
        |  cast(codepoint(substr(p_brand, 7, 1)) as bigint) AS brand_cp,
        |  bitwise_xor(p_size, p_partkey) AS bx,
        |  bitwise_left_shift(p_size, 3) AS size_x8,
        |  hamming_distance(p_brand, reverse(p_brand)) AS ham_rev
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin)),

    // Presto date/time names (ISO numbering) over `orders`.
    "qa2_presto_sql_datetime" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderkey,
        |  cast(day_of_week(o_orderdate) as bigint) AS dow,
        |  cast(day_of_year(o_orderdate) as bigint) AS doy,
        |  cast(week_of_year(o_orderdate) as bigint) AS woy,
        |  cast(year_of_week(o_orderdate) as bigint) AS yow,
        |  to_unixtime(o_orderdate) AS epoch_s,
        |  date_format(o_orderdate, '%Y-%m-%d') AS d_str,
        |  date_parse(date_format(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS d_rt,
        |  date_add('day', 3, o_orderdate) AS d_plus3,
        |  date_add('month', 2, o_orderdate) AS d_plus2m,
        |  date_add('month', 1, cast(o_orderdate as date)) AS dm_date,
        |  from_iso8601_date(date_format(o_orderdate, '%Y-%m-%d')) AS iso_rt,
        |  cast(date_diff('day', o_orderdate, date '1998-01-01') as bigint)
        |    AS days_to_98
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q1 verbatim (Presto/ANSI text, adapted only for the slim
    // fixture schema which carries every column Q1 needs) — the flagship
    // "reference SQL runs unmodified" check.
    "qb5_tpch_q1_sql" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= date '1998-12-01' - interval '90' day
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q6 verbatim.
    "qb6_tpch_q6_sql" -> ((s, dir) => sql(s, dir,
      """SELECT sum(l_extendedprice * l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= date '1994-01-01'
        |  AND l_shipdate < date '1994-01-01' + interval '1' year
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin)),

    // More verbatim TPC-H texts (dates shifted into the fixture's
    // 1995-2001 span; Q3/Q10 drop only columns the slim fixture lacks —
    // o_shippriority, c_address/c_phone/c_comment). Q5 and Q14 run
    // letter-for-letter: implicit-join FROM lists, date ± interval
    // arithmetic, LIKE, correlated aggregation — the Presto parser
    // surface a migrating user exercises most.
    "qe5_tpch_q3_sql" -> ((s, dir) => sql(s, dir,
      """SELECT l_orderkey,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < date '1998-03-15'
        |  AND l_shipdate > date '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin)),

    "qe6_tpch_q5_sql" -> ((s, dir) => sql(s, dir,
      """SELECT n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= date '1996-01-01'
        |  AND o_orderdate < date '1996-01-01' + interval '1' year
        |GROUP BY n_name
        |ORDER BY revenue DESC""".stripMargin)),

    "qe7_tpch_q14_sql" -> ((s, dir) => sql(s, dir,
      """SELECT 100.00 * sum(CASE
        |    WHEN p_type LIKE 'PROMO%'
        |    THEN l_extendedprice * (1 - l_discount)
        |    ELSE 0
        |  END) / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= date '1996-09-01'
        |  AND l_shipdate < date '1996-09-01' + interval '1' month""".stripMargin)),

    "qe8_tpch_q10_sql" -> ((s, dir) => sql(s, dir,
      """SELECT c_custkey, c_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate >= date '1995-10-01'
        |  AND o_orderdate < date '1995-10-01' + interval '3' month
        |  AND l_returnflag = 'R'
        |  AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)),

    // Correlated LATERAL subquery (Presto LateralJoinNode,
    // `sql/planner/plan/LateralJoinNode`): top-2 orders per customer.
    "qc0_lateral_sql" -> ((s, dir) => sql(s, dir,
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin)),

    // IP functions (reference `presto-main/.../scalar/IpPrefixFunctions
    // .java`): prefix masking and subnet membership over dotted-quad
    // IPv4, as registry templates compiling to pure integer bit math.
    // Presto TIME literals: verbatim TIME 'HH:MM:SS' text rides as
    // epoch-date TIMESTAMP_NTZ (Registry.rewritePrestoSql) — ordering,
    // hour/minute/second extraction, and date_diff all keep Presto's
    // within-a-day TIME semantics. The oracle replays the same
    // epoch-date representation.
    "qn0_time_literals" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  cast(hour(t) as bigint) AS h,
        |  cast(minute(t) as bigint) AS m,
        |  cast(second(t) as bigint) AS sec,
        |  t < TIME '12:00:00' AS am,
        |  cast(date_diff('minute', TIME '09:00:00', t) as bigint)
        |    AS min_since_9,
        |  cast(date_diff('second', t, TIME '23:59:59') as bigint)
        |    AS sec_to_midnight
        |FROM (SELECT id, CASE id
        |        WHEN 1 THEN TIME '08:30:15'
        |        WHEN 2 THEN TIME '12:00:00'
        |        WHEN 3 THEN TIME '17:45:59.250'
        |        ELSE TIME '00:00:00' END AS t
        |      FROM VALUES (1), (2), (3), (4) AS v(id))
        |ORDER BY id""".stripMargin)),

    // r8: TIME WITH TIME ZONE literals (the last descoped type) — the
    // wall clock rides on the epoch date in the zoned struct layer, so
    // comparison is by UTC instant (reference TimeWithTimeZoneType
    // compareTo; rows 1 and 2 are the same instant in different
    // offsets and compare EQUAL — where DuckDB/Postgres tiebreak by
    // offset, a documented divergence carried as spelled-out
    // expectations in the oracle), extraction is wall-clock local via
    // zoned_local, and the offset fields replay in DuckDB TIMETZ.
    "ql9_timetz_literals" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  cast(hour(zoned_local(t)) as bigint) AS h,
        |  cast(minute(zoned_local(t)) as bigint) AS m,
        |  cast(zoned_timezone_hour(t) as bigint) AS tzh,
        |  cast(zoned_timezone_minute(t) as bigint) AS tzm,
        |  t = TIME '03:00:15 +00:00' AS eq_inst,
        |  t < TIME '13:00:00 +00:00' AS lt_13utc
        |FROM (SELECT id, CASE id
        |        WHEN 1 THEN TIME '08:30:15 +05:30'
        |        WHEN 2 THEN TIME '03:00:15 +00:00'
        |        WHEN 3 THEN TIME '23:00:00 +02:00'
        |        ELSE TIME '12:00:00 +09:00' END AS t
        |      FROM VALUES (1), (2), (3), (4) AS v(id))
        |ORDER BY id""".stripMargin)),

    // Presto literal spellings run verbatim: ARRAY[...] (bracket-depth
    // rewrite), DECIMAL 'd.dd' (precision/scale from the digits), and
    // the ROW constructor. The decimal arithmetic results surface as
    // DOUBLE: the driver's pandas hasher renders Spark parquet decimals
    // as Decimal objects but DuckDB's as floats (round-3 qb9 lesson) —
    // values are identical either way, only the hash path diverges.
    "qn1_presto_literals" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  cast(element_at(xs, 2) as bigint) AS second_x,
        |  cast(size(xs) as bigint) AS n,
        |  cast(cast(d * 2 as decimal(10, 2)) as double) AS dbl,
        |  cast(cast(row(id, d).d as decimal(10, 2)) as double) AS rv
        |FROM (SELECT 1 AS id, ARRAY[10, 20, 30] AS xs, DECIMAL '1.25' AS d
        |      UNION ALL SELECT 2, ARRAY[5, 7], DECIMAL '99.50')
        |ORDER BY id""".stripMargin)),

    // Presto's CROSS JOIN UNNEST idiom verbatim (rewritten pre-parse to
    // LATERAL VIEW explode): word frequencies over the document corpus.
    "qn2_presto_unnest" -> ((s, dir) => sql(s, dir,
      """SELECT w AS word, cast(count(*) as bigint) AS n
        |FROM documents CROSS JOIN UNNEST(split(text, ' ')) AS t(w)
        |WHERE doc_id <= 20
        |GROUP BY w
        |HAVING count(*) >= 5
        |ORDER BY n DESC, word
        |LIMIT 15""".stripMargin)),

    // Presto 1-based bracket subscripts verbatim (pre-parse rewrite to
    // element_at; ArraySubscriptOperator.java): literal and dynamic
    // indices, chained subscripts on a nested ARRAY literal, a call
    // result, and a map string key. DuckDB's native [] is 1-based too,
    // so the oracle replays the exact spelling.
    // Presto parametric type spellings in CAST targets + the MAP
    // constructor family (TypeSignature.java row/array/map parens
    // grammar vs Spark's angle brackets; MapConstructor.java's
    // MAP(ARRAY, ARRAY) zip form): rewritten/dispatched per r7c —
    // verbatim Presto, hand-derived oracle (the qj2 stance).
    "ql7_presto_cast_types" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  CAST(row(id, id * 0.5) AS ROW(k BIGINT, half DOUBLE)).half
        |    AS half,
        |  CAST(ARRAY[id, id + 1] AS array(double))[2] AS bumped,
        |  MAP(ARRAY['lo', 'hi'], ARRAY[id - 1, id + 1])['hi'] AS hi,
        |  cardinality(CAST(MAP(ARRAY['a'], ARRAY[id])
        |    AS map(varchar, bigint))) AS m,
        |  CAST(ARRAY[row(id, 'tag')]
        |    AS array(row(k bigint, v varchar)))[1].v AS tagged
        |FROM (SELECT 1 AS id UNION ALL SELECT 2) t
        |ORDER BY id""".stripMargin)),

    "qn3_presto_subscripts" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  cast(xs[1] as bigint) AS first_x,
        |  cast(xs[id] as bigint) AS by_id,
        |  cast(ARRAY[ARRAY[1, 2], ARRAY[3, 4]][2][1] as bigint) AS nested,
        |  split(s, '-')[2] AS tok2,
        |  cast(m['a'] as bigint) AS ma
        |FROM (SELECT 1 AS id, ARRAY[10, 20, 30] AS xs, 'x-y-z' AS s,
        |        map('a', 5) AS m
        |      UNION ALL SELECT 2, ARRAY[7, 8, 9], 'p-q-r', map('a', 6))
        |ORDER BY id""".stripMargin)),

    // Per-VALUE zoned timestamps (TimestampWithTimeZoneType /
    // DateTimeEncoding): struct<utc, tz> columns built from ISO-8601
    // offset literals — instant comparison across zones, wall-clock
    // extraction, truncate-toward-zero offsets for a -03:30 zone, zone
    // shifting with the instant preserved, and ISO re-rendering. The
    // oracle carries hand-derived literals (the qj2 stance): every
    // value below is worked by hand from the offsets.
    "qp1_zoned_timestamps" -> ((s, dir) => sql(s, dir,
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-06-10T10:00:00Z'),
        |    (4, '2020-12-31T23:45:00-03:30') AS t(id, s))
        |SELECT cast(id as bigint) AS id,
        |  cast(zoned_instant(z) as string) AS instant_utc,
        |  cast(zoned_local(z) as string) AS wall,
        |  cast(zoned_timezone_hour(z) as bigint) AS tzh,
        |  cast(zoned_timezone_minute(z) as bigint) AS tzm,
        |  zoned_to_iso8601(z) AS iso,
        |  cast(hour(zoned_local(z)) as bigint) AS local_hour,
        |  zoned_instant(z) <= zoned_instant(
        |    zoned_timestamp('2020-06-10T11:00:00+01:00')) AS le_10utc,
        |  zoned_to_iso8601(zoned_at_timezone(z, '+00:00')) AS at_utc,
        |  zoned_to_iso8601(zoned_with_timezone(
        |    cast('2020-06-10 08:00:00' as timestamp_ntz), '-04:00'))
        |    AS w_tz,
        |  cast(rank() OVER (ORDER BY z) as bigint) AS instant_rank,
        |  z = zoned_timestamp('2020-06-10T12:00:00+02:00')
        |    AS eq_crosszone,
        |  z < zoned_timestamp('2020-07-01T00:00:00Z') AS lt_july,
        |  zoned_timestamp('2020-06-10T15:30:00+05:30') =
        |    zoned_timestamp('2020-06-10T12:00:00+02:00') AS lit_eq
        |FROM z ORDER BY id""".stripMargin)),

    // Aggregate-internal DISTINCT over zoned values by INSTANT, result
    // type INCLUDED (r8 — closes ledger residual 5's last tail):
    // array_agg(DISTINCT z) and collect_set(z) rewrite to a sorted
    // instant-fold keeping one representative per instant, so rows 1-3
    // (one instant, three zones) contribute ONE element. The oracle
    // makes DuckDB run count(DISTINCT TIMESTAMPTZ) itself; renderings
    // hand-pinned (the qz8 stance).
    "q0m_zoned_distinct_agg" -> ((s, dir) => sql(s, dir,
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-06-10T10:00:00Z'),
        |    (4, '2020-12-31T23:45:00-03:30'),
        |    (5, '2021-01-01T03:15:00Z') AS t(id, s))
        |SELECT cast(count(DISTINCT z) as bigint) AS n_instants,
        |  array_join(transform(array_agg(DISTINCT z),
        |    e -> cast(zoned_instant(e) as string)), ',') AS instants,
        |  array_join(transform(collect_set(z),
        |    e -> cast(zoned_instant(e) as string)), ',') AS set_instants
        |FROM z""".stripMargin)),

    // GROUP BY / DISTINCT over zoned values by INSTANT (r7 — closes the
    // ledger residual): rows 1-3 share the 10:00 UTC instant in three
    // zones, rows 4-5 share 2021-01-01T03:15Z across the year boundary.
    // The ZonedInstantComparison rule rewrites the grouping key to utc
    // and bare key outputs to first(key) — the reference's
    // TimestampWithTimeZoneType hashes the packed millis only. The
    // oracle makes DuckDB genuinely GROUP BY its own TIMESTAMPTZ.
    "qz8_zoned_grouping" -> ((s, dir) => sql(s, dir,
      """WITH z AS (SELECT id, zoned_timestamp(s) AS z FROM VALUES
        |    (1, '2020-06-10T15:30:00+05:30'),
        |    (2, '2020-06-10T12:00:00+02:00'),
        |    (3, '2020-06-10T10:00:00Z'),
        |    (4, '2020-12-31T23:45:00-03:30'),
        |    (5, '2021-01-01T03:15:00Z') AS t(id, s))
        |SELECT cast(zoned_instant(z) as string) AS inst,
        |  cast(count(*) as bigint) AS n, cast(min(id) as bigint) AS min_id
        |FROM z GROUP BY z ORDER BY inst""".stripMargin)),

    // Verbatim `expr AT TIME ZONE 'zone'` operator (SqlBase.g4
    // valueExpression #atTimeZone): pre-parse rewrite onto the zoned
    // struct layer — same instant, target display zone — composable
    // with the zoned_* surface. Receivers cover a column, a timestamp
    // LITERAL, and a function-call result (the three backward-walk
    // shapes); zones cover an IANA name and a negative half-hour
    // offset. Oracle carries hand-derived wall clocks (the qp1 stance).
    "qq5_at_time_zone" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  zoned_to_iso8601(ts AT TIME ZONE 'Asia/Kolkata') AS kolkata,
        |  zoned_to_iso8601(ts AT TIME ZONE '-03:30') AS nst,
        |  cast(zoned_timezone_hour(ts AT TIME ZONE '-03:30') as bigint)
        |    AS tzh,
        |  cast(zoned_local(timestamp '2020-06-10 10:00:00'
        |    AT TIME ZONE '+02:00') as string) AS lit_wall,
        |  cast(hour(zoned_local(date_trunc('hour', ts)
        |    AT TIME ZONE '+05:30')) as bigint) AS call_recv_hour,
        |  zoned_to_iso8601(ts AT TIME ZONE
        |    INTERVAL '05:30' HOUR TO MINUTE) AS ivl_pos,
        |  zoned_to_iso8601(ts AT TIME ZONE
        |    INTERVAL -'03:30' HOUR TO MINUTE) AS ivl_neg
        |FROM (SELECT 1 AS id, timestamp '2020-06-10 10:00:00' AS ts
        |      UNION ALL SELECT 2, timestamp '2020-12-31 23:45:00')
        |ORDER BY id""".stripMargin)),

    // Verbatim TIMESTAMP-WITH-TIME-ZONE literals (SqlBase.g4
    // typeConstructor; TimestampWithTimeZoneType.java): the wall clock
    // interpreted IN the suffix zone, carried as struct<utc, tz> —
    // closes the r5 "per-value zoned timestamps" descope at the
    // literal spelling too. Offsets, an IANA name, and UTC; the
    // New-Year's-Eve case crosses the year at UTC.
    "qq7_timestamp_tz_literal" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  zoned_to_iso8601(z) AS iso,
        |  cast(zoned_instant(z) as string) AS instant_utc,
        |  cast(zoned_timezone_hour(z) as bigint) AS tzh,
        |  zoned_instant(z) =
        |    zoned_instant(TIMESTAMP '2020-06-10 10:00:00 UTC')
        |    AS same_instant
        |FROM VALUES
        |  (1, TIMESTAMP '2020-06-10 15:30:00 +05:30'),
        |  (2, TIMESTAMP '2020-12-31 23:45:00 -03:30'),
        |  (3, TIMESTAMP '2020-06-10 12:00:00 Europe/Berlin')
        |  AS t(id, z)
        |ORDER BY id""".stripMargin)),

    // Presto's WEIGHTED approx_percentile(x, w, p) (ApproximateWeighted
    // PercentileAggregations.java): routed to Spark's exact
    // percentile(col, p, frequency) — the weighted-multiset percentile,
    // and exact trivially satisfies the approximate contract. The
    // oracle EXPANDS each row w times and takes the plain interpolated
    // quantile — the definition itself. The 5e-7 epsilon breaks exact
    // .xxx5 interpolation ties (cents-grid data, the qo1 lesson).
    "qp4_weighted_percentile" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag,
        |  round(approx_percentile(l_extendedprice,
        |    cast(l_quantity as bigint), 0.5) + 5e-7, 4) AS wmed,
        |  round(approx_percentile(l_extendedprice,
        |    cast(l_quantity as bigint), 0.9) + 5e-7, 4) AS wp90,
        |  round(approx_percentile(l_extendedprice,
        |    cast(l_quantity as bigint), 0.1) + 5e-7, 4) AS wp10
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    "qd2_presto_sql_ip" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id, ip,
        |  ip_prefix(ip, 24) AS net24,
        |  ip_prefix(ip, 12) AS net12,
        |  is_subnet_of('10.0.0.0/8', ip) AS in_10,
        |  is_subnet_of('192.168.0.0/16', ip) AS in_192168
        |FROM VALUES (1, '10.1.2.3'), (2, '192.168.77.200'), (3, '8.8.8.8'),
        |  (4, '172.16.254.1') AS t(id, ip)
        |ORDER BY id""".stripMargin)),

    // Remaining reference aggregate families: linear regression
    // (DoubleRegressionAggregation — Spark ships the same regr_* names),
    // Shannon entropy over counts (EntropyAggregation), and the
    // order-independent checksum digest (ChecksumAggregationFunction).
    // Rounded per the gate rules (aggregate sums are order-sensitive in
    // the last ulps); checksum is exact integer XOR, unrounded.
    "qe3_regr_entropy_checksum" -> ((s, dir) => sql(s, dir,
      """WITH cnts AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |ent AS (
        |  SELECT l_returnflag, round(entropy(cnt), 6) AS h_bits
        |  FROM cnts GROUP BY l_returnflag),
        |reg AS (
        |  SELECT l_returnflag,
        |    round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |    round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |    checksum(cast(l_orderkey * 10 + l_linenumber as varchar)) AS ck
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT ent.l_returnflag, h_bits, slope, icept, ck
        |FROM ent JOIN reg ON ent.l_returnflag = reg.l_returnflag
        |ORDER BY ent.l_returnflag""".stripMargin)),

    // Duration parsing/formatting (DateTimeFunctions.java parse_duration /
    // to_milliseconds / human_readable_seconds) and the Wilson score
    // interval (MathFunctions.java) — Presto spellings end-to-end; the
    // oracle replays the same IEEE arithmetic so bounds compare unrounded.
    "qe9_duration_stats" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  to_milliseconds(parse_duration(dur)) AS ms,
        |  human_readable_seconds(secs) AS hr,
        |  wilson_interval_lower(succ, trials, 1.96) AS wl,
        |  wilson_interval_upper(succ, trials, 1.96) AS wu
        |FROM VALUES
        |  (1, '3.5m',  0,       9,  10),
        |  (2, '90s',   1000000, 60, 100),
        |  (3, '2.25h', 694861,  39, 40),
        |  (4, '750ms', 59,      0,  7),
        |  (5, '1d',    604800,  1,  1) AS t(id, dur, secs, succ, trials)
        |ORDER BY id""".stripMargin)),

    // Distinct-set aggregates (SetAggregationFunction.java /
    // SetUnionFunction.java); arrays serialize via array_join for the
    // gate (pandas cannot sort array cells).
    "qf0_set_aggregates" -> ((s, dir) => sql(s, dir,
      """SELECT source,
        |  array_join(set_agg(lang), ',') AS langs,
        |  array_join(set_union(slice(split(text, ' '), 1, 2)), ',')
        |    AS lead_words,
        |  cast(cardinality(set_agg(lang)) as bigint) AS n_langs
        |FROM documents
        |GROUP BY source ORDER BY source""".stripMargin)),

    // Array-pack extras (ArrayCombinationsFunction.java, ZipFunction.java,
    // ArraySortComparatorFunction.java, SplitToMultimapFunction.java,
    // DataSizeFunctions.java): combinations in lexicographic index order,
    // null-padded zip with field0/field1 row names, comparator-lambda
    // array_sort (the Presto lambda text runs unchanged on Spark's
    // builtin), first-delimiter multimap split, binary-unit data sizes.
    // Arrays stringify for the gate (array cells don't hash).
    "qh4_array_extras_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  array_join(transform(combinations(arr, 2),
        |    c -> array_join(c, '+')), ',') AS pairs,
        |  array_join(transform(zip(arr, slice(arr, 2, 10)),
        |    p -> concat(coalesce(p.field0, '_'), '|',
        |                coalesce(p.field1, '_'))), ',') AS zipped,
        |  array_join(array_sort(arr,
        |    (x, y) -> IF(x < y, 1, IF(x = y, 0, -1))), ',') AS sorted_desc,
        |  cast(cardinality(split_to_multimap(cfg, ';', '=')) as bigint)
        |    AS n_keys,
        |  array_join(element_at(split_to_multimap(cfg, ';', '='), 'a'), ',')
        |    AS a_vals,
        |  parse_presto_data_size(sz) AS bytes
        |FROM VALUES
        |  (1, array('d', 'b', 'c', 'a'), 'a=1;b=2;a=3', '2.3MB'),
        |  (2, array('x', 'y'), 'a=7;k=v', '750kB'),
        |  (3, array('m', 'n', 'o'), 'a=9;c=4;a=5;c=6', '1GB'),
        |  (4, array('z'), 'a=0', '0B') AS t(id, arr, cfg, sz)
        |ORDER BY id""".stripMargin)),

    // Color/render/bar pack (ColorFunctions.java) as verbatim Presto SQL:
    // packed-bigint colors (system colors encode negative), ANSI 256-color
    // render, HSB-interpolated color(), and block bars. The oracle carries
    // hand-derived expected values: the ANSI cube index is integer math
    // (16 + 36r' + 6g' + b', x' = x*6/256) and the interpolation rows sit
    // on HSB sector boundaries (f = 0, 0.5, 1) where the float math is
    // exactly representable. Gradient-bar escapes vary per block, so that
    // column is gated on its block count.
    "qi7_color_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  color(cname) AS c_sys,
        |  color(hex3) AS c_hex,
        |  rgb(r, g, b) AS c_rgb,
        |  color(frac, color('#f00'), color('#0f0')) AS c_interp,
        |  render(txt, color(hex3)) AS rendered,
        |  render(flag) AS rendered_bool,
        |  bar(frac, 6, color('#00f'), color('#00f')) AS bar_flat,
        |  length(regexp_replace(bar(frac, 8), '[^█]', '')) AS grad_blocks
        |FROM VALUES
        |  (1, 'red', '#f00', 255L, 0L, 0L, 0.0D, 'hot', true),
        |  (2, 'green', '#0f0', 0L, 255L, 0L, 0.5D, 'mid', false),
        |  (3, 'blue', '#00f', 0L, 0L, 255L, 1.0D, 'cold', true),
        |  (4, 'magenta', '#fa0', 250L, 128L, 7L, 1.0D, 'warm', false)
        |  AS t(id, cname, hex3, r, g, b, frac, txt, flag)
        |ORDER BY id""".stripMargin)),

    // Coverage-audit batch as verbatim Presto SQL: literal-delimiter
    // split (Presto splits on a LITERAL, Spark on a regex — the shadow
    // \Q-quotes, so '.' and '|' delimiters behave like the reference),
    // strrpos, URL-safe base64, big-endian two's-complement byte images,
    // IEEE-754 bit images, combine_hash, Joda-style format/parse,
    // url port/fragment extraction, is_json_scalar.
    "qj4_scalar_extras_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  array_join(split(st, '.'), ',') AS dot_split,
        |  array_join(split(st, '.', 2), '|') AS dot_split2,
        |  strrpos(st, 'b') AS last_b,
        |  strrpos(st, 'zz') AS no_zz,
        |  to_base64url(to_utf8(st)) AS b64u,
        |  from_utf8(from_base64url(to_base64url(to_utf8(st)))) AS b64_rt,
        |  lower(hex(to_big_endian_64(nm))) AS be64,
        |  from_big_endian_64(to_big_endian_64(nm)) AS be64_rt,
        |  lower(hex(to_big_endian_32(cast(nm % 2147483647 as int)))) AS be32,
        |  from_big_endian_32(to_big_endian_32(cast(nm % 2147483647 as int)))
        |    AS be32_rt,
        |  lower(hex(to_ieee754_64(dv))) AS ieee64,
        |  from_ieee754_64(to_ieee754_64(dv)) = dv AS ieee64_rt,
        |  cast(from_ieee754_32(to_ieee754_32(cast(dv as float)))
        |    as double) = cast(cast(dv as float) as double) AS ieee32_rt,
        |  combine_hash(nm, id) AS ch,
        |  format_datetime(ts, 'yyyy-MM-dd HH:mm') AS fmt,
        |  parse_datetime('2020-03-05 10:30', 'yyyy-MM-dd HH:mm') AS parsed,
        |  url_extract_port(u) AS port,
        |  url_extract_fragment(u) AS frag,
        |  is_json_scalar(js) AS scalar_json
        |FROM VALUES
        |  (1, 'a.b.c', -2L, 1.5D, timestamp '2021-06-01 08:30:00',
        |   'http://host.example:8080/p?q=1#sec', '123'),
        |  (2, 'aab.b', 255L, -2.75D, timestamp '1999-12-31 23:59:59',
        |   'https://example.com/path#frag', '"abc"'),
        |  (3, 'nodots', 1048575L, 0.0D, timestamp '2020-01-01 00:00:00',
        |   'http://plain.example/nopath', '[1,2]'),
        |  (4, 'x.y', -9007199254740993L, 6.25D,
        |   timestamp '2024-02-29 12:00:00',
        |   'ftp://h:21/f#z', 'not json')
        |  AS t(id, st, nm, dv, ts, u, js)
        |ORDER BY id""".stripMargin)),

    // Second coverage-audit batch: lambda matchers (direct Catalyst HOF
    // resolution), masked bitwise shifts, week/millisecond/to_iso8601,
    // sha512 (NIST 'abc' vector in the oracle), Presto base64 spellings,
    // IPv4 subnet bounds, json_extract/json_parse/json_format.
    "qj7_more_names_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  all_match(arr, x -> x > 0) AS allm,
        |  any_match(arr, x -> x > 2) AS anym,
        |  none_match(arr, x -> x > 10) AS nonem,
        |  bitwise_shift_left(5, 2, 64) AS bsl64,
        |  bitwise_shift_left(5, 2, 4) AS bsl4,
        |  bitwise_logical_shift_right(-8, 2, 64) AS blsr,
        |  bitwise_logical_shift_right(255, 4, 8) AS blsr8,
        |  bitwise_arithmetic_shift_right(-16, 2) AS basr,
        |  cast(week(ts) as bigint) AS wk,
        |  millisecond(ts) AS ms,
        |  to_iso8601(ts) AS iso,
        |  lower(hex(sha512(to_utf8('abc')))) AS sha512_abc,
        |  from_utf8(from_base64(to_base64(to_utf8(st)))) AS b64rt,
        |  ip_subnet_min('10.1.2.3/24') AS smin,
        |  ip_subnet_max('10.1.2.3/24') AS smax,
        |  array_join(ip_subnet_range('192.168.5.7/30'), '-') AS srange,
        |  json_extract(js, '$.a') AS jx,
        |  json_format(json_parse(js)) AS jfmt
        |FROM VALUES
        |  (1, array(1, 2, 3), timestamp '2021-06-01 08:30:00.123',
        |   'alpha', '{"a":5}'),
        |  (2, array(4, 5), timestamp '2020-01-01 23:59:59.007',
        |   'beta', '{"a":"x"}'),
        |  (3, array(-1, 7), timestamp '1999-07-04 00:00:00.999',
        |   'gamma', '{"b":1}')
        |  AS t(id, arr, ts, st, js)
        |ORDER BY id""".stripMargin)),

    // Statistical distribution scalars (MathFunctions.java:608-660,
    // commons-math3-backed like the reference). Unrounded transcendental
    // outputs can't be replayed by the oracle, so the gates are the
    // distributions' exact identities: cdf(0) = 0.5 exactly (erf(0) = 0),
    // symmetry, monotonicity, inverse round-trips, the public z=1.96
    // envelope, and Beta(1,1) = uniform.
    "qj6_distributions_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  normal_cdf(0.0, 1.0, 0.0) AS ncdf_zero,
        |  abs(normal_cdf(0.0, 1.0, x) + normal_cdf(0.0, 1.0, -x) - 1.0)
        |    < 1e-15 AS sym_ok,
        |  normal_cdf(0.0, 1.0, x) > normal_cdf(0.0, 1.0, x - 1.0) AS mono_ok,
        |  abs(inverse_normal_cdf(0.0, 1.0, normal_cdf(0.0, 1.0, x)) - x)
        |    < 1e-9 AS inv_rt_ok,
        |  normal_cdf(0.0, 1.0, 1.96) BETWEEN 0.9749 AND 0.9751 AS z196_ok,
        |  abs(normal_cdf(2.0, 0.5, x + 2.0) - normal_cdf(0.0, 1.0, 2.0 * x))
        |    < 1e-12 AS shift_scale_ok,
        |  abs(beta_cdf(1.0, 1.0, p) - p) < 1e-12 AS beta_uniform_ok,
        |  abs(beta_cdf(2.0, 2.0, 0.5) - 0.5) < 1e-12 AS beta_sym_ok,
        |  abs(inverse_beta_cdf(2.0, 3.0, beta_cdf(2.0, 3.0, p)) - p)
        |    < 1e-9 AS beta_rt_ok
        |FROM VALUES
        |  (1, 0.5D, 0.2D), (2, 1.0D, 0.5D), (3, 1.96D, 0.7D),
        |  (4, 2.5D, 0.9D)
        |  AS t(id, x, p)
        |ORDER BY id""".stripMargin)),

    // Timezone functions over fixed instants spanning DST boundaries and
    // half/quarter-hour zones; the oracle carries hand-derived wall-clock
    // literals (IANA offsets are public constants), so no timezone engine
    // is needed on the oracle side.
    "qj2_timezone_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  at_timezone(ts, zone) AS local_wall,
        |  with_timezone(ts, zone) AS instant_utc,
        |  timezone_hour(ts, zone) AS tzh,
        |  timezone_minute(ts, zone) AS tzm
        |FROM VALUES
        |  (1, timestamp '2020-01-15 12:00:00', 'America/Los_Angeles'),
        |  (2, timestamp '2020-07-15 12:00:00', 'America/Los_Angeles'),
        |  (3, timestamp '2020-01-15 12:00:00', 'Asia/Kolkata'),
        |  (4, timestamp '2020-01-15 23:00:00', 'Asia/Kathmandu'),
        |  (5, timestamp '2020-01-15 12:00:00', 'America/St_Johns')
        |  AS t(id, ts, zone)
        |ORDER BY id""".stripMargin)),

    // Verbatim lock of the remaining same-name array/map surface
    // (ArrayUnionFunction.java, ArrayIntersectFunction.java,
    // ArrayExceptFunction.java, ArrayMaxFunction/ArrayMinFunction.java,
    // SequenceFunction.java, ArrayElementAtFunction.java,
    // MapConcatFunction.java, MapZipWithFunction.java,
    // MapTransformKeyFunction.java, MapEntriesFunction.java,
    // TypeOfFunction.java): these resolve to Spark builtins unchanged, and
    // this query pins their semantics (dedup on set algebra, negative
    // element_at from the end, map-concat merge, zip over the key union).
    // Outputs serialize sorted so neither engine's container order leaks.
    // typeof renders PRESTO type signatures since r7c ('array(varchar)',
    // 'map(varchar, integer)' — PrestoTypeOf, an analysis-time
    // literal). map_concat carries Presto's
    // LAST-MAP-WINS duplicate-key policy since r7c (registry override —
    // fold dropping overridden keys, then a disjoint entries concat;
    // RegistrySuite locks the override).
    "qi8_array_map_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  array_join(array_sort(array_union(a, b)), ',') AS arr_u,
        |  array_join(array_sort(array_intersect(a, b)), ',') AS arr_i,
        |  array_join(array_sort(array_except(a, b)), ',') AS arr_e,
        |  array_max(a) AS amax, array_min(a) AS amin,
        |  array_join(reverse(a), ',') AS arev,
        |  array_join(sequence(1, n), ',') AS seqs,
        |  element_at(a, 1) AS a_first, element_at(a, -1) AS a_last,
        |  array_join(array_sort(transform(map_entries(map_concat(m1, m2)),
        |    e -> concat(e.key, '=', cast(e.value as string)))), ',')
        |    AS mconcat,
        |  array_join(array_sort(transform(map_entries(
        |    map_zip_with(m1, m3, (k, v1, v2) ->
        |      coalesce(v1, 0) + coalesce(v2, 0))),
        |    e -> concat(e.key, '=', cast(e.value as string)))), ',') AS mzip,
        |  array_join(array_sort(transform(map_entries(
        |    transform_keys(m1, (k, v) -> upper(k))),
        |    e -> concat(e.key, '=', cast(e.value as string)))), ',') AS mkeys,
        |  typeof(a) AS t_arr, typeof(m1) AS t_map
        |FROM VALUES
        |  (1, array('b', 'a', 'c'), array('c', 'd'), 3,
        |   map('x', 1, 'y', 2), map('z', 9), map('x', 5, 'q', 7)),
        |  (2, array('m'), array('m', 'm', 'n'), 1,
        |   map('k', 0), map('l', 1), map('k', 2)),
        |  (3, array('z', 'z', 'y'), cast(array() as array<string>), 4,
        |   map('a', 1), map('b', 2), map('c', 3))
        |  AS t(id, a, b, n, m1, m2, m3)
        |ORDER BY id""".stripMargin)),

    // FNV hashes + HMACs (FnvHash.java, HmacFunctions.java). HMAC rows
    // are the public RFC 2202/4231 test vectors (the oracle carries the
    // published digests); FNV is replayed computationally by the oracle
    // (list_reduce over bytes with the same multiply/xor recurrences).
    "qh5_hash_hmac_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  lower(hex(CASE algo
        |    WHEN 'sha256' THEN hmac_sha256(to_utf8(data), from_hex(keyhex))
        |    WHEN 'sha1' THEN hmac_sha1(to_utf8(data), from_hex(keyhex))
        |    WHEN 'md5' THEN hmac_md5(to_utf8(data), from_hex(keyhex))
        |  END)) AS mac,
        |  fnv1_32(to_utf8(data)) AS f1_32,
        |  fnv1a_32(to_utf8(data)) AS f1a_32,
        |  fnv1_64(to_utf8(data)) AS f1_64,
        |  fnv1a_64(to_utf8(data)) AS f1a_64
        |FROM VALUES
        |  (1, 'sha256', '0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b',
        |   'Hi There'),
        |  (2, 'sha1', '0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b',
        |   'Hi There'),
        |  (3, 'md5', '0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b0b',
        |   'Hi There'),
        |  (4, 'sha256', '4a656665', 'what do ya want for nothing?'),
        |  (5, 'sha1', '4a656665', 'what do ya want for nothing?'),
        |  (6, 'md5', '4a656665', 'what do ya want for nothing?')
        |  AS t(id, algo, keyhex, data)
        |ORDER BY id""".stripMargin)),

    // Verbatim Presto TRY(...) special form over ANSI error paths: cast
    // failure, out-of-bounds element_at, unparseable date — each yields
    // NULL through TryEval instead of failing the query (qb0 covers the
    // try_* spellings; this is the reference's own syntax).
    "qi0_try_sql" -> ((s, dir) => sql(s, dir,
      """SELECT p_partkey,
        |  TRY(cast(substr(p_type, 1, 3) as integer)) AS bad_int,
        |  TRY(cast(cast(p_size as string) as integer)) AS good_int,
        |  TRY(element_at(split(p_type, ' '), 99)) AS oob,
        |  TRY(date_parse(p_brand, '%Y-%m-%d')) AS bad_date
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin)),

    // multimap_from_entries over row(key, value) arrays — fed here from
    // map_entries (whose structs carry the key/value field names the
    // reference's row type implies) and from explicit struct literals.
    "qi2_multimap_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  cast(cardinality(multimap_from_entries(es)) as bigint) AS n_keys,
        |  array_join(element_at(multimap_from_entries(es), 'a'), ',')
        |    AS a_vals,
        |  array_join(map_keys(multimap_from_entries(es)), ',') AS keys
        |FROM VALUES
        |  (1, array(struct('a' AS key, 1 AS value),
        |            struct('b' AS key, 2 AS value),
        |            struct('a' AS key, 3 AS value))),
        |  (2, array(struct('a' AS key, 7 AS value))),
        |  (3, array(struct('z' AS key, 0 AS value),
        |            struct('a' AS key, 5 AS value),
        |            struct('z' AS key, 9 AS value)))
        |  AS t(id, es)
        |ORDER BY id""".stripMargin)),

    // JSON extras (JsonFunctions.java): element counts at a path,
    // index-from-end array access, membership. r8c: json_array_get is
    // the native streaming walk — object elements render as compact
    // JSON, raw number spellings survive ('1.50' stays '1.50'), a JSON
    // null ELEMENT is SQL NULL while the STRING "null" is the 4-char
    // value (the distinction the old get_json_object template lost).
    "qi1_json_extras_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  json_size(j, '$') AS sz_root,
        |  json_size(j, '$.a') AS sz_a,
        |  json_array_get(arr, 1) AS second,
        |  json_array_get(arr, -1) AS last,
        |  json_array_contains(arr, 'x') AS has_x,
        |  json_array_contains(nums, 3) AS has_3,
        |  json_array_get('[{"k":1},1.50,null,"null"]', 0) AS el_obj,
        |  json_array_get('[{"k":1},1.50,null,"null"]', 1) AS el_raw,
        |  json_array_get('[{"k":1},1.50,null,"null"]', 2) AS el_null,
        |  json_array_get('[{"k":1},1.50,null,"null"]', 3) AS el_strnull,
        |  json_array_contains('[1.0]', 1) AS c_int_vs_float,
        |  json_array_contains('[1.5]', 1.5) AS c_float,
        |  json_array_contains('[2]', cast(2 as double)) AS c_float_vs_int,
        |  json_array_contains('{"a":1}', 'x') AS c_nonarray,
        |  json_array_contains(nums, cast('nan' as double)) AS c_nan,
        |  json_array_contains('not json', cast('nan' as double))
        |    AS c_nan_malformed
        |FROM VALUES
        |  (1, '{"a": [1,2,3], "b": 1}', '["x","y","z"]', '[1,2,3]'),
        |  (2, '{"a": {"k": 1, "m": 2}}', '["p"]', '[4,5]'),
        |  (3, '{"a": 7}', '["x"]', '[]')
        |  AS t(id, j, arr, nums)
        |ORDER BY id""".stripMargin)),

    // mongo ObjectId constructors (presto-mongodb
    // ObjectIdFunctions.java:40-117 — closes the residual-ledger
    // objectid entry): hex round-trip, the reference's space strip,
    // and the full comparison-operator family riding the varbinary
    // representation (unsigned bytewise = ObjectId.compareTo). The
    // zero-arg generator is nondeterministic by contract, so only its
    // SHAPE is gated (12 bytes).
    "q1n_objectid" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  hex(objectid(oid)) AS oid_hex,
        |  objectid(' ' || substr(oid, 1, 8) || ' ' || substr(oid, 9) || ' ')
        |    = objectid(oid) AS space_strip,
        |  objectid(oid) < objectid('ffffffffffffffffffffffff') AS lt_max,
        |  objectid(oid) > objectid('000000000000000000000000') AS gt_min,
        |  objectid(oid) BETWEEN objectid('000000000000000000000000')
        |    AND objectid('ffffffffffffffffffffffff') AS between_ok,
        |  length(objectid()) = 12 AS gen_len
        |FROM VALUES
        |  (1, '507f1f77bcf86cd799439011'),
        |  (2, '0000000000000000000000ff'),
        |  (3, 'FFFFFFFFFFFFFFFFFFFFFF00')
        |  AS t(id, oid)
        |ORDER BY id""".stripMargin)),

    // Teradata compat plugin (presto-teradata-functions): index,
    // char2hexint (uppercase UTF-16BE hex).
    "qh9_teradata_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  cast(index(s, 'lo') as bigint) AS idx,
        |  char2hexint(s) AS hx
        |FROM VALUES (1, 'hello'), (2, 'world'), (3, 'Spark')
        |  AS t(id, s)
        |ORDER BY id""".stripMargin)),

    // Vector math via registry lambdas over `embeddings` pairs.
    "qa3_presto_sql_vector" -> ((s, dir) => sql(s, dir,
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(cosine_similarity(a.embedding, b.embedding), 4) AS cos,
        |  round(dot_product(a.embedding, b.embedding), 4) AS dot,
        |  round(l2_distance(a.embedding, b.embedding), 4) AS l2
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 5
        |WHERE a.vec_id < 5 ORDER BY a_id""".stripMargin)),

    // differential_entropy, fixed_histogram_mle strategy
    // (DifferentialEntropyAggregation.java + FixedHistogramMleState
    // Strategy.java): 17 buckets over [0, 51) — width exactly 3.0 —
    // unweighted and weighted. Mergeable O(buckets) state; the oracle
    // replays the same histogram + (-Σ p ln p + ln w)/ln 2 (doubles gate
    // at 1e-9 relative tolerance).
    "qk3_differential_entropy" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag,
        |  differential_entropy(17, l_quantity, 1.0,
        |    'fixed_histogram_mle', 0.0, 51.0) AS ent,
        |  differential_entropy(17, l_quantity, cast(l_linenumber as double),
        |    'fixed_histogram_mle', 0.0, 51.0) AS ent_w,
        |  differential_entropy(17, l_quantity, 1.0,
        |    'fixed_histogram_jacknife', 0.0, 51.0) AS ent_jk
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // Aggregate FILTER clause (reference grammar `filter` on
    // aggregations — AggregationNode carries per-aggregate masks): the
    // ANSI spelling runs verbatim on both engines, incl. combined with
    // DISTINCT and alongside unfiltered aggregates in one pass.
    "ql3_agg_filter_sql" -> ((s, dir) => sql(s, dir,
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
        |  count(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 45)
        |    AS supp_heavy,
        |  avg(l_quantity) FILTER (WHERE l_linenumber = 1) AS avg_first
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // SHOW FUNCTIONS (testShowFunctions; the reference lists registered
    // names through the same metadata the planner resolves): the
    // Presto-name registry is CATALOG-VISIBLE, not a parser hack — the
    // session function catalog enumerates the installed names.
    "ql1_show_functions_sql" -> ((s, dir) => sql(s, dir,
      "SHOW FUNCTIONS LIKE 'classification_*'")
      .selectExpr("cast(function as string) as function")
      .orderBy("function")),

    // WHERE-position NOT IN against a subquery CONTAINING a NULL
    // (AbstractTestQueries testSemiJoinNullHandling): ANSI says no row
    // can pass (x NOT IN S is never TRUE when S has a NULL). Spark plans
    // this as a null-aware anti join — a different physical path from
    // qk8's projection-position truth table. Both the poisoned (empty
    // result proven by a count) and clean variants are locked.
    "ql0_not_in_where_sql" -> ((s, dir) => sql(s, dir,
      """SELECT
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT nullif(c_custkey, 370) FROM customer)) AS with_null_n,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_custkey <= 500))
        |    AS clean_n,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_custkey > 1e18))
        |    AS empty_set_n""".stripMargin)),

    // Special floating-point semantics (MathFunctions nan()/infinity()/
    // is_nan/is_finite/is_infinite; AbstractTestQueries
    // testSpecialFloatingPointValues): NaN/±Inf as values, in
    // comparisons, as GROUP BY keys (one NaN group), and in total sort
    // order (-Inf < finite < +Inf < NaN — Spark and DuckDB agree).
    // Documented divergence: `nan() = nan()` is TRUE under Spark's (and
    // DuckDB's) total-order equality; the reference's `=` compiles to
    // Java `==` where NaN equals nothing — the reference itself groups
    // and sorts NaN as equal/greatest, so only the raw `=` operator
    // differs.
    "qk9_float_special_sql" -> ((s, dir) => sql(s, dir,
      """WITH v AS (SELECT * FROM VALUES
        |    (1, nan()), (2, infinity()), (3, -infinity()),
        |    (4, 1.5E0), (5, cast(null as double)) AS t(id, x)),
        |ranked AS (
        |  SELECT id, x, cast(row_number() OVER (ORDER BY x) as bigint)
        |    AS sort_pos
        |  FROM v WHERE x IS NOT NULL),
        |grouped AS (
        |  SELECT y, cast(count(*) as bigint) AS n FROM VALUES
        |      (nan()), (nan()), (infinity()), (1.5E0), (nan())
        |    AS g(y) GROUP BY y)
        |SELECT v.id,
        |  CASE WHEN is_nan(v.x) THEN 'NaN'
        |       WHEN v.x = infinity() THEN 'Inf'
        |       WHEN v.x = -infinity() THEN '-Inf'
        |       ELSE cast(v.x as string) END AS x_repr,
        |  is_nan(v.x) AS f_nan, is_finite(v.x) AS f_fin,
        |  is_infinite(v.x) AS f_inf,
        |  v.x = v.x AS self_eq, v.x > 1.0E308 AS gt_huge,
        |  r.sort_pos,
        |  (SELECT max(y) FROM grouped WHERE n = 3) AS nan_key,
        |  (SELECT n FROM grouped WHERE is_nan(y)) AS nan_group_n
        |FROM v LEFT JOIN ranked r ON r.id = v.id
        |ORDER BY v.id""".stripMargin)),

    // Quantified comparison subqueries (reference grammar
    // `quantifiedComparison`, planned through ApplyNode;
    // AbstractTestQueries testQuantifiedComparison). Spark's parser has
    // no `> ALL (subquery)`, so the engine runs the standard aggregate
    // decorrelation — the ANSI truth table spelled out over
    // (count, count-non-null, max) scalar subqueries:
    //   x > ALL S:  TRUE if S empty; NULL if x NULL; FALSE if x <= max;
    //               NULL if S has NULLs; else TRUE
    //   x < ANY S:  FALSE if S empty; NULL if x NULL; TRUE if x < max;
    //               NULL if S has NULLs; else FALSE
    //   x = ANY S:  FALSE if S empty; NULL if x NULL; TRUE on a match
    //               (correlated count); NULL if S has NULLs; else FALSE
    //   x <> ALL S: the three-valued negation of x = ANY S
    // (= ANY can NOT lean on Spark's SELECT-list IN-subquery: that plans
    // as an ExistenceJoin whose flag is two-valued — FALSE where ANSI
    // wants NULL when S contains NULLs. The explicit decorrelation
    // restores the reference semantics; found by this very gate.)
    // The oracle runs the GENUINE quantified forms — the gate proves the
    // rewrite matches a real implementation on every branch (empty set,
    // NULL probe, NULL elements, definite hits/misses).
    "qk8_quantified_sql" -> ((s, dir) => sql(s, dir,
      """WITH probe AS (SELECT * FROM VALUES
        |    (1, 3), (2, 1), (3, CAST(NULL AS INT)), (4, 0) AS p(id, x))
        |SELECT cast(id as bigint) AS id, x,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1), (2) t(y)) = 0 THEN true
        |       WHEN x IS NULL THEN NULL
        |       WHEN x <= (SELECT max(y) FROM VALUES (1), (2) t(y)) THEN false
        |       WHEN (SELECT count(y) FROM VALUES (1), (2) t(y)) <
        |            (SELECT count(*) FROM VALUES (1), (2) t(y)) THEN NULL
        |       ELSE true END AS gt_all,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) = 0
        |         THEN true
        |       WHEN x IS NULL THEN NULL
        |       WHEN x <= (SELECT max(y) FROM VALUES (1), (CAST(NULL AS INT)) t(y))
        |         THEN false
        |       WHEN (SELECT count(y) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) <
        |            (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y))
        |         THEN NULL
        |       ELSE true END AS gt_all_nulls,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1) t(y) WHERE y > 99) = 0
        |         THEN true
        |       WHEN x IS NULL THEN NULL
        |       WHEN x <= (SELECT max(y) FROM VALUES (1) t(y) WHERE y > 99)
        |         THEN false
        |       ELSE true END AS gt_all_empty,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1), (2) t(y)) = 0 THEN false
        |       WHEN x IS NULL THEN NULL
        |       WHEN x < (SELECT max(y) FROM VALUES (1), (2) t(y)) THEN true
        |       WHEN (SELECT count(y) FROM VALUES (1), (2) t(y)) <
        |            (SELECT count(*) FROM VALUES (1), (2) t(y)) THEN NULL
        |       ELSE false END AS lt_any,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) = 0
        |         THEN false
        |       WHEN x IS NULL THEN NULL
        |       WHEN x < (SELECT max(y) FROM VALUES (1), (CAST(NULL AS INT)) t(y))
        |         THEN true
        |       WHEN (SELECT count(y) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) <
        |            (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y))
        |         THEN NULL
        |       ELSE false END AS lt_any_nulls,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) = 0
        |         THEN false
        |       WHEN x IS NULL THEN NULL
        |       WHEN (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y)
        |             WHERE t.y = p.x) > 0 THEN true
        |       WHEN (SELECT count(y) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) <
        |            (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y))
        |         THEN NULL
        |       ELSE false END AS eq_any_nulls,
        |  CASE WHEN (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) = 0
        |         THEN true
        |       WHEN x IS NULL THEN NULL
        |       WHEN (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y)
        |             WHERE t.y = p.x) > 0 THEN false
        |       WHEN (SELECT count(y) FROM VALUES (1), (CAST(NULL AS INT)) t(y)) <
        |            (SELECT count(*) FROM VALUES (1), (CAST(NULL AS INT)) t(y))
        |         THEN NULL
        |       ELSE true END AS neq_all_nulls
        |FROM probe p ORDER BY id""".stripMargin)),

    // spooky_hash_v2_32/64 (VarbinaryFunctions.java:306,316): the gate
    // rows are the reference's own published vectors
    // (TestVarbinaryFunctions.java:338-341) — the oracle carries those
    // digests, the HMAC-vector stance. Determinism/width over corpus
    // data are asserted alongside (DuckDB replays count + widths).
    "qk5_spooky_sql" -> ((s, dir) => sql(s, dir,
      """SELECT cast(id as bigint) AS id,
        |  lower(hex(spooky_hash_v2_32(to_utf8(data)))) AS h32,
        |  lower(hex(spooky_hash_v2_64(to_utf8(data)))) AS h64,
        |  cast(length(spooky_hash_v2_32(to_utf8(data))) as bigint) AS w32,
        |  cast(length(spooky_hash_v2_64(to_utf8(data))) as bigint) AS w64
        |FROM VALUES (1, ''), (2, 'hello') AS t(id, data)
        |ORDER BY id""".stripMargin)),

    // classification_* array aggregates (PrecisionRecallAggregation.java
    // subclasses): score = l_discount*10 on [0,1], outcome = returned
    // flag, weights = integer-valued l_quantity (so every running sum is
    // an exact double and the ratios hash bitwise). The oracle replays
    // bucketing, the 0.99999999999 top clamp, the early stop when true
    // weight exhausts, and the reference's VERBATIM BucketResult ratios
    // (see ClassificationMetricAgg doc for the two non-standard ones).
    // The arrays are posexploded to one scalar row per threshold: all
    // five aggregates keep buckets while true count/weight remains
    // (weights strictly positive, so the filters coincide) — and the
    // driver's row hasher needs scalar columns. The array aggregates
    // themselves are still what's under test; the explode is reshaping.
    "qk4_classification_arrays" -> ((s, dir) => sql(s, dir,
      """WITH a AS (SELECT
        |  classification_thresholds(10, l_returnflag = 'R',
        |    l_discount * 10) AS th,
        |  classification_precision(10, l_returnflag = 'R',
        |    l_discount * 10) AS prec,
        |  classification_recall(10, l_returnflag = 'R',
        |    l_discount * 10, l_quantity) AS rec_w,
        |  classification_fall_out(10, l_returnflag = 'R',
        |    l_discount * 10, l_quantity) AS fo_w,
        |  classification_miss_rate(10, l_returnflag = 'R',
        |    l_discount * 10) AS mr
        |FROM lineitem)
        |SELECT cast(p.bk as bigint) AS bk, p.t AS th,
        |  element_at(a.prec, p.bk + 1) AS prec,
        |  element_at(a.rec_w, p.bk + 1) AS rec_w,
        |  element_at(a.fo_w, p.bk + 1) AS fo_w,
        |  element_at(a.mr, p.bk + 1) AS mr
        |FROM a LATERAL VIEW posexplode(a.th) p AS bk, t
        |ORDER BY bk""".stripMargin)),

    // Strict element_at (spark.graft.elementAt.strict — the former
    // ledger-7 residual, now opt-in Presto semantics): past-either-end
    // indices return NULL where ANSI Spark raises, negatives count from
    // the end (ArrayElementAtFunction.checkedIndexToBlockPosition).
    // DuckDB's list indexing natively has the same soft contract, so
    // the oracle exercises the semantics directly. Conf set only around
    // ANALYSIS (the builder reads it then), reset before returning so
    // the shared driver session keeps the documented Spark default.
    "q1r_strict_element_at" -> ((s, dir) => {
      Tables.register(s, dir)
      Registry.install(s)
      val key = "spark.graft.elementAt.strict"
      try {
        s.conf.set(key, "true")
        s.sql(Registry.rewritePrestoSql(
          """SELECT l_orderkey AS k, l_linenumber AS ln,
            |  element_at(ARRAY[l_orderkey, l_partkey, l_suppkey],
            |    l_linenumber) AS in_bounds,
            |  element_at(ARRAY[l_orderkey, l_partkey, l_suppkey], 4)
            |    AS past_end,
            |  element_at(ARRAY[l_orderkey, l_partkey, l_suppkey], -1)
            |    AS from_end,
            |  element_at(ARRAY[l_orderkey, l_partkey, l_suppkey], -4)
            |    AS past_start
            |FROM lineitem WHERE l_orderkey <= 60 AND l_linenumber <= 3
            |ORDER BY k, ln""".stripMargin))
      } finally s.conf.unset(key)
    }),

    // Aggregate-internal ORDER BY (SqlBase.g4:356 #functionCall — a
    // Presto grammar Spark lacks): array_agg carries the ordering
    // CONTRACT (multi-key, mixed direction, explicit and default null
    // ordering — Presto defaults NULLS LAST both ways), DISTINCT + its
    // ORDER-BY-must-equal-argument rule, FILTER composition, and the
    // clause DROPPING on order-insensitive aggregates (sum's result
    // cannot depend on feed order). Rewritten to
    // transform(array_sort(collect_list(struct), cmp)) — one pass,
    // same per-group O(n log n), all codegen'd builtins. DuckDB runs
    // the ordered aggregates NATIVELY, so the comparator's direction
    // and null placement verify against another engine's
    // implementation, not our own arithmetic. Tie-free keys
    // (o_orderkey is unique) keep both engines deterministic.
    "q3i_agg_order_by" -> ((s, dir) => sql(s, dir,
      """SELECT o_orderpriority,
        |  array_join(array_agg(o_orderkey ORDER BY o_totalprice DESC,
        |      o_orderkey), ',') AS by_price_desc,
        |  array_join(array_agg(o_orderkey ORDER BY o_orderdate,
        |      o_orderkey DESC), ',') AS by_date_then_key,
        |  array_join(array_agg(CAST(o_orderkey AS VARCHAR)
        |      ORDER BY CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |               ELSE o_orderkey END, o_orderkey), ',')
        |    AS nulls_default_last,
        |  array_join(array_agg(o_orderkey
        |      ORDER BY CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |               ELSE o_orderkey END DESC NULLS FIRST,
        |      o_orderkey), ',') AS nulls_first_desc,
        |  array_join(array_agg(DISTINCT o_orderstatus
        |      ORDER BY o_orderstatus), ',') AS distinct_sorted,
        |  array_join(array_agg(o_orderkey ORDER BY o_orderkey)
        |      FILTER (WHERE o_orderkey % 5 = 0), ',') AS filtered,
        |  array_join(transform(array_sort(map_entries(
        |      multimap_agg(o_orderstatus, o_orderkey
        |        ORDER BY o_orderkey))),
        |    e -> concat(e.key, ':', array_join(
        |      transform(e.value, x -> CAST(x AS VARCHAR)), ' '))), ',')
        |    AS by_status,
        |  round(sum(o_totalprice ORDER BY o_orderdate), 4)
        |    AS order_insensitive
        |FROM orders
        |WHERE o_orderkey % 53 = 0 AND o_orderkey <= 6000
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin))
  )

  override def oracles: Map[String, String] = Map(
    // DuckDB runs the ordered aggregates NATIVELY (its own ORDER BY /
    // DISTINCT / FILTER aggregate modifiers, its own NULLS LAST
    // default) — a genuine two-engine agreement on feed order
    "q3i_agg_order_by" ->
      """WITH f AS (SELECT * FROM orders
        |           WHERE o_orderkey % 53 = 0 AND o_orderkey <= 6000),
        |mm AS (SELECT o_orderpriority, o_orderstatus || ':' ||
        |         array_to_string(array_agg(CAST(o_orderkey AS VARCHAR)
        |           ORDER BY o_orderkey), ' ') AS s
        |       FROM f GROUP BY o_orderpriority, o_orderstatus),
        |mmj AS (SELECT o_orderpriority,
        |          string_agg(s, ',' ORDER BY s) AS by_status
        |        FROM mm GROUP BY 1)
        |SELECT o_orderpriority,
        |  array_to_string(array_agg(o_orderkey
        |    ORDER BY o_totalprice DESC, o_orderkey), ',')
        |    AS by_price_desc,
        |  array_to_string(array_agg(o_orderkey
        |    ORDER BY o_orderdate, o_orderkey DESC), ',')
        |    AS by_date_then_key,
        |  array_to_string(array_agg(CAST(o_orderkey AS VARCHAR)
        |    ORDER BY CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |             ELSE o_orderkey END, o_orderkey), ',')
        |    AS nulls_default_last,
        |  array_to_string(array_agg(o_orderkey
        |    ORDER BY CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |             ELSE o_orderkey END DESC NULLS FIRST,
        |    o_orderkey), ',') AS nulls_first_desc,
        |  array_to_string(array_agg(DISTINCT o_orderstatus
        |    ORDER BY o_orderstatus), ',') AS distinct_sorted,
        |  coalesce(array_to_string(array_agg(o_orderkey
        |    ORDER BY o_orderkey) FILTER (WHERE o_orderkey % 5 = 0),
        |    ','), '') AS filtered,
        |  min(mmj.by_status) AS by_status,
        |  round(sum(o_totalprice), 4) AS order_insensitive
        |FROM f JOIN mmj USING (o_orderpriority)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "qn2_presto_unnest" ->
      """SELECT w AS word, cast(count(*) as bigint) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS w
        |      FROM documents WHERE doc_id <= 20) t
        |GROUP BY w HAVING count(*) >= 5
        |ORDER BY n DESC, word LIMIT 15""".stripMargin,

    // Each row expanded weight times, then the plain interpolated
    // quantile — the weighted-percentile definition from first
    // principles (quantile_cont and Spark's percentile share the
    // rank = p*(N-1) linear-interpolation definition).
    "qp4_weighted_percentile" ->
      """WITH e AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    unnest(range(CAST(l_quantity AS BIGINT))) AS i
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5) + 5e-7, 4) AS wmed,
        |  round(quantile_cont(l_extendedprice, 0.9) + 5e-7, 4) AS wp90,
        |  round(quantile_cont(l_extendedprice, 0.1) + 5e-7, 4) AS wp10
        |FROM e
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Hand-derived from the offsets: +05:30/+02:00/Z share the instant
    // 10:00 UTC; -03:30 on New Year's Eve crosses into 2021 at UTC.
    // Hand-derived scalar columns as before; the comparison/ordering
    // columns (instant_rank, eq_crosszone, lt_july) compute over
    // DuckDB's OWN TIMESTAMPTZ values built from the same literals — a
    // genuine two-engine agreement that zoned comparisons are
    // instant-based (DuckDB's TIMESTAMPTZ compares instants).
    "qp1_zoned_timestamps" ->
      """WITH zsrc AS (SELECT * FROM (VALUES
        |    (1, TIMESTAMPTZ '2020-06-10 15:30:00+05:30'),
        |    (2, TIMESTAMPTZ '2020-06-10 12:00:00+02:00'),
        |    (3, TIMESTAMPTZ '2020-06-10 10:00:00+00:00'),
        |    (4, TIMESTAMPTZ '2020-12-31 23:45:00-03:30')) AS s(id, z)),
        |zcomp AS (SELECT id,
        |    CAST(rank() OVER (ORDER BY z) AS BIGINT) AS instant_rank,
        |    z = TIMESTAMPTZ '2020-06-10 12:00:00+02:00' AS eq_crosszone,
        |    z < TIMESTAMPTZ '2020-07-01 00:00:00+00:00' AS lt_july
        |  FROM zsrc)
        |SELECT v.*, instant_rank, eq_crosszone, lt_july,
        |  TIMESTAMPTZ '2020-06-10 15:30:00+05:30' =
        |    TIMESTAMPTZ '2020-06-10 12:00:00+02:00' AS lit_eq
        |FROM (VALUES
        |  (CAST(1 AS BIGINT), '2020-06-10 10:00:00', '2020-06-10 15:30:00',
        |   CAST(5 AS BIGINT), CAST(30 AS BIGINT),
        |   '2020-06-10T15:30:00+05:30', CAST(15 AS BIGINT), true,
        |   '2020-06-10T10:00:00+00:00', '2020-06-10T08:00:00-04:00'),
        |  (CAST(2 AS BIGINT), '2020-06-10 10:00:00', '2020-06-10 12:00:00',
        |   CAST(2 AS BIGINT), CAST(0 AS BIGINT),
        |   '2020-06-10T12:00:00+02:00', CAST(12 AS BIGINT), true,
        |   '2020-06-10T10:00:00+00:00', '2020-06-10T08:00:00-04:00'),
        |  (CAST(3 AS BIGINT), '2020-06-10 10:00:00', '2020-06-10 10:00:00',
        |   CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |   '2020-06-10T10:00:00+00:00', CAST(10 AS BIGINT), true,
        |   '2020-06-10T10:00:00+00:00', '2020-06-10T08:00:00-04:00'),
        |  (CAST(4 AS BIGINT), '2021-01-01 03:15:00', '2020-12-31 23:45:00',
        |   CAST(-3 AS BIGINT), CAST(-30 AS BIGINT),
        |   '2020-12-31T23:45:00-03:30', CAST(23 AS BIGINT), false,
        |   '2021-01-01T03:15:00+00:00', '2020-06-10T08:00:00-04:00'))
        |  AS v(id, instant_utc, wall, tzh, tzm, iso, local_hour,
        |       le_10utc, at_utc, w_tz)
        |JOIN zcomp ON v.id = zcomp.id
        |ORDER BY v.id""".stripMargin,

    "q0m_zoned_distinct_agg" ->
      """WITH zsrc AS (SELECT * FROM (VALUES
        |    (1, TIMESTAMPTZ '2020-06-10 15:30:00+05:30'),
        |    (2, TIMESTAMPTZ '2020-06-10 12:00:00+02:00'),
        |    (3, TIMESTAMPTZ '2020-06-10 10:00:00+00:00'),
        |    (4, TIMESTAMPTZ '2020-12-31 23:45:00-03:30'),
        |    (5, TIMESTAMPTZ '2021-01-01 03:15:00+00:00')) AS s(id, z))
        |SELECT CAST(count(DISTINCT z) AS BIGINT) AS n_instants,
        |  '2020-06-10 10:00:00,2021-01-01 03:15:00' AS instants,
        |  '2020-06-10 10:00:00,2021-01-01 03:15:00' AS set_instants
        |FROM zsrc""".stripMargin,

    // DuckDB performs the TIMESTAMPTZ GROUP BY itself (5 rows -> 2
    // instant groups); the join maps each group to its hand-derived
    // UTC rendering.
    "qz8_zoned_grouping" ->
      """WITH zsrc AS (SELECT * FROM (VALUES
        |    (1, TIMESTAMPTZ '2020-06-10 15:30:00+05:30'),
        |    (2, TIMESTAMPTZ '2020-06-10 12:00:00+02:00'),
        |    (3, TIMESTAMPTZ '2020-06-10 10:00:00+00:00'),
        |    (4, TIMESTAMPTZ '2020-12-31 23:45:00-03:30'),
        |    (5, TIMESTAMPTZ '2021-01-01 03:15:00+00:00')) AS s(id, z)),
        |g AS (SELECT z, CAST(count(*) AS BIGINT) AS n,
        |    CAST(min(id) AS BIGINT) AS min_id
        |  FROM zsrc GROUP BY z)
        |SELECT v.inst, g.n, g.min_id
        |FROM g JOIN (VALUES
        |  ('2020-06-10 10:00:00', TIMESTAMPTZ '2020-06-10 10:00:00+00:00'),
        |  ('2021-01-01 03:15:00', TIMESTAMPTZ '2021-01-01 03:15:00+00:00'))
        |  AS v(inst, zz) ON g.z = v.zz
        |ORDER BY v.inst""".stripMargin,

    // Hand-derived: 15:30+05:30 and 12:00 Berlin summer (+02:00) are
    // both 10:00 UTC; 23:45-03:30 is 03:15 next day (2021) UTC.
    "qq7_timestamp_tz_literal" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '2020-06-10T15:30:00+05:30',
        |   '2020-06-10 10:00:00', CAST(5 AS BIGINT), true),
        |  (CAST(2 AS BIGINT), '2020-12-31T23:45:00-03:30',
        |   '2021-01-01 03:15:00', CAST(-3 AS BIGINT), false),
        |  (CAST(3 AS BIGINT), '2020-06-10T12:00:00+02:00',
        |   '2020-06-10 10:00:00', CAST(2 AS BIGINT), true))
        |  AS t(id, iso, instant_utc, tzh, same_instant)
        |ORDER BY id""".stripMargin,

    // Hand-derived: 10:00 UTC is 15:30 Kolkata / 06:30 at -03:30;
    // 2020-12-31 23:45 UTC crosses into 2021 at +05:30 (05:15) and
    // stays on NYE at -03:30 (20:15); hour-truncated 23:00 UTC at
    // +05:30 is 04:30 next morning.
    "qq5_at_time_zone" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '2020-06-10T15:30:00+05:30',
        |   '2020-06-10T06:30:00-03:30', CAST(-3 AS BIGINT),
        |   '2020-06-10 12:00:00', CAST(15 AS BIGINT),
        |   '2020-06-10T15:30:00+05:30', '2020-06-10T06:30:00-03:30'),
        |  (CAST(2 AS BIGINT), '2021-01-01T05:15:00+05:30',
        |   '2020-12-31T20:15:00-03:30', CAST(-3 AS BIGINT),
        |   '2020-06-10 12:00:00', CAST(4 AS BIGINT),
        |   '2021-01-01T05:15:00+05:30', '2020-12-31T20:15:00-03:30'))
        |  AS t(id, kolkata, nst, tzh, lit_wall, call_recv_hour,
        |       ivl_pos, ivl_neg)
        |ORDER BY id""".stripMargin,

    // hand-derived: the casts/zip are deterministic arithmetic
    "ql7_presto_cast_types" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 0.5, CAST(2 AS DOUBLE), CAST(2 AS BIGINT),
        |   CAST(1 AS BIGINT), 'tag'),
        |  (CAST(2 AS BIGINT), 1.0, CAST(3 AS DOUBLE), CAST(3 AS BIGINT),
        |   CAST(1 AS BIGINT), 'tag'))
        |  AS t(id, half, bumped, hi, m, tagged)
        |ORDER BY id""".stripMargin,

    "qn3_presto_subscripts" ->
      """SELECT cast(id as bigint) AS id,
        |  cast(xs[1] as bigint) AS first_x,
        |  cast(xs[id] as bigint) AS by_id,
        |  cast([[1, 2], [3, 4]][2][1] as bigint) AS nested,
        |  string_split(s, '-')[2] AS tok2,
        |  cast(m['a'][1] as bigint) AS ma
        |FROM (SELECT 1 AS id, [10, 20, 30] AS xs, 'x-y-z' AS s,
        |        MAP{'a': 5} AS m
        |      UNION ALL SELECT 2, [7, 8, 9], 'p-q-r', MAP{'a': 6})
        |ORDER BY id""".stripMargin,

    // DuckDB's native list/decimal literals replay the same values
    // (its [i] subscript is 1-based like Presto's).
    "qn1_presto_literals" ->
      """SELECT cast(id as bigint) AS id,
        |  cast(xs[2] as bigint) AS second_x,
        |  cast(len(xs) as bigint) AS n,
        |  cast(cast(d * 2 as decimal(10, 2)) as double) AS dbl,
        |  cast(cast(d as decimal(10, 2)) as double) AS rv
        |FROM (SELECT 1 AS id, [10, 20, 30] AS xs, 1.25 AS d
        |      UNION ALL SELECT 2, [5, 7], 99.50)
        |ORDER BY id""".stripMargin,

    // Wall-clock/offset fields replay in DuckDB TIMETZ; instant
    // EQUALITY is spelled out (DuckDB/Postgres tiebreak same-instant
    // timetz by offset where the reference compares instants only);
    // strict UTC ordering between distinct instants agrees.
    "ql9_timetz_literals" ->
      """SELECT CAST(id AS BIGINT) AS id,
        |  extract(hour FROM t) AS h,
        |  extract(minute FROM t) AS m,
        |  extract(timezone_hour FROM t) AS tzh,
        |  extract(timezone_minute FROM t) AS tzm,
        |  id IN (1, 2) AS eq_inst,
        |  t < TIMETZ '13:00:00+00:00' AS lt_13utc
        |FROM (VALUES
        |  (1, TIMETZ '08:30:15+05:30'),
        |  (2, TIMETZ '03:00:15+00:00'),
        |  (3, TIMETZ '23:00:00+02:00'),
        |  (4, TIMETZ '12:00:00+09:00')) AS v(id, t)
        |ORDER BY id""".stripMargin,

    // Replays the epoch-date TIME representation; date_diff replayed as
    // trunc-toward-zero whole units (Spark TimestampDiff semantics).
    "qn0_time_literals" ->
      """WITH v AS (SELECT id, CASE id
        |    WHEN 1 THEN timestamp '1970-01-01 08:30:15'
        |    WHEN 2 THEN timestamp '1970-01-01 12:00:00'
        |    WHEN 3 THEN timestamp '1970-01-01 17:45:59.250'
        |    ELSE timestamp '1970-01-01 00:00:00' END AS t
        |  FROM (VALUES (1), (2), (3), (4)) AS q(id))
        |SELECT cast(id as bigint) AS id,
        |  cast(hour(t) as bigint) AS h,
        |  cast(minute(t) as bigint) AS m,
        |  cast(second(t) as bigint) AS sec,
        |  t < timestamp '1970-01-01 12:00:00' AS am,
        |  cast(trunc((epoch(t) -
        |    epoch(timestamp '1970-01-01 09:00:00')) / 60.0) as bigint)
        |    AS min_since_9,
        |  cast(trunc(epoch(timestamp '1970-01-01 23:59:59') - epoch(t))
        |    as bigint) AS sec_to_midnight
        |FROM v ORDER BY id""".stripMargin,
    // Replays FixedHistogramUtils.getIndexForValue (floor, top-bucket
    // clamp) and the MLE entropy sum; width = (51-0)/17 = 3.0 exactly.
    "qk3_differential_entropy" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    LEAST(CAST(floor(17 * (l_quantity - 0.0) / (51.0 - 0.0))
        |      AS INT), 16) AS bk,
        |    CAST(l_linenumber AS DOUBLE) AS w
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, bk, CAST(count(*) AS DOUBLE) AS w1,
        |    sum(w) AS w2
        |  FROM b GROUP BY 1, 2),
        |t AS (SELECT l_returnflag, sum(w1) AS s1, sum(w2) AS s2,
        |    sum(CASE WHEN w1 > 0 THEN w1 * ln(w1) ELSE 0 END) AS swlw
        |  FROM g GROUP BY 1)
        |SELECT g.l_returnflag,
        |  (-sum((w1 / s1) * ln(w1 / s1)) + ln(51.0 / 17)) / ln(2.0) AS ent,
        |  (-sum((w2 / s2) * ln(w2 / s2)) + ln(51.0 / 17)) / ln(2.0) AS ent_w,
        |  max(s1 * GREATEST((ln(3.0 * s1) - swlw / s1) / ln(2.0), 0))
        |    - sum(w1 * (s1 - 1) *
        |        GREATEST((ln(3.0 * (s1 - 1)) -
        |          (swlw - w1 * ln(w1) +
        |           CASE WHEN w1 - 1 > 0 THEN (w1 - 1) * ln(w1 - 1)
        |                ELSE 0 END) / (s1 - 1)) / ln(2.0), 0)
        |        / s1) AS ent_jk
        |FROM g JOIN t ON g.l_returnflag = t.l_returnflag
        |GROUP BY g.l_returnflag
        |ORDER BY g.l_returnflag""".stripMargin,

    "ql3_agg_filter_sql" ->
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_disc,
        |  count(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 45)
        |    AS supp_heavy,
        |  avg(l_quantity) FILTER (WHERE l_linenumber = 1) AS avg_first
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "ql1_show_functions_sql" ->
      """SELECT * FROM (VALUES ('classification_fall_out'),
        |  ('classification_miss_rate'), ('classification_precision'),
        |  ('classification_recall'), ('classification_thresholds'))
        |  AS t(function) ORDER BY function""".stripMargin,

    "ql0_not_in_where_sql" ->
      """SELECT
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT nullif(c_custkey, 370) FROM customer)) AS with_null_n,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_custkey <= 500))
        |    AS clean_n,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN
        |     (SELECT c_custkey FROM customer WHERE c_custkey > 1e18))
        |    AS empty_set_n""".stripMargin,

    // NaN/Inf written as DuckDB literals; identical total order.
    "qk9_float_special_sql" ->
      """WITH v AS (SELECT * FROM (VALUES
        |    (1, 'NaN'::DOUBLE), (2, 'Infinity'::DOUBLE),
        |    (3, -('Infinity'::DOUBLE)), (4, 1.5E0),
        |    (5, CAST(NULL AS DOUBLE))) t(id, x)),
        |ranked AS (
        |  SELECT id, x, CAST(row_number() OVER (ORDER BY x) AS BIGINT)
        |    AS sort_pos
        |  FROM v WHERE x IS NOT NULL),
        |grouped AS (
        |  SELECT y, CAST(count(*) AS BIGINT) AS n FROM (VALUES
        |      ('NaN'::DOUBLE), ('NaN'::DOUBLE), ('Infinity'::DOUBLE),
        |      (1.5E0), ('NaN'::DOUBLE)) g(y) GROUP BY y)
        |SELECT CAST(v.id AS BIGINT) AS id,
        |  CASE WHEN isnan(v.x) THEN 'NaN'
        |       WHEN v.x = 'Infinity'::DOUBLE THEN 'Inf'
        |       WHEN v.x = -('Infinity'::DOUBLE) THEN '-Inf'
        |       ELSE CAST(v.x AS VARCHAR) END AS x_repr,
        |  isnan(v.x) AS f_nan,
        |  NOT isnan(v.x) AND abs(v.x) <> 'Infinity'::DOUBLE AS f_fin,
        |  abs(v.x) = 'Infinity'::DOUBLE AS f_inf,
        |  v.x = v.x AS self_eq, v.x > 1.0E308 AS gt_huge,
        |  r.sort_pos,
        |  (SELECT max(y) FROM grouped WHERE n = 3) AS nan_key,
        |  (SELECT n FROM grouped WHERE isnan(y)) AS nan_group_n
        |FROM v LEFT JOIN ranked r ON r.id = v.id
        |ORDER BY id""".stripMargin,

    // The genuine quantified forms — DuckDB implements ANSI ALL/ANY
    // natively, so the rewrite is checked against a real implementation.
    "qk8_quantified_sql" ->
      """WITH probe AS (SELECT * FROM (VALUES
        |    (1, 3), (2, 1), (3, CAST(NULL AS INT)), (4, 0)) p(id, x))
        |SELECT CAST(id AS BIGINT) AS id, x,
        |  x > ALL (SELECT y FROM (VALUES (1), (2)) t(y)) AS gt_all,
        |  x > ALL (SELECT y FROM (VALUES (1), (CAST(NULL AS INT))) t(y))
        |    AS gt_all_nulls,
        |  x > ALL (SELECT y FROM (VALUES (1)) t(y) WHERE y > 99)
        |    AS gt_all_empty,
        |  x < ANY (SELECT y FROM (VALUES (1), (2)) t(y)) AS lt_any,
        |  x < ANY (SELECT y FROM (VALUES (1), (CAST(NULL AS INT))) t(y))
        |    AS lt_any_nulls,
        |  x = ANY (SELECT y FROM (VALUES (1), (CAST(NULL AS INT))) t(y))
        |    AS eq_any_nulls,
        |  x <> ALL (SELECT y FROM (VALUES (1), (CAST(NULL AS INT))) t(y))
        |    AS neq_all_nulls
        |FROM probe ORDER BY id""".stripMargin,

    // The reference's published SpookyHashV2 digests, verbatim.
    "qk5_spooky_sql" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '6bf50919', '232706fc6bf50919',
        |   CAST(4 AS BIGINT), CAST(8 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'd382e6ca', '3768826ad382e6ca',
        |   CAST(4 AS BIGINT), CAST(8 AS BIGINT)))
        |  AS t(id, h32, h64, w32, w64)
        |ORDER BY id""".stripMargin,

    // Replays PrecisionRecallAggregation: [0,1) bucketing with the
    // 0.99999999999 top clamp, running (exclusive-prefix) weights in
    // bucket order, early stop while true weight remains, and the
    // reference's verbatim BucketResult ratios. All weights are
    // integer-valued so every double here is exact and the arrays
    // compare bitwise.
    // DuckDB list indexing is natively 1-based with NULL past either
    // end and negatives counting from the end — the exact contract
    // strict element_at opts into
    "q1r_strict_element_at" ->
      """SELECT l_orderkey AS k, l_linenumber AS ln,
        |  (list_value(l_orderkey, l_partkey, l_suppkey))[l_linenumber]
        |    AS in_bounds,
        |  (list_value(l_orderkey, l_partkey, l_suppkey))[4] AS past_end,
        |  (list_value(l_orderkey, l_partkey, l_suppkey))[-1] AS from_end,
        |  (list_value(l_orderkey, l_partkey, l_suppkey))[-4] AS past_start
        |FROM lineitem WHERE l_orderkey <= 60 AND l_linenumber <= 3
        |ORDER BY k, ln""".stripMargin,

    "qk4_classification_arrays" ->
      """WITH b AS (
        |  SELECT LEAST(CAST(floor(10 *
        |      (LEAST(l_discount * 10, 0.99999999999) - 0.0) / (1.0 - 0.0))
        |      AS INT), 9) AS bk,
        |    (l_returnflag = 'R') AS pos, l_quantity AS w
        |  FROM lineitem),
        |g AS (
        |  SELECT bk,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) AS t1,
        |    CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS DOUBLE) AS f1,
        |    sum(CASE WHEN pos THEN w ELSE 0 END) AS tw,
        |    sum(CASE WHEN NOT pos THEN w ELSE 0 END) AS fw
        |  FROM b GROUP BY bk),
        |d AS (
        |  SELECT CAST(r.i AS INT) AS bk,
        |    coalesce(t1, 0) AS t1, coalesce(f1, 0) AS f1,
        |    coalesce(tw, 0) AS tw, coalesce(fw, 0) AS fw
        |  FROM range(0, 10) r(i) LEFT JOIN g ON g.bk = r.i),
        |c AS (
        |  SELECT bk, 0.0 + bk * (1.0 - 0.0) / 10 AS th,
        |    coalesce(sum(t1) OVER win, 0) AS rt1,
        |    coalesce(sum(f1) OVER win, 0) AS rf1,
        |    coalesce(sum(tw) OVER win, 0) AS rtw,
        |    coalesce(sum(fw) OVER win, 0) AS rfw,
        |    sum(t1) OVER () AS tt1, sum(f1) OVER () AS tf1,
        |    sum(tw) OVER () AS ttw, sum(fw) OVER () AS tfw
        |  FROM d
        |  WINDOW win AS (ORDER BY bk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CAST(bk AS BIGINT) AS bk, th,
        |  (tt1 - rt1) / ((tt1 - rt1) + (tf1 - rf1)) AS prec,
        |  (ttw - rtw) / ttw AS rec_w,
        |  rtw / tfw AS fo_w,
        |  (tf1 - rf1) / tt1 AS mr
        |FROM c WHERE tt1 > rt1
        |ORDER BY bk""".stripMargin,

    "qa1_presto_sql_scalars" ->
      """SELECT p_partkey,
        |  strpos(p_type, 'BRASS') AS pos_brass,
        |  bin(p_size) AS size_bin,
        |  ('0x' || lower(hex(p_size)))::BIGINT AS size_roundtrip,
        |  trunc(p_retailprice / 100.0) AS price_h,
        |  CAST(ascii(substr(p_brand, 7, 1)) AS BIGINT) AS brand_cp,
        |  xor(p_size::BIGINT, p_partkey) AS bx,
        |  (p_size::BIGINT << 3) AS size_x8,
        |  CAST(hamming(p_brand, reverse(p_brand)) AS BIGINT) AS ham_rev
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "qa2_presto_sql_datetime" ->
      """SELECT o_orderkey,
        |  CAST(isodow(o_orderdate) AS BIGINT) AS dow,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        |  CAST(isoyear(o_orderdate) AS BIGINT) AS yow,
        |  epoch_ms(o_orderdate) / 1000.0 AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS d_rt,
        |  o_orderdate + INTERVAL 3 DAY AS d_plus3,
        |  o_orderdate + INTERVAL 2 MONTH AS d_plus2m,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
        |    AS dm_date,
        |  CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS iso_rt,
        |  date_diff('day', o_orderdate, TIMESTAMP '1998-01-01')
        |    AS days_to_98
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,

    "qb5_tpch_q1_sql" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= date '1998-12-01' - interval '90' day
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "qb6_tpch_q6_sql" ->
      """SELECT sum(l_extendedprice * l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= date '1994-01-01'
        |  AND l_shipdate < date '1994-01-01' + interval '1' year
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "qc0_lateral_sql" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,

    "qd2_presto_sql_ip" ->
      """WITH t(id, ip) AS (VALUES (1, '10.1.2.3'), (2, '192.168.77.200'),
        |  (3, '8.8.8.8'), (4, '172.16.254.1')),
        |n AS (SELECT id, ip,
        |  (CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
        |   + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
        |   + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
        |   + CAST(string_split(ip, '.')[4] AS BIGINT)) AS a
        |  FROM t),
        |m AS (SELECT id, ip, (a >> 8) << 8 AS m24, (a >> 20) << 20 AS m12, a
        |  FROM n)
        |SELECT CAST(id AS BIGINT) AS id, ip,
        |  ((m24 >> 24) & 255)::VARCHAR || '.' || ((m24 >> 16) & 255)::VARCHAR
        |    || '.' || ((m24 >> 8) & 255)::VARCHAR || '.'
        |    || (m24 & 255)::VARCHAR || '/24' AS net24,
        |  ((m12 >> 24) & 255)::VARCHAR || '.' || ((m12 >> 16) & 255)::VARCHAR
        |    || '.' || ((m12 >> 8) & 255)::VARCHAR || '.'
        |    || (m12 & 255)::VARCHAR || '/12' AS net12,
        |  ((a >> 24) << 24) = 167772160 AS in_10,
        |  ((a >> 16) << 16) = 3232235520 AS in_192168
        |FROM m ORDER BY id""".stripMargin,

    "qe5_tpch_q3_sql" ->
      """SELECT l_orderkey,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < date '1998-03-15'
        |  AND l_shipdate > date '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "qe6_tpch_q5_sql" ->
      """SELECT n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= date '1996-01-01'
        |  AND o_orderdate < date '1996-01-01' + interval '1' year
        |GROUP BY n_name
        |ORDER BY revenue DESC""".stripMargin,

    "qe7_tpch_q14_sql" ->
      """SELECT 100.00 * sum(CASE
        |    WHEN p_type LIKE 'PROMO%'
        |    THEN l_extendedprice * (1 - l_discount)
        |    ELSE 0
        |  END) / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= date '1996-09-01'
        |  AND l_shipdate < date '1996-09-01' + interval '1' month""".stripMargin,

    "qe8_tpch_q10_sql" ->
      """SELECT c_custkey, c_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate >= date '1995-10-01'
        |  AND o_orderdate < date '1995-10-01' + interval '3' month
        |  AND l_returnflag = 'R'
        |  AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "qe3_regr_entropy_checksum" ->
      """WITH cnts AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |ent AS (
        |  SELECT l_returnflag,
        |    round(log2(sum(CAST(cnt AS DOUBLE)))
        |      - sum(CASE WHEN cnt > 0 THEN CAST(cnt AS DOUBLE) * log2(cnt)
        |            ELSE 0.0 END) / sum(CAST(cnt AS DOUBLE)), 6) AS h_bits
        |  FROM cnts GROUP BY l_returnflag),
        |reg AS (
        |  SELECT l_returnflag,
        |    round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |    round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |    bit_xor(CAST(concat('0x', substring(md5(
        |      CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 15))
        |      AS BIGINT)) AS ck
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT ent.l_returnflag, h_bits, slope, icept, ck
        |FROM ent JOIN reg ON ent.l_returnflag = reg.l_returnflag
        |ORDER BY ent.l_returnflag""".stripMargin,

    "qe9_duration_stats" ->
      """WITH t(id, dur, secs, succ, trials) AS (VALUES
        |  (1, '3.5m',  0,       9,  10),
        |  (2, '90s',   1000000, 60, 100),
        |  (3, '2.25h', 694861,  39, 40),
        |  (4, '750ms', 59,      0,  7),
        |  (5, '1d',    604800,  1,  1)),
        |d AS (SELECT *,
        |  CAST(regexp_extract(dur,
        |    '^\s*([0-9]+(?:\.[0-9]+)?)\s*(ns|us|ms|s|m|h|d)\s*$', 1)
        |    AS DOUBLE) *
        |  CASE regexp_extract(dur,
        |    '^\s*([0-9]+(?:\.[0-9]+)?)\s*(ns|us|ms|s|m|h|d)\s*$', 2)
        |    WHEN 'ns' THEN 0.000000001 WHEN 'us' THEN 0.000001
        |    WHEN 'ms' THEN 0.001 WHEN 's' THEN 1.0 WHEN 'm' THEN 60.0
        |    WHEN 'h' THEN 3600.0 WHEN 'd' THEN 86400.0 END AS dsec
        |  FROM t)
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(round(dsec * 1000) AS BIGINT) AS ms,
        |  CASE WHEN secs = 0 THEN '0 seconds' ELSE concat_ws(', ',
        |    CASE WHEN secs // 604800 > 0 THEN concat(secs // 604800,
        |      CASE WHEN secs // 604800 = 1 THEN ' week'
        |        ELSE ' weeks' END) END,
        |    CASE WHEN secs % 604800 // 86400 > 0 THEN
        |      concat(secs % 604800 // 86400,
        |      CASE WHEN secs % 604800 // 86400 = 1 THEN ' day'
        |        ELSE ' days' END) END,
        |    CASE WHEN secs % 86400 // 3600 > 0 THEN
        |      concat(secs % 86400 // 3600,
        |      CASE WHEN secs % 86400 // 3600 = 1 THEN ' hour'
        |        ELSE ' hours' END) END,
        |    CASE WHEN secs % 3600 // 60 > 0 THEN concat(secs % 3600 // 60,
        |      CASE WHEN secs % 3600 // 60 = 1 THEN ' minute'
        |        ELSE ' minutes' END) END,
        |    CASE WHEN secs % 60 > 0 THEN concat(secs % 60,
        |      CASE WHEN secs % 60 = 1 THEN ' second'
        |        ELSE ' seconds' END) END) END AS hr,
        |  (CAST(succ AS DOUBLE) / trials
        |    + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2 * trials)
        |    - CAST(1.96 AS DOUBLE) * sqrt(CAST(succ AS DOUBLE) / trials
        |      * (1 - CAST(succ AS DOUBLE) / trials) / trials
        |      + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
        |        / (4 * CAST(trials AS DOUBLE) * trials)))
        |    / (1 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / trials)
        |    AS wl,
        |  (CAST(succ AS DOUBLE) / trials
        |    + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2 * trials)
        |    + CAST(1.96 AS DOUBLE) * sqrt(CAST(succ AS DOUBLE) / trials
        |      * (1 - CAST(succ AS DOUBLE) / trials) / trials
        |      + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
        |        / (4 * CAST(trials AS DOUBLE) * trials)))
        |    / (1 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / trials)
        |    AS wu
        |FROM d ORDER BY id""".stripMargin,

    "qf0_set_aggregates" ->
      """SELECT source,
        |  array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
        |  array_to_string(list_sort(list_distinct(flatten(
        |    list(string_split(text, ' ')[1:2])))), ',') AS lead_words,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents
        |GROUP BY source ORDER BY source""".stripMargin,

    "qh4_array_extras_sql" ->
      """WITH t(id, arr, cfg, sz) AS (VALUES
        |  (1, ['d', 'b', 'c', 'a'], 'a=1;b=2;a=3', '2.3MB'),
        |  (2, ['x', 'y'], 'a=7;k=v', '750kB'),
        |  (3, ['m', 'n', 'o'], 'a=9;c=4;a=5;c=6', '1GB'),
        |  (4, ['z'], 'a=0', '0B')),
        |pairs AS (
        |  SELECT id, string_agg(arr[i] || '+' || arr[j], ','
        |    ORDER BY i, j) AS pairs
        |  FROM t, UNNEST(range(1, len(arr) + 1)) AS ti(i),
        |    UNNEST(range(1, len(arr) + 1)) AS tj(j)
        |  WHERE i < j GROUP BY id),
        |kv AS (SELECT id, string_split(cfg, ';') AS es FROM t)
        |SELECT CAST(t.id AS BIGINT) AS id,
        |  coalesce(pairs.pairs, '') AS pairs,
        |  array_to_string(list_transform(range(1, len(arr) + 1),
        |    i -> arr[i] || '|' || coalesce(arr[i + 1], '_')), ',') AS zipped,
        |  array_to_string(list_sort(arr, 'DESC'), ',') AS sorted_desc,
        |  CAST(len(list_distinct(list_transform(es,
        |    kv0 -> string_split(kv0, '=')[1]))) AS BIGINT) AS n_keys,
        |  array_to_string(list_transform(list_filter(es,
        |    kv0 -> string_split(kv0, '=')[1] = 'a'),
        |    kv0 -> substr(kv0, strpos(kv0, '=') + 1)), ',') AS a_vals,
        |  CAST(round(CAST(regexp_extract(sz,
        |    '^\s*([0-9]+(?:\.[0-9]+)?)\s*([kMGTPEZY]?B)\s*$', 1) AS DOUBLE) *
        |    CASE regexp_extract(sz,
        |      '^\s*([0-9]+(?:\.[0-9]+)?)\s*([kMGTPEZY]?B)\s*$', 2)
        |      WHEN 'B' THEN 1.0 WHEN 'kB' THEN 1024.0
        |      WHEN 'MB' THEN 1048576.0 WHEN 'GB' THEN 1073741824.0
        |      WHEN 'TB' THEN 1099511627776.0 END) AS BIGINT) AS bytes
        |FROM t LEFT JOIN pairs ON pairs.id = t.id
        |JOIN kv ON kv.id = t.id
        |ORDER BY t.id""".stripMargin,

    "qi7_color_sql" ->
      """WITH t(id, c_sys, c_hex, c_rgb, c_interp, ansi, txt, bsym, bansi,
        |       cnt, blocks) AS (VALUES
        |  (1, -2, 16711680, 16711680, 16711680, 196, 'hot', '✓', 2, 0, 0),
        |  (2, -3, 65280, 65280, 16776960, 46, 'mid', '✗', 1, 3, 4),
        |  (3, -5, 255, 255, 65280, 21, 'cold', '✓', 2, 6, 8),
        |  (4, -6, 16755200, 16416775, 65280, 214, 'warm', '✗', 1, 6, 8))
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(c_sys AS BIGINT) AS c_sys, CAST(c_hex AS BIGINT) AS c_hex,
        |  CAST(c_rgb AS BIGINT) AS c_rgb,
        |  CAST(c_interp AS BIGINT) AS c_interp,
        |  chr(27) || '[38;5;' || CAST(ansi AS VARCHAR) || 'm' || txt ||
        |    chr(27) || '[0m' AS rendered,
        |  chr(27) || '[38;5;' || CAST(bansi AS VARCHAR) || 'm' || bsym ||
        |    chr(27) || '[0m' AS rendered_bool,
        |  repeat(chr(27) || '[38;5;21m█', cnt) || chr(27) || '[0m' ||
        |    repeat(' ', 6 - cnt) AS bar_flat,
        |  CAST(blocks AS INT) AS grad_blocks
        |FROM t ORDER BY id""".stripMargin,

    "qj7_more_names_sql" ->
      """WITH t(id, arr, ts, st, js, anym, nonem, ms, iso, jx) AS (VALUES
        |  (1, [1, 2, 3], TIMESTAMP '2021-06-01 08:30:00.123', 'alpha',
        |   '{"a":5}', true, true, 123, '2021-06-01T08:30:00.123', '5'),
        |  (2, [4, 5], TIMESTAMP '2020-01-01 23:59:59.007', 'beta',
        |   '{"a":"x"}', true, true, 7, '2020-01-01T23:59:59.007', 'x'),
        |  (3, [-1, 7], TIMESTAMP '1999-07-04 00:00:00.999', 'gamma',
        |   '{"b":1}', true, true, 999, '1999-07-04T00:00:00.999', NULL))
        |SELECT CAST(id AS BIGINT) AS id,
        |  len(list_filter(arr, x -> NOT (x > 0))) = 0 AS allm,
        |  anym, nonem,
        |  CAST(20 AS BIGINT) AS bsl64, CAST(4 AS BIGINT) AS bsl4,
        |  CAST(4611686018427387902 AS BIGINT) AS blsr,
        |  CAST(15 AS BIGINT) AS blsr8, CAST(-4 AS BIGINT) AS basr,
        |  CAST(weekofyear(ts) AS BIGINT) AS wk,
        |  CAST(ms AS BIGINT) AS ms, iso,
        |  'ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a' ||
        |  '2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f'
        |    AS sha512_abc,
        |  st AS b64rt,
        |  '10.1.2.0' AS smin, '10.1.2.255' AS smax,
        |  '192.168.5.4-192.168.5.7' AS srange,
        |  jx, js AS jfmt
        |FROM t ORDER BY id""".stripMargin,

    "qj6_distributions_sql" ->
      """SELECT CAST(id AS BIGINT) AS id, 0.5 AS ncdf_zero,
        |  TRUE AS sym_ok, TRUE AS mono_ok, TRUE AS inv_rt_ok,
        |  TRUE AS z196_ok, TRUE AS shift_scale_ok, TRUE AS beta_uniform_ok,
        |  TRUE AS beta_sym_ok, TRUE AS beta_rt_ok
        |FROM (VALUES (1), (2), (3), (4)) t(id) ORDER BY id""".stripMargin,

    "qj4_scalar_extras_sql" ->
      """WITH t(id, st, nm, dv, ts, u, js, ieee64, port, frag, sj) AS (VALUES
        |  (1, 'a.b.c', -2, 1.5, TIMESTAMP '2021-06-01 08:30:00',
        |   'http://host.example:8080/p?q=1#sec', '123',
        |   '3ff8000000000000', 8080, 'sec', true),
        |  (2, 'aab.b', 255, -2.75, TIMESTAMP '1999-12-31 23:59:59',
        |   'https://example.com/path#frag', '"abc"',
        |   'c006000000000000', NULL, 'frag', true),
        |  (3, 'nodots', 1048575, 0.0, TIMESTAMP '2020-01-01 00:00:00',
        |   'http://plain.example/nopath', '[1,2]',
        |   '0000000000000000', NULL, NULL, false),
        |  (4, 'x.y', -9007199254740993, 6.25,
        |   TIMESTAMP '2024-02-29 12:00:00',
        |   'ftp://h:21/f#z', 'not json',
        |   '4019000000000000', 21, 'z', false))
        |SELECT CAST(id AS BIGINT) AS id,
        |  array_to_string(string_split(st, '.'), ',') AS dot_split,
        |  CASE WHEN strpos(st, '.') = 0 THEN st
        |       ELSE substr(st, 1, strpos(st, '.') - 1) || '|' ||
        |            substr(st, strpos(st, '.') + 1) END AS dot_split2,
        |  CASE WHEN strpos(reverse(st), 'b') = 0 THEN 0
        |       ELSE CAST(length(st) - strpos(reverse(st), reverse('b'))
        |            - length('b') + 2 AS BIGINT) END AS last_b,
        |  CAST(0 AS BIGINT) AS no_zz,
        |  replace(replace(to_base64(st::BLOB), '+', '-'), '/', '_') AS b64u,
        |  st AS b64_rt,
        |  lower(lpad(to_hex(nm), 16, '0')) AS be64,
        |  CAST(nm AS BIGINT) AS be64_rt,
        |  lower(lpad(to_hex((CAST(nm AS BIGINT) % 2147483647)
        |    & 4294967295), 8, '0')) AS be32,
        |  CAST(nm % 2147483647 AS INT) AS be32_rt,
        |  ieee64,
        |  TRUE AS ieee64_rt, TRUE AS ieee32_rt,
        |  CAST(31 * nm + id AS BIGINT) AS ch,
        |  strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
        |  TIMESTAMP '2020-03-05 10:30:00' AS parsed,
        |  CAST(port AS BIGINT) AS port, frag,
        |  sj AS scalar_json
        |FROM t ORDER BY id""".stripMargin,

    "qj2_timezone_sql" ->
      """SELECT CAST(id AS BIGINT) AS id, local_wall, instant_utc,
        |  CAST(tzh AS BIGINT) AS tzh, CAST(tzm AS BIGINT) AS tzm
        |FROM (VALUES
        |  (1, TIMESTAMP '2020-01-15 04:00:00',
        |      TIMESTAMP '2020-01-15 20:00:00', -8, 0),
        |  (2, TIMESTAMP '2020-07-15 05:00:00',
        |      TIMESTAMP '2020-07-15 19:00:00', -7, 0),
        |  (3, TIMESTAMP '2020-01-15 17:30:00',
        |      TIMESTAMP '2020-01-15 06:30:00', 5, 30),
        |  (4, TIMESTAMP '2020-01-16 04:45:00',
        |      TIMESTAMP '2020-01-15 17:15:00', 5, 45),
        |  (5, TIMESTAMP '2020-01-15 08:30:00',
        |      TIMESTAMP '2020-01-15 15:30:00', -3, -30))
        |  AS t(id, local_wall, instant_utc, tzh, tzm)
        |ORDER BY id""".stripMargin,

    "qi8_array_map_sql" ->
      """WITH t(id, a, b, n, m1, m2, m3) AS (VALUES
        |  (1, ['b', 'a', 'c'], ['c', 'd'], 3,
        |   MAP{'x': 1, 'y': 2}, MAP{'z': 9}, MAP{'x': 5, 'q': 7}),
        |  (2, ['m'], ['m', 'm', 'n'], 1,
        |   MAP{'k': 0}, MAP{'l': 1}, MAP{'k': 2}),
        |  (3, ['z', 'z', 'y'], CAST([] AS VARCHAR[]), 4,
        |   MAP{'a': 1}, MAP{'b': 2}, MAP{'c': 3}))
        |SELECT CAST(id AS BIGINT) AS id,
        |  array_to_string(list_sort(list_distinct(a || b)), ',') AS arr_u,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> list_contains(b, x))), ','), '') AS arr_i,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> NOT list_contains(b, x))), ','), '') AS arr_e,
        |  list_aggregate(a, 'max') AS amax, list_aggregate(a, 'min') AS amin,
        |  array_to_string(list_reverse(a), ',') AS arev,
        |  array_to_string(range(1, n + 1), ',') AS seqs,
        |  a[1] AS a_first, a[-1] AS a_last,
        |  array_to_string(list_sort([e.key || '=' || CAST(e.value AS VARCHAR)
        |    for e in map_entries(map_concat(m1, m2))]), ',') AS mconcat,
        |  array_to_string([k || '=' ||
        |    CAST(coalesce(m1[k][1], 0) + coalesce(m3[k][1], 0) AS VARCHAR)
        |    for k in list_sort(list_distinct(map_keys(m1) || map_keys(m3)))],
        |    ',') AS mzip,
        |  array_to_string(list_sort([upper(e.key) || '=' ||
        |    CAST(e.value AS VARCHAR) for e in map_entries(m1)]), ',')
        |    AS mkeys,
        |  'array(varchar)' AS t_arr, 'map(varchar, integer)' AS t_map
        |FROM t ORDER BY id""".stripMargin,

    "qh5_hash_hmac_sql" ->
      """WITH t(id, algo, mac, data) AS (VALUES
        |  (1, 'sha256', 'b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7', 'Hi There'),
        |  (2, 'sha1', 'b617318655057264e28bc0b6fb378c8ef146be00', 'Hi There'),
        |  (3, 'md5', '9294727a3638bb1c13f48ef8158bfc9d', 'Hi There'),
        |  (4, 'sha256', '5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843', 'what do ya want for nothing?'),
        |  (5, 'sha1', 'effcdf6ae5eb2fa2d27416d5f184df9c259a7c79', 'what do ya want for nothing?'),
        |  (6, 'md5', '750c783e6ab0b503eaa86e310a5db738', 'what do ya want for nothing?')),
        |b AS (SELECT id, mac, list_transform(range(1, length(data) + 1),
        |  i -> CAST(ord(data[i]) AS BIGINT)) AS bs FROM t),
        |f AS (SELECT id, mac,
        |  list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
        |    (h, x) -> xor((h * 16777619) % 4294967296, x)) AS f1_32,
        |  list_reduce(list_prepend(CAST(2166136261 AS BIGINT), bs),
        |    (h, x) -> (xor(h, x) * 16777619) % 4294967296) AS f1a_32,
        |  list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), bs),
        |    (h, x) -> (h * 1099511628211) % 18446744073709551616
        |      - ((h * 1099511628211) % 18446744073709551616) % 256
        |      + xor(CAST(((h * 1099511628211) % 18446744073709551616) % 256
        |            AS BIGINT), x)) AS f1_64,
        |  list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), bs),
        |    (h, x) -> ((h - h % 256 + xor(CAST(h % 256 AS BIGINT), x))
        |      * 1099511628211) % 18446744073709551616) AS f1a_64
        |  FROM b)
        |SELECT CAST(id AS BIGINT) AS id, mac,
        |  CAST(CASE WHEN f1_32 >= 2147483648 THEN f1_32 - 4294967296
        |    ELSE f1_32 END AS BIGINT) AS f1_32,
        |  CAST(CASE WHEN f1a_32 >= 2147483648 THEN f1a_32 - 4294967296
        |    ELSE f1a_32 END AS BIGINT) AS f1a_32,
        |  CAST(CASE WHEN f1_64 >= 9223372036854775808
        |    THEN f1_64 - 18446744073709551616 ELSE f1_64 END AS BIGINT)
        |    AS f1_64,
        |  CAST(CASE WHEN f1a_64 >= 9223372036854775808
        |    THEN f1a_64 - 18446744073709551616 ELSE f1a_64 END AS BIGINT)
        |    AS f1a_64
        |FROM f ORDER BY id""".stripMargin,

    "qi0_try_sql" ->
      """SELECT p_partkey,
        |  TRY_CAST(substr(p_type, 1, 3) AS INTEGER) AS bad_int,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS good_int,
        |  CAST(NULL AS VARCHAR) AS oob,
        |  CAST(NULL AS TIMESTAMP) AS bad_date
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "qi2_multimap_sql" ->
      """WITH t(id, es) AS (VALUES
        |  (1, [{'key': 'a', 'value': 1}, {'key': 'b', 'value': 2},
        |       {'key': 'a', 'value': 3}]),
        |  (2, [{'key': 'a', 'value': 7}]),
        |  (3, [{'key': 'z', 'value': 0}, {'key': 'a', 'value': 5},
        |       {'key': 'z', 'value': 9}]))
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(len(list_distinct(list_transform(es, e -> e.key)))
        |    AS BIGINT) AS n_keys,
        |  array_to_string(list_transform(
        |    list_filter(es, e -> e.key = 'a'), e -> e.value), ',') AS a_vals,
        |  array_to_string(list_transform(list_filter(es, (e, i) ->
        |    list_position(list_transform(es, x -> x.key), e.key) = i),
        |    e -> e.key), ',') AS keys
        |FROM t ORDER BY id""".stripMargin,

    "qi1_json_extras_sql" ->
      """WITH t(id, j, arr, nums) AS (VALUES
        |  (1, '{"a": [1,2,3], "b": 1}', '["x","y","z"]', '[1,2,3]'),
        |  (2, '{"a": {"k": 1, "m": 2}}', '["p"]', '[4,5]'),
        |  (3, '{"a": 7}', '["x"]', '[]'))
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(len(json_keys(j)) AS BIGINT) AS sz_root,
        |  CAST(CASE WHEN json_extract(j, '$.a') IS NULL THEN NULL
        |    WHEN starts_with(CAST(json_extract(j, '$.a') AS VARCHAR), '[')
        |      THEN json_array_length(j, '$.a')
        |    WHEN starts_with(CAST(json_extract(j, '$.a') AS VARCHAR), '{')
        |      THEN len(json_keys(j, '$.a'))
        |    ELSE 0 END AS BIGINT) AS sz_a,
        |  json_extract_string(arr, '$[1]') AS second,
        |  json_extract_string(arr,
        |    concat('$[', json_array_length(arr) - 1, ']')) AS last,
        |  list_contains(json_extract_string(arr, '$[*]'), 'x') AS has_x,
        |  list_contains(json_extract_string(nums, '$[*]'), '3') AS has_3,
        |  '{"k":1}' AS el_obj, '1.50' AS el_raw,
        |  CAST(NULL AS VARCHAR) AS el_null, 'null' AS el_strnull,
        |  false AS c_int_vs_float, true AS c_float,
        |  false AS c_float_vs_int, CAST(NULL AS BOOLEAN) AS c_nonarray,
        |  -- reference JsonFunctions.java:288-292: a NaN/Inf double probe
        |  -- answers false BEFORE parsing, even on malformed input
        |  false AS c_nan, false AS c_nan_malformed
        |FROM t ORDER BY id""".stripMargin,

    "q1n_objectid" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '507F1F77BCF86CD799439011',
        |   true, true, true, true, true),
        |  (CAST(2 AS BIGINT), '0000000000000000000000FF',
        |   true, true, true, true, true),
        |  (CAST(3 AS BIGINT), 'FFFFFFFFFFFFFFFFFFFFFF00',
        |   true, true, true, true, true))
        |  AS t(id, oid_hex, space_strip, lt_max, gt_min, between_ok,
        |       gen_len)
        |ORDER BY id""".stripMargin,

    "qh9_teradata_sql" ->
      """WITH t(id, s) AS (VALUES (1, 'hello'), (2, 'world'), (3, 'Spark'))
        |SELECT CAST(id AS BIGINT) AS id,
        |  CAST(strpos(s, 'lo') AS BIGINT) AS idx,
        |  array_to_string(list_transform(range(1, length(s) + 1),
        |    i -> '00' || upper(lpad(hex(ord(s[i])), 2, '0'))), '') AS hx
        |FROM t ORDER BY id""".stripMargin,

    "qa3_presto_sql_vector" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v))
        |       * sqrt(list_dot_product(b.v, b.v))), 4) AS cos,
        |  round(list_dot_product(a.v, b.v), 4) AS dot,
        |  round(sqrt(list_sum(list_transform(list_zip(a.v, b.v),
        |    x -> (x[1] - x[2]) * (x[1] - x[2])))), 4) AS l2
        |FROM e a JOIN e b ON b.vec_id = a.vec_id + 5
        |WHERE a.vec_id < 5 ORDER BY a_id""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PrestoScalars

/** Scalar-function coverage: string, date/time, math (incl. width_bucket /
  * base conversions / bitwise), regex, and conditional families — the bulk
  * of the reference's function surface by usage.
  *
  * Reference implementations: `presto-main/.../operator/scalar/
  * StringFunctions.java` (44 fns), `DateTimeFunctions.java` (92 fns),
  * `MathFunctions.java` (92 fns), `JoniRegexpFunctions.java`,
  * `BitwiseFunctions.java`, and the conditional special forms
  * (`scalar/TryCastFunction.java`, `Greatest.java`).
  *
  * Differential-oracle ground rules (learned from r1):
  *  - integer-returning functions are cast to BIGINT on BOTH sides
  *    (Spark length/instr return INT, DuckDB returns other widths — the
  *    driver hashes dtypes, not just values);
  *  - per-row double arithmetic (+,-,*,/ sqrt, floor) is IEEE-exact in both
  *    engines and safe to project raw; transcendentals (ln/exp/trig) are
  *    libm-dependent, so they only ever appear inside rounded aggregates;
  *  - every projection is pure row-at-a-time → whole-stage codegen; at
  *    100 TB these run at scan speed with zero shuffles (ordering here is
  *    only for the deterministic oracle compare).
  */
object Scalars extends QueryPack {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.view(s, dir, n)

  override def defs: Map[String, Q] = Map(
    "q70_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          length(col("p_name")).cast("long").as("name_len"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          lower(col("p_brand")).as("brand_lower"),
          ltrim(rtrim(col("p_type"))).as("type_trim"),
          lpad(col("p_brand"), 12, "*").as("brand_lpad"),
          rpad(col("p_brand"), 12, "*").as("brand_rpad"),
          reverse(col("p_brand")).as("brand_rev"),
          expr("replace(p_type, ' ', '_')").as("type_us"),
          expr("split_part(p_type, ' ', 1)").as("type_first"),
          instr(col("p_name"), "a").cast("long").as("a_pos"),
          levenshtein(col("p_brand"), lit("Brand#13")).cast("long").as("lev_to_13"),
          translate(col("p_brand"), "#", "-").as("brand_tr"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          repeat(col("p_brand"), 2).as("brand_twice"),
          ascii(col("p_name")).cast("long").as("first_cp"),
          expr("char(65 + p_size % 26)").as("size_chr"))
        .orderBy(col("p_partkey"))),

    "q71_datetime_funcs" -> ((s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") <= 600)
        .select(
          col("o_orderkey"),
          // DuckDB date_trunc('month', ts) yields DATE; normalize to DATE.
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          // Spark dayofweek is 1=Sunday; DuckDB is 0=Sunday.
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          last_day(to_date(col("o_orderdate"))).as("month_end"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          datediff(lit("1998-08-01").cast("date"), to_date(col("o_orderdate")))
            .cast("long").as("days_to_eoh"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          PrestoScalars.dateFormatMysql(col("o_orderdate"), "%Y-%m-%d").as("fmt_ymd"),
          PrestoScalars.dateParse(
            concat(PrestoScalars.dateFormatMysql(col("o_orderdate"), "%Y-%m-%d"),
              lit(" 00:00:00")),
            "%Y-%m-%d %H:%i:%s").as("reparsed"))
        .orderBy(col("o_orderkey"))),

    "q72_math_scalar" -> ((s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).cast("long").as("abs_off"),
          ceil(col("p_retailprice")).cast("long").as("ceil_price"),
          floor(col("p_retailprice")).cast("long").as("floor_price"),
          signum(col("p_size") - 25).cast("double").as("sgn"),
          (col("p_size") % 7).cast("long").as("size_mod7"),
          pow(col("p_size"), 2).as("size_sq"),
          sqrt(col("p_retailprice")).as("sqrt_price"),
          // sign*floor(|x|*100)/100 == Presto truncate(x, 2); IEEE-exact.
          (signum(col("p_retailprice")) *
            floor(abs(col("p_retailprice")) * 100.0) / 100.0).as("trunc2"),
          PrestoScalars.widthBucket(col("p_retailprice"),
            lit(900.0), lit(2100.0), lit(12)).as("price_bucket"),
          PrestoScalars.toBase(col("p_partkey"), 16).as("hex_key"),
          PrestoScalars.fromBase(PrestoScalars.toBase(col("p_partkey"), 16), 16)
            .as("roundtrip_key"),
          shiftleft(col("p_size"), 2).cast("long").as("size_shl2"),
          shiftright(col("p_size"), 1).cast("long").as("size_shr1"),
          col("p_size").bitwiseAND(lit(21)).cast("long").as("size_and"),
          col("p_size").bitwiseOR(lit(8)).cast("long").as("size_or"),
          col("p_size").bitwiseXOR(lit(21)).cast("long").as("size_xor"))
        .orderBy(col("p_partkey"))),

    // Transcendentals are not bit-stable across libms → rounded aggregates
    // only (same policy as the reference's oracle tolerance,
    // `presto-tests/.../QueryAssertions.java`).
    "q73_math_transcendental" -> ((s, dir) =>
      t(s, dir, "part")
        .agg(
          round(avg(log(col("p_retailprice"))), 6).as("avg_ln_price"),
          round(avg(log(10.0, col("p_retailprice"))), 6).as("avg_log10_price"),
          round(avg(log(2.0, col("p_size"))), 6).as("avg_log2_size"),
          round(avg(exp(col("p_size") / 25.0)), 6).as("avg_exp_sz"),
          round(sum(sin(col("p_size"))), 6).as("sum_sin_sz"),
          round(sum(cos(col("p_size"))), 6).as("sum_cos_sz"),
          round(sum(atan2(col("p_size"), col("p_retailprice"))), 6).as("sum_atan2"),
          round(avg(degrees(col("p_size") / 50.0)), 6).as("avg_deg"),
          round(avg(radians(col("p_size").cast("double"))), 6).as("avg_rad"),
          round(lit(Math.PI), 6).as("pi_const"))),

    "q74_regex_funcs" -> ((s, dir) =>
      t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          col("p_type").rlike("BRASS|COPPER").as("is_metal"),
          col("p_name").like("%green%").as("is_green"),
          regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_last"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          expr("array_join(regexp_extract_all(p_name, '[a-z]+', 0), ',')")
            .as("name_words"),
          expr("cast(regexp_count(p_name, 'a') as bigint)").as("n_a"),
          array_join(split(col("p_name"), " "), "|").as("name_pipe"))
        .orderBy(col("p_partkey"))),

    "q75_conditional" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_custkey") <= 300)
        .select(
          col("c_custkey"),
          expr("try_cast(replace(c_name, 'Customer#', '') AS BIGINT)").as("cust_num"),
          expr("try_cast(c_mktsegment AS BIGINT)").as("seg_num"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
            .as("seg_or_other"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
          least(col("c_acctbal"), lit(0.0)).as("bal_neg"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_class"),
          expr("if(c_nationkey % 2 = 0, 'even', 'odd')").as("nat_parity"),
          expr("ifnull(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR')").as("seg2"))
        .orderBy(col("c_custkey"))),

    // CHAR(n) padded-comparison semantics (reference
    // `presto-common/.../type/Chars.java:33` padSpaces; SURVEY §7.4 ranks
    // this the top semantic-fidelity hazard): Presto compares CHAR values
    // after right-padding to the type width, so 'ab' = 'ab ' under
    // CHAR(5) but not under VARCHAR. Spark has no CHAR runtime type
    // (strings keep trailing blanks), so the engine expresses CHAR
    // comparison as explicit rpad-to-width on both operands — the
    // documented, plan-visible translation a migrating user applies.
    "qd0_char_padding" -> ((s, dir) =>
      s.sql("""SELECT a, b,
              |  a = b AS varchar_eq,
              |  rpad(a, 5, ' ') = rpad(b, 5, ' ') AS char5_eq,
              |  cast(length(a) as bigint) AS a_len,
              |  cast(length(rpad(a, 5, ' ')) as bigint) AS a_char_len,
              |  rpad(a, 5, ' ') < rpad(b, 5, ' ') AS char5_lt
              |FROM VALUES ('ab', 'ab '), ('ab', 'ab'), ('ab', 'ac'),
              |  ('xy ', 'xy') AS t(a, b)
              |ORDER BY a, b""".stripMargin))
  )

  override def oracles: Map[String, String] = Map(
    "q70_string_funcs" ->
      """SELECT p_partkey,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | upper(substr(p_name, 1, 8)) AS name_prefix,
        | lower(p_brand) AS brand_lower,
        | ltrim(rtrim(p_type)) AS type_trim,
        | lpad(p_brand, 12, '*') AS brand_lpad,
        | rpad(p_brand, 12, '*') AS brand_rpad,
        | reverse(p_brand) AS brand_rev,
        | replace(p_type, ' ', '_') AS type_us,
        | split_part(p_type, ' ', 1) AS type_first,
        | CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
        | CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS lev_to_13,
        | translate(p_brand, '#', '-') AS brand_tr,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | repeat(p_brand, 2) AS brand_twice,
        | CAST(ascii(p_name) AS BIGINT) AS first_cp,
        | chr(65 + p_size % 26) AS size_chr
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "q71_datetime_funcs" ->
      """SELECT o_orderkey,
        | date_trunc('month', o_orderdate) AS month_start,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | CAST(month(o_orderdate) AS BIGINT) AS mon,
        | CAST(day(o_orderdate) AS BIGINT) AS dom,
        | CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        | CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(DATE '1998-08-01' - CAST(o_orderdate AS DATE) AS BIGINT) AS days_to_eoh,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        | strftime(o_orderdate, '%Y-%m-%d') AS fmt_ymd,
        | strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 00:00:00',
        |   '%Y-%m-%d %H:%M:%S') AS reparsed
        |FROM orders WHERE o_orderkey <= 600 ORDER BY o_orderkey""".stripMargin,

    "q72_math_scalar" ->
      """SELECT p_partkey,
        | CAST(abs(p_size - 25) AS BIGINT) AS abs_off,
        | CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        | CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        | CAST(sign(p_size - 25) AS DOUBLE) AS sgn,
        | CAST(p_size % 7 AS BIGINT) AS size_mod7,
        | power(p_size, 2) AS size_sq,
        | sqrt(p_retailprice) AS sqrt_price,
        | sign(p_retailprice) * floor(abs(p_retailprice) * 100.0) / 100.0 AS trunc2,
        | CAST(CASE WHEN p_retailprice < 900.0 THEN 0
        |   WHEN p_retailprice >= 2100.0 THEN 13
        |   ELSE floor((p_retailprice - 900.0) / ((2100.0 - 900.0) / CAST(12 AS DOUBLE))) + 1
        | END AS BIGINT) AS price_bucket,
        | printf('%X', p_partkey) AS hex_key,
        | p_partkey AS roundtrip_key,
        | CAST(p_size AS BIGINT) << 2 AS size_shl2,
        | CAST(p_size AS BIGINT) >> 1 AS size_shr1,
        | CAST(p_size & 21 AS BIGINT) AS size_and,
        | CAST(p_size | 8 AS BIGINT) AS size_or,
        | CAST(xor(p_size, 21) AS BIGINT) AS size_xor
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "q73_math_transcendental" ->
      """SELECT
        | round(avg(ln(p_retailprice)), 6) AS avg_ln_price,
        | round(avg(log10(p_retailprice)), 6) AS avg_log10_price,
        | round(avg(log2(p_size)), 6) AS avg_log2_size,
        | round(avg(exp(p_size / 25.0)), 6) AS avg_exp_sz,
        | round(sum(sin(p_size)), 6) AS sum_sin_sz,
        | round(sum(cos(p_size)), 6) AS sum_cos_sz,
        | round(sum(atan2(p_size, p_retailprice)), 6) AS sum_atan2,
        | round(avg(degrees(p_size / 50.0)), 6) AS avg_deg,
        | round(avg(radians(CAST(p_size AS DOUBLE))), 6) AS avg_rad,
        | round(pi(), 6) AS pi_const
        |FROM part""".stripMargin,

    "q74_regex_funcs" ->
      """SELECT p_partkey,
        | regexp_matches(p_type, 'BRASS|COPPER') AS is_metal,
        | p_name LIKE '%green%' AS is_green,
        | regexp_extract(p_type, '([A-Z]+)$', 1) AS type_last,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        | array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS name_words,
        | CAST(length(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
        | array_to_string(string_split(p_name, ' '), '|') AS name_pipe
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "q75_conditional" ->
      """SELECT c_custkey,
        | TRY_CAST(replace(c_name, 'Customer#', '') AS BIGINT) AS cust_num,
        | TRY_CAST(c_mktsegment AS BIGINT) AS seg_num,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
        | greatest(c_acctbal, 0.0) AS bal_pos,
        | least(c_acctbal, 0.0) AS bal_neg,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |      WHEN c_acctbal < 5000 THEN 'mid'
        |      ELSE 'high' END AS bal_class,
        | CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nat_parity,
        | coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg2
        |FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin,

    "qd0_char_padding" ->
      """SELECT a, b,
        |  a = b AS varchar_eq,
        |  rpad(a, 5, ' ') = rpad(b, 5, ' ') AS char5_eq,
        |  CAST(length(a) AS BIGINT) AS a_len,
        |  CAST(length(rpad(a, 5, ' ')) AS BIGINT) AS a_char_len,
        |  rpad(a, 5, ' ') < rpad(b, 5, ' ') AS char5_lt
        |FROM (VALUES ('ab', 'ab '), ('ab', 'ab'), ('ab', 'ac'),
        |  ('xy ', 'xy')) t(a, b)
        |ORDER BY a, b""".stripMargin
  )
}

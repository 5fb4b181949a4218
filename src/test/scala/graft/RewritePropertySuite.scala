package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Registry

/** Property tests for the pre-parse rewrite pipeline — the
  * string-masking scanners (subscripts, ARRAY literals, AT TIME ZONE,
  * TIME/DECIMAL/zoned literals, TABLESAMPLE, UNNEST) share one masking
  * convention, and this suite hammers its two load-bearing contracts:
  *
  *  1. IDENTITY on masked content: a query whose only trigger-looking
  *     text sits INSIDE single-quoted literals (including doubled-''
  *     escapes) passes through rewritePrestoSql byte-identical.
  *  2. IDEMPOTENCE: rewriting twice equals rewriting once — no rewrite
  *     may manufacture text that re-triggers itself or a sibling.
  */
class RewritePropertySuite extends GraftSuite {

  /** Deterministic property driver (scalatestplus isn't on the
    * classpath; fixed seeds keep failures reproducible). */
  private def forAll(gen: Gen[String])(check: String => Unit): Unit =
    (1 to 500).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // trigger-looking fragments that must be INERT inside string literals
  private val triggerTexts = Seq(
    "ARRAY[1, 2]", "x[1]", "arr[idx]", "CROSS JOIN UNNEST(a)",
    "ts AT TIME ZONE 'UTC'", "TIME '12:34:56'", "DECIMAL '1.23'",
    "ts AT TIME ZONE INTERVAL '05:30' HOUR TO MINUTE",
    "TIME '08:30:15 +05:30'",
    "TIMESTAMP '2020-06-10 15:30:00 +05:30'",
    "TABLESAMPLE BERNOULLI (10)", "date_add('day', 1, d)",
    "information_schema.columns", "system.runtime.queries",
    "system.jdbc.columns", "system.jdbc.table_types",
    "cast(x as varchar)", "CAST(x AS row(a bigint))",
    "CAST(m AS map(varchar, bigint))", "array_agg(x ORDER BY y)",
    "it's doubled", "")

  private val benignTokens = Seq(
    "SELECT", "a", "b", "col_1", "+", "-", ",", "(", ")", "42", "1.5",
    "FROM t", "WHERE", "=", "\n", "  ", "GROUP BY", "count(*)")

  /** Well-formed SQL literal: interior quotes double ('' escape). */
  private def literalOf(content: String): String =
    s"'${content.replace("'", "''")}'"

  private val maskedQueryGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf(benignTokens),
      Gen.oneOf(triggerTexts).map(literalOf)))
  } yield parts.mkString(" ")

  // real (unmasked) constructs the pipeline rewrites, mixed with masked
  // literals — used for the idempotence property
  private val constructTokens = Seq(
    "ARRAY[1, 2, 3]", "t.arr[1]", "TIME '12:34:56'", "DECIMAL '0.05'",
    "TIME '08:30:15 +05:30'",
    "TIMESTAMP '2020-06-10 15:30:00 +05:30'", "m['k']",
    "TABLESAMPLE BERNOULLI (10)", "date_add('day', 3, d)",
    "date_diff('hour', a, b)", "cast(x as varchar)",
    "CAST(r AS ROW(x BIGINT, y DOUBLE))",
    "CAST(a AS array(row(k bigint, v varchar)))",
    "array_agg(x ORDER BY y DESC)", "sum(v ORDER BY k)",
    "ts AT TIME ZONE INTERVAL -'03:30' HOUR TO MINUTE",
    "TRY_CAST(m AS map(varchar, bigint))")

  private val mixedQueryGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    parts <- Gen.listOfN(n, Gen.oneOf(
      Gen.oneOf(benignTokens),
      Gen.oneOf(triggerTexts).map(literalOf),
      Gen.oneOf(constructTokens)))
  } yield parts.mkString(" ")

  test("rewritePrestoSql is identity when triggers only appear inside literals") {
    forAll(maskedQueryGen) { q =>
      assert(Registry.rewritePrestoSql(q) == q, s"\nquery: $q")
    }
  }

  test("rewritePrestoSql is idempotent on mixed queries") {
    forAll(mixedQueryGen) { q =>
      val once = Registry.rewritePrestoSql(q)
      val twice = Registry.rewritePrestoSql(once)
      assert(twice == once, s"\nquery: $q\nonce:  $once\ntwice: $twice")
    }
  }

  test("doubled-quote escapes stay masked through every scanner") {
    // 'it''s ARRAY[1]' — the '' reads as two adjacent literals under the
    // masking convention; either way the bracket must not rewrite
    val q = "SELECT 'it''s ARRAY[1]' AS s, 'a[1] AT TIME ZONE ''x''' AS t"
    assert(Registry.rewritePrestoSql(q) == q)
  }
}

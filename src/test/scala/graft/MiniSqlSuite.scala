package graft.sources

import java.sql.Types

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the shims' statement engine — the grammar Spark's
  * JDBC source generates, evaluated directly (the dialect gates cover
  * the end-to-end paths; THESE tests make a MiniSql regression local).
  * Every arm here was observed from Spark 4.1's own generated SQL. */
class MiniSqlSuite extends AnyFunSuite {

  import ShimModel.ColDef

  private def mkTable(name: String): Unit = {
    MySqlStore.drop(name)
    MySqlStore.create(name, Seq(
      ColDef("id", "BIGINT", Types.BIGINT, 19, 0, signed = true,
        nullable = false),
      ColDef("nm", "LONGTEXT", Types.LONGVARCHAR, Int.MaxValue, 0,
        signed = true, nullable = true),
      ColDef("v", "DOUBLE", Types.DOUBLE, 22, 0, signed = true,
        nullable = true),
      ColDef("fl", "BIT", Types.BIT, 1, 0, signed = true,
        nullable = true)))
    Seq[(Long, String, Any, Any)](
      (1L, "alpha", 1.5, true), (2L, "beta", null, false),
      (3L, null, 3.0, true), (4L, "delta", 4.5, null))
      .foreach { case (i, n, v, f) =>
        MySqlStore.insert(name, Seq(i, n, v, f))
      }
  }

  private def run(sql: String,
      params: Array[Any] = Array.empty): Seq[Array[Any]] =
    MiniSql.run(MiniSql.parse(sql, MySqlStore), params, MySqlStore)._2

  test("three-valued logic: NULL propagates, predicates keep TRUE only") {
    mkTable("ms_tvl")
    // v IS NULL on row 2; fl IS NULL on row 4
    assert(run("SELECT id FROM ms_tvl WHERE v > 2").map(_(0)) ==
      Seq(3L, 4L)) // NULL v drops, not errors
    // NOT (NULL) is NULL -> row still dropped
    assert(run("SELECT id FROM ms_tvl WHERE NOT (v > 2)").map(_(0)) ==
      Seq(1L))
    // OR with one TRUE side survives a NULL other side
    assert(run("SELECT id FROM ms_tvl WHERE v > 2 OR id = 2").map(_(0)) ==
      Seq(2L, 3L, 4L))
    // AND with one FALSE side is FALSE regardless of NULL
    assert(run("SELECT id FROM ms_tvl WHERE v > 2 AND id = 1").isEmpty)
    // IS NULL / IS NOT NULL
    assert(run("SELECT id FROM ms_tvl WHERE nm IS NULL").map(_(0)) ==
      Seq(3L))
    assert(run("SELECT id FROM ms_tvl WHERE fl IS NOT NULL")
      .map(_(0)) == Seq(1L, 2L, 3L))
    // IN with NULL candidate: hit wins, else NULL (drops)
    assert(run("SELECT id FROM ms_tvl WHERE v IN (1.5, NULL)").map(_(0)) ==
      Seq(1L))
  }

  test("CAST targets: the numeric set is accepted, others are loud") {
    mkTable("ms_cast")
    assert(run("SELECT CAST(id AS DOUBLE PRECISION) FROM ms_cast " +
      "WHERE id = 2")(0)(0) == java.lang.Double.valueOf(2.0))
    assert(run("SELECT CAST(v AS BIGINT) FROM ms_cast WHERE id = 1")(0)(0)
      == java.lang.Long.valueOf(1L))
    assert(run("SELECT CAST(id AS FLOAT8) FROM ms_cast WHERE id = 3")(0)(0)
      == java.lang.Double.valueOf(3.0))
    val e = intercept[java.sql.SQLException] {
      run("SELECT CAST(id AS UUID) FROM ms_cast")
    }
    assert(e.getMessage.contains("unsupported CAST target"))
  }

  test("T-SQL spellings: TOP (n) and the VAR/STDEV family fold in") {
    mkTable("ms_tsql")
    // TOP parses before the projection and acts as the limit
    assert(run("SELECT TOP (2) id FROM ms_tsql ORDER BY id DESC")
      .map(_(0)) == Seq(4L, 3L))
    // VAR == VAR_SAMP, VARP == VAR_POP, STDEV(P) likewise
    val vs = run("SELECT VAR(id), VAR_SAMP(id), VARP(id), VAR_POP(id) " +
      "FROM ms_tsql")(0)
    assert(vs(0) == vs(1) && vs(2) == vs(3))
    assert(vs(0).asInstanceOf[Double] > vs(2).asInstanceOf[Double])
  }

  test("pushed TopN may ORDER BY a column outside the projection") {
    mkTable("ms_topn")
    assert(run("SELECT id FROM ms_topn WHERE v IS NOT NULL " +
      "ORDER BY v DESC LIMIT 2").map(_(0)) == Seq(4L, 3L))
  }

  test("sources: derived tables, INNER/LEFT joins, item aliases") {
    mkTable("ms_a")
    MySqlStore.drop("ms_b")
    MySqlStore.create("ms_b", Seq(
      ColDef("id", "BIGINT", Types.BIGINT, 19, 0, signed = true,
        nullable = false),
      ColDef("w", "DOUBLE", Types.DOUBLE, 22, 0, signed = true,
        nullable = true)))
    Seq((1L, 10.0), (3L, 30.0)).foreach { case (i, w) =>
      MySqlStore.insert("ms_b", Seq(i, w))
    }
    // the join-pushdown shape: aliased derived tables INNER JOIN ON
    val inner = run(
      """SELECT `id`,`nm`,`id_1`,`w` FROM (
        |  SELECT `id`,`nm` FROM `g`.`ms_a` WHERE `id` <= 3
        |) join_subquery_0 INNER JOIN (
        |  SELECT `id` AS `id_1`,`w` FROM `g`.`ms_b`
        |) join_subquery_1 ON `id` = `id_1`""".stripMargin)
    assert(inner.map(r => (r(0), r(3))) == Seq((1L, 10.0), (3L, 30.0)))
    // LEFT join NULL-pads unmatched left rows
    val left = run(
      """SELECT `id`,`w` FROM (SELECT `id` FROM ms_a) a
        |LEFT JOIN (SELECT `id` AS `id_1`,`w` FROM ms_b) b
        |ON `id` = `id_1` ORDER BY `id`""".stripMargin)
    assert(left.map(_(0)) == Seq(1L, 2L, 3L, 4L))
    assert(left(1)(1) == null && left(3)(1) == null)
    // the outer wrap JDBCRDD adds: (query) SPARK_GEN_SUBQ_0
    assert(run("SELECT `id` FROM (SELECT `id` FROM ms_a) SPARK_GEN_SUBQ_0")
      .size == 4)
  }

  test("UPDATE: SET with WHERE mutates in place, loud on bad grammar") {
    mkTable("ms_upd")
    val n = MiniSql.runUpdate(MiniSql.parseUpdate(
      "UPDATE ms_upd SET v = 9.0 WHERE id <= 2", MySqlStore),
      Array.empty, MySqlStore)
    assert(n == 2)
    assert(run("SELECT v FROM ms_upd WHERE id = 1")(0)(0) == 9.0)
    assert(run("SELECT v FROM ms_upd WHERE id = 3")(0)(0) == 3.0)
    // parameterized SET (the DAO shape)
    MiniSql.runUpdate(MiniSql.parseUpdate(
      "UPDATE ms_upd SET fl = ? WHERE id = ?", MySqlStore),
      Array[Any](false, 1L), MySqlStore)
    assert(run("SELECT fl FROM ms_upd WHERE id = 1")(0)(0) == false)
    intercept[java.sql.SQLException] {
      MiniSql.parseUpdate("UPDATE ms_upd SET v = 1 FROM x", MySqlStore)
    }
  }

  test("TABLESAMPLE BERNOULLI: deterministic, 100% keeps all") {
    mkTable("ms_sample")
    def sample(pct: String, seed: Long): Seq[Any] =
      run(s"SELECT id FROM ms_sample TABLESAMPLE BERNOULLI ($pct) " +
        s"REPEATABLE ($seed)").map(_(0))
    assert(sample("100.0", 7) == Seq(1L, 2L, 3L, 4L))
    assert(sample("50.0", 7) == sample("50.0", 7)) // REPEATABLE
    assert(sample("0.0", 7).isEmpty)
  }

  test("dialect literal escaping: backslash per backend") {
    mkTable("ms_esc")
    MySqlStore.insert("ms_esc", Seq(9L, "a\\b", 0.0, true))
    // MySQL tokenizer treats \ as an escape: '\\' means one backslash
    assert(run("SELECT id FROM ms_esc WHERE nm = 'a\\\\b'").map(_(0)) ==
      Seq(9L))
    // Postgres (standard_conforming_strings): '\' IS a backslash
    PgStore.drop("pg_esc")
    PgStore.create("pg_esc", Seq(
      ColDef("id", "int8", Types.BIGINT, 19, 0, signed = true,
        nullable = false),
      ColDef("nm", "text", Types.VARCHAR, Int.MaxValue, 0,
        signed = true, nullable = true)))
    PgStore.insert("pg_esc", Seq(9L, "a\\b"))
    val sel = MiniSql.parse("SELECT id FROM pg_esc WHERE nm = 'a\\b'",
      PgStore)
    assert(MiniSql.run(sel, Array.empty, PgStore)._2.map(_(0)) == Seq(9L))
  }

  test("identifier quote is the BACKEND's, not both") {
    mkTable("ms_q")
    // MySQL: backtick quotes an identifier...
    assert(run("SELECT `id` FROM ms_q WHERE id = 1").map(_(0)) ==
      Seq(1L))
    // ...but double-quote must NOT silently parse as one — MySQL's
    // default sql_mode reads "..." as a string LITERAL, so the shim
    // fails loudly rather than guess
    intercept[java.sql.SQLException] {
      run("""SELECT "id" FROM ms_q WHERE id = 1""")
    }
    // Postgres: the inverse — double-quote is the ident quote,
    // backtick is rejected
    PgStore.drop("pg_q")
    PgStore.create("pg_q", Seq(
      ColDef("id", "int8", Types.BIGINT, 19, 0, signed = true,
        nullable = false)))
    PgStore.insert("pg_q", Seq(5L))
    val sel = MiniSql.parse("""SELECT "id" FROM "pg_q"""", PgStore)
    assert(MiniSql.run(sel, Array.empty, PgStore)._2.map(_(0)) ==
      Seq(5L))
    intercept[java.sql.SQLException] {
      MiniSql.parse("SELECT `id` FROM pg_q", PgStore)
    }
  }

  test("aggregate ORDER BY resolves projected expressions and aliases") {
    mkTable("ms_agg")
    val rows = run(
      """SELECT fl, COUNT(*) AS n FROM ms_agg WHERE fl IS NOT NULL
        |GROUP BY fl ORDER BY n DESC, fl""".stripMargin)
    assert(rows.map(r => (r(0), r(1))) == Seq((true, 2L), (false, 1L)))
  }
}

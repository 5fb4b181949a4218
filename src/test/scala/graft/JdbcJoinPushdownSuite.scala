package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftMySqlDriver, GraftPostgresDriver, GraftSqlServerDriver, MsStore, MySqlStore, PgStore}

/** JDBC JOIN pushdown (SupportsPushDownJoin) against the dialect
  * shims: two tables on one URL join remote-side — one scan,
  * PushedJoins in the plan, the generated derived-table INNER JOIN in
  * the statement log — with the negative control (conf off → a
  * Spark-side join reappears), the alias-collision arm (same column
  * name on both sides forces `id AS id_1`), and a Postgres arm
  * proving the recursive source grammar is dialect-neutral. */
class JdbcJoinPushdownSuite extends GraftSuite {

  GraftMySqlDriver.install()
  GraftPostgresDriver.install()

  private val myUrl = "jdbc:mysql://graft-shim/g"
  private val myDrv = "graft.sources.GraftMySqlDriver"
  private val pgUrl = "jdbc:postgresql://graft-shim/g"
  private val pgDrv = "graft.sources.GraftPostgresDriver"

  private def seed(url: String, drv: String): Unit = {
    import spark.implicits._
    Seq("jpa", "jpb").foreach { t =>
      (url match {
        case u if u.startsWith("jdbc:mysql") => MySqlStore.drop(t)
        case _ => PgStore.drop(t)
      })
    }
    (1 to 60).map(i => (i.toLong, s"n$i")).toDF("id", "nm")
      .write.format("jdbc").option("url", url).option("dbtable", "jpa")
      .option("driver", drv).mode("overwrite").save()
    (1 to 60).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "jpb")
      .option("driver", drv).mode("overwrite").save()
  }

  private def catalog(name: String, url: String, drv: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.driver", drv)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownJoin", "true")
  }

  private def withJoinPushdown[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf
      .getOption("spark.sql.optimizer.datasourceV2JoinPushdown")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown",
      on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf
        .set("spark.sql.optimizer.datasourceV2JoinPushdown", v)
      case None => spark.conf
        .unset("spark.sql.optimizer.datasourceV2JoinPushdown")
    }
  }

  test("a two-table join pushes whole: one scan, remote INNER JOIN") {
    seed(myUrl, myDrv)
    catalog("jp_my", myUrl, myDrv)
    withJoinPushdown(true) {
      MySqlStore.statementLog.clear()
      // same column name on both sides: the builder must alias the
      // collision (`id AS id_1`) and values must still line up
      val j = spark.table("jp_my.g.jpa")
        .join(spark.table("jp_my.g.jpb"), "id")
        .filter(col("id") <= 10)
      val rows = j.collect()
      assert(rows.length == 10)
      assert(rows.find(_.getLong(0) == 7L).exists(r =>
        r.getString(1) == "n7" && r.getDouble(2) == 14.0))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("PushedJoins"), plan)
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("BroadcastHashJoin"), s"join stayed Spark-side:\n$plan")
      val log = MySqlStore.statementLog.toArray.map(_.toString)
      assert(log.exists(q => q.contains("INNER JOIN") &&
        q.contains("join_subquery") && q.contains("AS `id_1`")),
        log.mkString("\n"))
    }
  }

  test("negative control: with the conf off the join stays Spark-side") {
    seed(myUrl, myDrv)
    catalog("jp_my", myUrl, myDrv)
    withJoinPushdown(false) {
      MySqlStore.statementLog.clear()
      val j = spark.table("jp_my.g.jpa")
        .join(spark.table("jp_my.g.jpb"), "id")
        .filter(col("id") <= 10)
      assert(j.collect().length == 10)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("PushedJoins"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("BroadcastHashJoin"), s"no Spark join either:\n$plan")
      assert(!MySqlStore.statementLog.toArray.map(_.toString)
        .exists(_.contains("INNER JOIN")),
        "a join statement crossed the wire with pushdown off")
    }
  }

  test("the postgres shim executes the same pushed-join grammar") {
    seed(pgUrl, pgDrv)
    catalog("jp_pg", pgUrl, pgDrv)
    withJoinPushdown(true) {
      PgStore.statementLog.clear()
      val j = spark.table("jp_pg.g.jpa")
        .join(spark.table("jp_pg.g.jpb"), "id")
        .filter(col("id") <= 5)
      val rows = j.collect()
      assert(rows.length == 5)
      assert(rows.find(_.getLong(0) == 3L).exists(_.getDouble(2) == 6.0))
      assert(j.queryExecution.executedPlan.toString
        .contains("PushedJoins"))
      // double-quoted, not backticked — the dialect's own SQL
      val log = PgStore.statementLog.toArray.map(_.toString)
      assert(log.exists(q => q.contains("INNER JOIN") &&
        q.contains("\"id\"") && !q.contains("`")), log.mkString("\n"))
    }
  }

  test("the sqlserver shim: pushed join composes with the TOP limit") {
    GraftSqlServerDriver.install()
    val msUrl = "jdbc:sqlserver://graft-shim;databaseName=g"
    val msDrv = "graft.sources.GraftSqlServerDriver"
    import spark.implicits._
    MsStore.drop("jpa"); MsStore.drop("jpb")
    (1 to 60).map(i => (i.toLong, s"n$i")).toDF("id", "nm")
      .write.format("jdbc").option("url", msUrl).option("dbtable", "jpa")
      .option("driver", msDrv).mode("overwrite").save()
    (1 to 60).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.format("jdbc").option("url", msUrl).option("dbtable", "jpb")
      .option("driver", msDrv).mode("overwrite").save()
    catalog("jp_ms", msUrl, msDrv)
    spark.conf.set("spark.sql.catalog.jp_ms.pushDownLimit", "true")
    withJoinPushdown(true) {
      MsStore.statementLog.clear()
      val j = spark.sql(
        """SELECT id, nm, v FROM jp_ms.g.jpa JOIN jp_ms.g.jpb USING (id)
          |ORDER BY v DESC LIMIT 3""".stripMargin)
      val rows = j.collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(60L, 59L, 58L))
      assert(j.queryExecution.executedPlan.toString
        .contains("PushedJoins"))
      val log = MsStore.statementLog.toArray.map(_.toString)
      assert(log.exists(_.contains("INNER JOIN")), log.mkString("\n"))
      // the dialect's limit stays TOP-shaped even over the joined source
      assert(log.exists(q => q.contains("TOP (3)") &&
        q.contains("INNER JOIN")) || !log.exists(_.contains("LIMIT")),
        log.mkString("\n"))
    }
  }

  test("left outer join: right answers whether Spark pushes it or not") {
    import spark.implicits._
    seed(myUrl, myDrv)
    MySqlStore.drop("jpc")
    // right side covers only half the keys -> unmatched lefts pad NULL
    (1 to 30).map(i => (i.toLong, i * 3.0)).toDF("id", "w")
      .write.format("jdbc").option("url", myUrl).option("dbtable", "jpc")
      .option("driver", myDrv).mode("overwrite").save()
    catalog("jp_my", myUrl, myDrv)
    withJoinPushdown(true) {
      val j = spark.table("jp_my.g.jpa")
        .join(spark.table("jp_my.g.jpc"), Seq("id"), "left")
      val rows = j.collect()
      assert(rows.length == 60)
      assert(rows.find(_.getLong(0) == 10L).exists(_.getDouble(2) == 30.0))
      assert(rows.find(_.getLong(0) == 40L).exists(_.isNullAt(2)),
        "unmatched left row must NULL-pad")
      // don't over-assert WHERE it ran: if Spark pushed it, the shim's
      // LEFT grammar executed it; if not, Spark joined — both legal
      val plan = j.queryExecution.executedPlan.toString
      val pushed = plan.contains("PushedJoins")
      val sparkSide = plan.contains("SortMergeJoin") ||
        plan.contains("BroadcastHashJoin")
      assert(pushed ^ sparkSide, s"exactly one side must join:\n$plan")
    }
  }

  test("aggregate over a pushed join: grouped numbers stay right") {
    seed(myUrl, myDrv)
    catalog("jp_my", myUrl, myDrv)
    withJoinPushdown(true) {
      val agg = spark.table("jp_my.g.jpa")
        .join(spark.table("jp_my.g.jpb"), "id")
        .groupBy((col("id") % 3).as("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("vs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(agg.map(_._2).sum == 60L)
      // g=0: ids 3,6,...,60 -> sum v = 2*(3+6+...+60) = 2*630
      assert(agg.find(_._1 == 0L).exists(_._3 == 1260.0))
    }
  }
}

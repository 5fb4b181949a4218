package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `system` connector surface: system.runtime.nodes,
  * system.runtime.queries, system.metadata.catalogs as queryable tables,
  * and the canonical CALL procedure `system.runtime.kill_query`.
  *
  * Reference: presto-main/.../connector/system/ — NodeSystemTable.java:50
  * (node_id/http_uri/node_version/coordinator/state),
  * QuerySystemTable.java:57-70 (query_id/state/user/source/query/...),
  * CatalogSystemTable.java:47, KillQueryProcedure.java:53-73 (its exact
  * error texts: "Target query is not running: <id>" for any query that
  * is not actively executing, "Target query not found: <id>" otherwise).
  *
  * In a synchronous library every recorded query has already finished by
  * the time any later statement can observe it, so the query log's
  * states are FINISHED/FAILED — which makes kill_query's "not running"
  * rejection the honest behavior for every known id, exactly the
  * reference's race-checked path. Metadata-sized driver assembly
  * throughout (the coordinator-local SystemPageSourceProvider stance).
  */
private[functions] object PrestoSystem {

  private case class QRec(queryId: String, var state: String, user: String,
      query: String, createdMs: Long, var endMs: Long)

  private val logs =
    new java.util.WeakHashMap[SparkSession, mutable.ArrayBuffer[QRec]]()
  private val counters = new java.util.WeakHashMap[SparkSession, Array[Int]]()

  private def log(spark: SparkSession): mutable.ArrayBuffer[QRec] =
    synchronized {
      logs.computeIfAbsent(spark, _ => mutable.ArrayBuffer.empty)
    }

  /** Record a statement entering the router; returns the record for
    * completion marking. Query ids follow the reference's
    * yyyyMMdd_HHmmss_index_suffix shape. */
  def record(spark: SparkSession, sqlText: String): AnyRef = synchronized {
    val n = counters.computeIfAbsent(spark, _ => Array(0))
    n(0) += 1
    val ts = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
      .format(new java.util.Date())
    val rec = QRec(f"${ts}_${n(0)}%05d_graft", "RUNNING",
      spark.sparkContext.sparkUser, sqlText.trim,
      System.currentTimeMillis(), 0L)
    log(spark) += rec
    rec
  }

  def finish(rec: AnyRef, failed: Boolean): Unit = synchronized {
    val r = rec.asInstanceOf[QRec]
    r.state = if (failed) "FAILED" else "FINISHED"
    r.endMs = System.currentTimeMillis()
  }

  // ——— queryable system tables ————————————————————————————————————————

  private val sysRe =
    ("""(?i)\bsystem\s*\.\s*(?:(runtime)\s*\.\s*(nodes|queries)""" +
      """|(metadata)\s*\.\s*(catalogs))\b""").r

  /** Rewrite system.runtime.nodes / system.runtime.queries /
    * system.metadata.catalogs (outside string literals) to refreshed
    * temp views. No-op when the query never mentions them. */
  def rewriteSystemTables(spark: SparkSession, q: String): String = {
    val mask = PrestoRewrite.stringMask(q)
    val ms = sysRe.findAllMatchIn(q).filter(m => !mask(m.start)).toList
    if (ms.isEmpty) q
    else {
      val names = ms.map(m =>
        Option(m.group(2)).map("runtime_" + _)
          .getOrElse("metadata_" + m.group(4))).toSet
      refresh(spark, names)
      val sb = new StringBuilder
      var pos = 0
      ms.foreach { m =>
        val t = Option(m.group(2)).map("runtime_" + _)
          .getOrElse("metadata_" + m.group(4))
        sb.append(q.substring(pos, m.start))
        sb.append("graft_system_").append(t)
        pos = m.end
      }
      sb.append(q.substring(pos))
      sb.toString
    }
  }

  private def refresh(spark: SparkSession, which: Set[String]): Unit = {
    import spark.implicits._
    if (which("runtime_nodes")) {
      // one local node wearing the coordinator hat — local[n] is a
      // single-JVM cluster (NodeSystemTable over the discovery service)
      Seq(("local", "local://127.0.0.1", spark.version, true, "active"))
        .toDF("node_id", "http_uri", "node_version", "coordinator", "state")
        .createOrReplaceTempView("graft_system_runtime_nodes")
    }
    if (which("runtime_queries")) {
      val rows = synchronized { log(spark).toSeq.map(r =>
        (r.queryId, r.state, r.user, r.query,
          new java.sql.Timestamp(r.createdMs),
          if (r.endMs == 0L) null
          else new java.sql.Timestamp(r.endMs))) }
      rows.toDF("query_id", "state", "user", "query", "created", "end")
        .createOrReplaceTempView("graft_system_runtime_queries")
    }
    if (which("metadata_catalogs")) {
      val cat = spark.catalog.currentCatalog()
      Seq((cat, cat)).toDF("catalog_name", "connector_id")
        .createOrReplaceTempView("graft_system_metadata_catalogs")
    }
  }

  // ——— CALL system.runtime.kill_query ————————————————————————————————

  private val callKillRe =
    ("""(?is)^\s*CALL\s+system\s*\.\s*runtime\s*\.\s*kill_query\s*\(""" +
      """\s*(?:query_id\s*=>\s*)?'([^']*)'""" +
      """(?:\s*,\s*(?:message\s*=>\s*)?'([^']*)')?\s*\)\s*$""").r
  private val callOtherRe = """(?is)^\s*CALL\s+([\w.]+)\s*\(.*$""".r

  /** Route CALL statements; None when not a CALL. */
  def maybeCall(spark: SparkSession, sqlText: String): Option[DataFrame] =
    sqlText match {
      case callKillRe(queryId, _) =>
        val known = synchronized { log(spark).exists(_.queryId == queryId) }
        // KillQueryProcedure.java:62/69/73 — a known id is by definition
        // no longer running here; unknown ids are not found
        if (known) sys.error(s"Target query is not running: $queryId")
        else sys.error(s"Target query not found: $queryId")
      case callOtherRe(name) =>
        // the reference resolves procedures per connector
        // (ProcedureRegistry); nothing else is registered in this engine
        sys.error(s"Procedure not registered: $name")
      case _ => None
    }
}

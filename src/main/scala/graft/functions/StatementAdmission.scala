package graft.functions

import org.apache.spark.sql.SparkSession

import graft.plans.{DbResourceGroupManager, ResourceGroups}

/** Automatic resource-group admission on the statement path — the
  * reference's dispatch chain (`DispatchManager.createQueryInternal` →
  * `InternalResourceGroupManager.selectGroup` → `ResourceGroupManager
  * .submit`): once a manager is INSTALLED on a session, every routed
  * statement is classified (`StatementUtils.getQueryType:77-136`),
  * matched through the selector chain (user/source/clientTags/
  * queryType/resource-estimates), and admitted against the selected
  * group's limits before it runs. Queued statements PARK and start on
  * promotion ([[ResourceGroups.awaitAdmission]]); a statement no
  * selector matches rejects with the reference's exact text
  * (`InternalResourceGroupManager.selectGroup:132` — "Query did not
  * match any selection rule"); a full queue rejects with
  * QueryQueueFullException's text.
  *
  * Session criteria ride on Spark confs the way `graft.source` already
  * does: `graft.source` (Session.getSource), `graft.client_tags`
  * (comma-separated — Session.getClientTags), and the three estimate
  * values `graft.resource_estimates.{execution_time,cpu_time,
  * peak_memory}` (airlift spellings — Session.getResourceEstimates).
  * The admission priority is the session's query_priority property.
  * How long a queued statement waits is
  * `graft.resource_groups.queue_timeout` (duration, default 5m — the
  * reference parks until query_max_queued_time; a synchronous library
  * bounds the park so a saturated group surfaces as an error, not a
  * silent hang).
  *
  * The dispatch registers the statement as a QUEUED row in
  * system.runtime.queries BEFORE admission (the reference's dispatcher
  * registers queued queries — QueryState.QUEUED): while parked it
  * renders with a live queued_time_ms and NULL started, and
  * kill_query reaches it (the park is revoked, the statement fails
  * with the kill text); a queue-full rejection or park timeout settles
  * the same record FAILED with the park charged as queued time.
  *
  * Scope note, deliberate: NESTED routed statements (ALTER FUNCTION's
  * re-registration) are not re-admitted — the reference dispatches
  * client-submitted statements only, and re-admitting against a
  * saturated hard-limit-1 leaf would deadlock a synchronous driver.
  */
object StatementAdmission {

  /** user, source, clientTags, queryType, estimates → resolved group */
  type Select = (String, Option[String], Set[String], Option[String],
    ResourceGroups.QueryEstimates) => Option[ResourceGroups.Resolved]

  private val managers =
    new java.util.WeakHashMap[SparkSession, Select]()

  /** Install a file-manager configuration: statements on this session
    * now admit through its selectors. */
  def install(spark: SparkSession, mgr: ResourceGroups.Manager): Unit =
    synchronized {
      managers.put(spark,
        (u, s, t, qt, est) => ResourceGroups.select(mgr, u, s, t, qt, est))
    }

  /** Install a DB-backed manager (its own exact-match + priority
    * selector chain). */
  def install(spark: SparkSession, mgr: DbResourceGroupManager): Unit =
    synchronized {
      managers.put(spark, (u, s, t, qt, est) => mgr.select(u, s, t, qt, est))
    }

  def uninstall(spark: SparkSession): Unit =
    synchronized { managers.remove(spark) }

  private def selectorOf(spark: SparkSession): Option[Select] =
    synchronized { Option(managers.get(spark)) }

  /** The reference's statement → QueryType table
    * (StatementUtils.java:81-135), keyed here on the routed text's
    * leading keyword(s): queries are SELECT; EXPLAIN and ANALYZE their
    * own kinds; INSERT and CTAS are INSERT; DELETE is DELETE; the SHOW/
    * DESCRIBE family is DESCRIBE; every other routed statement form
    * (DDL, session/role/grant/transaction control, CALL, PREPARE) is
    * DATA_DEFINITION. */
  // precompiled probes — this runs on the per-statement hot path
  private val SelectRe =
    java.util.regex.Pattern.compile("(?is)(SELECT|WITH|VALUES|TABLE)\\b.*")
  private val ExplainRe =
    java.util.regex.Pattern.compile("(?is)EXPLAIN\\b.*")
  private val AnalyzeRe =
    java.util.regex.Pattern.compile("(?is)ANALYZE\\b.*")
  private val CtasRe = java.util.regex.Pattern.compile(
    """(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?[^\s(]+\s+.*?\bAS\b.*""")
  private val InsertRe =
    java.util.regex.Pattern.compile("(?is)INSERT\\b.*")
  private val DeleteRe =
    java.util.regex.Pattern.compile("(?is)DELETE\\b.*")
  private val DescribeRe =
    java.util.regex.Pattern.compile("(?is)(SHOW|DESC|DESCRIBE)\\b.*")

  private[graft] def queryTypeOf(sql: String): Option[String] = {
    val t = sql.trim
    if (SelectRe.matcher(t).matches()) Some("SELECT")
    else if (ExplainRe.matcher(t).matches()) Some("EXPLAIN")
    else if (AnalyzeRe.matcher(t).matches()) Some("ANALYZE")
    else if ({
      // the CTAS probe's AS must not match inside a string literal
      // (CREATE TABLE t (c VARCHAR) COMMENT 'as is' is DDL, not CTAS)
      val mask = PrestoRewrite.stringMask(t)
      val blanked = new StringBuilder(t)
      var i = 0
      while (i < t.length) { if (mask(i)) blanked.setCharAt(i, ' '); i += 1 }
      CtasRe.matcher(blanked.toString).matches()
    }) Some("INSERT") // CTAS (WITH-properties form included)
    else if (InsertRe.matcher(t).matches()) Some("INSERT")
    else if (DeleteRe.matcher(t).matches()) Some("DELETE")
    else if (DescribeRe.matcher(t).matches()) Some("DESCRIBE")
    else if (t.nonEmpty) Some("DATA_DEFINITION")
    else None
  }

  /** The session's client tags (`graft.client_tags`, comma-separated —
    * Session.getClientTags): the ONE parse admission and the event
    * SPI's QueryContext both consume. */
  private[functions] def clientTags(spark: SparkSession): Set[String] =
    spark.conf.getOption("graft.client_tags")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])

  private def estimates(spark: SparkSession): ResourceGroups.QueryEstimates =
    ResourceGroups.QueryEstimates(
      spark.conf.getOption("graft.resource_estimates.execution_time")
        .map(ResourceGroups.parseDurationSecs),
      spark.conf.getOption("graft.resource_estimates.cpu_time")
        .map(ResourceGroups.parseDurationSecs),
      spark.conf.getOption("graft.resource_estimates.peak_memory")
        .map(ResourceGroups.parseDataSizeBytes))

  /** Wrap a routed statement in selection + admission when a manager
    * is installed (and this is not a nested re-entry); pass through
    * untouched otherwise. */
  def admitted[T](spark: SparkSession, sqlText: String)(body: => T): T =
    selectorOf(spark) match {
      case None => body
      case Some(_) if PrestoSystem.inStatement => body
      case Some(select) =>
        val user = spark.sparkContext.sparkUser
        val source = spark.conf.getOption("graft.source")
        val tags = clientTags(spark)
        val resolved = select(user, source, tags, queryTypeOf(sqlText),
          estimates(spark)).getOrElse(throw new IllegalStateException(
          "Query did not match any selection rule"))
        val timeoutMillis = (ResourceGroups.parseDurationSecs(
          spark.conf.getOption("graft.resource_groups.queue_timeout")
            .getOrElse("5m")) * 1000).toLong
        // register the dispatched statement as a QUEUED row first —
        // visible in system.runtime.queries while parked, and killable
        // (kill_query revokes the park); record() inside the body then
        // transitions it to RUNNING with the real queued time
        val g = ResourceGroups.stateOf(resolved)
        val rec = PrestoSystem.beginQueued(spark, sqlText,
          resolved.segments)
        val admission =
          try ResourceGroups.admitWithWaiter(g,
            PrestoStatements.queryPriority(spark)) { t =>
            PrestoSystem.registerParked(rec, g, t)
          } catch { case e: Throwable => // queue-full rejection
            PrestoSystem.failQueued(spark, rec,
              Option(e.getMessage).getOrElse("admission rejected"))
            throw e
          }
        admission match {
          case ResourceGroups.Run => ()
          case ResourceGroups.Queued(t) =>
            val granted =
              try ResourceGroups.awaitTicket(g, t, timeoutMillis)
              catch { case e: Throwable =>
                // interruption etc. — the ticket bookkeeping is
                // awaitTicket's, the record settling is ours
                PrestoSystem.failQueued(spark, rec,
                  Option(e.getMessage).getOrElse("park interrupted"))
                throw e
              } finally PrestoSystem.unregisterParked(rec)
            if (!granted)
              throw new IllegalStateException(
                PrestoSystem.failQueued(spark, rec,
                  "query did not start within " +
                    s"$timeoutMillis ms queued on group ${resolved.id}"))
        }
        try ResourceGroups.runGranted(spark, resolved, g)(body)
        finally PrestoSystem.dropPending(rec)
    }
}

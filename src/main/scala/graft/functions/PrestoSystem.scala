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
  * On a single-threaded driver every recorded query has already
  * finished by the time any later statement can observe it, so
  * kill_query's "not running" rejection is the common arm — exactly
  * the reference's race-checked path. On a MULTI-threaded driver the
  * kill is real: the router job-groups every routed statement
  * (interrupt-on-cancel), so `CALL system.runtime.kill_query` on a
  * RUNNING record cancels that job group from the calling thread and
  * the victim errs with the reference's `Query killed. Message: ...`
  * text (KillQueryProcedure.createKillQueryException:89-93). The same
  * cancellation path enforces an explicitly-SET
  * `query_max_execution_time` (QueryTracker.enforceTimeLimits:215).
  * Metadata-sized driver assembly throughout (the coordinator-local
  * SystemPageSourceProvider stance).
  */
private[functions] object PrestoSystem {

  private case class QRec(queryId: String, var state: String, user: String,
      source: String, resourceGroup: Option[Seq[String]],
      query: String, createdMs: Long, var endMs: Long,
      // real park time when StatementAdmission queued this statement
      // (QueryStats.getQueuedTime); 0 for unadmitted statements
      var queuedMs: Long = 0L,
      // failed straight out of the queue (kill/timeout/rejection):
      // started and analysis_time_ms render NULL — the reference's
      // executionStartTime for a never-started query
      var neverStarted: Boolean = false,
      // set by kill_query / the execution-time watchdog BEFORE the job
      // group is cancelled; the router rethrows the victim's
      // cancellation as this text (volatile: written by the killer
      // thread, read by the victim's catch)
      @volatile var killMessage: String = null,
      var watchdog: Option[java.util.concurrent.ScheduledFuture[_]] = None)

  // one daemon timer arms execution-time limits for all sessions;
  // per-statement tasks are cancelled in finish() AND removed from the
  // queue on cancel (removeOnCancelPolicy — without it a cancelled
  // task sits in the queue pinning its SparkSession until the full
  // limit elapses), so the queue stays bounded by in-flight statements
  private lazy val watchdogTimer = {
    val ex = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val t = new Thread(r, "graft-query-watchdog")
        t.setDaemon(true)
        t
      })
    ex.setRemoveOnCancelPolicy(true)
    ex
  }

  private val logs =
    new java.util.WeakHashMap[SparkSession, mutable.ArrayBuffer[QRec]]()
  private val counters = new java.util.WeakHashMap[SparkSession, Array[Int]]()

  private def log(spark: SparkSession): mutable.ArrayBuffer[QRec] =
    synchronized {
      logs.computeIfAbsent(spark, _ => mutable.ArrayBuffer.empty)
    }

  // Per-THREAD stack of pre-statement job-group properties (Spark job
  // groups are thread-local state), so the router RESTORES a
  // caller-set group (or an outer routed statement's) instead of
  // clearing it — clearing would break the caller's tasks-to-query
  // correlation and any cancellation by group id. A per-session map
  // would cross-wire concurrent statements on different threads.
  private val priorGroups =
    ThreadLocal.withInitial[mutable.Stack[(String, String, String)]](
      () => mutable.Stack.empty)

  /** Whether THIS thread is already inside a routed statement (the
    * per-thread job-group stack is non-empty between record and
    * clearGroup) — statement admission consults this so nested router
    * re-entries are not re-admitted. */
  def inStatement: Boolean = priorGroups.get().nonEmpty

  // The record StatementAdmission created at DISPATCH on this thread
  // (state QUEUED, visible in system.runtime.queries, killable);
  // record() transitions it to RUNNING instead of creating a second
  // entry — the reference's dispatcher registers a query once and
  // walks it through states the same way.
  private val pendingRec = ThreadLocal.withInitial[QRec](() => null)

  // QUEUED queryId → its parked (group state, ticket), so kill_query
  // can revoke the park (ResourceGroups.cancelWaiter). Guarded by this
  // object's lock, like the log.
  private val parked = mutable.Map.empty[String,
    (graft.plans.ResourceGroups.GroupState, Long)]

  // query ids recorded on each session — the split tap's ownership
  // probe (a shared SparkContext can host several sessions; one
  // session's listeners must not hear another session's splits).
  // Grows with the log, which already holds every id.
  private val queryIdIndex =
    new java.util.WeakHashMap[SparkSession, mutable.Set[String]]()

  /** Whether `queryId` was recorded on THIS session. O(1), called per
    * task end by the split tap. */
  def ownsQuery(spark: SparkSession, queryId: String): Boolean =
    synchronized {
      Option(queryIdIndex.get(spark)).exists(_.contains(queryId))
    }

  private def newRec(spark: SparkSession, sqlText: String, state: String,
      group: Option[Seq[String]]): QRec = {
    val n = counters.computeIfAbsent(spark, _ => Array(0))
    n(0) += 1
    val ts = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
      .format(new java.util.Date())
    val source = spark.conf.getOption("graft.source").orNull
    val rec = QRec(f"${ts}_${n(0)}%05d_graft", state,
      spark.sparkContext.sparkUser, source, group, sqlText.trim,
      System.currentTimeMillis(), 0L)
    queryIdIndex.computeIfAbsent(spark, _ => mutable.Set.empty)
      .add(rec.queryId)
    rec
  }

  /** Register a dispatched-but-not-yet-admitted statement: a QUEUED
    * row in system.runtime.queries (the reference's dispatcher
    * registers queued queries before they run — QueryState.QUEUED),
    * carrying its resolved group's segments. record() on this thread
    * transitions it to RUNNING. */
  def beginQueued(spark: SparkSession, sqlText: String,
      segments: Seq[String]): AnyRef = {
    val rec = synchronized {
      val r = newRec(spark, sqlText, "QUEUED", Some(segments))
      log(spark) += r
      pendingRec.set(r)
      r
    }
    maybeFireCreated(spark, rec) // outside the lock: plugin code
    rec
  }

  def registerParked(rec: AnyRef,
      g: graft.plans.ResourceGroups.GroupState, ticket: Long): Unit = {
    val killedAlready = synchronized {
      parked(rec.asInstanceOf[QRec].queryId) = (g, ticket)
      rec.asInstanceOf[QRec].killMessage != null
    }
    // a kill that landed in the beginQueued→park window found no park
    // to revoke — revoke it NOW so the waiter wakes immediately
    // instead of sitting out the whole queue timeout
    if (killedAlready)
      graft.plans.ResourceGroups.cancelWaiter(g, ticket)
  }

  def unregisterParked(rec: AnyRef): Unit = synchronized {
    parked -= rec.asInstanceOf[QRec].queryId
  }

  /** Defensive cleanup: drop the thread's pending record if it is
    * still `rec` (record() normally consumed it — this only matters if
    * the body failed before reaching record()). */
  def dropPending(rec: AnyRef): Unit =
    if (pendingRec.get() eq rec) pendingRec.remove()

  /** Settle a QUEUED record that never reached RUNNING (queue-full,
    * park timeout, or a kill while parked): FAILED, the park charged
    * as queued time. Returns the effective failure text — the kill
    * text when a kill caused it, `default` otherwise — after firing
    * queryCompleted with it. */
  def failQueued(spark: SparkSession, rec: AnyRef,
      default: => String): String = {
    val (r, text) = synchronized {
      val r = rec.asInstanceOf[QRec]
      pendingRec.remove()
      r.endMs = System.currentTimeMillis()
      r.queuedMs = r.endMs - r.createdMs
      r.neverStarted = true
      r.state = "FAILED"
      (r, Option(r.killMessage).getOrElse(default))
    }
    maybeFireCompleted(spark, r, Some(text), failureType = None)
    text
  }

  /** Record a statement entering the router; returns the record for
    * completion marking. Query ids follow the reference's
    * yyyyMMdd_HHmmss_index_suffix shape. */
  def record(spark: SparkSession, sqlText: String): AnyRef = {
    val (rec, fresh) = recordSync(spark, sqlText)
    if (fresh) maybeFireCreated(spark, rec) // outside the lock
    rec
  }

  private def recordSync(spark: SparkSession,
      sqlText: String): (QRec, Boolean) = synchronized {
    // a record StatementAdmission dispatched on this thread transitions
    // QUEUED → RUNNING (its park becomes the queued time); otherwise a
    // fresh RUNNING record. Fresh path: source is the client-provided
    // tag (Session.getSource — NULL when the client sent none); a
    // statement running inside ResourceGroups.withGroup logs the
    // group's SEGMENT LIST from the wrapper's own local property (set
    // only by the admission machinery, so a pool the CALLER set for
    // ordinary fair scheduling never renders as a group — the
    // reference reports NULL for a query never admitted to one;
    // segments carried as a list, never re-split from the dotted pool
    // name, so an expanded template segment containing a dot survives
    // — ResourceGroupId.java carries segment lists too).
    val pending = pendingRec.get()
    val rec = if (pending != null) {
      pendingRec.remove()
      pending.queuedMs = System.currentTimeMillis() - pending.createdMs
      pending.state = "RUNNING"
      pending
    } else {
      val group = Option(spark.sparkContext.getLocalProperty(
        graft.plans.ResourceGroups.segmentsProperty))
        .map(_.split("\u0000").toSeq)
      val r = newRec(spark, sqlText, "RUNNING", group)
      log(spark) += r
      r
    }
    // job-group the statement so system.runtime.tasks can correlate
    // its stage rows back to this query id (the reference's query_id
    // column; Spark's own grouping mechanism). The pre-existing group
    // properties are captured for [[clearGroup]] to restore.
    val sc = spark.sparkContext
    priorGroups.get().push((
      sc.getLocalProperty("spark.jobGroup.id"),
      sc.getLocalProperty("spark.job.description"),
      sc.getLocalProperty("spark.job.interruptOnCancel")))
    // interruptOnCancel so a kill reaches task threads mid-compute —
    // the reference's failQuery aborts the victim's tasks the same way
    sc.setJobGroup(rec.queryId, sqlText.trim.take(120),
      interruptOnCancel = true)
    // arm the time limits ONLY when the session explicitly SET them
    // (the 100-day defaults never need a timer per statement)
    armTimeLimits(spark, rec)
    (rec, pending == null)
  }

  /** QueryTracker.enforceTimeLimits:213-219 for explicitly-SET limits:
    * a daemon timer cancels the statement's job group with the
    * reference's text — query_max_execution_time counts from the
    * statement entering the router, query_max_run_time from DISPATCH
    * (it "includes the queueing time": an admission park already
    * consumed part of the budget, so its delay is shortened by the
    * queued duration — a statement that out-queued its run-time limit
    * is killed immediately). Scope: the limits govern work executed
    * INSIDE the statement bracket — eager statements (CTAS/INSERT/DDL,
    * every gate's internal collect). A plain SELECT returns a LAZY
    * DataFrame whose jobs run at the caller's action, outside the
    * bracket; a library has no dispatcher owning that lifecycle, so
    * those jobs are the caller's to cancel. Within the bracket the
    * kill IS final: `cancelJobGroupAndFutureJobs` both cancels active
    * jobs and fails any later submission under the query's group, so
    * a killed multi-job statement never computes its next stage —
    * the reference's failQuery finality. */
  private def armTimeLimits(spark: SparkSession, rec: QRec): Unit = {
    val explicit = PrestoStatements.explicitSessionProps(spark)
    def arm(prop: String, alreadySpentMs: Long, text: String => String):
        Option[java.util.concurrent.ScheduledFuture[_]] = {
      if (!explicit.contains(prop)) return None
      val value = PrestoStatements.sessionPropValue(spark, prop)
      val millis = (graft.plans.ResourceGroups
        .parseDurationSecs(value) * 1000).toLong
      // airlift Duration.toString of the session value ("2s" → "2.00s")
      val rendered = """^\s*([\d.]+)\s*([a-zA-Z]+)\s*$""".r
        .findFirstMatchIn(value)
        .map(m => f"${m.group(1).toDouble}%.2f${m.group(2)}")
        .getOrElse(value)
      Some(watchdogTimer.schedule(new Runnable {
        override def run(): Unit = {
          val running = PrestoSystem.synchronized(rec.state == "RUNNING")
          if (running) {
            rec.killMessage = text(rendered)
            // AndFutureJobs: the limit is final like the reference's
            // failQuery — a multi-job statement's NEXT submission under
            // this group fails immediately instead of computing
            spark.sparkContext.cancelJobGroupAndFutureJobs(rec.queryId)
          }
        }
      }, math.max(0L, millis - alreadySpentMs),
        java.util.concurrent.TimeUnit.MILLISECONDS))
    }
    val exec = arm("query_max_execution_time", 0L,
      d => s"Query exceeded the maximum execution time limit of $d")
    val run = arm("query_max_run_time", rec.queuedMs,
      d => s"Query exceeded maximum time limit of $d")
    // one watchdog slot suffices: keep the one that fires FIRST (both
    // kill the same statement with their own text)
    rec.watchdog = (exec.toSeq ++ run.toSeq)
      .sortBy(_.getDelay(java.util.concurrent.TimeUnit.MILLISECONDS))
      .headOption match {
      case Some(first) =>
        (exec.toSeq ++ run.toSeq).filter(_ ne first)
          .foreach(_.cancel(false))
        Some(first)
      case None => None
    }
  }

  def finish(spark: SparkSession, rec: AnyRef, failed: Boolean,
      failure: Option[Throwable] = None): Unit = {
    val r = rec.asInstanceOf[QRec]
    val settledNow = synchronized {
      // idempotent on an already-settled record (finishSuccess settles
      // then THROWS the kill text, and the router's catch finishes
      // again — without this guard that path would double-fire the
      // queryCompleted plugin event and move endMs)
      if (r.state != "RUNNING" && r.state != "QUEUED") false
      else {
        // a kill that landed is authoritative even on the success
        // path — never downgrade FAILED back to FINISHED
        r.state =
          if (failed || r.killMessage != null) "FAILED" else "FINISHED"
        r.endMs = System.currentTimeMillis()
        r.watchdog.foreach(_.cancel(false))
        r.watchdog = None
        true
      }
    }
    // outside the lock: plugin code + a status-store read
    if (settledNow)
      maybeFireCompleted(spark, r,
        Option(r.killMessage).orElse(failure.flatMap(e =>
          Option(e.getMessage))),
        failureType = failure.map(_.getClass.getSimpleName))
  }

  /** The success-path completion: kill_query sets killMessage under
    * THIS lock after verifying the record is RUNNING, and this
    * transition runs under the same lock — so a kill either finds the
    * statement still RUNNING and wins (the victim then throws HERE,
    * even when its jobs dodged the job-group cancellation by finishing
    * first or never being submitted) or loses cleanly to a completed
    * statement (kill_query then reports "not running"). No third
    * interleaving exists; the reference's failQuery is authoritative
    * the same way. */
  def finishSuccess(spark: SparkSession, rec: AnyRef): Unit = {
    val r = rec.asInstanceOf[QRec]
    val msg = synchronized {
      // kill check and state transition under ONE lock hold — a kill
      // landing between them could otherwise slip a FINISHED through
      val m = r.killMessage
      r.state = if (m != null) "FAILED" else "FINISHED"
      r.endMs = System.currentTimeMillis()
      r.watchdog.foreach(_.cancel(false))
      r.watchdog = None
      m
    }
    maybeFireCompleted(spark, r, Option(msg), failureType = None)
    if (msg != null) throw new RuntimeException(msg)
  }

  // ——— EventListener SPI feed (plans/QueryEvents.scala) ———————————————
  // Every assembly is guarded by hasListeners: sessions with no
  // registered listener pay nothing — no catalog reads, no status-store
  // flush. Dispatch isolates plugin failures (QueryEvents.isolate).

  import graft.plans.QueryEvents

  private def contextOf(spark: SparkSession,
      r: QRec): QueryEvents.QueryContext = {
    val tags = StatementAdmission.clientTags(spark)
    val props = PrestoStatements.explicitSessionProps(spark)
      .map(n => n -> PrestoStatements.sessionPropValue(spark, n)).toMap
    QueryEvents.QueryContext(
      user = r.user,
      principal = None,
      source = Option(r.source),
      clientTags = tags,
      catalog = Some(spark.catalog.currentCatalog()),
      schema = Some(spark.catalog.currentDatabase),
      resourceGroupId = r.resourceGroup,
      sessionProperties = props,
      serverVersion = spark.version,
      environment = spark.conf.getOption("graft.environment")
        .getOrElse("production"))
  }

  private def maybeFireCreated(spark: SparkSession, r: QRec): Unit =
    if (QueryEvents.hasListeners(spark))
      QueryEvents.fireCreated(spark, QueryEvents.QueryCreatedEvent(
        java.time.Instant.ofEpochMilli(r.createdMs),
        contextOf(spark, r),
        QueryEvents.QueryMetadata(r.queryId, r.query, r.state)))

  private def maybeFireCompleted(spark: SparkSession, r: QRec,
      failure: Option[String], failureType: Option[String]): Unit =
    if (QueryEvents.hasListeners(spark)) {
      // REAL stage aggregates for this statement's job group — the
      // same status-store correlation system.runtime.tasks serves. A
      // never-started record (queue-full/park-timeout/queued-kill)
      // provably has no stages: skip the bus drain + store scan.
      val mine =
        if (r.neverStarted)
          Seq.empty[org.apache.spark.status.api.v1.StageData]
        else {
          val sc = spark.sparkContext
          org.apache.spark.graft.StatusBridge.flush(sc)
          val groups = org.apache.spark.graft.StatusBridge.stageGroups(sc)
          org.apache.spark.graft.StatusBridge.stages(sc)
            .filter(s => groups.get(s.stageId).contains(r.queryId))
        }
      // task-granular gauges (QueryStatistics.java:35,:46): per-task
      // metrics for the statement's stage attempts, read once each
      val stageTasks = mine.map(s => (s,
        org.apache.spark.graft.StatusBridge.taskMetrics(
          spark.sparkContext, s.stageId, s.attemptId)))
      // one GC row per stage attempt that actually RAN tasks — a
      // skipped stage (AQE exchange reuse) has none, and the reference
      // only aggregates executed stages
      // the reference's exact aggregation arithmetic
      // (StageExecutionStateMachine.java:372-437): per-task seconds
      // ROUNDED (airlift roundTo), min/max fold from an initial 0 (so
      // min never exceeds 0 — replicated verbatim, not "fixed"), the
      // task count is GC-occurrence-based; the average divides by the
      // GC-ing task count (Spark serves GC TIME, not GC counts — the
      // closest analog of the reference's fullGcCount divisor)
      val gcStats = stageTasks.filter(_._2.nonEmpty).map { case (s, tms) =>
        val secs = tms.map(tm => ((tm.jvmGcTime + 500L) / 1000L).toInt)
        val gcTasks = tms.count(_.jvmGcTime > 0L)
        QueryEvents.StageGcStatistics(
          stageId = s.stageId,
          stageExecutionId = s.attemptId,
          tasks = tms.size,
          fullGcTasks = gcTasks,
          minFullGcSec = math.min(0, secs.min),
          maxFullGcSec = math.max(0, secs.max),
          totalFullGcSec = secs.sum,
          averageFullGcSec =
            if (gcTasks == 0) 0 else secs.sum / gcTasks)
      }
      val stats = QueryEvents.QueryStatistics(
        cpuTimeMillis = mine.map(_.executorCpuTime).sum / 1000000L,
        wallTimeMillis = math.max(0L, r.endMs - r.createdMs),
        queuedTimeMillis = r.queuedMs,
        analysisTimeMillis =
          if (r.neverStarted) None
          else Some(math.max(0L, r.endMs - r.createdMs - r.queuedMs)),
        peakTaskTotalMemory = stageTasks.flatMap(_._2)
          .map(_.peakExecutionMemory).foldLeft(0L)(math.max),
        totalRows = mine.map(_.inputRecords).sum,
        totalBytes = mine.map(_.inputBytes).sum,
        outputRows = mine.map(_.outputRecords).sum,
        outputBytes = mine.map(_.outputBytes).sum,
        stageGcStatistics = gcStats,
        completedSplits = mine.map(_.numCompleteTasks).sum,
        complete = r.state == "FINISHED")
      QueryEvents.fireCompleted(spark, QueryEvents.QueryCompletedEvent(
        QueryEvents.QueryMetadata(r.queryId, r.query, r.state),
        stats,
        contextOf(spark, r),
        if (failure.isEmpty && failureType.isEmpty) None
        else Some(QueryEvents.QueryFailureInfo(failureType, failure)),
        java.time.Instant.ofEpochMilli(r.createdMs),
        if (r.neverStarted) None
        else Some(java.time.Instant.ofEpochMilli(
          r.createdMs + r.queuedMs)),
        java.time.Instant.ofEpochMilli(r.endMs)))
    }

  /** The victim side of a kill: when this statement's record carries a
    * kill message (kill_query or the execution-time watchdog set it
    * before cancelling the job group), the raised error is the
    * reference's text, carrying Spark's cancellation as cause. */
  def failureFor(rec: AnyRef, e: Throwable): Throwable = {
    val msg = rec.asInstanceOf[QRec].killMessage
    if (msg == null) e else new RuntimeException(msg, e)
  }

  /** Restore the pre-statement job group (paired with [[record]], on
    * the SAME thread): a caller-set group — or an outer routed
    * statement's — survives the inner statement instead of being
    * cleared mid-flight. */
  def clearGroup(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    val st = priorGroups.get()
    if (st.nonEmpty) {
      val (gid, desc, interrupt) = st.pop()
      sc.setLocalProperty("spark.jobGroup.id", gid)
      sc.setLocalProperty("spark.job.description", desc)
      sc.setLocalProperty("spark.job.interruptOnCancel", interrupt)
    } else sc.clearJobGroup()
  }

  // ——— queryable system tables ————————————————————————————————————————

  private val sysRe =
    ("""(?i)\bsystem\s*\.\s*""" +
      """(?:(runtime)\s*\.\s*(nodes|queries|tasks|transactions)""" +
      """|(metadata)\s*\.\s*(catalogs|table_properties""" +
      """|schema_properties|column_properties|analyze_properties)""" +
      """|(jdbc)\s*\.\s*(catalogs|schemas|tables|columns|types""" +
      """|table_types|procedures|procedure_columns|pseudo_columns""" +
      """|super_tables|super_types|udts|attributes))\b""").r

  // Hive-connector table-suffix system tables ("t$partitions" /
  // "t$properties", HiveMetadata.java:407-415 + SystemTableHandler:
  // 2788-2811). The $ forces the quoted spelling, so the rewrite only
  // needs the double-quoted form — exactly what the reference's
  // grammar produces for these names.
  private val hiveSysRe =
    """"([A-Za-z_][A-Za-z0-9_]*)\$(partitions|properties)"""".r

  /** Rewrite "t$partitions" / "t$properties" (outside string literals)
    * to catalog-metadata temp views — the Hive connector's
    * getSystemTable path: $partitions lists the table's partition
    * VALUES typed per the table schema (getPartitionsSystemTable —
    * metadata only, no data scan), $properties is one row of the
    * table's parameters with columns sorted by key
    * (getPropertiesSystemTable). A $partitions suffix on a
    * non-partitioned table is unresolved, like the reference's
    * Optional.empty(). */
  private def rewriteHiveSystemTables(spark: SparkSession,
      q: String): String = {
    val mask = PrestoRewrite.stringMask(q)
    val ms = hiveSysRe.findAllMatchIn(q).filter(m => !mask(m.start)).toList
    if (ms.isEmpty) return q
    val sb = new StringBuilder
    var pos = 0
    ms.foreach { m =>
      val (table, kind) = (m.group(1), m.group(2))
      val view = s"graft_hsys_${table.toLowerCase}_$kind"
      if (kind == "partitions") {
        val partCols = spark.catalog.listColumns(table).collect()
          .filter(_.isPartition).map(_.name)
        if (partCols.isEmpty)
          sys.error(s"Table '$table$$partitions' does not exist")
        val types = spark.table(table).schema
          .filter(f => partCols.contains(f.name))
          .map(f => f.name -> f.dataType.sql).toMap
        // SHOW PARTITIONS is a catalog listing — zero file I/O, the
        // reference's metastore-served system table
        val rows = spark.sql(s"SHOW PARTITIONS $table").collect()
          .map(_.getString(0))
        import spark.implicits._
        val parsed = rows.toSeq.toDF("p")
        val cols = partCols.map { c =>
          // Hive path escaping is %xx only; url_decode ALSO folds '+'
          // to space, so a literal '+' in a partition value (a zone
          // offset, a version tag) must be shielded first
          org.apache.spark.sql.functions.expr(
            s"""CAST(url_decode(replace(regexp_extract(p,
               |  '(?:^|/)${c}=([^/]*)', 1), '+', '%2B'))
               |  AS ${types(c)})"""
              .stripMargin.replace("\n", " ")).as(c)
        }
        parsed.select(cols.toSeq: _*).createOrReplaceTempView(view)
      } else {
        // the reference rejects views here
        // (getPropertiesSystemTable:421-423 — absent table OR
        // VIRTUAL_VIEW throws TableNotFoundException)
        if (spark.catalog.tableExists(table) &&
            spark.catalog.getTable(table).tableType == "VIEW")
          sys.error(s"Table '$table$$properties' does not exist")
        val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
          .map(r => r.getString(0) -> r.getString(1))
          .sortBy(_._1)
        val schema = org.apache.spark.sql.types.StructType(props.map {
          case (k, _) => org.apache.spark.sql.types.StructField(
            k, org.apache.spark.sql.types.StringType)
        })
        val row = org.apache.spark.sql.Row.fromSeq(props.map(_._2).toSeq)
        spark.createDataFrame(
          java.util.Collections.singletonList(row), schema)
          .createOrReplaceTempView(view)
      }
      sb.append(q.substring(pos, m.start)).append(view)
      pos = m.end
    }
    sb.append(q.substring(pos))
    sb.toString
  }

  /** Rewrite system.runtime.nodes / system.runtime.queries /
    * system.metadata.catalogs (outside string literals) to refreshed
    * temp views. No-op when the query never mentions them. */
  def rewriteSystemTables(spark: SparkSession, q0: String): String = {
    val q = rewriteHiveSystemTables(spark, q0)
    val mask = PrestoRewrite.stringMask(q)
    val ms = sysRe.findAllMatchIn(q).filter(m => !mask(m.start)).toList
    if (ms.isEmpty) q
    else {
      // the (?i) match preserves the query's case; keys and view names
      // are lowercase (the reference's identifiers are case-insensitive)
      def key(m: scala.util.matching.Regex.Match): String =
        Option(m.group(2)).map("runtime_" + _.toLowerCase)
          .orElse(Option(m.group(4)).map("metadata_" + _.toLowerCase))
          .getOrElse("jdbc_" + m.group(6).toLowerCase)
      refresh(spark, ms.map(key).toSet)
      val sb = new StringBuilder
      var pos = 0
      ms.foreach { m =>
        sb.append(q.substring(pos, m.start))
        sb.append("graft_system_").append(key(m))
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
      // QuerySystemTable.java:56-71 — the reference's FULL 12-column
      // layout in its column order. Library renderings: created is
      // DISPATCH time; queued_time_ms is the REAL admission park (live
      // and growing for a still-QUEUED row, 0 for unadmitted
      // statements); started = created + queued (NULL while queued);
      // analysis_time_ms is the router's record→finish span (the
      // statement's parse/rewrite/plan work — execution is lazy in
      // Spark and lands on the reader); last_heartbeat is the newest
      // update we hold (end when settled).
      val rows = synchronized { log(spark).toSeq.map { r =>
        def t(ms: Long): java.sql.Timestamp =
          if (ms == 0L) null else new java.sql.Timestamp(ms)
        val queuedNow =
          if (r.state == "QUEUED")
            System.currentTimeMillis() - r.createdMs
          else r.queuedMs
        org.apache.spark.sql.Row(
          r.queryId, r.state, r.user, r.source, r.query,
          r.resourceGroup.orNull,
          queuedNow,
          if (r.endMs == 0L || r.state == "QUEUED" || r.neverStarted)
            null
          else
            java.lang.Long.valueOf(r.endMs - r.createdMs - r.queuedMs),
          t(r.createdMs),
          if (r.state == "QUEUED" || r.neverStarted) null
          else t(r.createdMs + r.queuedMs),
          if (r.endMs == 0L) t(r.createdMs) else t(r.endMs),
          t(r.endMs))
      }}
      val schema = {
        import org.apache.spark.sql.types._
        StructType(Seq(
          StructField("query_id", StringType),
          StructField("state", StringType),
          StructField("user", StringType),
          StructField("source", StringType),
          StructField("query", StringType),
          StructField("resource_group_id", ArrayType(StringType)),
          StructField("queued_time_ms", LongType),
          StructField("analysis_time_ms", LongType),
          StructField("created", TimestampType),
          StructField("started", TimestampType),
          StructField("last_heartbeat", TimestampType),
          StructField("end", TimestampType)))
      }
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .createOrReplaceTempView("graft_system_runtime_queries")
    }
    if (which("runtime_tasks")) {
      // TaskSystemTable.java:47-80 — the reference's FULL 24-column
      // layout, in its column order. Library rendering: one row per
      // Spark STAGE ATTEMPT from Spark's own status store (a Presto
      // task's operator pipeline maps onto a Spark stage; the store is
      // what the UI/REST API serve). The listener bus drains first
      // (timeout-tolerant — the table serves a snapshot, never errors)
      // so a just-finished query's stages are visible. query_id
      // correlates through the job group the statement router sets per
      // routed statement (stages run outside the router read NULL);
      // states render in the reference's TaskState vocabulary. I/O
      // mappings: raw input = the stage's source-scan volume
      // (TaskStats.rawInputDataSize — what the connector handed over);
      // processed input = everything the pipeline consumed, scans plus
      // exchange reads (processedInputDataSize); output = what the task
      // handed downstream (shuffle write) plus final storage writes;
      // physical written = storage bytes alone (physicalWrittenDataSize);
      // blocked time = the one blocking Spark meters per stage, shuffle
      // fetch wait. completionTime is the task's END (the reference's
      // endTime); last_heartbeat renders the newest status-store
      // update we hold for the stage — end when finished, else launch/
      // submission (the reference's lastHeartbeat is likewise "most
      // recent status update").
      org.apache.spark.graft.StatusBridge.flush(spark.sparkContext)
      val groups =
        org.apache.spark.graft.StatusBridge.stageGroups(spark.sparkContext)
      def ts(d: Option[java.util.Date]): java.sql.Timestamp =
        d.map(x => new java.sql.Timestamp(x.getTime)).orNull
      val rows = org.apache.spark.graft.StatusBridge
        .stages(spark.sparkContext).map { st =>
          val queued = math.max(0, st.numTasks - st.numActiveTasks -
            st.numCompleteTasks - st.numFailedTasks -
            st.numKilledTasks).toLong
          val qid = groups.get(st.stageId).orNull
          // Spark StageStatus → the reference's TaskState names
          // (TaskState.java): a SKIPPED stage's work was avoided and
          // will never run — CANCELED is the closest member
          val state = String.valueOf(st.status) match {
            case "ACTIVE" => "RUNNING"
            case "COMPLETE" => "FINISHED"
            case "PENDING" => "PLANNED"
            case "SKIPPED" => "CANCELED"
            case other => other // FAILED
          }
          val end = ts(st.completionTime)
          val heartbeat = Option(end)
            .getOrElse(Option(ts(st.firstTaskLaunchedTime))
              .getOrElse(ts(st.submissionTime)))
          org.apache.spark.sql.Row(
            "local",
            (Option(qid).toSeq :+ s"${st.stageId}.${st.attemptId}")
              .mkString("."),
            s"${st.stageId}.${st.attemptId}",
            st.stageId.toString,
            qid,
            state,
            st.numTasks.toLong, queued, st.numActiveTasks.toLong,
            st.numCompleteTasks.toLong,
            st.executorRunTime, st.executorCpuTime / 1000000L,
            st.shuffleFetchWaitTime,
            st.inputBytes, st.inputRecords,
            st.inputBytes + st.shuffleReadBytes,
            st.inputRecords + st.shuffleReadRecords,
            st.shuffleWriteBytes + st.outputBytes,
            st.shuffleWriteRecords + st.outputRecords,
            st.outputBytes,
            ts(st.submissionTime), ts(st.firstTaskLaunchedTime),
            heartbeat, end)
        }
      val schema = {
        import org.apache.spark.sql.types._
        StructType(Seq(
          StructField("node_id", StringType),
          StructField("task_id", StringType),
          StructField("stage_execution_id", StringType),
          StructField("stage_id", StringType),
          StructField("query_id", StringType),
          StructField("state", StringType),
          StructField("splits", LongType),
          StructField("queued_splits", LongType),
          StructField("running_splits", LongType),
          StructField("completed_splits", LongType),
          StructField("split_scheduled_time_ms", LongType),
          StructField("split_cpu_time_ms", LongType),
          StructField("split_blocked_time_ms", LongType),
          StructField("raw_input_bytes", LongType),
          StructField("raw_input_rows", LongType),
          StructField("processed_input_bytes", LongType),
          StructField("processed_input_rows", LongType),
          StructField("output_bytes", LongType),
          StructField("output_rows", LongType),
          StructField("physical_written_bytes", LongType),
          StructField("created", TimestampType),
          StructField("start", TimestampType),
          StructField("last_heartbeat", TimestampType),
          StructField("end", TimestampType)))
      }
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
        .createOrReplaceTempView("graft_system_runtime_tasks")
    }
    if (which("runtime_transactions")) {
      // TransactionsSystemTable.java:60-69 — the active-transaction
      // registry. The engine's documented transaction stance is
      // autocommit no-ops (qq0: every statement commits on success, the
      // reference's non-transactional-connector behavior), so between
      // statements there is never an open transaction to list: the
      // honest rendering is the EMPTY relation with the reference's
      // schema, not a missing table (the column_properties stance).
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("transaction_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("isolation_level",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("read_only",
          org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("auto_commit_context",
          org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("create_time",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("idle_time_secs",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("written_catalog",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("catalogs",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType))))
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        schema)
        .createOrReplaceTempView("graft_system_runtime_transactions")
    }
    if (which("metadata_catalogs")) {
      val cat = spark.catalog.currentCatalog()
      Seq((cat, cat)).toDF("catalog_name", "connector_id")
        .createOrReplaceTempView("graft_system_metadata_catalogs")
    }
    // system.metadata.{table,schema,column,analyze}_properties
    // (AbstractPropertiesSystemTable.java:35-41,78-92: catalog_name/
    // property_name/default_value/type/description, catalogs and
    // properties each in sorted order, null defaults rendered "").
    // The rows ARE the engine's live registries: table properties are
    // what maybeCreateTableWith accepts (HiveTableProperties.java:
    // 42-51 with the reference's defaults — ORC storage format per
    // HiveClientConfig.java:86, fpp 0.05 per :109), schema properties
    // the CREATE SCHEMA location (HiveSchemaProperties.java:29-34),
    // analyze properties ANALYZE's partitions list
    // (HiveAnalyzeProperties.java:45-48), and hive registers no column
    // properties — an empty relation, not a missing table.
    def propsView(name: String,
        rows: Seq[(String, String, String, String)]): Unit = {
      val cat = spark.catalog.currentCatalog()
      val schema = org.apache.spark.sql.types.StructType(
        Seq("catalog_name", "property_name", "default_value", "type",
          "description").map(org.apache.spark.sql.types.StructField(_,
          org.apache.spark.sql.types.StringType)))
      val data = rows.sortBy(_._1).map { case (n, d, t, desc) =>
        org.apache.spark.sql.Row(cat, n, d, t, desc) }
      spark.createDataFrame(
        java.util.Arrays.asList(data: _*), schema)
        .createOrReplaceTempView(s"graft_system_metadata_$name")
    }
    if (which("metadata_table_properties")) propsView("table_properties",
      Seq(
        ("avro_schema_url", "", "varchar",
          "URI pointing to Avro schema for the table"),
        ("bucket_count", "0", "integer", "Number of buckets"),
        ("bucketed_by", "[]", "array(varchar)", "Bucketing columns"),
        ("external_location", "", "varchar",
          "File system location URI for external table"),
        ("format", "ORC", "varchar", "Hive storage format for the table"),
        ("orc_bloom_filter_columns", "[]", "array(varchar)",
          "ORC Bloom filter index columns"),
        ("orc_bloom_filter_fpp", "0.05", "double",
          "ORC Bloom filter false positive probability"),
        ("partitioned_by", "[]", "array(varchar)", "Partition columns"),
        ("preferred_ordering_columns", "[]", "array(varchar)",
          "Preferred ordering columns for unbucketed table"),
        ("sorted_by", "[]", "array(varchar)", "Bucket sorting columns")))
    if (which("metadata_schema_properties")) propsView("schema_properties",
      Seq(("location", "", "varchar", "Base file system location URI")))
    if (which("metadata_column_properties"))
      propsView("column_properties", Seq.empty)
    if (which("metadata_analyze_properties"))
      propsView("analyze_properties",
        Seq(("partitions", "", "array(array(varchar))",
          "Partitions to be analyzed")))
    refreshJdbc(spark, which)
  }

  // ——— system.jdbc.* — the java.sql.DatabaseMetaData surface —————————
  //
  // presto-main/.../connector/system/jdbc/ — the table set a JDBC
  // driver's getCatalogs/getSchemas/getTables/getColumns/getTypeInfo
  // calls read. Column sets replay the reference's builders verbatim
  // (CatalogJdbcTable.java:42, SchemaJdbcTable.java:46-47,
  // TableJdbcTable.java:50-59, ColumnJdbcTable.java:74-97,
  // TypesJdbcTable.java:49-66, TableTypeJdbcTable.java:33 and the five
  // always-empty tables Presto serves for completeness:
  // ProcedureJdbcTable/ProcedureColumnJdbcTable/PseudoColumnJdbcTable/
  // SuperTableJdbcTable/SuperTypeJdbcTable/UdtJdbcTable/
  // AttributeJdbcTable — their cursors add no rows). The reference's
  // FilterUtil pushes single-value catalog/schema/table constraints
  // into the cursor; here the views are metadata-sized snapshots and
  // Spark's own filter pushdown does the pruning over them — same
  // effect, no data scan either way.

  /** Spark type → the reference's JDBC metadata five-tuple:
    * (java.sql.Types code, column_size, decimal_digits, num_prec_radix,
    * char_octet_length) — `ColumnJdbcTable.java:169-310` verbatim,
    * through the engine's Spark↔Presto type mapping (TIMESTAMP rides
    * NTZ, TIMESTAMP WITH TIME ZONE rides session-TZ TimestampType). */
  private def jdbcTypeInfo(dt: org.apache.spark.sql.types.DataType):
      (Int, Option[Int], Option[Int], Option[Int], Option[Int]) = {
    import org.apache.spark.sql.types._
    import java.sql.Types
    dt match {
      case BooleanType => (Types.BOOLEAN, None, None, None, None)
      case LongType => (Types.BIGINT, Some(19), None, Some(10), None)
      case IntegerType => (Types.INTEGER, Some(10), None, Some(10), None)
      case ShortType => (Types.SMALLINT, Some(5), None, Some(10), None)
      case ByteType => (Types.TINYINT, Some(3), None, Some(10), None)
      case FloatType => (Types.REAL, Some(24), None, Some(2), None)
      case DoubleType => (Types.DOUBLE, Some(53), None, Some(2), None)
      case d: DecimalType =>
        (Types.DECIMAL, Some(d.precision), Some(d.scale), Some(10), None)
      case StringType => // unbounded varchar: VarcharType.UNBOUNDED_LENGTH
        (Types.VARCHAR, Some(Int.MaxValue), None, None, Some(Int.MaxValue))
      case c: CharType =>
        (Types.CHAR, Some(c.length), None, None, Some(c.length))
      case v: VarcharType =>
        (Types.VARCHAR, Some(v.length), None, None, Some(v.length))
      case BinaryType =>
        (Types.VARBINARY, Some(Int.MaxValue), None, None, Some(Int.MaxValue))
      case DateType => (Types.DATE, Some(14), None, None, None)
      case TimestampNTZType => (Types.TIMESTAMP, Some(23), None, None, None)
      case TimestampType =>
        (Types.TIMESTAMP_WITH_TIMEZONE, Some(29), None, None, None)
      case _: ArrayType => (Types.ARRAY, None, None, None, None)
      case _ => (Types.JAVA_OBJECT, None, None, None, None)
    }
  }

  private def rowsDf(spark: SparkSession, cols: Seq[(String,
      org.apache.spark.sql.types.DataType)],
      rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(cols.map {
      case (n, t) => org.apache.spark.sql.types.StructField(n, t) })
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def refreshJdbc(spark: SparkSession, which: Set[String]): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType => BoolT,
      LongType => LongT, StringType => StrT}
    val S = StrT; val L = LongT
    val cat = spark.catalog.currentCatalog()
    val curDb = spark.catalog.currentDatabase
    def view(name: String, df: DataFrame): Unit =
      df.createOrReplaceTempView(s"graft_system_jdbc_$name")
    // (db, table name, "TABLE"|"VIEW", isTemp) across every schema —
    // catalog listings only, metadata-sized at any corpus (the
    // reference's MetadataListing.listTables walks connector metadata
    // the same way)
    lazy val allTables: Seq[(String, String, String, Boolean)] = {
      val perDb = spark.catalog.listDatabases().collect().toSeq
        .flatMap(d => spark.catalog.listTables(d.name).collect())
      val temps = spark.catalog.listTables().collect()
        .filter(_.isTemporary)
      (perDb ++ temps).map { t =>
        val db = Option(t.database).filter(_.nonEmpty).getOrElse(curDb)
        val typ =
          if (t.tableType == "VIEW" || t.isTemporary) "VIEW" else "TABLE"
        (db, t.name, typ, t.isTemporary)
      }.distinct.sortBy(r => (r._1, r._2))
    }
    if (which("jdbc_catalogs"))
      view("catalogs", rowsDf(spark, Seq("table_cat" -> S),
        Seq(Row(cat))))
    if (which("jdbc_schemas"))
      view("schemas", rowsDf(spark,
        Seq("table_schem" -> S, "table_catalog" -> S),
        (spark.catalog.listDatabases().collect().map(_.name).toSeq
          :+ "information_schema").distinct.sorted.map(Row(_, cat))))
    if (which("jdbc_tables"))
      view("tables", rowsDf(spark,
        Seq("table_cat" -> S, "table_schem" -> S, "table_name" -> S,
          "table_type" -> S, "remarks" -> S, "type_cat" -> S,
          "type_schem" -> S, "type_name" -> S,
          "self_referencing_col_name" -> S, "ref_generation" -> S),
        allTables.map { case (db, n, typ, _) =>
          Row(cat, db, n, typ, null, null, null, null, null, null) }))
    if (which("jdbc_columns")) {
      val rows = allTables.flatMap { case (db, n, _, isTemp) =>
        val ident = if (isTemp) s"`$n`" else s"`$db`.`$n`"
        // a table whose storage is gone still lists in jdbc.tables;
        // its columns are simply absent (the reference skips tables
        // listTableColumns cannot resolve the same way)
        scala.util.Try(spark.table(ident).schema).toOption.toSeq
          .flatMap(_.fields.toSeq.zipWithIndex.map { case (f, i) =>
            val (jt, size, digits, radix, octets) = jdbcTypeInfo(f.dataType)
            def l(o: Option[Int]): Any =
              o.map(v => java.lang.Long.valueOf(v.toLong)).orNull
            Row(cat, db, n, f.name, jt.toLong,
              PrestoStatements.prestoTypeName(f.dataType),
              l(size), 0L, l(digits), l(radix),
              java.sql.DatabaseMetaData.columnNullableUnknown.toLong,
              f.getComment().orNull, null, null, null, l(octets),
              (i + 1).toLong, "", null, null, null, null, null, null)
          })
      }
      view("columns", rowsDf(spark,
        Seq("table_cat" -> S, "table_schem" -> S, "table_name" -> S,
          "column_name" -> S, "data_type" -> L, "type_name" -> S,
          "column_size" -> L, "buffer_length" -> L,
          "decimal_digits" -> L, "num_prec_radix" -> L,
          "nullable" -> L, "remarks" -> S, "column_def" -> S,
          "sql_data_type" -> L, "sql_datetime_sub" -> L,
          "char_octet_length" -> L, "ordinal_position" -> L,
          "is_nullable" -> S, "scope_catalog" -> S,
          "scope_schema" -> S, "scope_table" -> S,
          "source_data_type" -> L, "is_autoincrement" -> S,
          "is_generatedcolumn" -> S), rows))
    }
    if (which("jdbc_table_types"))
      view("table_types", rowsDf(spark, Seq("table_type" -> S),
        Seq(Row("TABLE"), Row("VIEW"))))
    if (which("jdbc_types")) {
      import java.sql.Types._
      // the engine's live scalar-type inventory (SURVEY §1.2's mapping,
      // each carried by a gated surface) with the reference's own
      // (jdbcDataType, columnSize, numPrecRadix) facts per name —
      // intervals and sketch/JSON types take its JAVA_OBJECT fall-
      // through, sketch types its non-comparable arm (typePredNone).
      // Parametric constructors follow addParametricTypeRows:
      // array → ARRAY, everything else JAVA_OBJECT, no size facts.
      val J = JAVA_OBJECT
      def s(v: Int) = Some(v)
      val concrete: Seq[(String, Int, Option[Int], Option[Int], Boolean)] =
        Seq(
          ("boolean", BOOLEAN, None, None, true),
          ("tinyint", TINYINT, s(3), s(10), true),
          ("smallint", SMALLINT, s(5), s(10), true),
          ("integer", INTEGER, s(10), s(10), true),
          ("bigint", BIGINT, s(19), s(10), true),
          ("real", REAL, s(24), s(2), true),
          ("double", DOUBLE, s(53), s(2), true),
          ("varchar", VARCHAR, s(Int.MaxValue), None, true),
          ("varbinary", VARBINARY, s(Int.MaxValue), None, true),
          ("json", J, None, None, true),
          ("date", DATE, s(14), None, true),
          ("time", TIME, s(8), None, true),
          ("time with time zone", TIME_WITH_TIMEZONE, s(14), None, true),
          ("timestamp", TIMESTAMP, s(23), None, true),
          ("timestamp with time zone", TIMESTAMP_WITH_TIMEZONE, s(29),
            None, true),
          ("interval year to month", J, None, None, true),
          ("interval day to second", J, None, None, true),
          ("HyperLogLog", J, None, None, false),
          ("P4HyperLogLog", J, None, None, false),
          ("SetDigest", J, None, None, false),
          ("KHyperLogLog", J, None, None, false),
          ("qdigest", J, None, None, false),
          ("tdigest", J, None, None, false))
      val searchable = java.sql.DatabaseMetaData.typeSearchable.toLong
      val predNone = java.sql.DatabaseMetaData.typePredNone.toLong
      val nullable = java.sql.DatabaseMetaData.typeNullable.toLong
      val concreteRows = concrete.map {
        case (name, jt, size, radix, comparable) =>
          def l(o: Option[Int]): Any =
            o.map(v => java.lang.Long.valueOf(v.toLong)).orNull
          Row(name, jt.toLong, l(size), null, null, null, nullable,
            false, if (comparable) searchable else predNone, null,
            false, null, null, 0L, 0L, null, null, l(radix))
      }
      val parametricRows = Seq("array", "map", "row", "decimal", "char",
        "function").map { name =>
        Row(name,
          if (name == "array") java.sql.Types.ARRAY.toLong
          else java.sql.Types.JAVA_OBJECT.toLong,
          null, null, null, null, nullable, false, predNone, null,
          false, null, null, 0L, 0L, null, null, null)
      }
      view("types", rowsDf(spark,
        Seq("type_name" -> S, "data_type" -> L, "precision" -> L,
          "literal_prefix" -> S, "literal_suffix" -> S,
          "create_params" -> S, "nullable" -> L,
          "case_sensitive" -> BoolT, "searchable" -> L,
          "unsigned_attribute" -> BoolT, "fixed_prec_scale" -> BoolT,
          "auto_increment" -> BoolT, "local_type_name" -> S,
          "minimum_scale" -> L, "maximum_scale" -> L,
          "sql_data_type" -> L, "sql_datetime_sub" -> L,
          "num_prec_radix" -> L), concreteRows ++ parametricRows))
    }
    // the five always-empty metadata tables (their reference cursors
    // add no rows) — present with exact schemas, never missing
    if (which("jdbc_procedures"))
      view("procedures", rowsDf(spark,
        Seq("procedure_cat" -> S, "procedure_schem" -> S,
          "procedure_name" -> S, "remarks" -> S, "procedure_type" -> L,
          "specific_name" -> S), Seq.empty))
    if (which("jdbc_procedure_columns"))
      view("procedure_columns", rowsDf(spark,
        Seq("procedure_cat" -> S, "procedure_schem" -> S,
          "procedure_name" -> S, "column_name" -> S, "column_type" -> L,
          "data_type" -> L, "type_name" -> S, "precision" -> L,
          "length" -> L, "scale" -> L, "radix" -> L, "nullable" -> L,
          "remarks" -> S, "column_def" -> S, "sql_data_type" -> L,
          "sql_datetime_sub" -> L, "char_octet_length" -> L,
          "ordinal_position" -> L, "is_nullable" -> S,
          "specific_name" -> S), Seq.empty))
    if (which("jdbc_pseudo_columns"))
      view("pseudo_columns", rowsDf(spark,
        Seq("table_cat" -> S, "table_schem" -> S, "table_name" -> S,
          "column_name" -> S, "data_type" -> L, "column_size" -> L,
          "decimal_digits" -> L, "num_prec_radix" -> L,
          "column_usage" -> S, "remarks" -> S,
          "char_octet_length" -> L, "is_nullable" -> L), Seq.empty))
    if (which("jdbc_super_tables"))
      view("super_tables", rowsDf(spark,
        Seq("table_cat" -> S, "table_schem" -> S, "table_name" -> S,
          "supertable_name" -> S), Seq.empty))
    if (which("jdbc_super_types"))
      view("super_types", rowsDf(spark,
        Seq("type_cat" -> S, "type_schem" -> S, "type_name" -> S,
          "supertype_cat" -> S, "supertype_schem" -> S,
          "supertype_name" -> S), Seq.empty))
    if (which("jdbc_udts"))
      view("udts", rowsDf(spark,
        Seq("type_cat" -> S, "type_schem" -> S, "type_name" -> S,
          "class_name" -> S, "data_type" -> S, "remarks" -> S,
          "base_type" -> S), Seq.empty))
    if (which("jdbc_attributes"))
      view("attributes", rowsDf(spark,
        Seq("type_cat" -> S, "type_schem" -> S, "type_name" -> S,
          "attr_name" -> S, "data_type" -> L, "attr_type_name" -> S,
          "attr_size" -> L, "decimal_digits" -> L,
          "num_prec_radix" -> L, "nullable" -> L, "remarks" -> S,
          "attr_def" -> S, "sql_data_type" -> L,
          "sql_datetime_sub" -> L, "char_octet_length" -> L,
          "ordinal_position" -> L, "is_nullable" -> S,
          "scope_catalog" -> S, "scope_schema" -> S,
          "scope_table" -> S, "source_data_type" -> L), Seq.empty))
  }

  // ——— CALL system.runtime.kill_query ————————————————————————————————

  private val callKillRe =
    ("""(?is)^\s*CALL\s+system\s*\.\s*runtime\s*\.\s*kill_query\s*\(""" +
      """\s*(?:query_id\s*=>\s*)?'([^']*)'""" +
      """(?:\s*,\s*(?:message\s*=>\s*)?'([^']*)')?\s*\)\s*$""").r
  private val callOtherRe = """(?is)^\s*CALL\s+([\w.]+)\s*\(.*$""".r

  // ——— CALL system.create_empty_partition ————————————————————————————
  // presto-hive CreateEmptyPartitionProcedure.java:76-84 (signature:
  // schema_name, table_name, partition_columns array(varchar),
  // partition_values array(varchar)) and :95-117 (the two loud arms:
  // column-name mismatch, partition already present). The Spark-native
  // finishInsert of a zero-row partition is ALTER TABLE ADD PARTITION —
  // a pure catalog registration, no files written, visible to
  // $partitions and scans immediately.
  private val callCepRe =
    ("""(?is)^\s*CALL\s+system\s*\.\s*create_empty_partition\s*""" +
      """\((.*)\)\s*$""").r

  /** Parse the procedure's argument list: positional or `name =>`
    * named, values 'string' or ARRAY['a', ...]. Loud outside that
    * grammar. */
  private def cepArgs(text: String):
      (String, String, Seq[String], Seq[String]) = {
    // split top-level commas (ARRAY[...] holds nested commas)
    val parts = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    text.foreach { c =>
      if (inStr) { if (c == '\'') inStr = false; sb += c }
      else c match {
        case '\'' => inStr = true; sb += c
        case '[' | '(' => depth += 1; sb += c
        case ']' | ')' => depth -= 1; sb += c
        case ',' if depth == 0 => parts += sb.toString; sb.clear()
        case _ => sb += c
      }
    }
    if (sb.toString.trim.nonEmpty) parts += sb.toString
    val namedRe = """(?is)^\s*(\w+)\s*=>\s*(.*)$""".r
    val strRe = """(?is)^\s*'([^']*)'\s*$""".r
    val arrRe = """(?is)^\s*ARRAY\s*\[(.*)\]\s*$""".r
    val order = Seq("schema_name", "table_name",
      "partition_columns", "partition_values")
    val vals = mutable.Map.empty[String, String]
    require(parts.size <= order.size,
      s"create_empty_partition takes ${order.size} arguments, " +
        s"got ${parts.size}")
    parts.zipWithIndex.foreach { case (p, i) =>
      p match {
        case namedRe(n, v) => vals(n.toLowerCase) = v
        case v => vals(order(i)) = v
      }
    }
    def str(k: String): String = vals.getOrElse(k,
      sys.error(s"Required procedure argument '$k' is missing")) match {
      case strRe(s) => s
      case other => sys.error(s"create_empty_partition: bad $k: $other")
    }
    def arr(k: String): Seq[String] = vals.getOrElse(k,
      sys.error(s"Required procedure argument '$k' is missing")) match {
      case arrRe(body) =>
        if (body.trim.isEmpty) Seq.empty
        else body.split(',').toSeq.map {
          case strRe(s) => s
          case other =>
            sys.error(s"create_empty_partition: bad element: $other")
        }
      case other => sys.error(s"create_empty_partition: bad $k: $other")
    }
    (str("schema_name"), str("table_name"),
      arr("partition_columns"), arr("partition_values"))
  }

  private def createEmptyPartition(spark: SparkSession,
      argText: String): DataFrame = {
    val (schema, table, pCols, pVals) = cepArgs(argText)
    val qualified =
      if (schema == spark.catalog.currentDatabase) table
      else s"$schema.$table"
    // beginInsert resolves the table first — unknown tables are loud
    val actual = spark.catalog.listColumns(qualified).collect()
      .filter(_.isPartition).map(_.name).toSeq
    if (pCols != actual)
      sys.error("input partition column names doesn't " +
        "match actual partition column names")
    if (pVals.size != pCols.size)
      sys.error("input partition values doesn't match partition columns")
    val already = spark.sql(s"SHOW PARTITIONS $qualified").collect()
      .map(_.getString(0))
      .contains(pCols.zip(pVals).map { case (c, v) => s"$c=$v" }
        .mkString("/"))
    if (already) sys.error("Partition already exists")
    val spec = pCols.zip(pVals)
      .map { case (c, v) => s"$c = '${v.replace("'", "''")}'" }
      .mkString(", ")
    spark.sql(s"ALTER TABLE $qualified ADD PARTITION ($spec)")
    spark.sql("SELECT 'CALL' AS result")
  }

  /** Route CALL statements; None when not a CALL. */
  def maybeCall(spark: SparkSession, sqlText: String): Option[DataFrame] =
    sqlText match {
      case callKillRe(queryId, message) =>
        // KillQueryProcedure.java:53-75 — unknown ids are not found;
        // done ids are "not running" (the racy pre-check); a RUNNING
        // id is failed with createKillQueryException's text and its
        // job group cancelled (the router tagged it at record time); a
        // QUEUED id (parked in admission) has its park REVOKED — the
        // waiter wakes ungranted and the statement fails with the kill
        // text (the reference fails queued queries the same way:
        // failQuery reaches any non-done state)
        val parkedInfo = synchronized {
          val rec = log(spark).find(_.queryId == queryId).getOrElse(
            sys.error(s"Target query not found: $queryId"))
          if (rec.state != "RUNNING" && rec.state != "QUEUED")
            sys.error(s"Target query is not running: $queryId")
          rec.killMessage = "Query killed. " +
            (if (message == null || message.isEmpty) "No message provided."
             else s"Message: $message")
          if (rec.state == "QUEUED") Some(parked.get(queryId)) else None
        }
        parkedInfo match {
          case None => // RUNNING: cancel its tagged jobs AND bar future
            // submissions under the group — the reference's failQuery
            // fails the query object outright, so nothing further runs
            // (KillQueryProcedure.java:66-70); a statement whose next
            // job had not yet been submitted when the kill landed dies
            // at that submission instead of computing it. Completion
            // still settles the kill even if every job outran this.
            spark.sparkContext.cancelJobGroupAndFutureJobs(queryId)
          case Some(Some((g, ticket))) =>
            // parked: revoke the wait (false = promotion won the race;
            // the statement then runs and finishSuccess settles it)
            graft.plans.ResourceGroups.cancelWaiter(g, ticket)
          case Some(None) => () // QUEUED but not yet/no longer parked:
            // the dispatch path checks killMessage at every transition
        }
        Some(spark.sql("SELECT 'CALL' AS result"))
      case callCepRe(args) => Some(createEmptyPartition(spark, args))
      case callOtherRe(name) =>
        // the reference resolves procedures per connector
        // (ProcedureRegistry); nothing else is registered in this engine
        sys.error(s"Procedure not registered: $name")
      case _ => None
    }
}

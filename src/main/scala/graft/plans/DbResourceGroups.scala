package graft.plans

import java.sql.DriverManager

import scala.collection.mutable

/** DB-backed resource-group configuration — the Spark-native
  * re-expression of the reference's MySQL-backed manager
  * (`presto-resource-group-managers/.../db/
  * DbResourceGroupConfigurationManager.java` over the same
  * `InternalResourceGroup` admission machinery the file-based manager
  * uses; store schema per `ResourceGroupsDao.java:25-95`).
  *
  * What carries over 1:1 (all deterministic, all gated):
  *   - '''The store''': four tables in MySQL — `resource_groups`
  *     (spec rows linked by `parent`, scoped by `environment`),
  *     `selectors` (regexes + `priority`, evaluated highest first:
  *     `getSelectors` orders `priority DESC`),
  *     `exact_match_source_selectors` (most-specific exact source
  *     match, `DbSourceExactMatchSelector.java:48-81`), and
  *     `resource_groups_global_properties`. Like the function-
  *     namespace manager, every read/write goes through the REAL
  *     `jdbc:mysql://` driver against the r12 dialect shim — the
  *     reference literally requires MySQL.
  *   - '''Load-at-start + reload-on-change''' (`load():192-246`): the
  *     constructor's caller loads once; a later `load()` rebuilds the
  *     spec tree, and every spec whose config CHANGED reconfigures its
  *     LIVE groups in place (`configureChangedGroups:331-340`) — new
  *     limits govern without a session restart; specs that left the
  *     environment DISABLE their live groups
  *     (`disableDeletedGroups:342-356`: zero concurrency, zero queue).
  *     A load that throws keeps the last good configuration and counts
  *     a refresh failure (the `catch (Throwable)` arm).
  *   - '''Selection''': exact-match source selector first when enabled
  *     (`load():212-219` prepends it), then the priority-ordered
  *     regex selectors through the SAME first-match/template-expansion
  *     walk the file-based manager uses ([[ResourceGroups.select]]).
  *     The exact-match store holds the ResourceGroupId as its JSON
  *     segment list (`["global","pipeline"]`), NULL environment /
  *     query_type meaning wildcard, most-specific row winning
  *     (`getExactMatchResourceGroup`'s ORDER BY ... IS NULL).
  *
  * Scale: resource-group specs are KB-scale coordinator state at any
  * cluster size — the reference polls its DB every 10 s from one
  * thread; here `load()` is caller-driven (a library has no daemon),
  * which the gate exercises explicitly. DDL type adaptation for the
  * shim's MySQL subset: VARCHAR(n)→LONGTEXT, DATETIME→TIMESTAMP,
  * AUTO_INCREMENT ids are caller-supplied (the DAO's inserts carry
  * explicit ids in the reference's own tests too).
  */
class DbResourceGroupManager(url: String, driverClass: String,
    environment: String, exactMatchSelectorEnabled: Boolean = false) {

  import ResourceGroups._

  Class.forName(driverClass)

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close() // exactMatch runs per-select: never leak
  }

  // one shared, thread-safe-for-read mapper (construction is Jackson's
  // expensive operation; exactMatch runs per-select)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  @volatile private var manager: Manager = Manager(Seq.empty, Seq.empty)
  // dotted TEMPLATE path → the spec's admission facts (a Resolved whose
  // id is the template path); the diff between loads is what
  // reconfigures live groups (volatile: select() reads it outside
  // load()'s lock)
  @volatile private var specs = Map.empty[String, Resolved]
  // TEMPLATE path → resolved (expanded) group segment lists configured
  // from it
  private val configured =
    mutable.Map.empty[String, mutable.Set[Seq[String]]]
  @volatile private var refreshFailureCount = 0L
  @volatile private var loadedOnce = false

  def refreshFailures: Long = refreshFailureCount

  /** Create the four store tables when absent (probed — the shim's
    * CREATE is not IF NOT EXISTS and would reset them). */
  def initialize(): Unit = withConn { c =>
    def exists(t: String): Boolean =
      try { c.createStatement().executeQuery(
        s"SELECT 1 FROM $t WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
    if (!exists("resource_groups_global_properties"))
      c.createStatement().executeUpdate(
        """CREATE TABLE resource_groups_global_properties (
          | name LONGTEXT NOT NULL, value LONGTEXT)""".stripMargin)
    if (!exists("resource_groups"))
      c.createStatement().executeUpdate(
        """CREATE TABLE resource_groups (
          | resource_group_id BIGINT NOT NULL,
          | name LONGTEXT NOT NULL,
          | soft_memory_limit LONGTEXT NOT NULL,
          | max_queued INT NOT NULL,
          | soft_concurrency_limit INT,
          | hard_concurrency_limit INT NOT NULL,
          | scheduling_policy LONGTEXT,
          | scheduling_weight INT,
          | jmx_export BIT(1),
          | soft_cpu_limit LONGTEXT,
          | hard_cpu_limit LONGTEXT,
          | parent BIGINT,
          | environment LONGTEXT)""".stripMargin)
    if (!exists("selectors"))
      c.createStatement().executeUpdate(
        """CREATE TABLE selectors (
          | resource_group_id BIGINT NOT NULL,
          | priority BIGINT NOT NULL,
          | user_regex LONGTEXT,
          | source_regex LONGTEXT,
          | query_type LONGTEXT,
          | client_tags LONGTEXT,
          | selector_resource_estimate LONGTEXT)""".stripMargin)
    if (!exists("exact_match_source_selectors"))
      c.createStatement().executeUpdate(
        """CREATE TABLE exact_match_source_selectors (
          | environment LONGTEXT,
          | source LONGTEXT NOT NULL,
          | query_type LONGTEXT,
          | update_time TIMESTAMP NOT NULL,
          | resource_group_id LONGTEXT NOT NULL)""".stripMargin)
  }

  private case class GroupRow(id: Long, name: String, maxQueued: Int,
      hardConcurrencyLimit: Int, schedulingPolicy: Option[String],
      schedulingWeight: Option[Int], parent: Option[Long],
      softCpuLimit: Option[String], hardCpuLimit: Option[String])

  /** `load():192-246`. Synchronized like the reference's; failures keep
    * the last good configuration. */
  def load(): Unit = synchronized {
    try {
      val quotaPeriod = readCpuQuotaPeriod()
      val (roots, pathById) = buildSpecsFromDb()
      // the same load-time validation the file-based manager applies
      // (AbstractResourceConfigurationManager.validateRootGroups)
      ResourceGroups.validateSpecs(roots)
      val selectors = readSelectors(pathById)
      val mgr = Manager(roots, selectors, quotaPeriod)
      val newSpecs = pathById.values.map { case (path, spec) =>
        path.mkString(".") -> ResourceGroups.resolvedFacts(spec, mgr, path)
      }.toMap
      // a template is "changed" when its facts differ OR it was absent
      // last load (a group whose environment flipped away and BACK must
      // re-enable its live states — the reference reconfigures
      // re-appearing groups the same way)
      val changed = newSpecs.collect {
        case (k, v) if !specs.get(k).contains(v) => k }.toSet
      val deleted = specs.keySet -- newSpecs.keySet
      manager = mgr
      specs = newSpecs
      // reconfigure the LIVE groups resolved from each changed
      // template; deleted templates disable theirs (zero limits)
      changed.foreach { tpl =>
        configured.getOrElse(tpl, Set.empty).foreach(segs =>
          ResourceGroups.reconfigure(newSpecs(tpl).copy(segments = segs)))
      }
      deleted.foreach { tpl =>
        configured.getOrElse(tpl, Set.empty).foreach(segs =>
          ResourceGroups.reconfigure(Resolved(segs, 0, 0, None, None)))
      }
      loadedOnce = true
    } catch {
      case e: Throwable =>
        refreshFailureCount += 1
        if (!loadedOnce) throw e // nothing to fall back to yet
    }
  }

  /** The one global property (`resource_groups_global_properties`,
    * CHECK name in ('cpu_quota_period')) — duration string → millis. */
  private def readCpuQuotaPeriod(): Option[Long] = withConn { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT name, value FROM resource_groups_global_properties")
    Iterator.continually(rs).takeWhile(_.next())
      .flatMap { r =>
        if (r.getString(1) != "cpu_quota_period") None
        else Option(r.getString(2))
      }.toSeq.headOption
      .map(v => (ResourceGroups.parseDurationSecs(v) * 1000).toLong)
  }

  /** The reference's buildSpecsFromDb: rows → spec tree via parent
    * links. Returns the root specs plus (template path, spec) per id. */
  private def buildSpecsFromDb():
      (Seq[GroupSpec], Map[Long, (Seq[String], GroupSpec)]) = withConn { c =>
    val ps = c.prepareStatement(
      """SELECT resource_group_id, name, max_queued,
        | hard_concurrency_limit, scheduling_policy, scheduling_weight,
        | parent, soft_cpu_limit, hard_cpu_limit
        |FROM resource_groups WHERE environment = ?""".stripMargin)
    ps.setString(1, environment)
    val rs = ps.executeQuery()
    val rows = Iterator.continually(rs).takeWhile(_.next()).map { r =>
      val pol = Option(r.getString(5))
      val w = { val v = r.getInt(6); if (r.wasNull()) None else Some(v) }
      val p = { val v = r.getLong(7); if (r.wasNull()) None else Some(v) }
      GroupRow(r.getLong(1), r.getString(2), r.getInt(3), r.getInt(4),
        pol, w, p, Option(r.getString(8)), Option(r.getString(9)))
    }.toVector
    val byParent = rows.groupBy(_.parent)
    def millis(d: Option[String]): Option[Long] =
      d.map(v => (ResourceGroups.parseDurationSecs(v) * 1000).toLong)
    def build(row: GroupRow, path: Seq[String],
        acc: mutable.Map[Long, (Seq[String], GroupSpec)]): GroupSpec = {
      val myPath = path :+ row.name
      val subs = byParent.getOrElse(Some(row.id), Vector.empty)
        .sortBy(_.id).map(build(_, myPath, acc))
      val spec = GroupSpec(row.name, row.maxQueued,
        row.hardConcurrencyLimit, row.schedulingPolicy,
        row.schedulingWeight, subs,
        softCpuLimitMillis = millis(row.softCpuLimit),
        hardCpuLimitMillis = millis(row.hardCpuLimit))
      acc(row.id) = (myPath, spec)
      spec
    }
    val acc = mutable.Map.empty[Long, (Seq[String], GroupSpec)]
    val roots = byParent.getOrElse(None, Vector.empty).sortBy(_.id)
      .map(build(_, Seq.empty, acc))
    (roots, acc.toMap)
  }

  /** `getSelectors`: selectors of this environment's groups, highest
    * priority first (the DAO's ORDER BY priority DESC; the environment
    * JOIN is replayed against the loaded group ids). */
  private def readSelectors(
      pathById: Map[Long, (Seq[String], GroupSpec)]): Seq[Selector] =
    withConn { c =>
      val rs = c.createStatement().executeQuery(
        """SELECT resource_group_id, priority, user_regex, source_regex,
          | query_type, client_tags, selector_resource_estimate
          |FROM selectors""".stripMargin)
      Iterator.continually(rs).takeWhile(_.next()).flatMap { r =>
        val gid = r.getLong(1)
        pathById.get(gid).map { case (path, _) =>
          (r.getLong(2), Selector(
            userRegex = Option(r.getString(3)),
            sourceRegex = Option(r.getString(4)),
            clientTags = Option(r.getString(6)).map(parseJsonTags)
              .getOrElse(Set.empty),
            group = path,
            queryType = Option(r.getString(5)),
            resourceEstimate = Option(r.getString(7)).map(json =>
              ResourceGroups.parseSelectorEstimate(
                mapper.readTree(json)))))
        }
      }.toVector.sortBy(-_._1).map(_._2)
    }

  /** client_tags rides as a JSON string list (SelectorRecord.Mapper's
    * listJsonCodec). */
  private def parseJsonTags(json: String): Set[String] = {
    val n = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    n.elements().asScala.map(_.asText()).toSet
  }

  /** `DbSourceExactMatchSelector.match` + the DAO's most-specific
    * lookup: exact source equality, NULL environment/query_type as
    * wildcards, non-NULL more specific (ORDER BY env IS NULL,
    * query_type IS NULL ... LIMIT 1). Returns the stored group id's
    * segments. */
  private def exactMatch(source: Option[String],
      queryType: Option[String]): Option[Seq[String]] = source.flatMap {
    src =>
      val qt = queryType.getOrElse("")
      withConn { c =>
        val ps = c.prepareStatement(
          """SELECT environment, query_type, resource_group_id
            |FROM exact_match_source_selectors WHERE source = ?"""
            .stripMargin)
        ps.setString(1, src)
        val rs = ps.executeQuery()
        val rows = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (Option(r.getString(1)), Option(r.getString(2)),
            r.getString(3))).toVector
        rows.filter { case (env, t, _) =>
          env.forall(_ == environment) && t.forall(_ == qt) }
          .sortBy { case (env, t, _) => (env.isEmpty, t.isEmpty) }
          .headOption.map { case (_, _, idJson) =>
            import scala.jdk.CollectionConverters._
            mapper.readTree(idJson).elements().asScala.map(_.asText())
              .toSeq
          }
      }
  }

  private val TplVarRe = """\$\{[a-zA-Z][a-zA-Z0-9]*\}""".r

  /** Whether an EXPANDED segment matches a spec's name template:
    * literal equality, or — when the template carries `${...}`
    * variables — a segment-wise bind of each variable to non-empty
    * text (the reference matches expanded ids against templates the
    * same way: `ResourceGroupIdTemplate` via
    * `DbResourceGroupConfigurationManager.getMatchingSpec:145-153`). */
  private def segmentMatches(template: String, segment: String): Boolean =
    if (!template.contains("${")) template == segment
    else {
      val sb = new StringBuilder
      var last = 0
      TplVarRe.findAllMatchIn(template).foreach { m =>
        sb.append(java.util.regex.Pattern.quote(
          template.substring(last, m.start)))
        sb.append("(.+)")
        last = m.end
      }
      sb.append(java.util.regex.Pattern.quote(template.substring(last)))
      segment.matches(sb.toString)
    }

  /** Resolve a STORED (already-expanded) group id against the loaded
    * spec tree, with its full ancestor chain: at each level a literal
    * template match is preferred, then the first templated spec whose
    * variables bind the segment (spec order — the reference's
    * candidate walk). A stored id like `global.adhoc_alice` under spec
    * `global.adhoc_${USER}` resolves to that spec's limits. Returns
    * the resolved leaf plus the matched TEMPLATE path for change
    * tracking. */
  private def resolveStoredId(
      segments: Seq[String]): (Resolved, Seq[String]) = {
    val mgr = manager
    var level = mgr.rootGroups
    var tplPath = Vector.empty[String]
    var chain = Vector.empty[Resolved]
    segments.zipWithIndex.foreach { case (seg, i) =>
      val spec = level.find(_.nameTemplate == seg)
        .orElse(level.find(s => s.nameTemplate.contains("${") &&
          segmentMatches(s.nameTemplate, seg)))
        .getOrElse(throw new IllegalArgumentException(
          "exact-match selector points at unknown group: " +
            segments.take(i + 1).mkString(".")))
      tplPath :+= spec.nameTemplate
      chain :+= ResourceGroups
        .resolvedFacts(spec, mgr, segments.take(i + 1))
        .copy(parents = chain)
      level = spec.subGroups
    }
    (chain.last, tplPath)
  }

  /** Match a query to its resolved group: the exact-match selector
    * first (when enabled), then the priority-ordered regex selectors.
    * Records which template produced which live id so a later reload
    * can reconfigure it. */
  def select(user: String, source: Option[String],
      tags: Set[String] = Set.empty,
      queryType: Option[String] = None,
      estimates: QueryEstimates = QueryEstimates()): Option[Resolved] = {
    val viaExact =
      if (!exactMatchSelectorEnabled) None
      else exactMatch(source, queryType).map(resolveStoredId)
    val hit = viaExact.orElse(
      ResourceGroups.selectWithTemplate(manager, user, source, tags,
        queryType, estimates))
    hit.foreach { case (r, tpl) =>
      synchronized {
        // record EVERY level: a reload that changes or deletes an
        // ANCESTOR spec (the root's limits!) must find the live ids
        // configured under that template too
        configured.getOrElseUpdate(tpl.mkString("."),
          mutable.Set.empty) += r.segments
        r.parents.zipWithIndex.foreach { case (p, i) =>
          configured.getOrElseUpdate(tpl.take(i + 1).mkString("."),
            mutable.Set.empty) += p.segments
        }
      }
    }
    hit.map(_._1)
  }
}

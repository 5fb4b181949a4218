package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Resource groups / admission control — the Spark-native re-expression
  * of the reference's file-based resource-group manager
  * (`presto-resource-group-managers/.../
  * FileResourceGroupConfigurationManager.java` over
  * `presto-main/.../execution/resourceGroups/InternalResourceGroup
  * .java`), the round-11 audit's missing item #3.
  *
  * What carries over 1:1 (all deterministic, all gated):
  *   - '''The config format''': the reference's JSON — `rootGroups`
  *     (nested specs with `name` templates like `adhoc_${USER}`,
  *     `maxQueued`, `hardConcurrencyLimit`, `schedulingPolicy`,
  *     `schedulingWeight`, `subGroups`) + ordered `selectors`
  *     (`user`/`source` regexes, `clientTags`, `group` path).
  *   - '''Selection''' (`StaticSelector.match:81-124`): selectors
  *     evaluate IN ORDER, first match wins; a `user`/`source` regex
  *     must match fully; named capture groups become template
  *     variables alongside the standard `${USER}`/`${SOURCE}`;
  *     `clientTags` must be a subset of the criteria's tags; template
  *     expansion fails loudly on unresolved variables
  *     (`ResourceGroupNameTemplate.expandTemplate:78-86`).
  *   - '''Admission state machine''' (`InternalResourceGroup`): a leaf
  *     group runs up to `hardConcurrencyLimit` queries (`canRunMore
  *     :896`), queues up to `maxQueued` more (`canQueueMore:888`), and
  *     rejects beyond that with the reference's exact error text
  *     (`QueryQueueFullException`: `Too many queued queries for "g"`);
  *     a finished query promotes the longest-queued one (FIFO).
  *
  * Spark-first binding: a resolved group maps onto a Spark FAIR
  * scheduler pool — [[withGroup]] admits against the group's limits,
  * pins `spark.scheduler.pool` to the group id for the body (so a
  * multi-tenant driver gets per-group task scheduling, Spark's native
  * mechanism for exactly this), and releases on the way out. On a
  * cluster the pool name + weight feed the fair scheduler allocation
  * file; the admission half is driver-side bookkeeping at any scale.
  */
object ResourceGroups {

  final case class GroupSpec(
      nameTemplate: String,
      maxQueued: Int,
      hardConcurrencyLimit: Int,
      schedulingPolicy: Option[String],
      schedulingWeight: Option[Int],
      subGroups: Seq[GroupSpec],
      // CPU quota limits (InternalResourceGroup:103-107), duration
      // strings in the config/store, millis here
      softCpuLimitMillis: Option[Long] = None,
      hardCpuLimitMillis: Option[Long] = None)

  // ——— selector resource estimates (SelectorResourceEstimate.java) ——
  // Each present dimension requires the query's estimate PRESENT and
  // inside [min, max] (both inclusive — Range.contains:140-144); a
  // query that supplied no estimate for a constrained dimension never
  // matches. Durations/data sizes use airlift's spellings
  // ("5m", "30s", "500MB").

  final case class EstimateRange(min: Option[Double], max: Option[Double]) {
    def contains(v: Double): Boolean =
      min.forall(_ <= v) && max.forall(_ >= v)
  }

  final case class SelectorEstimate(
      executionTime: Option[EstimateRange],
      cpuTime: Option[EstimateRange],
      peakMemory: Option[EstimateRange]) {
    def matches(e: QueryEstimates): Boolean =
      executionTime.forall(r => e.executionTimeSecs.exists(r.contains)) &&
        cpuTime.forall(r => e.cpuTimeSecs.exists(r.contains)) &&
        peakMemory.forall(r => e.peakMemoryBytes.exists(r.contains))
  }

  /** The query side of the estimate match (the client-supplied
    * ResourceEstimates session values). */
  final case class QueryEstimates(
      executionTimeSecs: Option[Double] = None,
      cpuTimeSecs: Option[Double] = None,
      peakMemoryBytes: Option[Double] = None)

  private val NumUnitRe = """^\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*$""".r

  /** airlift Duration.valueOf grammar → seconds. */
  private[graft] def parseDurationSecs(s: String): Double = s match {
    case NumUnitRe(n, u) =>
      val f = u match {
        case "ns" => 1e-9; case "us" => 1e-6; case "ms" => 1e-3
        case "s" => 1.0; case "m" => 60.0; case "h" => 3600.0
        case "d" => 86400.0
        case other => throw new IllegalArgumentException(
          s"Unknown duration unit: $other")
      }
      n.toDouble * f
    case other =>
      throw new IllegalArgumentException(s"duration is not valid: $other")
  }

  /** airlift DataSize.valueOf grammar → bytes. */
  private[graft] def parseDataSizeBytes(s: String): Double = s match {
    case NumUnitRe(n, u) =>
      val f = u match {
        case "B" => 1d; case "kB" => 1024d; case "MB" => 1024d * 1024
        case "GB" => math.pow(1024, 3); case "TB" => math.pow(1024, 4)
        case "PB" => math.pow(1024, 5)
        case other => throw new IllegalArgumentException(
          s"Unknown unit: $other")
      }
      n.toDouble * f
    case other =>
      throw new IllegalArgumentException(s"size is not valid: $other")
  }

  /** Parse the JSON shape `{"executionTime": {"min": "5m", "max":
    * "10m"}, "cpuTime": ..., "peakMemory": {"max": "500MB"}}`. */
  private[graft] def parseSelectorEstimate(
      node: com.fasterxml.jackson.databind.JsonNode): SelectorEstimate = {
    def range(name: String, conv: String => Double): Option[EstimateRange] =
      Option(node.get(name)).map { r =>
        EstimateRange(
          Option(r.get("min")).map(v => conv(v.asText())),
          Option(r.get("max")).map(v => conv(v.asText())))
      }
    SelectorEstimate(
      range("executionTime", parseDurationSecs),
      range("cpuTime", parseDurationSecs),
      range("peakMemory", parseDataSizeBytes))
  }

  final case class Selector(
      userRegex: Option[String],
      sourceRegex: Option[String],
      clientTags: Set[String],
      group: Seq[String], // dotted template path segments
      // StaticSelector.java:108-112 — case-insensitive equality against
      // the criteria's query type (absent criteria reads "")
      queryType: Option[String] = None,
      // StaticSelector.java:103-105 — estimate ranges must all hold
      resourceEstimate: Option[SelectorEstimate] = None)

  final case class Manager(rootGroups: Seq[GroupSpec],
      selectors: Seq[Selector],
      // the one global property (`cpu_quota_period`) — required
      // whenever any group carries a CPU limit
      cpuQuotaPeriodMillis: Option[Long] = None)

  /** A resolved group, identified by its SEGMENT LIST — the reference
    * carries `ResourceGroupId` as segments, never a joined string
    * (ResourceGroupId.java), so an expanded template segment containing
    * a dot (user "john.doe" under `adhoc_${USER}`) stays one segment
    * and distinct paths never collide in the live-state registry.
    * [[id]] is the dotted DISPLAY form (pool names, error texts). */
  final case class Resolved(segments: Seq[String], maxQueued: Int,
      hardConcurrencyLimit: Int, schedulingPolicy: Option[String],
      schedulingWeight: Option[Int],
      softCpuLimitMillis: Long = Long.MaxValue,
      hardCpuLimitMillis: Long = Long.MaxValue,
      // quota regenerated per elapsed second
      // (AbstractResourceConfigurationManager.configureGroup:225 —
      // 1000 * hardCpuLimit / cpuQuotaPeriod)
      cpuQuotaGenerationMillisPerSecond: Long = Long.MaxValue,
      // ancestor chain root-first (InternalResourceGroup.run:507-516 —
      // every ancestor's capacity gates a leaf admission; counts and
      // CPU usage propagate up as descendant totals)
      parents: Seq[Resolved] = Nil) {
    def id: String = segments.mkString(".")
  }

  /** The reference's configureGroup CPU arm: soft clamps to hard
    * (InternalResourceGroup.setHardCpuLimit), the generation rate
    * derives from the quota period, and a CPU limit without a
    * cpuQuotaPeriod is the loud precondition
    * (AbstractResourceConfigurationManager:63). */
  /** All of a spec's admission facts as a [[Resolved]] carrying `id` —
    * shared by [[resolve]] and the DB manager's change tracking. */
  private[plans] def resolvedFacts(spec: GroupSpec, mgr: Manager,
      segments: Seq[String]): Resolved = {
    val (soft, hard, rate) = cpuFields(spec, mgr, segments.mkString("."))
    Resolved(segments, spec.maxQueued, spec.hardConcurrencyLimit,
      spec.schedulingPolicy, spec.schedulingWeight, soft, hard, rate)
  }

  private def cpuFields(spec: GroupSpec, mgr: Manager,
      id: String): (Long, Long, Long) = {
    if (spec.softCpuLimitMillis.isEmpty && spec.hardCpuLimitMillis.isEmpty)
      return (Long.MaxValue, Long.MaxValue, Long.MaxValue)
    val period = mgr.cpuQuotaPeriodMillis.getOrElse(
      throw new IllegalArgumentException(
        s"cpuQuotaPeriod must be specified to use cpu limits on group: $id"))
    // [[validateSpecs]] has already rejected soft-without-hard and
    // soft > hard (the reference's validateRootGroups), so hard is
    // present whenever soft is
    val hard = spec.hardCpuLimitMillis.getOrElse(Long.MaxValue)
    val soft = math.min(spec.softCpuLimitMillis.getOrElse(Long.MaxValue),
      hard)
    val rateBase = spec.hardCpuLimitMillis
      .orElse(spec.softCpuLimitMillis).get
    // rate floor (AbstractResourceConfigurationManager:224
    // Math.max(1, rate)) — without it a hard limit smaller than
    // period/1000 truncates to rate 0 and the group, once at its hard
    // CPU limit, never regenerates quota and is parked forever
    val rate = math.max(1L,
      math.min(1000.0 * rateBase / period.toDouble,
        Long.MaxValue.toDouble).toLong)
    (soft, hard, rate)
  }

  /** The reference's load-time validation over the whole spec tree:
    * `AbstractResourceConfigurationManager.validateRootGroups:66-67`
    * (soft CPU limit requires a hard one, and must not exceed it) and
    * `InternalResourceGroup.setSchedulingPolicy:519-520` (every child
    * of a query_priority group must itself use query_priority, so
    * priority ordering is preserved down the tree). Error texts are
    * the reference's own. */
  private[plans] def validateSpecs(roots: Seq[GroupSpec]): Unit = {
    def walk(spec: GroupSpec, path: Seq[String]): Unit = {
      val id = (path :+ spec.nameTemplate).mkString(".")
      if (spec.softCpuLimitMillis.isDefined) {
        require(spec.hardCpuLimitMillis.isDefined,
          "Must specify hard CPU limit in addition to soft limit")
        require(spec.softCpuLimitMillis.get <= spec.hardCpuLimitMillis.get,
          "Soft CPU limit cannot be greater than hard CPU limit")
      }
      if (spec.schedulingPolicy.exists(_.equalsIgnoreCase("query_priority")))
        spec.subGroups.foreach { sub =>
          val subId = s"$id.${sub.nameTemplate}"
          require(
            sub.schedulingPolicy.exists(
              _.equalsIgnoreCase("query_priority")),
            s"Parent of $subId uses query priority scheduling, " +
              s"so $subId must also")
        }
      spec.subGroups.foreach(walk(_, path :+ spec.nameTemplate))
    }
    roots.foreach(walk(_, Nil))
  }

  /** Parse the reference's JSON config format (jackson rides in with
    * Spark). Field names are the reference's own spellings. */
  def parse(json: String): Manager = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    def groups(n: com.fasterxml.jackson.databind.JsonNode): Seq[GroupSpec] =
      if (n == null) Seq.empty
      else n.elements().asScala.map { g =>
        GroupSpec(
          nameTemplate = g.get("name").asText(),
          maxQueued = Option(g.get("maxQueued")).map(_.asInt())
            .getOrElse(0),
          hardConcurrencyLimit =
            Option(g.get("hardConcurrencyLimit")).map(_.asInt())
              .getOrElse(0),
          schedulingPolicy =
            Option(g.get("schedulingPolicy")).map(_.asText()),
          schedulingWeight =
            Option(g.get("schedulingWeight")).map(_.asInt()),
          subGroups = groups(g.get("subGroups")),
          softCpuLimitMillis = Option(g.get("softCpuLimit"))
            .map(v => (parseDurationSecs(v.asText()) * 1000).toLong),
          hardCpuLimitMillis = Option(g.get("hardCpuLimit"))
            .map(v => (parseDurationSecs(v.asText()) * 1000).toLong))
      }.toSeq
    val selectors = Option(root.get("selectors")).map(_.elements().asScala
      .map { s =>
        Selector(
          userRegex = Option(s.get("user")).map(_.asText()),
          sourceRegex = Option(s.get("source")).map(_.asText()),
          clientTags = Option(s.get("clientTags"))
            .map(_.elements().asScala.map(_.asText()).toSet)
            .getOrElse(Set.empty),
          group = s.get("group").asText().split('.').toSeq,
          queryType = Option(s.get("queryType")).map(_.asText()),
          resourceEstimate = Option(s.get("selectorResourceEstimate"))
            .map(parseSelectorEstimate))
      }.toSeq).getOrElse(Seq.empty)
    val rootGroups = groups(root.get("rootGroups"))
    validateSpecs(rootGroups)
    Manager(rootGroups, selectors,
      cpuQuotaPeriodMillis = Option(root.get("cpuQuotaPeriod"))
        .map(v => (parseDurationSecs(v.asText()) * 1000).toLong))
  }

  private val VarPattern = """\$\{([a-zA-Z][a-zA-Z0-9]*)\}""".r
  private val NamedGroupPattern = """\(\?<([a-zA-Z][a-zA-Z0-9]*)>""".r

  /** First-match selection + template expansion → the resolved leaf
    * group, or None when no selector matches (the reference then
    * rejects the query: no group == not eligible to run). */
  def select(mgr: Manager, user: String, source: Option[String],
      tags: Set[String] = Set.empty,
      queryType: Option[String] = None,
      estimates: QueryEstimates = QueryEstimates()): Option[Resolved] =
    selectWithTemplate(mgr, user, source, tags, queryType, estimates)
      .map(_._1)

  /** [[select]] plus the matched selector's TEMPLATE path — what the
    * DB-backed manager records so a later spec change can find the
    * live groups configured from that template
    * (DbResourceGroupConfigurationManager's configuredGroups map). */
  def selectWithTemplate(mgr: Manager, user: String,
      source: Option[String],
      tags: Set[String] = Set.empty,
      queryType: Option[String] = None,
      estimates: QueryEstimates = QueryEstimates())
      : Option[(Resolved, Seq[String])] = {
    mgr.selectors.iterator.flatMap { sel =>
      val vars = mutable.Map.empty[String, String]
      val userOk = sel.userRegex.forall { re =>
        val p = java.util.regex.Pattern.compile(re)
        val matcher = p.matcher(user)
        val ok = matcher.matches()
        if (ok) NamedGroupPattern.findAllMatchIn(re).foreach { g =>
          val name = g.group(1)
          Option(matcher.group(name)).foreach(vars(name) = _)
        }
        ok
      }
      val src = source.getOrElse("")
      val sourceOk = userOk && sel.sourceRegex.forall { re =>
        val p = java.util.regex.Pattern.compile(re)
        val matcher = p.matcher(src)
        val ok = matcher.matches()
        if (ok) NamedGroupPattern.findAllMatchIn(re).foreach { g =>
          val name = g.group(1)
          Option(matcher.group(name)).foreach(vars(name) = _)
        }
        ok
      }
      val tagsOk = sel.clientTags.subsetOf(tags)
      val typeOk = sel.queryType.forall(
        _.equalsIgnoreCase(queryType.getOrElse("")))
      val estOk = sel.resourceEstimate.forall(_.matches(estimates))
      if (!userOk || !sourceOk || !tagsOk || !typeOk || !estOk) None
      else {
        vars.getOrElseUpdate("USER", user)
        vars.getOrElseUpdate("SOURCE", src)
        Some((resolve(mgr, sel.group, vars.toMap), sel.group))
      }
    }.nextOption()
  }

  /** Walk the spec tree along the selector's template path, expanding
    * each segment (`ResourceGroupIdTemplate` + `expandTemplate`). */
  private def resolve(mgr: Manager, path: Seq[String],
      vars: Map[String, String]): Resolved = {
    def expand(template: String): String =
      VarPattern.replaceAllIn(template, m =>
        java.util.regex.Matcher.quoteReplacement(
          vars.getOrElse(m.group(1), throw new IllegalArgumentException(
            s"unresolved variable '${m.group(1)}' in resource group " +
              s"'$template', available: ${vars.keys.mkString(",")}"))))
    var specs = mgr.rootGroups
    var segments = Vector.empty[String]
    // each prefix of the path resolves too: ancestors carry their own
    // limits and an admission must clear every level
    val chain = mutable.ArrayBuffer.empty[Resolved]
    path.foreach { segTemplate =>
      val spec = specs.find(_.nameTemplate == segTemplate).getOrElse(
        throw new IllegalArgumentException(
          s"no group spec '$segTemplate' under " +
            s"'${segments.mkString(".")}'"))
      segments :+= expand(segTemplate)
      chain += resolvedFacts(spec, mgr, segments)
        .copy(parents = chain.toSeq)
      specs = spec.subGroups
    }
    chain.last
  }

  // ---- the InternalResourceGroup admission state machine ------------

  // One lock for the whole admission machinery — the reference
  // synchronizes every group operation on the ROOT group's monitor
  // (checkState(Thread.holdsLock(root)) throughout
  // InternalResourceGroup); a single module lock is that same
  // discipline without needing per-tree lock objects.
  private val gate = new Object

  /** One queued admission: global-arrival ticket + the query's
    * priority (the `query_priority` session property, default 1 —
    * `SystemSessionProperties.getQueryPriority`). */
  private[plans] final case class QEntry(ticket: Long, priority: Int)

  final class GroupState(initial: Resolved) {
    // limits re-read on every admit/release, so a reconfigure() takes
    // effect on the NEXT admission — the reference's
    // InternalResourceGroup.setHardConcurrencyLimit contract
    @volatile private[ResourceGroups] var current: Resolved = initial
    // running/queuedTotal INCLUDE descendants at non-leaf levels (the
    // reference's runningQueries + descendantRunningQueries view)
    private[ResourceGroups] var running = 0
    private[ResourceGroups] var queuedTotal = 0
    private[ResourceGroups] val queued = mutable.Queue.empty[QEntry]
    private[ResourceGroups] var cpuUsageMillis = 0L
    def resolved: Resolved = current
    def runningCount: Int = gate.synchronized(running)
    def queuedCount: Int = gate.synchronized(queuedTotal)
    def cpuUsage: Long = gate.synchronized(cpuUsageMillis)
  }

  sealed trait Admission
  case object Run extends Admission
  final case class Queued(ticket: Long) extends Admission

  // All registry state lives under [[gate]] (the module's documented
  // single-lock discipline — the reference synchronizes every group
  // operation on the ROOT group's monitor): plain maps, every access
  // from a gate.synchronized block. Keys are SEGMENT LISTS, so two
  // distinct paths whose dotted renderings collide stay distinct.
  private val states = mutable.HashMap.empty[Seq[String], GroupState]
  // parent segments → child states (the reference's real child
  // pointers) — promotion walks this instead of scanning the registry
  private val childIndex =
    mutable.HashMap.empty[Seq[String], mutable.LinkedHashSet[GroupState]]
  // GLOBAL arrival order — tickets order enqueue time across the whole
  // tree, which is what the fair policy's queued-time dequeue reads
  private var arrivals = 0L
  // tickets with a live [[awaitTicket]] waiter, the subset a promotion
  // has granted a slot to, and the subset an external
  // [[cancelWaiter]] revoked (all bounded by the waiter count: entries
  // are removed on the waiter's way out, whatever the outcome)
  private val waiting = mutable.Set.empty[Long]
  private val grantedToWaiter = mutable.Set.empty[Long]
  private val revokedTickets = mutable.Set.empty[Long]

  def stateOf(r: Resolved): GroupState = gate.synchronized {
    states.getOrElseUpdate(r.segments, {
      val s = new GroupState(r)
      r.parents.lastOption.foreach(p =>
        childIndex.getOrElseUpdate(p.segments,
          mutable.LinkedHashSet.empty).add(s))
      s
    })
  }

  def clearAll(): Unit = gate.synchronized {
    states.clear()
    childIndex.clear()
    waiting.clear()
    grantedToWaiter.clear()
    revokedTickets.clear()
    arrivals = 0L
  }

  /** Re-limit a LIVE group in place (the reference's
    * configureChangedGroups → InternalResourceGroup setters): running
    * and queued entries are untouched (so is the state's ancestor
    * chain — a reconfigure carries LIMITS, not lineage), the new
    * limits govern from the next admit/release. No-op when the group
    * was never admitted to. */
  def reconfigure(r: Resolved): Unit = gate.synchronized {
    states.get(r.segments).foreach(g =>
      g.current = r.copy(parents = g.current.parents))
  }

  /** The leaf-to-root chain of live states (root first) — the walk
    * `InternalResourceGroup.run:507-516` performs. Caller holds
    * [[gate]]. */
  private def chainOf(g: GroupState): Seq[GroupState] =
    g.resolved.parents.map(stateOf) :+ g

  /** `InternalResourceGroup.canRunMore:896-921`: blocked outright at
    * the hard CPU limit; between soft and hard, the concurrency limit
    * shrinks linearly (floor, at least one below the configured limit,
    * never below one running query). `running` includes descendants
    * at non-leaf levels. Caller holds [[gate]]. */
  private def canRunMore(g: GroupState): Boolean = {
    val r = g.resolved
    if (g.cpuUsageMillis >= r.hardCpuLimitMillis) return false
    var limit = r.hardConcurrencyLimit
    if (g.cpuUsageMillis >= r.softCpuLimitMillis) {
      val penalty = (g.cpuUsageMillis - r.softCpuLimitMillis).toDouble /
        (r.hardCpuLimitMillis - r.softCpuLimitMillis).toDouble
      limit = math.floor(r.hardConcurrencyLimit * (1 - penalty)).toInt
      limit = math.min(r.hardConcurrencyLimit - 1, limit)
      limit = math.max(1, limit)
    }
    g.running < limit
  }

  /** `canQueueMore:888-894`: queued (incl. descendants) under the
    * level's maxQueued. Caller holds [[gate]]. */
  private def canQueueMore(g: GroupState): Boolean =
    g.queuedTotal < g.resolved.maxQueued

  /** `InternalResourceGroup.run:505-535`: EVERY level of the ancestor
    * chain must clear — run while all levels [[canRunMore]]
    * (concurrency + CPU quota), queue at the LEAF while all levels
    * [[canQueueMore]], else the reference's QUERY_QUEUE_FULL rejection
    * carrying the leaf's id. `priority` is the query_priority session
    * value — it orders the queue under the query_priority policy. */
  def admit(g: GroupState, priority: Int = 1): Admission =
    gate.synchronized {
      val chain = chainOf(g)
      val canRun = chain.forall(canRunMore)
      val canQueue = chain.forall(canQueueMore)
      if (canRun) {
        chain.foreach(_.running += 1)
        Run
      } else if (canQueue) {
        val t = arrivals
        arrivals += 1
        g.queued.enqueue(QEntry(t, priority))
        chain.foreach(_.queuedTotal += 1)
        Queued(t)
      } else throw new IllegalStateException(
        s"""Too many queued queries for "${g.resolved.id}"""")
    }

  /** Live child states of `s` (groups a query ever touched), from the
    * maintained parent→children index. Caller holds [[gate]]. */
  private def childrenOf(s: GroupState): Seq[GroupState] =
    childIndex.get(s.resolved.segments).map(_.toSeq).getOrElse(Seq.empty)

  /** Earliest queued arrival anywhere in s's subtree (ties and the
    * fair policy read queued time). Caller holds [[gate]]. */
  private def earliestArrival(s: GroupState): Long =
    (s.queued.headOption.map(_.ticket).toSeq ++ childrenOf(s)
      .filter(_.queuedTotal > 0).map(earliestArrival)).min

  /** Highest queued query priority anywhere in s's subtree — the
    * reference's `getHighestQueryPriority`, the sort key a
    * query_priority parent uses to pick among children
    * (`getSubGroupSchedulingPriority:840-843`). Caller holds
    * [[gate]]. */
  private def highestPriority(s: GroupState): Int =
    (s.queued.map(_.priority) ++ childrenOf(s)
      .filter(_.queuedTotal > 0).map(highestPriority)).max

  /** The reference's `internalStartNext` descent: at each level the
    * group must clear canRunMore; a leaf with queued work starts; an
    * inner group picks among eligible children by ITS scheduling
    * policy — `weighted_fair` minimizes utilization-vs-share delta
    * (WeightedFairQueue.poll:67-99, Usage = (schedulingWeight,
    * running)); `weighted` prefers the highest weight (the reference's
    * stochastic weighted pick made deterministic — documented);
    * fair/default dequeues by earliest arrival. Ties break on queued
    * time rather than the reference's starvation-avoiding coin flip.
    * Caller holds [[gate]]. */
  private def pickLeaf(s: GroupState): Option[GroupState] = {
    if (!canRunMore(s)) return None
    if (s.queued.nonEmpty) return Some(s) // queues live at leaves
    val eligible = childrenOf(s).filter(_.queuedTotal > 0)
      .flatMap(c => pickLeaf(c).map(leaf => (c, leaf)))
    if (eligible.isEmpty) return None
    def share(c: GroupState): Double =
      math.max(1, c.resolved.schedulingWeight.getOrElse(1)).toDouble
    val policy = s.resolved.schedulingPolicy
      .map(_.toLowerCase).getOrElse("fair")
    val chosen = policy match {
      case "weighted_fair" =>
        val totalShare = eligible.map(e => share(e._1)).sum
        val totalUtil = 1.0 + eligible.map(_._1.running).sum
        eligible.minBy { case (c, _) =>
          ((c.running / totalUtil) / (share(c) / totalShare),
            earliestArrival(c))
        }
      case "weighted" =>
        eligible.minBy { case (c, _) =>
          (-share(c), earliestArrival(c)) }
      case "query_priority" =>
        // IndexedPriorityQueue semantics: highest queued priority
        // wins, insertion (arrival) order breaks ties
        eligible.minBy { case (c, _) =>
          (-highestPriority(c), earliestArrival(c)) }
      case _ =>
        eligible.minBy { case (c, _) => (0.0, earliestArrival(c)) }
    }
    Some(chosen._2)
  }

  /** Dequeue the leaf's next entry by ITS policy: query_priority takes
    * the highest-priority entry (earliest arrival among ties — the
    * reference's IndexedPriorityQueue), everything else FIFO. Caller
    * holds [[gate]]. */
  private def dequeueNext(leaf: GroupState): QEntry = {
    val byPriority = leaf.resolved.schedulingPolicy
      .exists(_.equalsIgnoreCase("query_priority"))
    if (!byPriority) leaf.queued.dequeue()
    else {
      val e = leaf.queued.minBy(q => (-q.priority, q.ticket))
      leaf.queued.dequeueAll(_.ticket == e.ticket)
      e
    }
  }

  /** One pass of tree-wide promotion from `root`; a promoted ticket
    * with a blocked [[awaitAdmission]] waiter is handed its slot and
    * woken. Caller holds [[gate]]. */
  private def startNextEligible(root: GroupState): Option[Long] =
    pickLeaf(root).map { leaf =>
      chainOf(leaf).foreach { lvl =>
        lvl.running += 1; lvl.queuedTotal -= 1 }
      val t = dequeueNext(leaf).ticket
      if (waiting.contains(t)) {
        grantedToWaiter += t
        gate.notifyAll()
      }
      t
    }

  /** Query finished: account its CPU time against EVERY level's quota
    * (internalRefreshStats sums subtree usage into each group), free
    * the slot chain-wide, then start queued queries TREE-WIDE while
    * capacity holds (`queryFinished` → root.processQueuedQueries —
    * promotion is not confined to the releasing leaf), earliest
    * arrival first. Returns the started tickets, possibly from other
    * leaves. A CPU-throttled group parks its queue until quota
    * regenerates; regeneration itself does not auto-start (the
    * reference's refresh daemon does — this library is caller-driven,
    * so the next admit/release cycle picks the parked work up). */
  def release(g: GroupState, cpuMillis: Long = 0L): Seq[Long] =
    gate.synchronized {
      require(g.running > 0, s"release on idle group ${g.resolved.id}")
      require(cpuMillis >= 0, "cpuMillis must be non-negative")
      val chain = chainOf(g)
      chain.foreach { s =>
        s.cpuUsageMillis =
          if (s.cpuUsageMillis > Long.MaxValue - cpuMillis) Long.MaxValue
          else s.cpuUsageMillis + cpuMillis
        s.running -= 1
      }
      val root = chain.head
      Iterator.continually(startNextEligible(root))
        .takeWhile(_.isDefined).flatten.toSeq
    }

  /** `internalGenerateCpuQuota:772-786`: regenerate quota for elapsed
    * wall seconds at the group's configured rate, floored at zero. */
  def generateCpuQuota(g: GroupState, elapsedSeconds: Long): Unit =
    gate.synchronized {
      val rate = g.resolved.cpuQuotaGenerationMillisPerSecond
      val newQuota =
        if (rate == Long.MaxValue ||
            elapsedSeconds > Long.MaxValue / math.max(1L, rate))
          Long.MaxValue
        else elapsedSeconds * rate
      g.cpuUsageMillis = math.max(0L, g.cpuUsageMillis - newQuota)
    }

  /** Withdraw a queued ticket (caller cannot or will not wait): removes
    * exactly that entry so a later release() never hands its slot to a
    * phantom — without this, an abandoned ticket keeps `running`
    * elevated forever and the group wedges at its concurrency limit.
    * Returns false when the ticket was NOT in the queue — a concurrent
    * release() promoted it in the window between Queued and this call,
    * so the slot now belongs to the caller, who must release(g) it
    * (the withGroup wrapper does exactly that). */
  def cancelQueued(g: GroupState, ticket: Long): Boolean =
    gate.synchronized {
      val removed = g.queued.dequeueAll(_.ticket == ticket).size
      chainOf(g).foreach(_.queuedTotal -= removed)
      removed > 0
    }

  /** Block until a Queued admission is promoted — the reference's
    * dispatcher semantics (a queued query PARKS and starts on
    * promotion) on a concurrent driver. Returns true when the slot was
    * granted (by the initial admit or a later promotion), throws the
    * queue-full rejection when the group cannot even queue, and false
    * on timeout (the ticket is withdrawn — nothing leaks). Promotion
    * order is the group's scheduling policy's, exactly as release()
    * applies it. */
  def awaitAdmission(g: GroupState, timeoutMillis: Long,
      priority: Int = 1): Boolean =
    admitWithWaiter(g, priority)() match {
      case Run => true
      case Queued(t) => awaitTicket(g, t, timeoutMillis)
    }

  /** [[admit]] that — atomically, under the same [[gate]] hold —
    * registers a Queued ticket as having a waiter and hands it to
    * `onQueued` (callers record it for external cancellation). The
    * atomicity matters: a promotion between admit and registration
    * would grant a slot no waiter ever claims; while this thread owns
    * the lock that window does not exist. The caller MUST then park on
    * [[awaitTicket]] (which owns the registration's cleanup). */
  def admitWithWaiter(g: GroupState, priority: Int = 1)(
      onQueued: Long => Unit = _ => ()): Admission = gate.synchronized {
    admit(g, priority) match {
      case Run => Run
      case q @ Queued(t) =>
        waiting += t
        onQueued(t)
        q
    }
  }

  /** Park on a ticket [[admitWithWaiter]] queued: true when a
    * promotion grants the slot, false on timeout (ticket withdrawn —
    * nothing leaks) or external revocation ([[cancelWaiter]] — a kill
    * reached the queued query). While this thread owns the lock —
    * everywhere except inside wait() — the ticket is granted, revoked,
    * or still queued: no fourth state, no lost wakeup. */
  def awaitTicket(g: GroupState, t: Long,
      timeoutMillis: Long): Boolean = gate.synchronized {
    try {
      val deadline = System.nanoTime() + timeoutMillis * 1000000L
      var granted = grantedToWaiter.contains(t)
      var remaining = timeoutMillis
      while (!granted && !revokedTickets.contains(t) && remaining > 0) {
        gate.wait(remaining)
        granted = grantedToWaiter.contains(t)
        remaining = (deadline - System.nanoTime()) / 1000000L
      }
      if (!granted && !revokedTickets.contains(t) &&
          !cancelQueued(g, t)) {
        // unreachable while the lock discipline holds (grant and
        // revocation both need gate, and we hold it at every check) —
        // but a slot must never leak, so give it back rather than
        // trust that
        release(g)
      }
      granted
    } catch {
      case ie: InterruptedException =>
        // an interrupted waiter must not strand its bookkeeping: a
        // granted slot goes back (it will never run the body), a
        // still-queued entry is withdrawn (a later release() would
        // otherwise promote a phantom and wedge the group one slot
        // below its limit forever)
        if (grantedToWaiter.contains(t)) release(g)
        else cancelQueued(g, t)
        throw ie
    } finally {
      waiting -= t
      grantedToWaiter -= t
      revokedTickets -= t
    }
  }

  /** Revoke a PARKED ticket from outside (kill_query reaching a
    * QUEUED query): withdraws the queue entry and wakes its waiter,
    * which reports not-granted. False when the ticket was already
    * granted — the kill lost the promotion race and the statement is
    * now running (its completion path settles the kill). */
  def cancelWaiter(g: GroupState, t: Long): Boolean = gate.synchronized {
    if (grantedToWaiter.contains(t)) false
    else {
      cancelQueued(g, t)
      // mark revoked only for a LIVE waiter — its exit path owns the
      // entry's removal; a waiter already gone (timed out between the
      // caller's snapshot and this call) must not leave a permanent
      // entry behind
      if (waiting.contains(t)) {
        revokedTickets += t
        gate.notifyAll()
      }
      true
    }
  }

  /** Run `body` on an ALREADY-GRANTED slot of `g` (an
    * [[admitWithWaiter]] Run or a granted [[awaitTicket]]): FAIR pool
    * pinned for the body, slot released after — the execution half of
    * [[withGroup]] for callers that drive admission themselves. Takes
    * the SAME state object the caller admitted against (a fresh
    * [[stateOf]] lookup could mint a different one across a concurrent
    * clearAll/reconfigure and release the wrong counters). */
  def runGranted[T](s: SparkSession, r: Resolved, g: GroupState)(
      body: => T): T =
    try pinPool(s, r)(body) finally release(g)

  private def pinPool[T](s: SparkSession, r: Resolved)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    val prevSeg = sc.getLocalProperty(segmentsProperty)
    sc.setLocalProperty("spark.scheduler.pool", r.id)
    // the query log reads the SEGMENT LIST from its own property (NUL
    // joined — group names never contain NUL) rather than re-splitting
    // the dotted pool name, so an expanded segment containing a dot
    // survives; it also marks the pool as a resource group, not a
    // caller-set fair-scheduler pool
    sc.setLocalProperty(segmentsProperty, r.segments.mkString("\u0000"))
    try body
    finally {
      sc.setLocalProperty("spark.scheduler.pool", prev)
      sc.setLocalProperty(segmentsProperty, prevSeg)
    }
  }

  /** The local property [[withGroup]] stashes the admitted group's
    * segment list under (NUL-joined), for the query log. */
  val segmentsProperty = "graft.resource_group.segments"

  /** Admit against the group, pin the Spark FAIR scheduler pool to the
    * group id for the body, release after. Throws the queue-full error
    * when the group cannot even queue; a Queued admission waits its
    * turn only in a real concurrent driver — here the caller decides
    * (gates drive the state machine explicitly; [[withGroupAwait]] is
    * the blocking variant). */
  def withGroup[T](s: SparkSession, r: Resolved, priority: Int = 1)(
      body: => T): T = {
    val g = stateOf(r)
    admit(g, priority) match {
      case Run =>
        try pinPool(s, r)(body) finally release(g)
      case Queued(t) =>
        // this synchronous wrapper cannot block-wait its turn, so the
        // just-enqueued ticket must be withdrawn before throwing —
        // otherwise release() would hand a slot to the phantom entry.
        // If a concurrent release already promoted the ticket, the
        // slot is OURS and must go back (it would leak chain-wide)
        if (!cancelQueued(g, t)) release(g)
        throw new IllegalStateException(
          s"group ${r.id} is at its hard concurrency limit")
    }
  }

  /** [[withGroup]] that WAITS for its turn when queued (the
    * reference's real queue semantics): the body runs on admission or
    * promotion; a timeout errs with the queue-wait text. */
  def withGroupAwait[T](s: SparkSession, r: Resolved,
      timeoutMillis: Long, priority: Int = 1)(body: => T): T = {
    val g = stateOf(r)
    if (!awaitAdmission(g, timeoutMillis, priority))
      throw new IllegalStateException(
        s"query did not start within $timeoutMillis ms queued on " +
          s"group ${r.id}")
    try pinPool(s, r)(body) finally release(g)
  }
}

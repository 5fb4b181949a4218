package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Session property managers — the Spark-native re-expression of the
  * reference's file-based manager
  * (`presto-session-property-managers/.../FileSessionPropertyManager
  * .java` over `SessionMatchSpec.java`), the round-12 audit's missing
  * item #2: a JSON list of match specs that apply default session
  * properties to every query whose context (user, source, client tags,
  * query type, resource group) matches.
  *
  * What carries over 1:1 (all deterministic, all gated):
  *   - '''The config format''': the reference's JSON — a LIST of specs
  *     with `user`/`source` regexes, `clientTags`, `queryType`,
  *     `group` (resource-group regex) and a `sessionProperties` map;
  *     unknown fields fail loudly (the reference's codec enables
  *     FAIL_ON_UNKNOWN_PROPERTIES, `FileSessionPropertyManager
  *     .java:42-44`).
  *   - '''Matching''' (`SessionMatchSpec.match:59-87`): regexes must
  *     match FULLY (`matcher.matches()`, not find); an absent source
  *     matches against ""; `clientTags` must all be present on the
  *     context; `queryType` compares case-insensitively; `group`
  *     matches the resolved resource-group id.
  *   - '''Combination''' (`FileSessionPropertyManager
  *     .getSystemSessionProperties:85-93`): EVERY matching spec
  *     contributes, and "later properties override earlier
  *     properties" — not first-match-wins.
  *
  * Spark-first binding: the resolved properties are applied through
  * the engine's own SET SESSION registry (the qp8 surface —
  * `functions/PrestoStatements.scala`), so a property name that does
  * not exist fails with the reference's "Session property X does not
  * exist", the wired properties actually move Spark confs
  * (`hash_partition_count` → shuffle partitions,
  * `join_distribution_type=PARTITIONED` → broadcast off), and
  * [[withProperties]] RESETs each one afterwards so per-query defaults
  * never leak into the session — exactly the manager's role in the
  * reference, where the properties are query-scoped defaults. */
object SessionPropertyManagers {

  final case class MatchSpec(
      userRegex: Option[String],
      sourceRegex: Option[String],
      clientTags: Set[String],
      queryType: Option[String],
      groupRegex: Option[String],
      sessionProperties: Seq[(String, String)]) // insertion-ordered

  /** SessionConfigurationContext: what the engine knows about a query
    * before it runs. */
  final case class Context(
      user: String,
      source: Option[String] = None,
      clientTags: Set[String] = Set.empty,
      queryType: Option[String] = None,
      resourceGroupId: Option[String] = None)

  private val KnownFields = Set("user", "source", "clientTags",
    "queryType", "group", "sessionProperties")

  /** Parse the reference's JSON config (a LIST of match specs). Loud
    * on unknown field names, like the reference's codec. */
  def parse(json: String): Seq[MatchSpec] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    require(root.isArray, "session property config must be a JSON list")
    root.elements().asScala.map { s =>
      s.fieldNames().asScala.foreach(f => require(KnownFields.contains(f),
        s"Unknown property: $f"))
      MatchSpec(
        userRegex = Option(s.get("user")).map(_.asText()),
        sourceRegex = Option(s.get("source")).map(_.asText()),
        clientTags = Option(s.get("clientTags"))
          .map(_.elements().asScala.map(_.asText()).toSet)
          .getOrElse(Set.empty),
        queryType = Option(s.get("queryType")).map(_.asText()),
        groupRegex = Option(s.get("group")).map(_.asText()),
        sessionProperties = Option(s.get("sessionProperties"))
          .map(p => p.fields().asScala
            .map(e => e.getKey -> e.getValue.asText()).toSeq)
          .getOrElse(Seq.empty))
    }.toSeq
  }

  /** One spec against one context (`SessionMatchSpec.match:59-87`):
    * the spec's properties when every present criterion passes, empty
    * otherwise. */
  def matchProps(spec: MatchSpec, ctx: Context): Seq[(String, String)] = {
    def full(re: String, v: String): Boolean =
      java.util.regex.Pattern.compile(re).matcher(v).matches()
    val ok =
      spec.userRegex.forall(full(_, ctx.user)) &&
        spec.sourceRegex.forall(full(_, ctx.source.getOrElse(""))) &&
        (spec.clientTags.isEmpty ||
          spec.clientTags.subsetOf(ctx.clientTags)) &&
        spec.queryType.forall(qt =>
          qt.equalsIgnoreCase(ctx.queryType.getOrElse(""))) &&
        spec.groupRegex.forall(full(_, ctx.resourceGroupId.getOrElse("")))
    if (ok) spec.sessionProperties else Seq.empty
  }

  /** Combined defaults for a context: every matching spec contributes,
    * later specs override earlier ones
    * (`FileSessionPropertyManager:85-93`). */
  def properties(specs: Seq[MatchSpec],
      ctx: Context): Seq[(String, String)] = {
    val out = mutable.LinkedHashMap.empty[String, String]
    specs.foreach(spec => matchProps(spec, ctx).foreach {
      case (k, v) => out.remove(k); out(k) = v // re-insert: LAST wins,
      // and the surviving order reflects the overriding spec
    })
    out.toSeq
  }

  /** Apply the context's resolved defaults through the SET SESSION
    * registry, run the body, RESET each applied property after — the
    * manager's query-scoped lifecycle. Precedence matches the
    * reference (`FileSessionPropertyManager` defaults merge UNDER the
    * session's own properties at query-session creation): a property
    * the user has explicitly SET is left untouched — not overridden,
    * not RESET — so an explicit SET survives the block. Throws the
    * registry's loud error when a spec names a property that does not
    * exist (a skipped name is valid by construction — SET SESSION
    * already validated it when the user set it). */
  def withProperties[T](s: SparkSession, specs: Seq[MatchSpec],
      ctx: Context)(body: => T): T = {
    import graft.functions.Registry.{explicitSessionProps, prestoStatement}
    val props = properties(specs, ctx)
    val explicit = explicitSessionProps(s)
    val applied = mutable.ArrayBuffer.empty[String]
    try {
      props.foreach { case (name, value) =>
        if (!explicit.contains(name.split('.').last.toLowerCase)) {
          prestoStatement(s, s"SET SESSION $name = '$value'")
          applied += name
        }
      }
      body
    } finally applied.foreach(name =>
      prestoStatement(s, s"RESET SESSION $name"))
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Instant semantics for zoned-timestamp comparisons.
  *
  * The zoned layer carries TIMESTAMP WITH TIME ZONE values as
  * struct<utc, tz> (reference `TimestampWithTimeZoneType.java`, whose
  * compareTo orders by the packed millis — the INSTANT — ignoring the
  * zone key; `DateTimeEncoding.java` packs millis+zoneKey). Spark's
  * struct comparison orders by (utc, tz) pairs, so two same-instant
  * values in different zones would compare unequal. This rule rewrites
  * every comparison, sort order, and IN-list over zoned structs onto
  * the `utc` field, restoring the reference's semantics for =, <>,
  * <, <=, >, >=, ORDER BY, join keys, and IN.
  *
  * Injected twice (idempotent): as a POST-HOC RESOLUTION rule on
  * sessions the engine builds (`GraftExtensions` via
  * `spark.sql.extensions` in Sessions.local) — analysis-time, so even
  * a both-sides-literal comparison rewrites BEFORE ConstantFolding can
  * fold it with struct pair semantics (r8, closing the former ledger
  * residual) — and through `spark.experimental.extraOptimizations`
  * (Registry.install), the only hook available on driver-provided
  * sessions. There the literal-literal edge is closed by [[ZonedShield]]
  * (r10): the SQL rewrite layer wraps zoned literal constructors in a
  * non-foldable identity, so the comparison survives ConstantFolding to
  * this rule, which rewrites it and strips the shields.
  *
  * GROUP BY / DISTINCT over zoned values group by INSTANT (r7): a
  * zoned grouping key rewrites to its `utc` field and bare references
  * to the key in the output become `first(key)` — one arbitrary
  * representative zone per instant group, which is exactly the
  * reference's behavior (TimestampWithTimeZoneType hashes/compares the
  * packed millis only, so which zone survives a group is
  * implementation-defined there too). DISTINCT arrives here already
  * rewritten to an Aggregate (ReplaceDistinctWithAggregate runs in the
  * earlier optimizer batches) and gets the same treatment. Window
  * PARTITION BY over zoned values partitions by instant likewise (no
  * representative needed — the key is not output).
  */
/** Non-foldable identity wrapped around zoned-literal CONSTRUCTORS by
  * the SQL rewrite layer (r10). Purpose: on driver-provided sessions
  * the instant-semantics rule runs only in the LAST optimizer batch
  * (`extraOptimizations`), after ConstantFolding — which used to fold a
  * both-sides-literal zoned comparison with struct PAIR semantics
  * before the rule could see it (the former ledger residual). The
  * shield makes the literal non-foldable so the comparison survives to
  * the rule, which rewrites it onto `utc` and then strips every shield
  * (analysis-time on engine sessions, user-batch on driver sessions).
  * Cost: a stripped shield is gone; an unstripped one (no install) is
  * one virtual call over a literal-sized expression. */
case class ZonedShield(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "presto_zoned_shield"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = false
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ZonedInstantComparison extends Rule[LogicalPlan] {

  private[graft] def isZoned(dt: DataType): Boolean = dt match {
    case StructType(fields) if fields.length == 2 =>
      fields(0).name == "utc" &&
        (fields(0).dataType == TimestampNTZType ||
          fields(0).dataType == TimestampType) &&
        fields(1).name == "tz" && fields(1).dataType == StringType
    case _ => false
  }

  private def utcOf(e: Expression): Expression =
    GetStructField(e, 0, Some("utc"))

  /** Does a result type embed the zoned struct anywhere? */
  private def containsZoned(dt: DataType): Boolean = dt match {
    case s: StructType =>
      isZoned(s) || s.fields.exists(f => containsZoned(f.dataType))
    case ArrayType(et, _) => containsZoned(et)
    case MapType(kt, vt, _) => containsZoned(kt) || containsZoned(vt)
    case _ => false
  }

  /** Replace bare (non-aggregated) references to a zoned grouping key
    * with first(key) — the arbitrary-representative contract. References
    * already inside aggregate functions are left alone. */
  private def firstifyKeyRefs(e: Expression,
      keys: Seq[Expression]): Expression = e match {
    case ae: AggregateExpression => ae
    case k if keys.exists(_.semanticEquals(k)) =>
      new First(k).toAggregateExpression()
    case other =>
      other.withNewChildren(other.children.map(firstifyKeyRefs(_, keys)))
  }

  /** array_agg(DISTINCT z)-by-instant: plain collect_list, sort, then a
    * fold that keeps the first entry of each (utc, tz) run — sorted
    * order makes every same-instant entry (exact duplicates included)
    * adjacent, so the fold IS the distinct. Deliberately NOT collect_set:
    * a set-typed replacement would re-match this rule's own output and
    * recurse; the list aggregate stays standard mergeable partial/final,
    * scale-safe (O(group) like the reference's array_agg). */
  private def instantDistinctCollect(z: Expression): Expression = {
    val zt = z.dataType
    val accType = ArrayType(zt, containsNull = false)
    val collected = SortArray(
      aggregate.CollectList(z).toAggregateExpression(), Literal(true))
    val acc = NamedLambdaVariable("acc", accType, nullable = false)
    val x = NamedLambdaVariable("x", zt, nullable = false)
    val cond = And(GreaterThan(Size(acc), Literal(0)),
      EqualTo(GetStructField(ElementAt(acc, Literal(-1)), 0, Some("utc")),
        GetStructField(x, 0, Some("utc"))))
    val merge = LambdaFunction(
      If(cond, acc, Concat(Seq(acc, CreateArray(Seq(x))))), Seq(acc, x))
    val out = NamedLambdaVariable("out", accType, nullable = false)
    ArrayAggregate(collected, Literal.create(Seq.empty[Any], accType),
      merge, LambdaFunction(out, Seq(out)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case agg: Aggregate if agg.groupingExpressions.exists(g =>
          g.resolved && isZoned(g.dataType)) =>
        val zonedKeys = agg.groupingExpressions.filter(g =>
          g.resolved && isZoned(g.dataType))
        val newGrouping = agg.groupingExpressions.map(g =>
          if (g.resolved && isZoned(g.dataType)) utcOf(g) else g)
        val newAggs = agg.aggregateExpressions.map { ne =>
          firstifyKeyRefs(ne, zonedKeys) match {
            case named: NamedExpression => named
            // a bare key reference became first(key) — re-alias under the
            // ORIGINAL exprId so parent operators still resolve
            case other => Alias(other, ne.name)(exprId = ne.exprId)
          }
        }
        agg.copy(groupingExpressions = newGrouping,
          aggregateExpressions = newAggs)
      case w: Window if w.partitionSpec.exists(p =>
          p.resolved && isZoned(p.dataType)) =>
        w.copy(partitionSpec = w.partitionSpec.map(p =>
          if (p.resolved && isZoned(p.dataType)) utcOf(p) else p))
    }.transformAllExpressions {
      // array_agg(DISTINCT z) / collect_set(z): the RESULT carries the
      // zoned struct, so the utc-field rewrite below can't apply — but
      // pair-distinct still over-counts same-instant values. Rewrite to
      // a plain collect_set (pair-distinct, bounded) followed by a
      // sorted scalar fold keeping ONE entry per instant — the smallest
      // (utc, tz) pair, a deterministic refinement of the reference's
      // arbitrary surviving zone (closes ledger residual 5's
      // aggregate-internal tail; NULLs drop like collect_set).
      case ae: AggregateExpression
          if (ae.isDistinct ||
              ae.aggregateFunction.isInstanceOf[aggregate.CollectSet]) &&
            ae.aggregateFunction.children.length == 1 &&
            (ae.aggregateFunction.isInstanceOf[aggregate.CollectList] ||
              ae.aggregateFunction.isInstanceOf[aggregate.CollectSet]) && {
              val z = ae.aggregateFunction.children.head
              z.resolved && isZoned(z.dataType)
            } =>
        instantDistinctCollect(ae.aggregateFunction.children.head)
      // DISTINCT inside an aggregate dedups by the aggregate function's
      // argument values — a zoned argument must dedup by INSTANT, so
      // count(DISTINCT z) over two same-instant/different-zone rows is 1
      // (reference hashes packed millis only). Only safe when the zoned
      // struct does not surface in the result type (count and friends);
      // instant-distinct array_agg/collect_set is the dedicated case
      // above.
      case ae: AggregateExpression if ae.isDistinct &&
          ae.aggregateFunction.children.exists(c =>
            c.resolved && isZoned(c.dataType)) &&
          !containsZoned(ae.aggregateFunction.dataType) =>
        ae.copy(aggregateFunction = ae.aggregateFunction
          .withNewChildren(ae.aggregateFunction.children.map(c =>
            if (c.resolved && isZoned(c.dataType)) utcOf(c) else c))
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
      case cmp: BinaryComparison
          if cmp.left.resolved && cmp.right.resolved &&
            isZoned(cmp.left.dataType) && isZoned(cmp.right.dataType) =>
        cmp.withNewChildren(Seq(utcOf(cmp.left), utcOf(cmp.right)))
      case so @ SortOrder(child, _, _, _)
          if child.resolved && isZoned(child.dataType) =>
        so.copy(child = utcOf(child))
      case In(v, list)
          if v.resolved && isZoned(v.dataType) &&
            list.forall(e => e.resolved && isZoned(e.dataType)) =>
        In(utcOf(v), list.map(utcOf))
      // rank/dense_rank/percent_rank keep their OWN copy of the order
      // expressions for run-change detection — rewriting only the
      // window spec's SortOrder would order by instant but still bump
      // the rank when the zone changes within an instant tie
      case r: RankLike
          if r.children.exists(c => c.resolved && isZoned(c.dataType)) =>
        r.withNewChildren(r.children.map(c =>
          if (c.resolved && isZoned(c.dataType)) utcOf(c) else c))
    }.transformAllExpressions {
      // LAST within this apply: the comparison/sort/grouping rewrites
      // above have already seen every shielded literal in this plan, so
      // the shields have served their anti-folding purpose and drop out
      case ZonedShield(c) => c
    }
}

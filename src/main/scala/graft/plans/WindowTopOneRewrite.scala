package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the latest-per-key idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" === 1)
  *
  * into a `min_by` (all keys `asc()`) or `max_by` (all keys `desc()` —
  * the reference's own latest-per-key idiom,
  * NBclaims_bronze.Notebook/notebook-content.py:123-131 orders
  * `desc("IngestionTimestamp")`) aggregation over the ordering tuple.
  * The window form
  * shuffles EVERY row to its key's reducer and sorts each group; the
  * aggregate form partial-aggregates map-side, so one row per (key,
  * partition) crosses the wire and nothing sorts — the rewrite graft
  * applies by hand in its own queries (Dedup.latestByKeyAgg,
  * measured 2.5s → 0.6s on the b2 bench; the ingestion-log bucketing
  * commit repeats it), offered automatically to naive user queries.
  *
  * Why top-1 only, not `rn <= k`: Spark's own InferWindowGroupLimit
  * (SPARK-37099) already plans `rn <= k` well — measured on 4.1, a
  * `WindowGroupLimit ... Partial` runs BEFORE the exchange, so at
  * most k rows per (group, mapper) cross the shuffle; what remains is
  * a full mapper-local sort feeding the partial limit and the final
  * sort + Window exec. A generic k>1 rewrite would need a bounded-heap
  * aggregate over arbitrary row types — interpreted orderings plus
  * buffer serde per row — trading a codegen'd sort for slower
  * per-row work; that only wins for typed hot paths, which is exactly
  * what [[graft.functions.TopKPairs]] covers for (score, id) top-k.
  * Top-1 is different: min_by/max_by partial-aggregates with NO
  * mapper-local sort at all, a strict improvement the built-in never
  * produces.
  *
  * Fires only when the rewrite is provably value-identical:
  *  - a lone `row_number()` window expression, filtered to exactly 1
  *    (`rn = 1` / `1 = rn`), partition keys may be any deterministic
  *    expressions;
  *  - every ORDER BY key is ascending NULLS FIRST (the asc() default,
  *    → min_by) or every key is descending NULLS LAST (the desc()
  *    default, → max_by), all deterministic; mixed directions or the
  *    non-default null orderings bail. Nullable keys are safe: the
  *    ordering tuple is wrapped in a struct — a struct literal is never
  *    null (so min_by/max_by never discards a row) and Spark's struct
  *    comparison orders null fields first, which IS asc_nulls_first
  *    under min and desc_nulls_last under max;
  *  - ties: row_number picks a partition-order-dependent winner; so
  *    does min_by/max_by. The rewrite preserves the set of admissible
  *    winners, exactly like Spark's own exchange-reuse under ties. The
  *    winner is carried as ONE min_by/max_by over a struct of the full
  *    row — per-column aggregates would tear tied rows (each column
  *    from a different tied row), fabricating rows that never existed.
  *
  * The filtered `rn` column itself is rebuilt as literal 1 under its
  * original exprId, so projections above the filter keep resolving.
  *
  * Register with `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations ++= Seq(WindowTopOneRewrite)`.
  */
object WindowTopOneRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) =>
      stripProjects(child).flatMap { case (projs, w) =>
        rewrite(cond, w).map(agg =>
          projs.foldRight(agg: LogicalPlan)((list, acc) => Project(list, acc)))
      }.getOrElse(f)
  }

  /** Unwraps attribute-only Projects (withColumn and the analyzer's
    * window extraction each add one) down to a Window node, returning
    * them outermost-first for rebuilding above the aggregate. */
  private def stripProjects(p: LogicalPlan)
      : Option[(Seq[Seq[NamedExpression]], Window)] = p match {
    case w: Window => Some((Nil, w))
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child).map { case (ps, w) => (list +: ps, w) }
    case _ => None
  }

  /** The window's single row_number output attribute, if the node is a
    * lone-row_number window. */
  private def rowNumberAttr(w: Window): Option[Attribute] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), spec), _))
        if spec.orderSpec.nonEmpty => Some(a.toAttribute)
    case _ => None
  }

  private def filtersToOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }

  /** The two rank orders a struct-comparison aggregate can reproduce
    * exactly. Struct comparison orders a null FIELD first (smallest):
    * under min that ranks nulls first — asc_nulls_first, the `asc()`
    * default; under max nulls lose to every non-null — desc_nulls_last,
    * the `desc()` default. Mixed directions or the non-default null
    * orderings have no struct-monotone encoding, so the rule bails. */
  private sealed trait Form
  private case object AscForm extends Form
  private case object DescForm extends Form

  private def formOf(orderSpec: Seq[SortOrder]): Option[Form] =
    if (!orderSpec.forall(_.child.deterministic)) None
    else if (orderSpec.forall(so =>
      so.direction == Ascending && so.nullOrdering == NullsFirst)) Some(AscForm)
    else if (orderSpec.forall(so =>
      so.direction == Descending && so.nullOrdering == NullsLast)) Some(DescForm)
    else None

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val safe = for {
      rn <- rowNumberAttr(w)
      if filtersToOne(cond, rn)
      form <- formOf(w.orderSpec)
      // a global (partition-less) window must keep the window path: an
      // UNGROUPED aggregate returns one row on empty input, so the
      // rewrite would fabricate an all-null row where rn=1 yields none
      if w.partitionSpec.nonEmpty && w.partitionSpec.forall(_.deterministic)
    } yield (rn, form)
    safe.map { case (rn, form) =>
      // Spark's InferWindowGroupLimit may already have inserted a
      // WindowGroupLimit below the Window (it runs in an earlier
      // optimizer batch than user-provided rules). Left in place it
      // forces a per-partition sort AND puts the exchange below the
      // partial aggregation — the exact costs this rewrite deletes.
      // Stripping it is value-identical: the limit keeps every rank-1
      // candidate per (group, partition), and the aggregate picks the
      // same winner from the full input.
      val input = w.child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      val ordering = w.orderSpec.map(_.child) match {
        case Seq(single) if !single.nullable => single
        // struct: never null itself, null FIELDS order first — exactly
        // row_number's asc_nulls_first under min_by (where min_by on a
        // bare nullable key would instead discard the null-keyed rows)
        // and desc_nulls_last under max_by (nulls lose to non-nulls)
        case keys => CreateStruct(keys)
      }
      // one min_by/max_by over the WHOLE row keeps the winner atomic
      // under ordering ties; columns unpack in a Project above
      val row = CreateStruct(input.output)
      val winner = Alias(
        (form match {
          case AscForm  => MinBy(row, ordering)
          case DescForm => MaxBy(row, ordering)
        }).toAggregateExpression(),
        "__graft_winner")()
      val groupAttrs = w.partitionSpec.collect { case a: Attribute => a }
      val agg = Aggregate(w.partitionSpec, groupAttrs :+ winner, input)
      val wAttr = winner.toAttribute
      val unpacked: Seq[NamedExpression] = input.output.zipWithIndex.map {
        case (a, _) if groupAttrs.exists(_.semanticEquals(a)) => a
        case (a, i) => Alias(
          GetStructField(wAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
      } :+ Alias(Literal(1, IntegerType), rn.name)(exprId = rn.exprId)
      Project(unpacked, agg)
    }
  }
}

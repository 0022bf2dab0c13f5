package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

import graft.functions.TopKRows

/** Optimizer rule: rewrite the ranked-window filter idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" === 1)            // latest-per-key
  *     .filter($"rn" <= 10)            // top-N-per-key
  *
  * into a partial-aggregating form with NO window exec:
  *
  *  - `rn = 1` with uniform key directions becomes `min_by` (all keys
  *    `asc()`) or `max_by` (all keys `desc()` — the reference's own
  *    latest-per-key idiom, NBclaims_bronze.Notebook/
  *    notebook-content.py:123-131 orders `desc("IngestionTimestamp")`)
  *    over the whole-row struct: codegen'd, map-side partials, one row
  *    per (key, partition) crosses the wire, nothing sorts (the
  *    rewrite graft applies by hand in Dedup.latestByKeyAgg — measured
  *    2.5s → 0.6s on the b2 bench — offered automatically to naive
  *    user queries).
  *  - `rn <= k` (and `rn = 1` shapes min_by can't encode: mixed
  *    directions, non-default null orderings, partition-less windows)
  *    becomes the bounded-heap [[TopKRows]] aggregate + posexplode,
  *    rebuilding `rn` as position+1. Each map partition ships at most
  *    k rows per group where the window form shuffles and sorts EVERY
  *    row; Spark's own InferWindowGroupLimit (SPARK-37099) bounds the
  *    shuffle to k rows per (group, mapper) too, but only after a full
  *    mapper-local SORT, and it still sorts and windows after the
  *    exchange. The aggregate form deletes both sorts at the price of
  *    interpreted per-row ordering eval — the right trade for the
  *    top-N-per-key reporting shape (Health report top-10 providers;
  *    g7's shape at Measures.topN), where k is small and rows are wide.
  *
  * Value identity:
  *  - a lone `row_number()` window expression, filtered to a literal
  *    rank prefix (`rn = 1`, `rn <= k`, `rn < k`, and flipped forms) —
  *    possibly among other conjuncts (CombineFilters merges subsequent
  *    user filters into one And; the non-rank residual re-applies
  *    above the rewrite, see apply());
  *    partition keys may be any deterministic expressions (the
  *    TopKRows path also allows an EMPTY partition list: the ungrouped
  *    aggregate emits one array row and posexplode of an empty array
  *    emits nothing, so empty input yields empty output — the min_by
  *    path must keep requiring a partition, since an ungrouped min_by
  *    would fabricate an all-null row there);
  *  - min_by/max_by path: every ORDER BY key ascending NULLS FIRST
  *    (asc() default, → min_by) or every key descending NULLS LAST
  *    (desc() default, → max_by). Nullable keys are safe: the ordering
  *    tuple is wrapped in a struct — a struct literal is never null
  *    (so min_by/max_by never discards a row) and Spark's struct
  *    comparison orders null fields first, which IS asc_nulls_first
  *    under min and desc_nulls_last under max. TopKRows carries the
  *    per-key direction and null ordering explicitly through
  *    Catalyst's InterpretedOrdering, so any combination is exact;
  *  - ties: row_number picks a partition-order-dependent winner; so do
  *    min_by/max_by and TopKRows' boundary eviction. The rewrite
  *    preserves the set of admissible winners, exactly like Spark's
  *    own exchange-reuse under ties. Winners are carried as whole-row
  *    structs — per-column aggregates would tear tied rows.
  *
  * The filtered `rn` column is rebuilt under its original exprId
  * (literal 1, or posexplode position + 1), so projections above the
  * filter keep resolving.
  *
  * Register with `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations ++= Seq(WindowTopOneRewrite)`.
  */
object WindowTopOneRewrite extends Rule[LogicalPlan] with PredicateHelper {

  // The filter may be a conjunction: CombineFilters merges any
  // subsequent user .filter(p) into Filter(p && rn <= k), so the rank
  // conjunct must be found among the others, and the residual
  // predicates re-applied ABOVE the rewritten plan (row-local, and rn
  // is rebuilt under its original exprId, so residuals referencing rn
  // — e.g. a pagination rn >= 2 — still resolve and evaluate
  // identically). Rewriting moves residual evaluation after the rank
  // cut, which only commutes for deterministic predicates — bail
  // otherwise.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, child) =>
      (for {
        (projs, w) <- stripProjects(child)
        rn <- rowNumberAttr(w)
        conjuncts = splitConjunctivePredicates(cond)
        if conjuncts.forall(_.deterministic)
        k <- conjuncts.flatMap(filterLimit(_, rn)).minOption
        agg <- rewrite(rn, k, w)
      } yield {
        // every conjunct whose limit IS k is fully enforced by the
        // k-rank cut itself; everything else re-applies above
        val residual = conjuncts.filterNot(filterLimit(_, rn).contains(k))
        val filtered = if (residual.isEmpty) agg
          else Filter(residual.reduce(And), agg)
        projs.foldRight(filtered)((list, acc) => Project(list, acc))
      }).getOrElse(f)
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

  /** The rank-prefix size a filter keeps, if it is one of the literal
    * prefix shapes over `rn`. (`rn = k` for k > 1 selects a single
    * interior rank, not a prefix — no rewrite.) */
  private def filterLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** The two rank orders a struct-comparison aggregate can reproduce
    * exactly. Struct comparison orders a null FIELD first (smallest):
    * under min that ranks nulls first — asc_nulls_first, the `asc()`
    * default; under max nulls lose to every non-null — desc_nulls_last,
    * the `desc()` default. Mixed directions or the non-default null
    * orderings have no struct-monotone encoding — those fall through
    * to the TopKRows path, which carries orderings explicitly. */
  private sealed trait Form
  private case object AscForm extends Form
  private case object DescForm extends Form

  private def formOf(orderSpec: Seq[SortOrder]): Option[Form] =
    if (orderSpec.forall(so =>
      so.direction == Ascending && so.nullOrdering == NullsFirst)) Some(AscForm)
    else if (orderSpec.forall(so =>
      so.direction == Descending && so.nullOrdering == NullsLast)) Some(DescForm)
    else None

  /** Spark's InferWindowGroupLimit may already have inserted a
    * WindowGroupLimit below the Window (it runs in an earlier
    * optimizer batch than user-provided rules). Left in place it
    * forces a per-partition sort AND puts the exchange below the
    * partial aggregation — the exact costs this rewrite deletes.
    * Stripping is value-identical ONLY when the limit provably keeps
    * every rank-prefix candidate of THIS window: same partition and
    * order spec, a rank-like function whose prefix contains
    * row_number's (RowNumber exactly; Rank keeps a superset under
    * ties), and a limit of at least k. Anything else stays in place —
    * a foreign-but-matching-input limit below the aggregate is still
    * value-identical because the original Window consumed its output
    * too; it just isn't ours to delete. */
  private def stripLimit(w: Window, k: Int): LogicalPlan = w.child match {
    case wgl: WindowGroupLimit
        if wgl.limit >= k &&
          wgl.partitionSpec.length == w.partitionSpec.length &&
          wgl.partitionSpec.zip(w.partitionSpec)
            .forall { case (a, b) => a.semanticEquals(b) } &&
          wgl.orderSpec.length == w.orderSpec.length &&
          wgl.orderSpec.zip(w.orderSpec)
            .forall { case (a, b) => a.semanticEquals(b) } &&
          (wgl.rankLikeFunction.isInstanceOf[RowNumber] ||
            wgl.rankLikeFunction.isInstanceOf[Rank]) =>
      wgl.child
    case c => c
  }

  private def rewrite(rn: Attribute, k: Int, w: Window): Option[LogicalPlan] =
    if (k < 1 ||
        !w.orderSpec.forall(_.child.deterministic) ||
        !w.partitionSpec.forall(_.deterministic)) None
    else (formOf(w.orderSpec), k) match {
      case (Some(form), 1) if w.partitionSpec.nonEmpty =>
        Some(rewriteTopOne(rn, w, form))
      case _ => Some(rewriteTopK(rn, w, k))
    }

  /** rn = 1, uniform directions: one codegen'd min_by/max_by over the
    * whole-row struct. */
  private def rewriteTopOne(rn: Attribute, w: Window, form: Form): LogicalPlan = {
    val input = stripLimit(w, 1)
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

  /** rn <= k (or rn = 1 shapes min_by can't encode): bounded-heap
    * [[TopKRows]] + posexplode, rn rebuilt as position + 1. */
  private def rewriteTopK(rn: Attribute, w: Window, k: Int): LogicalPlan = {
    val input = stripLimit(w, k)
    val ordStruct = CreateStruct(w.orderSpec.map(_.child))
    val rowStruct = CreateStruct(input.output)
    val topk = Alias(
      TopKRows(ordStruct, rowStruct, k,
        w.orderSpec.map(_.direction == Ascending),
        w.orderSpec.map(_.nullOrdering == NullsFirst)).toAggregateExpression(),
      "__graft_topk")()
    val groupAttrs = w.partitionSpec.collect { case a: Attribute => a }
    val agg = Aggregate(w.partitionSpec, groupAttrs :+ topk, input)
    val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__graft_row",
      rowStruct.dataType.asInstanceOf[StructType], nullable = false)()
    // the array column itself is consumed by the generator and not
    // needed in the generate output
    val gen = Generate(PosExplode(topk.toAttribute),
      unrequiredChildIndex = Seq(agg.output.length - 1),
      outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), agg)
    val unpacked: Seq[NamedExpression] = input.output.zipWithIndex.map {
      case (a, _) if groupAttrs.exists(_.semanticEquals(a)) => a
      case (a, i) => Alias(
        GetStructField(rowAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
    } :+ Alias(Add(posAttr, Literal(1, IntegerType)), rn.name)(exprId = rn.exprId)
    Project(unpacked, gen)
  }
}

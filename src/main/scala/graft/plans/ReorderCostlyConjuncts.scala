package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft._

/** Cost-based conjunct ordering (SURVEY.md §4 "cascade ordering").
  *
  * Catalyst pushes and prunes predicates but does not reorder the conjuncts
  * of a `Filter` by evaluation cost — it has no cost model for black-box
  * functions. The reference hand-orders its cascade cheap -> expensive
  * (literal match before fuzzy ratio before model scoring,
  * src/dependencies/ChunkProcessor.py:49-71); this rule gives the engine
  * the same property declaratively: within one `Filter`, conjuncts are
  * stably sorted by a static cost estimate, so a cheap `length(x) > 5`
  * guard always short-circuits ahead of a `fuzz_ratio(...) > 90` scan,
  * no matter how the user wrote the query.
  *
  * Safety: `And` is commutative and all involved predicates are pure, so
  * the result set is unchanged (Catalyst's own CombineFilters/PushDownPredicates
  * already reorder conjunct evaluation). The sort is stable and the rule
  * returns the node unchanged when already ordered, so it converges in one
  * pass.
  */
object ReorderCostlyConjuncts extends Rule[LogicalPlan] {

  /** Static per-node weights: custom text kernels dominate, regexes are
    * mid-cost, simple comparisons ~free. Tree cost = sum over nodes. */
  private def nodeCost(e: Expression): Long = e match {
    case _: FuzzRatio | _: FuzzPartialRatio | _: BackgroundPassage |
         _: ShingleJaccard | _: MinHashSig | _: HtmlToText |
         _: ExtractOrgs | _: PseudoEmbedding => 1000L
    case _: SimHash64 | _: NfkcAscii | _: CompanyNameNorm |
         _: NormalizeQuotes | _: DedupLines | _: ScaledDot => 100L
    case _: RLike | _: RegExpExtract | _: RegExpReplace => 25L
    case _: Like | _: Contains | _: StartsWith | _: EndsWith |
         _: StringSplit => 5L
    case _ => 1L
  }

  private def cost(e: Expression): Long =
    nodeCost(e) + e.children.map(cost).sum

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Stable cheap-first reorder; None if already ordered. */
  private def reorder(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    if (conjuncts.length <= 1) None
    else {
      val sorted = conjuncts.sortBy(cost) // stable: equal costs keep order
      if (sorted.corresponds(conjuncts)(_ eq _)) None
      else Some(sorted.reduceLeft(And(_, _)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      reorder(cond).map(Filter(_, child)).getOrElse(f)
    // Join conditions matter just as much: in a (broadcast) nested-loop
    // theta-join the condition runs once per PAIR, so an expensive kernel
    // ahead of a cheap comparison multiplies across the whole cross space
    // (e.g. all-pairs cosine joins evaluating the dot product before the
    // upper-triangle id guard).
    case j @ Join(_, _, _, Some(cond), _) =>
      reorder(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}

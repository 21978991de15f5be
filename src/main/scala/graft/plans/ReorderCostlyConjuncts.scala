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
  * pass. Two guards keep the reorder semantics-preserving:
  *  - non-deterministic conditions are left untouched (reordering changes
  *    how many RNG draws occur — same guard Catalyst's pushdown uses);
  *  - conjuncts that can THROW under ANSI mode (narrowing casts, integral
  *    arithmetic overflow, invalid array index) are never hoisted ahead of
  *    a conjunct that originally preceded them — they sort after all
  *    non-throwing conjuncts in original relative order, so a cheap
  *    `CAST(x AS INT) > 5` can't run ahead of its `x RLIKE '^\d+$'` guard.
  *    (Moving a throwable conjunct LATER only suppresses errors on rows a
  *    cheaper conjunct already rejects — the benign direction, and one
  *    Spark's own predicate reordering already permits.)
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

  /** Conservative "can this conjunct raise under ANSI mode" test: narrowing
    * or string casts, integral/decimal arithmetic (overflow, div by zero),
    * and fallible collection indexing. Double arithmetic and widening casts
    * never throw and stay hoistable. */
  private def throwyType(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Divisor that provably can't trip div-by-zero: a non-zero literal. */
  private def nonZeroLiteral(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case n: java.lang.Number => n.longValue != 0L
      case _ => false
    })

  private def mayThrow(e: Expression): Boolean = e.exists {
    case c: Cast => !Cast.canUpCast(c.child.dataType, c.dataType)
    // integral remainder can't overflow (MinValue % -1 == 0): only the
    // div-by-zero path throws, which a non-zero literal divisor rules out —
    // keeps `id % 5 === 0`-style cheap guards hoistable
    case r: Remainder => throwyType(r.dataType) && !nonZeroLiteral(r.right)
    case p: Pmod => throwyType(p.dataType) && !nonZeroLiteral(p.right)
    case b: BinaryArithmetic => throwyType(b.dataType) // overflow
    case _: ElementAt | _: GetArrayItem => true // invalid index raises
    case m: UnaryMinus => throwyType(m.dataType) // negation overflow
    case a: Abs => throwyType(a.dataType) // abs(MinValue) overflow
    // black-box user code: assume it can throw (and its default nodeCost
    // of 1 would otherwise hoist it ahead of every guard)
    case _: ScalaUDF => true
    // ANSI string->datetime parsing raises on malformed input
    case _: GetTimestamp | _: ParseToDate | _: ParseToTimestamp |
         _: UnixTimestamp | _: ToUnixTimestamp => true
    case _ => false
  }

  /** Stable cheap-first reorder; None if already ordered or unsafe to
    * touch. Throwable conjuncts keep their original relative order after
    * every non-throwing conjunct (never hoisted). */
  private def reorder(cond: Expression): Option[Expression] = {
    if (!cond.deterministic) return None
    val conjuncts = splitConjuncts(cond)
    if (conjuncts.length <= 1) None
    else {
      val (unsafe, safe) = conjuncts.partition(mayThrow)
      val sorted = safe.sortBy(cost) ++ unsafe // both stable
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

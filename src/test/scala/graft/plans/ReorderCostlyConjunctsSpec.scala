package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

import graft.GraftFunctions._
import graft.SparkSpec

class ReorderCostlyConjunctsSpec extends SparkSpec {
  import spark.implicits._

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  test("expensive custom-kernel conjunct moves after the cheap guard") {
    // parquet-backed (a local Seq would be folded by ConvertToLocalRelation)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val q = docs.filter(
      fuzz_ratio($"source", lit("alpha source")) > 55.0 &&
        length($"text") > 50)
    val cond = q.queryExecution.optimizedPlan.collectFirst {
      case Filter(c, _) => c
    }.get
    // Catalyst also infers an isnotnull guard; the invariant is just that
    // the fuzzy kernel lands last, behind every cheap conjunct
    val cs = conjuncts(cond)
    assert(cs.length >= 2, cs)
    assert(cs.init.forall(
      !_.exists(_.isInstanceOf[org.apache.spark.sql.graft.FuzzRatio])),
      s"cheap guards should be evaluated first: $cs")
    assert(cs.last.exists(_.isInstanceOf[org.apache.spark.sql.graft.FuzzRatio]),
      s"fuzzy kernel should be evaluated last: $cs")
  }

  test("join conditions reorder too — pair-wise kernels run after cheap guards") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val a = e.select($"vec_id".as("id_1"), $"embedding".as("qe"))
    val b = e.select($"vec_id".as("id_2"), $"embedding".as("te"))
    val q = a.join(b,
      graft.ops.Similarity.cosineScaled($"qe", $"te") > 0.5 && $"id_1" < $"id_2")
    val cond = q.queryExecution.optimizedPlan.collectFirst {
      case Join(_, _, _, Some(c), _) => c
    }.get
    val cs = conjuncts(cond)
    assert(!cs.head.exists(_.isInstanceOf[org.apache.spark.sql.graft.ScaledDot]),
      s"cheap id guard should be evaluated first: $cs")
  }

  test("non-deterministic conditions are left untouched") {
    // applied directly: Catalyst splits non-deterministic conjuncts into
    // their own Filter during pushdown, so build the node the rule would see
    import org.apache.spark.sql.catalyst.expressions._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val rel = docs.queryExecution.analyzed
    val src = rel.output.find(_.name == "source").get
    val kernel = GreaterThan(
      org.apache.spark.sql.graft.FuzzRatio(src,
        Literal.create("alpha source")), Literal.create(55.0))
    val nd = LessThan(new Rand(Literal.create(42L)), Literal.create(0.5))
    val plan = Filter(And(kernel, nd), rel)
    val out = ReorderCostlyConjuncts(plan)
    assert(out eq plan, s"non-deterministic condition was rewritten: $out")
  }

  test("ANSI-throwable conjunct is never hoisted ahead of its guard") {
    // cast(source) to int throws under ANSI unless guarded by the rlike;
    // cast cost (1) < rlike cost (25), so an unguarded sort would hoist it
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val q = docs.filter(
      $"source".rlike("^[0-9]+$") && $"source".cast("int") > 5)
    val cond = q.queryExecution.optimizedPlan.collectFirst {
      case Filter(c, _) => c
    }.get
    val cs = conjuncts(cond)
    val rlikeIdx = cs.indexWhere(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.RLike]))
    val castIdx = cs.indexWhere(_.exists {
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        c.dataType == org.apache.spark.sql.types.IntegerType
      case _ => false
    })
    assert(rlikeIdx >= 0 && castIdx >= 0 && rlikeIdx < castIdx,
      s"throwable cast hoisted ahead of its rlike guard: $cs")
    // and the query actually runs under ANSI mode (no rows are numeric)
    assert(q.count() == 0L)
  }

  test("reordering never changes the result set") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val expensiveFirst = docs.filter(
      fuzz_partial_ratio($"text", lit("vector stream window")) > 60.0 &&
        $"doc_id" % 5 === 0).select($"doc_id")
    val cheapFirst = docs.filter(
      ($"doc_id" % 5 === 0) &&
        fuzz_partial_ratio($"text", lit("vector stream window")) > 60.0)
      .select($"doc_id")
    assert(expensiveFirst.collect().map(_.getLong(0)).sorted.toSeq ==
      cheapFirst.collect().map(_.getLong(0)).sorted.toSeq)
  }
}

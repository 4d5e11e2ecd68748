package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, IntegerLiteral}
import org.apache.spark.sql.catalyst.plans.logical.{LocalLimit, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.GraftRelation

/** Catalyst optimizer rule that propagates a `LocalLimit` into the graft
  * relation so the scan itself stops after `n` rows per partition.
  *
  * Re-derivation of the reference's headline rule `PropagateJDBCLimit`
  * (reference: src/main/scala/org/apache/spark/sql/PropagateJDBCLimit.scala:14-27):
  *  - match `LocalLimit(IntegerLiteral(n), LogicalRelation(GraftRelation))`;
  *  - swap in a limit-carrying copy of the relation;
  *  - preserve the original output attributes / expr-ids by copying the
  *    `LogicalRelation` rather than rebuilding it (the reference preserves
  *    `rel.attributeMap` values, PropagateJDBCLimit.scala:21) — getting
  *    this wrong breaks alias resolution downstream;
  *  - keep the `LocalLimit` on top so limit semantics hold even if the
  *    source returns more rows (PropagateJDBCLimit.scala:26).
  */
object PropagateLimitToGraft extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case ll @ LocalLimit(IntegerLiteral(n),
        lr @ LogicalRelation(rel: GraftRelation, _, _, _, _))
        if rel.limit < 0 && n >= 0 =>
      ll.withNewChildren(Seq(lr.copy(relation = rel.copy(limit = n))))
    // Catalyst's ColumnPruning pushes attribute-only Projects beneath
    // limits before user-provided rules run, so also see through one
    // pruning Project (safe: a pure projection neither adds, drops, nor
    // reorders rows).
    case ll @ LocalLimit(IntegerLiteral(n),
        p @ Project(projList,
          lr @ LogicalRelation(rel: GraftRelation, _, _, _, _)))
        if rel.limit < 0 && n >= 0 &&
          projList.forall(_.isInstanceOf[AttributeReference]) =>
      ll.withNewChildren(Seq(p.withNewChildren(
        Seq(lr.copy(relation = rel.copy(limit = n))))))
  }

  /** Idempotently install into a live session via
    * `spark.experimental.extraOptimizations` — the mechanism the reference
    * documents (reference README.md:15,36). New sessions should prefer
    * [[graft.GraftExtensions]] (`SparkSessionExtensions.injectOptimizerRule`).
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) spark.experimental.extraOptimizations = cur :+ this
  }
}

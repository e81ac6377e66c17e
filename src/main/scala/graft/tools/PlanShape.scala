package graft.tools

import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}

/** EXECUTION-honest plan-shape counts, shared by tools/DumpPlans (the
  * PLANS.md appendix) and PlanInventorySpec (the `sbt test` ceiling
  * gate). The previous counters were textual over
  * `executedPlan.toString`, which mis-reads two node families:
  *
  *  - a lazily CACHED subtree (`InMemoryTableScan` over the same
  *    `InMemoryRelation`, or a [[graft.Materialize.stageLazy]] frame
  *    printed before its first action) prints
  *    its build plan under EVERY consumer but executes it once; the
  *    textual count charged it once per consumer, so collapsing five
  *    redundant subtrees into one cached build made the "exchange
  *    count" go UP while the executed shuffles went DOWN (observed on
  *    the r19 shuffle audit: assoc_lift_daily 9→10 textual while
  *    9→5 executed);
  *  - a `ReusedExchange` points at work counted at its definition site.
  *
  * So: walk the tree, counting each cached build ONCE (deduped by its
  * CachedRDDBuilder identity — two scans of the same relation share
  * it), skip reuse pointers, descend through AQE wrappers. Subquery
  * plans are intentionally NOT walked, matching what `toString` printed
  * — the pins were derived under that rule and subqueries execute once.
  */
object PlanShape {

  /** (shuffle exchanges, broadcast-hash joins, sort-merge joins,
    * nested-loop joins, distinct codegen stage ids). */
  final case class Shape(exchanges: Int, bhj: Int, smj: Int,
      nestedLoop: Int, codegenStages: Int)

  def of(plan: SparkPlan): Shape = {
    val cachedSeen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var ex = 0; var bhj = 0; var smj = 0; var nl = 0
    val codegenIds = scala.collection.mutable.Set.empty[Int]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec        => walk(s.plan)
      case _: ReusedExchangeExec    => () // counted at its definition
      case t: InMemoryTableScanExec =>
        if (cachedSeen.add(t.relation.cacheBuilder))
          walk(t.relation.cachedPlan)
      case w: WholeStageCodegenExec =>
        codegenIds += w.codegenStageId; w.children.foreach(walk)
      case other =>
        other match {
          case _: ShuffleExchangeLike         => ex += 1
          case _: BroadcastHashJoinExec       => bhj += 1
          case _: SortMergeJoinExec           => smj += 1
          case _: BroadcastNestedLoopJoinExec => nl += 1
          case _: CartesianProductExec        => nl += 1
          case _                              => ()
        }
        other.children.foreach(walk)
    }
    walk(plan)
    Shape(ex, bhj, smj, nl, codegenIds.size)
  }
}

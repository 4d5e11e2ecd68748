package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` entry point — the Spark-4 idiomatic
  * replacement for the reference's `spark.experimental.extraOptimizations`
  * installation (reference README.md:15,36):
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.PropagateLimitToGraft)
    // opt-in theta→equi bin rewrite for point-in-interval joins
    // (fires only when spark.graft.binnedRangeJoin.width > 0)
    e.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRewrite)
    graft.functions.GraftFunctions.sqlFunctionDescriptors
      .foreach(e.injectFunction)
    // CREATE/DROP/REFRESH MATERIALIZED VIEW ([[graft.plans
    // .GraftSqlParser]]); everything else delegates verbatim
    e.injectParser((_, delegate) =>
      new graft.plans.GraftSqlParser(delegate))
  }
}

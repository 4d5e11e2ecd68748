package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations we rely on at 100 TB must
  * actually appear in the plan (SURVEY.md §4) — filter pushdown reaching
  * the scan, column pruning in ReadSchema, broadcast joins for small
  * dims, TakeOrderedAndProject for top-k, partial aggregation.
  */
class PlanSpec extends SparkTestBase {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet filter pushdown: PushedFilters reach the scan") {
    val df = Tables.t(spark, sf001, "lineitem")
      .filter(col("l_quantity") < 10 && col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    val plan = physical(df)
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("LessThan(l_quantity,10.0)") ||
      plan.contains("LessThan(l_quantity"), plan)
  }

  test("column pruning: ReadSchema carries only required columns") {
    val df = Tables.t(spark, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = physical(df)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      plan)
  }

  test("graft V1 relation reports pushed filters on its scan node") {
    val df = Tables.graftScan(spark, sf001, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    val plan = physical(df)
    assert(plan.contains("GraftRelation"), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
  }

  test("graft V1 relation reports real size -> dims auto-broadcast") {
    // no explicit broadcast() hint: Catalyst must decide from sizeInBytes
    val li = Tables.graftScan(spark, sf001, "lineitem")
    val n = Tables.graftScan(spark, sf001, "nation")
    val df = li.join(n, li("l_suppkey") % 25 === n("n_nationkey"))
    assert(physical(df).contains("BroadcastHashJoin"),
      s"nation (tiny) should auto-broadcast:\n${physical(df)}")
  }

  test("graft-v2 scan reports statistics -> dims auto-broadcast") {
    val li = spark.read.format("graft-v2")
      .option("path", s"$sf001/lineitem.parquet").load()
    val n = spark.read.format("graft-v2")
      .option("path", s"$sf001/nation.parquet").load()
    val df = li.join(n, li("l_suppkey") % 25 === n("n_nationkey"))
    assert(physical(df).contains("BroadcastHashJoin"),
      s"v2 nation (tiny) should auto-broadcast:\n${physical(df)}")
  }

  test("small dimension joins broadcast") {
    val c = Tables.t(spark, sf001, "customer")
    val n = Tables.t(spark, sf001, "nation")
    val df = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
    assert(physical(df).contains("BroadcastHashJoin"), physical(df))
  }

  test("order-by + limit plans as TakeOrderedAndProject (top-k, no full sort)") {
    val df = SparkEntry.queries("q_topk")(spark, sf001)
    assert(physical(df).contains("TakeOrderedAndProject"), physical(df))
  }

  test("aggregation runs partial+final (map-side combine)") {
    val df = Tables.t(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    val plan = physical(df)
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan)
  }

  test("whole-stage codegen covers the scan->project->filter pipeline") {
    val df = Tables.t(spark, sf001, "lineitem")
      .filter(col("l_quantity") > 1).select(col("l_orderkey") * 2)
    // codegen'd stages render as "*(n)" in the plan string
    assert(physical(df).contains("*(1)"), physical(df))
  }

  test("as-of join plans a single shuffle (window), no nested loop") {
    val ev = Tables.t(spark, sf001, "events")
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "signup")
    val df = graft.operators.AsOfJoin.join(l, r, "user_id", "ts", "ts",
      Seq("event_id"))
    val plan = physical(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      plan)
  }

  test("gram/token explodes never leak a re-derived tokenizer into " +
      "the scan's DataFilters (InferFiltersFromGenerate trap)") {
    // an inner explode over the aliased gram array lets Catalyst infer
    // size(arr) > 0 and push the WHOLE tokenize pipeline into the scan
    // as an interpreted DataFilter — a measured 10x on the gram family;
    // the operators use explode_outer + output-null-filter to stay out
    // of that rule's reach
    val docs = Tables.t(spark, sf001, "documents")
    val shapes = Seq(
      "wordNgrams" -> graft.operators.CorpusOps.wordNgrams(docs, 3),
      "commonNgrams" ->
        graft.operators.CorpusOps.commonNgrams(docs, 3, 2),
      "tfIdf" -> graft.operators.TextSearch.tfIdfKeywords(docs, 2),
      "bm25" -> graft.operators.TextSearch.bm25(docs, "hash join", 5))
    shapes.foreach { case (name, df) =>
      val scans = physical(df).linesIterator
        .filter(_.contains("FileScan")).toSeq
      assert(scans.nonEmpty, s"$name: no scan?")
      scans.foreach { s =>
        assert(!s.contains("split("),
          s"$name re-tokenizes inside the scan filter: $s")
      }
    }
  }
}

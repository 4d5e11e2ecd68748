package graft

import org.apache.spark.sql.functions._

/** DataSource V2 source: schema inference, value parity with the
  * vectorized parquet reader, pushdown of columns/filters/limit through
  * `V2ScanRelationPushDown` (no custom rule), row-group partitioning.
  */
class SourceV2Spec extends SparkTestBase {

  private def v2(name: String) =
    spark.read.format("graft-v2")
      .option("path", s"$sf001/$name.parquet").load()

  test("schema inference matches the vectorized reader") {
    assert(v2("lineitem").schema ==
      spark.read.parquet(s"$sf001/lineitem.parquet").schema)
    assert(v2("orders").schema ==
      spark.read.parquet(s"$sf001/orders.parquet").schema)
  }

  test("full-table values match the vectorized reader (incl. timestamps)") {
    val a = v2("orders")
    val b = spark.read.parquet(s"$sf001/orders.parquet")
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("strings and nulls round-trip") {
    val a = v2("customer")
    val b = spark.read.parquet(s"$sf001/customer.parquet")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("filter + projection + limit land in the V2 scan") {
    val df = v2("lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .select(col("l_orderkey"), col("l_quantity"))
      .limit(7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScanV2"), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    assert(plan.contains("PushedLimit: 7"), plan)
    assert(df.count() == 7)
    // correctness of the filtered result vs vectorized reader
    val expected = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .count()
    val got = v2("lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .count()
    assert(got == expected)
  }

  test("unsupported filter stays a Spark-side residual, result correct") {
    val got = v2("lineitem").filter(col("l_quantity") + 1 > 5).count()
    val expected = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(col("l_quantity") + 1 > 5).count()
    assert(got == expected)
  }

  test("aggregation over the v2 source matches the v1 path") {
    val a = v2("lineitem").groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
    val b = Tables.t(spark, sf001, "lineitem").groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("nested/array schema is rejected with a clear error") {
    val e = intercept[Exception] {
      v2("embeddings").collect()
    }
    assert(e.getMessage.contains("flat primitive schemas"), e.getMessage)
  }

  test("multi-file directory: one partition per row group") {
    val src = Tables.t(spark, sf001, "orders")
    val dir = java.nio.file.Files.createTempDirectory("graft-v2-dir")
      .resolve("multi").toString
    src.repartition(3).write.parquet(dir)
    val df = spark.read.format("graft-v2").option("path", dir).load()
    assert(df.rdd.getNumPartitions >= 3)
    assert(df.count() == src.count())
  }
}

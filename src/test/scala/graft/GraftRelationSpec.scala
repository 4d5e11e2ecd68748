package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.sources.{GraftFilters, GraftRelation}

/** Scan-surface contracts: pruning, filter pushdown, residuals,
  * partitioned read (reference JDBCRelationWithLimit.scala:29-43,
  * JDBCRDDWithLimit.scala:36-63).
  */
class GraftRelationSpec extends SparkTestBase {

  private def rel(np: Int = 1, pc: Option[String] = None) =
    GraftRelation(spark, s"$sf001/lineitem.parquet", np, pc)

  test("schema resolves eagerly from parquet footer") {
    assert(rel().schema.fieldNames.contains("l_orderkey"))
    assert(rel().schema.size == 11)
  }

  // needConversion=false: the scan emits InternalRow typed as Row
  // (reference JDBCRelationWithLimit.scala:24 declares the same)
  private def asInternal(rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) =
    rdd.asInstanceOf[org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow]]

  test("column pruning: scan returns only required columns, in order") {
    val rdd = asInternal(
      rel().buildScan(Array("l_quantity", "l_orderkey"), Array.empty))
    val row = rdd.first()
    assert(row.numFields == 2)
    // order must match requiredColumns: (double, long)
    assert(row.getDouble(0) >= 0.0 && row.getLong(1) >= 0L)
  }

  test("zero required columns degenerates to constant (count-only scan)") {
    val rdd = asInternal(rel().buildScan(Array.empty, Array.empty))
    assert(rdd.first().numFields == 1)
    assert(rdd.count() == spark.read.parquet(s"$sf001/lineitem.parquet").count())
  }

  test("pushed filters reduce scan output") {
    val rdd = rel().buildScan(Array("l_orderkey"),
      Array(EqualTo("l_returnflag", "R"), LessThan("l_quantity", 5.0)))
    val expected = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 5.0).count()
    assert(rdd.count() == expected)
  }

  test("unhandledFilters reports only what compile() rejects") {
    val r = rel()
    val supported: Array[Filter] = Array(EqualTo("l_returnflag", "R"),
      In("l_linenumber", Array(1, 2)), IsNotNull("l_comment_x"),
      Or(EqualTo("l_returnflag", "R"), GreaterThan("l_quantity", 1.0)))
    assert(r.unhandledFilters(supported).isEmpty)
    val unsupported: Array[Filter] = Array(AlwaysTrue)
    assert(r.unhandledFilters(unsupported).sameElements(unsupported))
  }

  test("filter compiler covers the sources.Filter algebra") {
    assert(GraftFilters.compile(Not(EqualTo("a", 1))).isDefined)
    assert(GraftFilters.compile(And(IsNull("a"), IsNotNull("b"))).isDefined)
    assert(GraftFilters.compile(StringStartsWith("a", "x")).isDefined)
    assert(GraftFilters.compile(StringEndsWith("a", "x")).isDefined)
    assert(GraftFilters.compile(StringContains("a", "x")).isDefined)
    assert(GraftFilters.compile(AlwaysTrue).isEmpty)
  }

  test("partitioned scan: disjoint hash buckets cover the table exactly") {
    val r = rel(np = 4, pc = Some("l_orderkey"))
    val rdd = r.buildScan(Array("l_orderkey"), Array.empty)
    // single scan + one exchange: exactly N output partitions
    assert(rdd.getNumPartitions == 4)
    assert(rdd.count() ==
      spark.read.parquet(s"$sf001/lineitem.parquet").count())
    // per-partition contract: rows are co-located by the partition
    // column — a given l_orderkey value lands in exactly one partition
    val keyToParts = asInternal(rdd).mapPartitionsWithIndex { (pid, it) =>
      it.map(row => (row.getLong(0), pid))
    }.distinct().collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(keyToParts.forall(_._2.length == 1),
      "a partition-column value appeared in more than one partition")
  }

  test("partitioned scan works when the partition column is not projected") {
    val r = rel(np = 4, pc = Some("l_orderkey"))
    // count-style: zero required columns
    val none = r.buildScan(Array.empty, Array.empty)
    assert(none.count() ==
      spark.read.parquet(s"$sf001/lineitem.parquet").count())
    // projection that omits the partition column
    val other = r.buildScan(Array("l_quantity"), Array.empty)
    assert(other.getNumPartitions == 4)
    assert(other.count() ==
      spark.read.parquet(s"$sf001/lineitem.parquet").count())
  }

  test("format(\"graft\") round-trips through DataSourceRegister") {
    val df = spark.read.format("graft")
      .option("path", s"$sf001/nation.parquet").load()
    assert(df.count() == 25)
  }
}

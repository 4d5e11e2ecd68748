package graft

import org.apache.spark.sql.functions._

/** SQL + UDF surface (SURVEY.md §2j): scalar UDF registration, SQL-API
  * access to the same tables, and the graft relation addressable from
  * `spark.sql` via a temp view.
  */
class SqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("native expressions are reachable from pure SQL (extensions set)") {
    val reg = spark.sessionState.functionRegistry
    graft.functions.GraftFunctions.sqlFunctionDescriptors.foreach {
      case (id, info, builder) => reg.registerFunction(id, info, builder)
    }
    assert(spark.sql(
      "SELECT lang_guess('the cat and the dog went into the house')")
      .head.getString(0) == "en")
    assert(spark.sql("SELECT simhash64('hello world hello')")
      .head.getLong(0) != 0L)
    assert(spark.sql("SELECT size(minhash_sig('a b c d e f g', 16, 3))")
      .head.getInt(0) == 16)
    assert(spark.sql("SELECT ngram_jaccard('abcdef', 'abcdef', 3)")
      .head.getDouble(0) == 1.0)
    assert(!spark.sql(
      "SELECT doc_fingerprint('some reasonably long text here', 8)")
      .head.isNullAt(0))
    // non-literal where a literal is required -> clear error
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig('x', 1 + 1, 3)").collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("scalar UDF registers and evaluates (udf() + SQL register)") {
    val discounted = udf((price: Double, disc: Double) => price * (1 - disc))
    spark.udf.register("discounted", discounted)
    val li = Tables.t(spark, sf001, "lineitem")
    val viaColumn = li.select(
      discounted($"l_extendedprice", $"l_discount").as("d")).agg(sum($"d"))
      .head.getDouble(0)
    li.createOrReplaceTempView("li_udf")
    val viaSql = spark.sql(
      "SELECT sum(discounted(l_extendedprice, l_discount)) FROM li_udf")
      .head.getDouble(0)
    assert(math.abs(viaColumn - viaSql) < 1e-6)
    val manual = li.select(
      ($"l_extendedprice" * (lit(1) - $"l_discount")).as("d"))
      .agg(sum($"d")).head.getDouble(0)
    assert(math.abs(viaColumn - manual) < 1e-6)
  }

  test("TPC-H-Q1-shaped SQL over temp views matches the DataFrame plan") {
    Tables.t(spark, sf001, "lineitem").createOrReplaceTempView("lineitem_v")
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS count_order
      FROM lineitem_v
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
    val df = Tables.t(spark, sf001, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("double")
        .as("sum_qty"), count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("graft relation is queryable through spark.sql on a view") {
    Tables.graftScan(spark, sf001, "orders").createOrReplaceTempView("orders_g")
    val n = spark.sql(
      "SELECT count(*) FROM orders_g WHERE o_totalprice > 100000")
      .head.getLong(0)
    val expected = Tables.t(spark, sf001, "orders")
      .filter($"o_totalprice" > 100000).count()
    assert(n == expected)
  }

  test("generator/UDTF surface: explode of a custom function's array") {
    val splitWords = udf((s: String) => s.split("\\s+"))
    val docs = Tables.t(spark, sf001, "documents").limit(20)
    val exploded = docs.select($"doc_id",
      explode(splitWords($"text")).as("word"))
    val viaRegexp = docs.select($"doc_id",
      explode(split($"text", "\\s+")).as("word"))
    assert(exploded.count() == viaRegexp.count())
  }
}

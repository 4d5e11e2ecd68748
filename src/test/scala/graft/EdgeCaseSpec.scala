package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Null and empty-input semantics — the testdata carries no NULLs, so
  * these paths only get exercised here.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  test("null-intolerant expressions null out instead of throwing") {
    val df = Seq((Option.empty[String], Option(Seq(1.0, 2.0))),
      (Some("text here"), None)).toDF("txt", "vec")
    val out = df.select(
      simhash($"txt").as("sh"),
      fingerprint($"txt", 8).as("fp"),
      minhash($"txt", 8, 2).as("mh"),
      lang_guess($"txt").as("lg"),
      cosine_sim($"vec", $"vec").as("cs"),
      ngram_jaccard($"txt", $"txt", 3).as("nj")).collect()
    val r0 = out(0) // null text
    assert(r0.isNullAt(0) && r0.isNullAt(1) && r0.isNullAt(2) &&
      r0.isNullAt(3) && !r0.isNullAt(4) && r0.isNullAt(5))
    val r1 = out(1) // null vec
    assert(!r1.isNullAt(0) && r1.isNullAt(4))
  }

  test("empty and degenerate text inputs") {
    val df = Seq("", " ", "a").toDF("txt")
    val rows = df.select(simhash($"txt"), minhash($"txt", 4, 3),
      fingerprint($"txt", 8), lang_guess($"txt")).collect()
    assert(rows.length == 3) // no exceptions
    // empty text: minhash signature is all sentinel values, lang und
    assert(rows(0).getSeq[Long](1).forall(_ == Long.MaxValue))
    assert(rows(0).getString(3) == "und")
  }

  test("mismatched vector lengths take the common prefix") {
    val df = Seq((Seq(1.0, 0.0, 0.0), Seq(1.0))).toDF("a", "b")
    assert(df.select(cosine_sim($"a", $"b")).head.getDouble(0) == 1.0)
  }

  test("aggregations on empty input: global agg yields one row, grouped none") {
    val empty = Tables.t(spark, sf001, "lineitem")
      .filter(col("l_quantity") < -1)
    assert(empty.groupBy(col("l_returnflag")).count().count() == 0)
    val row = empty.agg(count(lit(1)), sum(col("l_quantity"))).head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("graft scan with always-false filter returns empty, not error") {
    val df = Tables.graftScan(spark, sf001, "lineitem")
      .filter(col("l_orderkey") < -1)
    assert(df.count() == 0)
  }

  test("dedup on empty corpus returns empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.exact(empty).count() == 0)
    assert(graft.operators.Dedup.minHashLsh(empty).count() == 0)
    assert(graft.operators.Dedup.simHashDups(empty).count() == 0)
  }

  test("as-of join with empty right side keeps left rows with nulls") {
    val l = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10")))
      .toDF("event_id", "user_id", "ts")
    val r = l.filter(lit(false))
    val out = graft.operators.AsOfJoin.join(l, r, "user_id", "ts", "ts",
      Seq("event_id"))
    assert(out.count() == 1)
    assert(out.head.isNullAt(out.columns.indexOf("asof_event_id")))
  }
}

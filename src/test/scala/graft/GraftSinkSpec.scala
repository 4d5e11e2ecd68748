package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{AnalysisException, SaveMode}
import org.apache.spark.sql.functions._

import graft.sources.{GraftSink, Retry}

/** Write path: SaveMode matrix + all-or-nothing commit protocols
  * (reference ExtJdbcRelationProvider.scala:25-53, ExtJdbcUtils.scala:70-109).
  */
class GraftSinkSpec extends SparkTestBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").resolve("out").toString

  private def nation = spark.read.parquet(s"$sf001/nation.parquet")

  test("saveAtomic writes parquet readable back; Overwrite replaces") {
    val dir = tmp()
    GraftSink.saveAtomic(nation, dir, SaveMode.ErrorIfExists)
    assert(spark.read.parquet(dir).count() == 25)
    GraftSink.saveAtomic(nation.limit(5), dir, SaveMode.Overwrite)
    assert(spark.read.parquet(dir).count() == 5)
  }

  test("SaveMode.ErrorIfExists throws; Ignore is a no-op") {
    val dir = tmp()
    GraftSink.saveAtomic(nation, dir, SaveMode.ErrorIfExists)
    intercept[AnalysisException] {
      GraftSink.saveAtomic(nation, dir, SaveMode.ErrorIfExists)
    }
    GraftSink.saveAtomic(nation.limit(1), dir, SaveMode.Ignore)
    assert(spark.read.parquet(dir).count() == 25, "Ignore must not write")
  }

  test("write.format(\"graft\") applies the SaveMode matrix") {
    val dir = tmp()
    nation.write.format("graft").option("path", dir).save()
    assert(spark.read.parquet(dir).count() == 25)
    nation.limit(3).write.format("graft").option("path", dir)
      .mode(SaveMode.Overwrite).save()
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("saveCompensating commits all partitions on success") {
    val dir = tmp()
    val df = nation.repartition(4)
    GraftSink.saveCompensating(df, dir)
    // parquet part files are self-describing: no schema hint on read-back
    val back = GraftSink.readCompensating(spark, dir)
    assert(back.count() == 25)
    assert(back.schema == nation.schema)
    assert(back.agg(sum(col("n_nationkey"))).head.getLong(0) ==
      nation.agg(sum(col("n_nationkey"))).head.getLong(0))
  }

  test("saveCompensating rolls back committed partitions on any failure") {
    val dir = tmp()
    val df = nation.repartition(4)
    val e = intercept[RuntimeException] {
      GraftSink.saveCompensating(df, dir, failPartition = 2)
    }
    assert(e.getMessage.contains("rolled back"))
    // compensating delete removed every committed task's file
    val remaining = new java.io.File(dir).listFiles()
    assert(remaining == null || remaining.forall(!_.getName.startsWith("part-")),
      s"files left behind: ${Option(remaining).map(_.toSeq)}")
  }

  test("saveAtomic Overwrite keeps old contents when the staged write fails") {
    val dir = tmp()
    GraftSink.saveAtomic(nation, dir, SaveMode.ErrorIfExists)
    val boom = org.apache.spark.sql.functions.udf { (i: Int) =>
      if (i >= 0) throw new RuntimeException("boom"); i
    }
    val bad = nation.withColumn("x", boom(col("n_nationkey")))
    intercept[Exception] { GraftSink.saveAtomic(bad, dir, SaveMode.Overwrite) }
    // staging-first: the failed write never touched the target
    assert(spark.read.parquet(dir).count() == 25)
  }

  test("saveAtomic Overwrite+truncate preserves the directory object") {
    val dir = tmp()
    GraftSink.saveAtomic(nation, dir, SaveMode.ErrorIfExists)
    // a non-part metadata file stands in for ACLs/ownership/markers
    Files.write(Paths.get(dir, "_graft_marker"), "keep".getBytes)
    GraftSink.saveAtomic(nation.limit(5), dir, SaveMode.Overwrite,
      truncate = true)
    assert(spark.read.parquet(dir).count() == 5)
    assert(Files.exists(Paths.get(dir, "_graft_marker")),
      "truncate-and-load must keep non-data directory contents")
    // whereas drop-and-recreate replaces the directory wholesale
    GraftSink.saveAtomic(nation.limit(7), dir, SaveMode.Overwrite)
    assert(spark.read.parquet(dir).count() == 7)
    assert(!Files.exists(Paths.get(dir, "_graft_marker")))
  }

  test("INSERT INTO / INSERT OVERWRITE through InsertableRelation") {
    val dir = tmp()
    GraftSink.saveAtomic(nation, dir, SaveMode.ErrorIfExists)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ins " +
      s"USING graft OPTIONS (path '$dir')")
    try {
      spark.sql("INSERT INTO graft_ins SELECT * FROM graft_ins LIMIT 5")
      assert(spark.read.parquet(dir).count() == 30) // append semantics
      spark.sql(
        "INSERT OVERWRITE TABLE graft_ins SELECT * FROM graft_ins LIMIT 3")
      assert(spark.read.parquet(dir).count() == 3) // replace semantics
    } finally spark.catalog.dropTempView("graft_ins")
  }

  test("retry helper: succeeds after transient failures") {
    var attempts = 0
    val v = Retry.withDeadline(sleepMs = 1, deadlineMs = 5000) {
      attempts += 1
      if (attempts < 3) throw new RuntimeException("transient")
      42
    }
    assert(v == 42 && attempts == 3)
  }

  test("retry helper: gives up after the deadline") {
    intercept[RuntimeException] {
      Retry.withDeadline(sleepMs = 5, deadlineMs = 30) {
        throw new RuntimeException("always fails")
      }
    }
  }
}

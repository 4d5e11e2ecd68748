package graft

import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contracts (SURVEY.md §5.3): pushdown never changes
  * results, limit composes as min, write-then-read round-trips.
  */
class PropertySpec extends AnyFunSuite {
  /** Deterministic scalacheck sampling (scalatest-scalacheck bridge is
    * not on the offline classpath, so drive Gen directly). */
  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  lazy val spark = SparkTestBase.session
  val sf001 = "/root/testdata/sf0.001"

  private val filterPool: Seq[(String, Column)] = Seq(
    ("qty<10", col("l_quantity") < 10),
    ("flag=R", col("l_returnflag") === "R"),
    ("lineno in (1,2)", col("l_linenumber").isin(1, 2)),
    ("price>=2000", col("l_extendedprice") >= 2000.0),
    ("status!=F", col("l_linestatus") =!= "F"),
    ("orderkey<500", col("l_orderkey") < 500L))

  private val genFilter: Gen[Seq[Int]] =
    Gen.someOf(filterPool.indices).map(_.toSeq)

  test("pushed filters never change results vs unpushed evaluation") {
    val plain = spark.read.parquet(s"$sf001/lineitem.parquet")
    forAllSeeded(genFilter, 12) { picks =>
      val conds = picks.map(filterPool(_)._2)
      val cond = conds.foldLeft(lit(true))(_ && _)
      val viaGraft = Tables.graftScan(spark, sf001, "lineitem")
        .filter(cond).agg(count(lit(1)),
          sum(col("l_orderkey")), sum(col("l_linenumber"))).head
      val viaSpark = plain.filter(cond).agg(count(lit(1)),
        sum(col("l_orderkey")), sum(col("l_linenumber"))).head
      assert(viaGraft == viaSpark, s"filters=$picks")
    }
  }

  test("limit composes: q.limit(n).limit(m) has min(n,m) rows") {
    val gen = for {
      n <- Gen.choose(0, 40)
      m <- Gen.choose(0, 40)
    } yield (n, m)
    forAllSeeded(gen, 10) { case (n, m) =>
      val c = Tables.graftScan(spark, sf001, "lineitem")
        .limit(n).limit(m).count()
      assert(c == math.min(n, m))
    }
  }

  test("write-then-read round-trips (atomic parquet sink)") {
    val src = spark.read.parquet(s"$sf001/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-prop")
      .resolve("o").toString
    graft.sources.GraftSink.saveAtomic(src, dir, SaveMode.Overwrite)
    val back = spark.read.parquet(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("compensating-commit sink round-trips values through parquet parts") {
    val src = spark.read.parquet(s"$sf001/customer.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-prop")
      .resolve("c").toString
    graft.sources.GraftSink.saveCompensating(src, dir)
    val back = graft.sources.GraftSink.readCompensating(spark, dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}

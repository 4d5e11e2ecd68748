package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

/** `spark.read.format("graft")` / `df.write.format("graft")` provider —
  * the analog of the reference's `ExtJdbcRelationProvider`
  * (reference: src/main/scala/org/apache/spark/sql/ExtJdbcRelationProvider.scala:7-61):
  * read side returns the pruning/filtering/limit-capable [[GraftRelation]];
  * write side applies the SaveMode matrix and the all-or-nothing commit
  * protocol ([[GraftSink.saveAtomic]]), then re-resolves and returns the
  * read relation (ExtJdbcRelationProvider.scala:58).
  */
class GraftSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a 'path' option"))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftRelation(
      sqlContext.sparkSession,
      path(parameters),
      numPartitions = parameters.getOrElse("numPartitions", "1").toInt,
      partitionColumn = parameters.get("partitionColumn"))

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val checked = enforceChecks(data, path(parameters))
    parameters.get("replaceWhere") match {
      case Some(condSql) =>
        // Delta-style predicate overwrite through the writer syntax:
        // `df.write.format("graft").mode("overwrite")
        //    .option("replaceWhere", "day = DATE '2024-06-01'")`.
        // Only Overwrite makes sense — the option *scopes* the
        // overwrite; any other mode is a user error, not a fallback.
        if (mode != SaveMode.Overwrite) {
          throw new IllegalArgumentException(
            s"graft: option 'replaceWhere' requires SaveMode.Overwrite, got $mode")
        }
        GraftSink.replaceWhere(checked, path(parameters), condSql)
      case None =>
        // `truncate` option mirrors the reference's truncate-and-load vs
        // drop-and-recreate Overwrite split (ExtJdbcRelationProvider.scala:28-34).
        GraftSink.saveAtomic(checked, path(parameters), mode,
          truncate = parameters.getOrElse("truncate", "false").toBoolean)
    }
    createRelation(sqlContext, parameters)
  }

  /** CHECK-constraint enforcement for V1 path writes. The catalog's
    * analyzer-side enforcement (`Table.constraints()` +
    * `ResolveTableConstraints`) only covers V2 write plans; a
    * `df.write.format("graft")` save used to land rows unvalidated on
    * a constrained table. The guard is a single-pass filter whose
    * predicate either evaluates `true` or raises — no extra scan of
    * the input, stays inside codegen, and a NULL predicate passes per
    * ANSI CHECK semantics. */
  private def enforceChecks(data: DataFrame, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = new org.apache.hadoop.fs.Path(dir)
    val checks = scala.util.Try(
      graft.sources.v2.GraftCatalog.readChecks(
        p.getFileSystem(
          graft.sources.v2.GraftHadoopConf.sessionConf()), p))
      .getOrElse(Nil).filter(_.enforced)
    if (checks.isEmpty) data
    else checks.foldLeft(data) { (df, c) =>
      df.filter(
        when(coalesce(expr(c.predicateSql), lit(true)), lit(true))
          .otherwise(raise_error(lit(
            s"graft: CHECK constraint '${c.name}' " +
              s"(${c.predicateSql}) violated"))))
    }
  }
}

package object graft {
  import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

  /** Writer syntax sugar — the analog of the reference's
    * `writer.extjdbc(url, table, props)` implicit
    * (reference: src/main/scala/com/github/sadikovi/package.scala:8-17):
    *
    * {{{
    * import graft._
    * df.write.mode("overwrite").graft("/path/out")
    * }}}
    */
  implicit class GraftDataFrameWriterOps(val writer: DataFrameWriter[Row])
      extends AnyVal {
    def graft(path: String): Unit =
      writer.format("graft").option("path", path).save()
  }
}

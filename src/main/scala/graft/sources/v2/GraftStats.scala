package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-level column statistics for the COST-BASED OPTIMIZER:
  * `CALL <cat>.system.analyze(table => 'ns.t')` computes per-column
  * distinct and null counts in ONE aggregate pass (codegen'd
  * `approx_count_distinct` + `count` — no per-column jobs) and
  * persists them in a `.graft-stats` sidecar; every scan then reports
  * them through V2 `Statistics.columnStats()`, which Spark's
  * `DataSourceV2Relation.transformV2Stats` turns into catalyst
  * `ColumnStat`s — the NDV/null inputs CBO join reordering and
  * selectivity estimation feed on (`spark.sql.cbo.enabled`).
  *
  * Scope and staleness, deliberately simple:
  *  - top-level atomic columns only (nested/array columns carry no
  *    per-column CBO stats);
  *  - min/max are NOT duplicated here — footer statistics already
  *    serve pruning exactly, per file, always fresh;
  *  - the sidecar records the manifest version (or row count) it was
  *    computed at; scans report stats AS ESTIMATES regardless of
  *    later commits (numRows stays footer-exact per scan — only the
  *    NDV/null ratios age), the same advisory contract every
  *    ANALYZE-style command documents. Re-run analyze after bulk
  *    mutations. */
object GraftStats {

  val FileName = ".graft-stats"
  private val Header = "graft-stats-1"

  /** `avgLen`/`maxLen` are -1 for non-length-bearing types (numeric
    * widths are implied by the type; CBO row-size estimation only
    * needs measured lengths for strings/binaries). */
  final case class ColStat(distinct: Long, nulls: Long,
      avgLen: Long = -1L, maxLen: Long = -1L)
  final case class TableStats(version: Long, rows: Long,
      cols: Map[String, ColStat])

  /** One aggregate pass over the CURRENT table state; persists and
    * returns the stats. */
  def analyze(spark: SparkSession, path: String): TableStats = {
    val table = new Path(path)
    val fs = table.getFileSystem(GraftHadoopConf.sessionConf())
    val df = spark.read.format("graft-v2").option("path", path).load()
    val fields = df.schema.fields.toSeq.filter(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case _ => true
    })
    val cols = fields.map(_.name)
    def lengthy(f: StructField): Boolean = f.dataType match {
      case StringType | BinaryType => true
      case _ => false
    }
    val aggs = count(lit(1)).as("__rows") +:
      fields.flatMap { f =>
        val c = f.name
        Seq(approx_count_distinct(col(c)).as(s"__d_$c"),
          count(col(c)).as(s"__n_$c")) ++
          (if (lengthy(f)) Seq(
            ceil(avg(length(col(c)))).cast("long").as(s"__al_$c"),
            max(length(col(c))).cast("long").as(s"__ml_$c"))
          else Nil)
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")
    def optLen(name: String): Long =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(
          row.fieldIndex(name))) row.getAs[Long](name)
      else -1L
    val stats = TableStats(
      GraftManifest.current(fs, table).map(_.version).getOrElse(0L),
      rows,
      cols.map(c => c -> ColStat(
        row.getAs[Long](s"__d_$c"),
        rows - row.getAs[Long](s"__n_$c"),
        optLen(s"__al_$c"), optLen(s"__ml_$c"))).toMap)
    write(fs, table, stats)
    stats
  }

  private def write(fs: FileSystem, table: Path,
      stats: TableStats): Unit = {
    val lines = Seq(Header, s"version=${stats.version}",
      s"rows=${stats.rows}") ++
      stats.cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"col=$c:${s.distinct}:${s.nulls}:${s.avgLen}:${s.maxLen}"
      }
    val out = fs.create(new Path(table, FileName), true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The persisted stats, if any (None on a torn/absent/foreign
    * sidecar — stats are advisory, never an error). */
  def read(fs: FileSystem, table: Path): Option[TableStats] =
    scala.util.Try {
      val p = new Path(table, FileName)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes =
          try {
            val b = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
            in.readFully(0, b); b
          } finally in.close()
        val lines = new String(bytes, "UTF-8").split("\n").toSeq
        if (lines.headOption.forall(_ != Header)) None
        else {
          def meta(k: String): Long = lines
            .find(_.startsWith(s"$k=")).map(_.stripPrefix(s"$k=").toLong)
            .getOrElse(-1L)
          val cols = lines.filter(_.startsWith("col=")).flatMap { l =>
            l.stripPrefix("col=").split(":") match {
              case Array(c, d, n) =>
                Some(c -> ColStat(d.toLong, n.toLong))
              case Array(c, d, n, al, ml) =>
                Some(c -> ColStat(d.toLong, n.toLong,
                  al.toLong, ml.toLong))
              case _ => None
            }
          }.toMap
          Some(TableStats(meta("version"), meta("rows"), cols))
        }
      }
    }.toOption.flatten
}

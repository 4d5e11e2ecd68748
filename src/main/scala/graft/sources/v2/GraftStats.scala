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

  final case class ColStat(distinct: Long, nulls: Long)
  final case class TableStats(version: Long, rows: Long,
      cols: Map[String, ColStat])

  /** One aggregate pass over the CURRENT table state; persists and
    * returns the stats. */
  def analyze(spark: SparkSession, path: String): TableStats = {
    val table = new Path(path)
    val fs = table.getFileSystem(GraftHadoopConf.sessionConf())
    val df = spark.read.format("graft-v2").option("path", path).load()
    val cols = df.schema.fields.toSeq.collect {
      case f if (f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      }) => f.name
    }
    val aggs = count(lit(1)).as("__rows") +:
      cols.flatMap(c => Seq(
        approx_count_distinct(col(c)).as(s"__d_$c"),
        count(col(c)).as(s"__n_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")
    val stats = TableStats(
      GraftManifest.current(fs, table).map(_.version).getOrElse(0L),
      rows,
      cols.map(c => c -> ColStat(
        row.getAs[Long](s"__d_$c"),
        rows - row.getAs[Long](s"__n_$c"))).toMap)
    write(fs, table, stats)
    stats
  }

  private def write(fs: FileSystem, table: Path,
      stats: TableStats): Unit = {
    val lines = Seq(Header, s"version=${stats.version}",
      s"rows=${stats.rows}") ++
      stats.cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"col=$c:${s.distinct}:${s.nulls}"
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
              case _ => None
            }
          }.toMap
          Some(TableStats(meta("version"), meta("rows"), cols))
        }
      }
    }.toOption.flatten
}

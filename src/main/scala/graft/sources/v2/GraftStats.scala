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
        // Dataset.col on the raw name parses dots as nested access —
        // quote so a top-level `a.b` (or other special-char) column
        // resolves as itself
        val ref = col("`" + c.replace("`", "``") + "`")
        Seq(approx_count_distinct(ref).as(s"__d_$c"),
          count(ref).as(s"__n_$c")) ++
          (if (lengthy(f)) Seq(
            ceil(avg(length(ref))).cast("long").as(s"__al_$c"),
            max(length(ref)).cast("long").as(s"__ml_$c"))
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
            // the name is written first and may itself contain ':' —
            // the stat fields are the LAST 2 (or, for length-bearing
            // columns, 4) numeric fields, so parse from the right
            val parts = l.stripPrefix("col=").split(":", -1)
            def num(s: String) = s.nonEmpty && s.matches("-?\\d+")
            val statCount =
              if (parts.length >= 5 && parts.takeRight(4).forall(num)) 4
              else if (parts.length >= 3 && parts.takeRight(2).forall(num)) 2
              else 0
            if (statCount == 0) None
            else {
              val name = parts.dropRight(statCount).mkString(":")
              parts.takeRight(statCount).map(_.toLong) match {
                case Array(d, n) => Some(name -> ColStat(d, n))
                case Array(d, n, al, ml) =>
                  Some(name -> ColStat(d, n, al, ml))
                case _ => None
              }
            }
          }.toMap
          Some(TableStats(meta("version"), meta("rows"), cols))
        }
      }
    }.toOption.flatten
}

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

  /** One equi-height histogram bin: values in [lo, hi] with `ndv`
    * approximate distincts inside the bin. */
  final case class HistBin(lo: Double, hi: Double, ndv: Long)

  /** Equi-height histogram over a numeric column: every bin holds
    * ~`height` non-null rows. What CBO's range-predicate selectivity
    * estimation consumes (`EstimationUtils` interpolates inside the
    * boundary bins instead of assuming a uniform [min, max]). */
  final case class Hist(height: Double, bins: Seq[HistBin])

  /** `avgLen`/`maxLen` are -1 for non-length-bearing types (numeric
    * widths are implied by the type; CBO row-size estimation only
    * needs measured lengths for strings/binaries). `min`/`max` are
    * TABLE-level numeric bounds for CBO range selectivity — file
    * PRUNING still reads per-file footer statistics, which stay
    * exact and fresh; these only feed the estimator. */
  final case class ColStat(distinct: Long, nulls: Long,
      avgLen: Long = -1L, maxLen: Long = -1L,
      hist: Option[Hist] = None,
      min: Option[Double] = None, max: Option[Double] = None)
  final case class TableStats(version: Long, rows: Long,
      cols: Map[String, ColStat])

  /** Approximate CURRENT logical row count from footers minus
    * deletion-vector cardinality — driver-side metadata only, no job.
    * What the staleness checks compare the sidecar's recorded rows
    * against. */
  def currentRows(spark: SparkSession, path: String): Long = {
    val table = new Path(path)
    val fs = table.getFileSystem(GraftHadoopConf.sessionConf())
    GraftManifest.current(fs, table) match {
      case Some(snap) =>
        val groups = FooterCache.rowGroupsFor(
          snap.names.map(n => new Path(table, n).toString))
        val raw = groups.map(_.rowCount).sum
        if (snap.dvs.isEmpty) raw
        else math.max(0L, raw - DeleteVectors.cardinality(
          table, snap.dvs.values, GraftHadoopConf.sessionConf()))
      case None =>
        FooterCache.rowGroups(path).map(_.rowCount).sum
    }
  }

  /** Fraction the table's row count has drifted from the sidecar's
    * recorded rows (0 = fresh; None when no sidecar exists). */
  def staleness(spark: SparkSession, path: String): Option[Double] = {
    val table = new Path(path)
    val fs = table.getFileSystem(GraftHadoopConf.sessionConf())
    read(fs, table).map { ts =>
      val now = currentRows(spark, path)
      math.abs(now - ts.rows).toDouble / math.max(ts.rows, 1L)
    }
  }

  /** One aggregate pass over the CURRENT table state (two with
    * histograms); persists and returns the stats.
    *
    * `histogramBins > 0` adds equi-height histograms over numeric
    * columns, the way Spark's own `ANALYZE ... FOR COLUMNS` does with
    * `spark.sql.statistics.histogram.enabled`: pass 1 piggybacks an
    * `approx_percentile` per numeric column onto the existing
    * aggregate (bin boundaries at i/bins quantiles), pass 2 counts
    * per-bin distincts with `ApproxCountDistinctForIntervals` over
    * all columns at once. Two scans total regardless of column
    * count. */
  def analyze(spark: SparkSession, path: String,
      histogramBins: Int = 0): TableStats = {
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
    def histEligible(f: StructField): Boolean = f.dataType match {
      case _: NumericType => true
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
          else Nil) ++
          (if (histEligible(f)) Seq(
            min(ref).cast(DoubleType).as(s"__mn_$c"),
            max(ref).cast(DoubleType).as(s"__mx_$c"))
          else Nil) ++
          (if (histogramBins > 0 && histEligible(f)) {
            val pcts = (0 to histogramBins)
              .map(i => lit(i.toDouble / histogramBins))
            Seq(percentile_approx(ref.cast(DoubleType),
              array(pcts: _*), lit(10000)).as(s"__p_$c"))
          } else Nil)
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")
    def optLen(name: String): Long =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(
          row.fieldIndex(name))) row.getAs[Long](name)
      else -1L
    // pass 2 (histograms only): per-bin distinct counts for every
    // numeric column whose quantile boundaries pass 1 produced, in
    // ONE aggregate over the same scan
    val hists: Map[String, Hist] =
      if (histogramBins <= 0) Map.empty
      else {
        val eligible = fields.filter(histEligible).flatMap { f =>
          val c = f.name
          val idx = row.fieldIndex(s"__p_$c")
          if (row.isNullAt(idx)) None // all-NULL column: no histogram
          else Some(c -> row.getSeq[Double](idx))
        }.filter(_._2.length == histogramBins + 1)
        if (eligible.isEmpty) Map.empty
        else {
          import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
          import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
          import org.apache.spark.sql.graftbridge.ColumnBridge
          val ndvAggs = eligible.map { case (c, eps) =>
            val child = ColumnBridge.expression(
              col("`" + c.replace("`", "``") + "`").cast(DoubleType))
            ColumnBridge.column(
              ApproxCountDistinctForIntervals(child,
                CreateArray(eps.map(e =>
                  Literal(e): org.apache.spark.sql.catalyst.expressions
                    .Expression)))
                .toAggregateExpression()).as(s"__h_$c")
          }
          val hrow = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
          eligible.map { case (c, eps) =>
            val ndvs = hrow.getSeq[Long](hrow.fieldIndex(s"__h_$c"))
            val nonNull = row.getAs[Long](s"__n_$c") // count() = non-null
            val bins = eps.sliding(2).zip(ndvs.iterator).map {
              case (Seq(lo, hi), ndv) => HistBin(lo, hi, ndv)
            }.toSeq
            c -> Hist(nonNull.toDouble / histogramBins, bins)
          }.toMap
        }
      }
    def optD(name: String): Option[Double] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(
          row.fieldIndex(name))) Some(row.getAs[Double](name))
      else None
    val stats = TableStats(
      GraftManifest.current(fs, table).map(_.version).getOrElse(0L),
      rows,
      cols.map(c => c -> ColStat(
        row.getAs[Long](s"__d_$c"),
        rows - row.getAs[Long](s"__n_$c"),
        optLen(s"__al_$c"), optLen(s"__ml_$c"),
        hists.get(c),
        optD(s"__mn_$c"), optD(s"__mx_$c"))).toMap)
    write(fs, table, stats)
    stats
  }

  private def write(fs: FileSystem, table: Path,
      stats: TableStats): Unit = {
    val lines = Seq(Header, s"version=${stats.version}",
      s"rows=${stats.rows}") ++
      stats.cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"col=$c:${s.distinct}:${s.nulls}:${s.avgLen}:${s.maxLen}"
      } ++
      stats.cols.toSeq.sortBy(_._1).flatMap { case (c, s) =>
        // `rng=<name>:<min>:<max>` — numeric fields last, same
        // right-anchored parse contract as hist lines
        (s.min, s.max) match {
          case (Some(mn), Some(mx)) => Some(s"rng=$c:$mn:$mx")
          case _ => None
        }
      } ++
      stats.cols.toSeq.sortBy(_._1).flatMap { case (c, s) =>
        // `hist=<name>:<height>:<lo>,<hi>,<ndv>;...` — the bin spec
        // and height never contain ':', so the name (which may) is
        // everything before the last two ':'-separated fields
        s.hist.map(h => s"hist=$c:${h.height}:" +
          h.bins.map(b => s"${b.lo},${b.hi},${b.ndv}").mkString(";"))
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
          val hists = lines.filter(_.startsWith("hist=")).flatMap { l =>
            val v = l.stripPrefix("hist=")
            val iBins = v.lastIndexOf(':')
            val iHeight = if (iBins <= 0) -1
              else v.lastIndexOf(':', iBins - 1)
            if (iHeight <= 0) None
            else scala.util.Try {
              val name = v.substring(0, iHeight)
              val height = v.substring(iHeight + 1, iBins).toDouble
              val bins = v.substring(iBins + 1).split(";").toSeq
                .map(_.split(",")).collect {
                  case Array(lo, hi, ndv) =>
                    HistBin(lo.toDouble, hi.toDouble, ndv.toLong)
                }
              name -> Hist(height, bins)
            }.toOption
          }.toMap
          val rngs = lines.filter(_.startsWith("rng=")).flatMap { l =>
            val v = l.stripPrefix("rng=")
            val iMax = v.lastIndexOf(':')
            val iMin = if (iMax <= 0) -1
              else v.lastIndexOf(':', iMax - 1)
            if (iMin <= 0) None
            else scala.util.Try {
              v.substring(0, iMin) ->
                (v.substring(iMin + 1, iMax).toDouble,
                  v.substring(iMax + 1).toDouble)
            }.toOption
          }.toMap
          val withHists = cols.map { case (c, s) =>
            c -> s.copy(hist = hists.get(c),
              min = rngs.get(c).map(_._1), max = rngs.get(c).map(_._2))
          }
          Some(TableStats(meta("version"), meta("rows"), withHists))
        }
      }
    }.toOption.flatten
}

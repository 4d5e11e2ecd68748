package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources._

/** MANIFEST-LEVEL DATA SKIPPING — per-file column ranges recorded in
  * the commit log (the Delta-Lake stats-in-the-log shape over graft's
  * single-file-per-version CAS), closing the last listing-level
  * pruning gap: bloom sidecars skip files for EQUALITY, partition
  * tokens for declared partition values, and these `fstat=` lines let
  * RANGE predicates drop files from the listing with ZERO footer I/O
  * — at 100 TB the difference between consulting a manifest the
  * driver already read and opening ~10⁵ footers once per driver.
  *
  *  - DECLARED columns only (`.graft-skip.json` marker, written by
  *    `option("statsColumns", "a,b")`): stats lines cost
  *    O(files × cols) at checkpoint versions — the operator chooses
  *    which columns earn that (the Delta trade).
  *  - Stats are computed AT COMMIT for the commit's NEW files from
  *    the just-written footers (driver-cached), fold along delta
  *    chains like names and dv mappings, and are IMMUTABLE per file.
  *    Files committed before the declaration — or whose footer lacks
  *    usable stats — simply never skip (conservative), exactly like
  *    un-tokenized files under hidden partitioning.
  *  - Supported types: integral (byte/short/int/long), date, and
  *    float/double. Strings are excluded (parquet truncates binary
  *    stats) and timestamps are excluded (footer timestamp stats are
  *    in each FILE's own unit); footer-stats pruning remains the
  *    exact backstop for both.
  *  - Pruning is strictly conservative and the evaluation mirrors
  *    [[RowGroupPruning]]'s bound logic at FILE granularity.
  *
  * Line format (manifest meta):
  * `fstat=<file>:<col>:<k>:<min>:<max>:<nulls>:<rows>` with `k` ∈
  * {`l` (long-comparable), `d` (double)}; all-null files write `n`
  * for min/max. Declared column names must not contain ':' or
  * newlines (validated at declaration).
  */
object SkipStats {

  val MarkerName = ".graft-skip.json"

  /** One file-column range: `kind` 'l' or 'd'; `lo`/`hi` None for an
    * all-null file. */
  final case class ColStat(kind: Char, lo: Option[String],
      hi: Option[String], nulls: Long, rows: Long)

  // ───────────────────────── marker ─────────────────────────

  def write(fs: FileSystem, dir: Path, cols: Seq[String]): Unit = {
    require(cols.nonEmpty && cols.distinct == cols,
      s"statsColumns must be non-empty and distinct: $cols")
    cols.foreach(c => require(!c.contains(":") && !c.contains("\n"),
      s"statsColumns name '$c' may not contain ':' or newlines"))
    val tmp = new Path(dir, s"$MarkerName.tmp")
    val out = fs.create(tmp, true)
    val json = cols.map(c =>
      "\"" + c.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("{\"cols\":[", ",", "]}")
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val dst = new Path(dir, MarkerName)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) {
      throw new java.io.IOException(
        s"skip-stats marker publish failed: $tmp -> $dst")
    }
  }

  def read(fs: FileSystem, dir: Path): Seq[String] = {
    val m = new Path(dir, MarkerName)
    if (!fs.exists(m)) return Seq.empty
    val in = fs.open(m)
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val body = raw.trim.stripPrefix("{\"cols\":[").stripSuffix("]}")
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false; var esc = false
    body.foreach { c =>
      if (esc) { sb.append(c); esc = false }
      else if (c == '\\' && inStr) esc = true
      else if (c == '"') {
        if (inStr) { cols += sb.toString; sb.clear() }
        inStr = !inStr
      } else if (inStr) sb.append(c)
    }
    cols.toSeq
  }

  /** Whether a column of this Spark type has a stable manifest-stat
    * rendering (see the class doc for the exclusions). */
  def supportedType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           FloatType | DoubleType => true
      case _ => false
    }
  }

  // ─────────────────── commit-time collection ───────────────────

  /** Per-file aggregated stats for `cols` over `files` (table-root
    * paths), from the driver footer cache. A file-column whose ANY
    * row group lacks usable stats records nothing (conservative);
    * doubles drop to nothing if NaN could hide (parquet already
    * omits NaN-tainted stats — the hasNonNullValue guard covers). */
  def collect(files: Seq[String], cols: Seq[String])
      : Map[String, Map[String, ColStat]] = {
    if (cols.isEmpty || files.isEmpty) return Map.empty
    files.flatMap { f =>
      scala.util.Try {
        val groups = FooterCache.rowGroupsFor(Seq(f))
        if (groups.isEmpty) None
        else {
          val perCol = cols.flatMap { c =>
            // per row group: bounded, or PROVABLY all-null (bounds()
            // rejects all-null chunks, but the raw footer stats can
            // still attest every row is null), or unknown → decline
            val gs = groups.map { g =>
              RowGroupPruning.boundsOf(g, c) match {
                case Some(b) => Some(Right(b))
                case None => g.stats.get(c) match {
                  case Some((st, _)) if st != null &&
                      st.isNumNullsSet && !st.hasNonNullValue &&
                      st.getNumNulls == g.rowCount =>
                    Some(Left((st.getNumNulls, g.rowCount)))
                  case _ => None
                }
              }
            }
            if (gs.exists(_.isEmpty)) None
            else {
              val vals = gs.flatten
              val bounded = vals.collect { case Right(b) => b }
              val rows = bounded.map(_._4).sum +
                vals.collect { case Left((_, r)) => r }.sum
              val nulls = bounded.map(_._3).sum +
                vals.collect { case Left((n, _)) => n }.sum
              if (bounded.isEmpty) {
                Some(c -> ColStat('l', None, None, nulls, rows))
              } else {
                render(bounded.map(_._1), bounded.map(_._2),
                  nulls, rows).map(c -> _)
              }
            }
          }.toMap
          if (perCol.isEmpty) None
          else Some(new Path(f).getName -> perCol)
        }
      }.toOption.flatten
    }.toMap
  }

  /** Fold row-group mins/maxes into one rendered file stat; None when
    * the physical type has no stable rendering. */
  private def render(mins: Seq[Any], maxs: Seq[Any], nulls: Long,
      rows: Long): Option[ColStat] = {
    if (nulls >= rows) {
      // all-null file: min/max carry no information but null counts do
      return Some(ColStat('l', None, None, nulls, rows))
    }
    def asLongs(vs: Seq[Any]): Option[Seq[Long]] = {
      val ls = vs.map {
        case n: java.lang.Integer => Some(n.longValue)
        case n: java.lang.Long => Some(n.longValue)
        case n: java.lang.Short => Some(n.longValue)
        case n: java.lang.Byte => Some(n.longValue)
        case _ => None
      }
      if (ls.exists(_.isEmpty)) None else Some(ls.flatten)
    }
    def asDoubles(vs: Seq[Any]): Option[Seq[Double]] = {
      val ds = vs.map {
        case n: java.lang.Float => Some(n.doubleValue)
        case n: java.lang.Double => Some(n.doubleValue)
        case _ => None
      }
      if (ds.exists(_.isEmpty) ||
          ds.flatten.exists(_.isNaN)) None
      else Some(ds.flatten)
    }
    (asLongs(mins), asLongs(maxs)) match {
      case (Some(lo), Some(hi)) =>
        Some(ColStat('l', Some(lo.min.toString),
          Some(hi.max.toString), nulls, rows))
      case _ => (asDoubles(mins), asDoubles(maxs)) match {
        case (Some(lo), Some(hi)) =>
          Some(ColStat('d', Some(lo.min.toString),
            Some(hi.max.toString), nulls, rows))
        case _ => None
      }
    }
  }

  // ─────────────────── line render / parse ───────────────────

  def renderLines(stats: Map[String, Map[String, ColStat]])
      : Seq[String] =
    stats.toSeq.sortBy(_._1).flatMap { case (file, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"fstat=$file:$c:${s.kind}:${s.lo.getOrElse("n")}:" +
          s"${s.hi.getOrElse("n")}:${s.nulls}:${s.rows}"
      }
    }

  def parseLine(l: String): Option[(String, String, ColStat)] = {
    val v = l.stripPrefix("fstat=")
    val parts = v.split(':')
    // file names never contain ':' and declared column names refuse
    // it, so the split arity is fixed
    if (parts.length != 7 || parts(2).length != 1) None
    else scala.util.Try {
      val lo = if (parts(3) == "n") None else Some(parts(3))
      val hi = if (parts(4) == "n") None else Some(parts(4))
      (parts(0), parts(1),
        ColStat(parts(2).head, lo, hi, parts(5).toLong,
          parts(6).toLong))
    }.toOption
  }

  // ───────────────────────── pruning ─────────────────────────

  private def litLong(v: Any): Option[Long] = v match {
    case n: java.lang.Integer => Some(n.longValue)
    case n: java.lang.Long => Some(n.longValue)
    case n: java.lang.Short => Some(n.longValue)
    case n: java.lang.Byte => Some(n.longValue)
    case d: java.sql.Date =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaDate(d).toLong)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  private def litDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Float => Some(n.doubleValue)
    case n: java.lang.Double => Some(n.doubleValue)
    case n: java.lang.Integer => Some(n.doubleValue)
    case n: java.lang.Long => Some(n.doubleValue)
    case n: java.lang.Short => Some(n.doubleValue)
    case _ => None
  }

  /** Compare a stat bound against a filter literal in the stat's
    * domain; None = incomparable (conservative). */
  private def cmp(bound: String, kind: Char, lit: Any): Option[Int] =
    kind match {
      case 'l' => litLong(lit).map(l =>
        java.lang.Long.compare(bound.toLong, l))
      case 'd' => litDouble(lit).map { d =>
        val b = bound.toDouble
        // primitive == first: Double.compare orders -0.0 < 0.0, but
        // SQL equality treats them equal — a file holding only -0.0
        // must not prune for `= 0.0`
        if (b == d) 0 else java.lang.Double.compare(b, d)
      }
      case _ => None
    }

  /** May a file with `stats` hold rows satisfying `f`? Missing
    * columns/bounds keep the file. Mirrors [[RowGroupPruning]] at
    * file granularity. */
  def mayMatch(f: Filter, stats: Map[String, ColStat]): Boolean = {
    def b(a: String): Option[(String, String, Char, Long, Long)] =
      stats.get(a).flatMap(s =>
        for (lo <- s.lo; hi <- s.hi)
          yield (lo, hi, s.kind, s.nulls, s.rows))
    f match {
      case EqualTo(a, v) =>
        stats.get(a).forall(s => s.nulls < s.rows) && b(a).forall {
          case (lo, hi, k, _, _) =>
            cmp(lo, k, v).forall(_ <= 0) && cmp(hi, k, v).forall(_ >= 0)
        }
      case LessThan(a, v) => b(a).forall { case (lo, _, k, _, _) =>
        cmp(lo, k, v).forall(_ < 0) }
      case LessThanOrEqual(a, v) => b(a).forall {
        case (lo, _, k, _, _) => cmp(lo, k, v).forall(_ <= 0) }
      case GreaterThan(a, v) => b(a).forall { case (_, hi, k, _, _) =>
        cmp(hi, k, v).forall(_ > 0) }
      case GreaterThanOrEqual(a, v) => b(a).forall {
        case (_, hi, k, _, _) => cmp(hi, k, v).forall(_ >= 0) }
      case In(a, vs) =>
        stats.get(a).forall(s => s.nulls < s.rows) && b(a).forall {
          case (lo, hi, k, _, _) => vs.exists(v =>
            cmp(lo, k, v).forall(_ <= 0) &&
              cmp(hi, k, v).forall(_ >= 0))
        }
      case IsNull(a) => stats.get(a).forall(_.nulls > 0)
      case IsNotNull(a) => stats.get(a).forall(s => s.nulls < s.rows)
      case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
      case Or(l, r) => mayMatch(l, stats) || mayMatch(r, stats)
      case _ => true
    }
  }

  /** Apply the filters to a file list under a snapshot's stats map:
    * files without stats always survive. */
  def prune(files: Seq[String],
      fstats: Map[String, Map[String, ColStat]],
      filters: Seq[Filter]): Seq[String] =
    if (filters.isEmpty || fstats.isEmpty) files
    else files.filter { p =>
      fstats.get(new Path(p).getName) match {
        case Some(st) => filters.forall(mayMatch(_, st))
        case None => true
      }
    }
}

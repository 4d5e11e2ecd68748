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
  *  - Supported types: integral (byte/short/int/long), date,
  *    float/double, timestamp (LTZ and NTZ), and string.
  *    TIMESTAMPS: footer stat values are in each FILE's own parquet
  *    unit (`FooterCache.tsUnit`), so collection normalizes to
  *    MICROS — the unit Spark literals compare in — per file, with
  *    floor(min)/ceil(max) rounding for NANOS and saturating widening
  *    on MILLIS overflow, so mixed-unit tables fold into one
  *    comparable domain. STRINGS: bounds are stored as base64 of the
  *    UTF-8 bytes, self-truncated to [[MaxStringBoundBytes]] with
  *    floor(min-prefix)/byte-incremented ceil(max-prefix) — sound
  *    whether or not the footer itself truncated (parquet truncates
  *    min downward and max upward), and compared in unsigned byte
  *    order exactly like Spark's `UTF8String`.
  *  - Pruning is strictly conservative and the evaluation mirrors
  *    [[RowGroupPruning]]'s bound logic at FILE granularity.
  *
  * Line format (manifest meta):
  * `fstat=<file>:<col>:<k>:<min>:<max>:<nulls>:<rows>` with `k` ∈
  * {`l` (long-comparable), `d` (double), `t` (timestamp micros),
  * `s` (base64url UTF-8 prefix bounds)}; all-null files write `n`
  * for min/max (base64url never renders a 1-char value, so `n` is
  * unambiguous). Declared column names must not contain ':' or
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
           FloatType | DoubleType | TimestampType | TimestampNTZType |
           StringType => true
      case _ => false
    }
  }

  /** String bounds self-truncate to this many UTF-8 bytes: lo keeps
    * the prefix (a prefix is ≤ the value), hi increments the last
    * non-0xFF prefix byte (strictly greater than anything extending
    * the prefix). Long URLs/documents as stats keys stay O(32B) per
    * file-column in the manifest. */
  val MaxStringBoundBytes = 32

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
                // the file's parquet unit re-keys integral stats into
                // the timestamp domain; the footer's string flag does
                // the same for binary stats
                val tsU = FooterCache.tsUnit(f, c)
                val isStr = groups.headOption
                  .flatMap(_.stats.get(c)).exists(_._2)
                render(bounded.map(_._1), bounded.map(_._2),
                  nulls, rows, tsU, isStr).map(c -> _)
              }
            }
          }.toMap
          if (perCol.isEmpty) None
          else Some(new Path(f).getName -> perCol)
        }
      }.toOption.flatten
    }.toMap
  }

  // ───────────── timestamp unit normalization (micros) ─────────────

  private[v2] type TU =
    org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
  import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit => TUe}

  /** File-unit stat value -> micros, rounding DOWN (a lower bound may
    * only widen). MILLIS overflow saturates to the widest bound. */
  private[v2] def toMicrosFloor(v: Long, u: TU): Long = u match {
    case TUe.MICROS => v
    case TUe.MILLIS =>
      try Math.multiplyExact(v, 1000L)
      catch { case _: ArithmeticException => Long.MinValue }
    case TUe.NANOS => Math.floorDiv(v, 1000L)
  }

  /** File-unit stat value -> micros, rounding UP (an upper bound may
    * only widen). */
  private[v2] def toMicrosCeil(v: Long, u: TU): Long = u match {
    case TUe.MICROS => v
    case TUe.MILLIS =>
      try Math.multiplyExact(v, 1000L)
      catch { case _: ArithmeticException => Long.MaxValue }
    case TUe.NANOS =>
      if (v == Long.MinValue) Math.floorDiv(v, 1000L)
      else -Math.floorDiv(-v, 1000L)
  }

  // ───────────── string prefix bounds (byte order) ─────────────

  private val b64e = java.util.Base64.getUrlEncoder.withoutPadding
  private val b64d = java.util.Base64.getUrlDecoder

  /** Lower prefix bound: a truncated prefix sorts ≤ the value. */
  private[v2] def floorBytes(b: Array[Byte]): Array[Byte] =
    if (b.length <= MaxStringBoundBytes) b
    else java.util.Arrays.copyOf(b, MaxStringBoundBytes)

  /** Smallest byte string strictly greater than EVERY string starting
    * with `p`: increment the last non-0xFF byte, drop the rest. None
    * when `p` is all 0xFF (no representable successor). */
  private[v2] def prefixSuccessor(p: Array[Byte]): Option[Array[Byte]] = {
    val i = p.lastIndexWhere(x => (x & 0xFF) != 0xFF)
    if (i < 0) None
    else {
      val q = java.util.Arrays.copyOf(p, i + 1)
      q(i) = (q(i) + 1).toByte
      Some(q)
    }
  }

  /** Upper prefix bound: short values pass through exact; truncated
    * values take the prefix successor — ≥ every value the footer max
    * bounded. None when the prefix is all 0xFF (no representable
    * upper bound at this length). */
  private[v2] def ceilBytes(b: Array[Byte]): Option[Array[Byte]] =
    if (b.length <= MaxStringBoundBytes) Some(b)
    else prefixSuccessor(java.util.Arrays.copyOf(b, MaxStringBoundBytes))

  /** Fold row-group mins/maxes into one rendered file stat; None when
    * the physical type has no stable rendering. */
  private def render(mins: Seq[Any], maxs: Seq[Any], nulls: Long,
      rows: Long, tsUnit: Option[TU], isString: Boolean)
      : Option[ColStat] = {
    if (nulls >= rows) {
      // all-null file: min/max carry no information but null counts do
      return Some(ColStat('l', None, None, nulls, rows))
    }
    if (isString) {
      val bins = mins.collect {
        case b: org.apache.parquet.io.api.Binary => b.getBytes }
      val baxs = maxs.collect {
        case b: org.apache.parquet.io.api.Binary => b.getBytes }
      if (bins.size != mins.size || baxs.size != maxs.size) return None
      import org.apache.spark.unsafe.types.UTF8String
      def cmpB(a: Array[Byte], b: Array[Byte]): Int =
        UTF8String.fromBytes(a).compareTo(UTF8String.fromBytes(b))
      val lo = bins.reduce((a, b) => if (cmpB(a, b) <= 0) a else b)
      val hi = baxs.reduce((a, b) => if (cmpB(a, b) >= 0) a else b)
      return ceilBytes(hi).map { h =>
        ColStat('s', Some(b64e.encodeToString(floorBytes(lo))),
          Some(b64e.encodeToString(h)), nulls, rows)
      }
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
      case (Some(lo), Some(hi)) => tsUnit match {
        case Some(u) =>
          Some(ColStat('t',
            Some(toMicrosFloor(lo.min, u).toString),
            Some(toMicrosCeil(hi.max, u).toString), nulls, rows))
        case None =>
          Some(ColStat('l', Some(lo.min.toString),
            Some(hi.max.toString), nulls, rows))
      }
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

  /** Timestamp filter literal -> micros (the `t`-kind stat domain).
    * Covers both java.time (datetime.java8API on) and java.sql
    * externals, plus LocalDateTime for NTZ columns. */
  private def litMicros(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    v match {
      case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
      case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
      case l: java.time.LocalDateTime =>
        Some(DateTimeUtils.localDateTimeToMicros(l))
      case _ => None
    }
  }

  private def litBytes(v: Any): Option[Array[Byte]] = v match {
    case s: String => Some(s.getBytes("UTF-8"))
    case _ => None
  }

  /** Compare a stat bound against a filter literal in the stat's
    * domain; None = incomparable (conservative). */
  private def cmp(bound: String, kind: Char, lit: Any): Option[Int] =
    kind match {
      case 'l' => litLong(lit).map(l =>
        java.lang.Long.compare(bound.toLong, l))
      case 't' => litMicros(lit).map(l =>
        java.lang.Long.compare(bound.toLong, l))
      case 's' => litBytes(lit).map { b =>
        import org.apache.spark.unsafe.types.UTF8String
        UTF8String.fromBytes(b64d.decode(bound))
          .compareTo(UTF8String.fromBytes(b))
      }
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
      case StringStartsWith(a, v) => b(a).forall {
        case (lo, hi, 's', _, _) =>
          // strings with prefix v live in [v, byte-ceil(v)): the file
          // may hold one iff its range intersects that band. ceil-less
          // prefixes (all 0xFF) drop the upper test (conservative).
          import org.apache.spark.unsafe.types.UTF8String
          val vb = v.getBytes("UTF-8")
          val hiOk = UTF8String.fromBytes(b64d.decode(hi))
            .compareTo(UTF8String.fromBytes(vb)) >= 0
          val loOk = prefixSuccessor(vb).forall { vc =>
            UTF8String.fromBytes(b64d.decode(lo))
              .compareTo(UTF8String.fromBytes(vc)) < 0
          }
          hiOk && loOk
        case _ => true
      }
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

  /** Fold a snapshot's per-file stats into per-column profile rows
    * `(column, rows, nulls, min_repr, max_repr, exact)` — the shared
    * core of `Profile.profileFromStats` and the `t.profile` metadata
    * table. Columns not covered on EVERY file, or with mixed stat
    * kinds (a widened column's old files), are silently skipped —
    * callers decide whether partial coverage is an error. String
    * bounds are the truncated UTF-8 prefix floor/ceil → exact=false;
    * the caller is responsible for rejecting DV-masked snapshots
    * (masked rows would overcount). */
  def profileRows(snap: GraftManifest.Snapshot)
      : Seq[(String, Long, Long, Option[String], Option[String],
        Boolean)] = {
    val files = snap.names
    val cols = snap.fstats.values.flatMap(_.keys).toSeq.distinct.sorted
    val b64d = java.util.Base64.getDecoder
    import org.apache.spark.unsafe.types.UTF8String
    cols.flatMap { c =>
      val per = files.map(f => snap.fstats.get(f).flatMap(_.get(c)))
      if (per.exists(_.isEmpty)) None
      else {
        val st = per.flatten
        // all-null files store kind 'l' with no bounds — they carry
        // counts but must not vote on the kind
        val kinds = st.filter(_.lo.nonEmpty).map(_.kind).distinct
        if (kinds.length > 1) None
        else {
          val nRows = st.map(_.rows).sum
          val nNulls = st.map(_.nulls).sum
          val los = st.flatMap(_.lo)
          val his = st.flatMap(_.hi)
          val folded = kinds.headOption match {
            case None => Some((None, None, true)) // all rows null
            case Some('l') | Some('t') =>
              Some((Some(los.map(_.toLong).min.toString),
                Some(his.map(_.toLong).max.toString), true))
            case Some('d') =>
              Some((Some(los.map(_.toDouble).min.toString),
                Some(his.map(_.toDouble).max.toString), true))
            case Some('s') =>
              Some((Some(los.map(b => UTF8String.fromBytes(
                  b64d.decode(b))).min.toString),
                Some(his.map(b => UTF8String.fromBytes(
                  b64d.decode(b))).max.toString), false))
            case Some(_) => None // unknown kind: skip, don't guess
          }
          folded.map { case (mn, mx, exact) =>
            (c, nRows, nNulls, mn, mx, exact)
          }
        }
      }
    }
  }
}

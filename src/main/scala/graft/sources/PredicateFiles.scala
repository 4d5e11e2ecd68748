package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.Column
import org.apache.spark.sql.sources.Filter

import graft.sources.v2.{FooterCache, RowGroupPruning}

/** File-level classification for predicate overwrites, shared by the
  * V1 [[GraftSink.replaceWhere]] and the V2 `overwrite(filters)` commit:
  * footer statistics split a directory's part files into
  *
  *  - `keep`    — no row group may match: never opened, never moved;
  *  - `delete`  — every row group provably matches: dropped whole;
  *  - `rewrite` — undecided boundary files: rewritten by a distributed
  *                job keeping the rows where the predicate is NOT true
  *                (NULL evaluates to keep, matching SQL DELETE).
  *
  * The rewrite cost is proportional to the boundary, not the table —
  * a stats-aligned predicate (time range over time-clustered files)
  * rewrites nothing at any scale.
  */
private[graft] object PredicateFiles {

  /** (keep, deleteWhole, rewrite) for `cond` over `parts`. Temporal
    * predicate values (the retention shape: `ts >= TIMESTAMP '...'`)
    * are rewritten per file into that file's own parquet stat unit
    * (epoch millis/micros/nanos, or days for dates) so the numeric
    * footer comparison applies; a value that does not convert exactly
    * stays as-is, which the pruner treats as incomparable —
    * conservative (the file is rewritten, never wrongly kept). */
  def classify(cond: Filter, parts: Seq[Path])
      : (Seq[Path], Seq[Path], Seq[Path]) = {
    val k = Seq.newBuilder[Path]
    val d = Seq.newBuilder[Path]
    val r = Seq.newBuilder[Path]
    parts.foreach { p =>
      val f = rewriteTemporal(cond, temporalCols(p.toString))
      val rgs = FooterCache.rowGroups(p.toString)
      val may = rgs.exists(rg => RowGroupPruning.mayMatch(f, rg))
      val must = rgs.nonEmpty &&
        rgs.forall(rg => RowGroupPruning.mustMatch(f, rg))
      if (!may) k += p else if (must) d += p else r += p
    }
    (k.result(), d.result(), r.result())
  }

  /** Flat timestamp/date columns of `file`: name -> Some(unit) for
    * timestamps, None for dates. */
  private def temporalCols(file: String)
      : Map[String, Option[TimeUnit]] =
    FooterCache.schemaOption(file).map { mt =>
      import scala.jdk.CollectionConverters._
      mt.getFields.asScala.flatMap { f =>
        if (!f.isPrimitive) None
        else f.asPrimitiveType().getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            Some(f.getName -> Some(ts.getUnit))
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
            Some(f.getName -> None)
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)

  /** Temporal literal -> the file's stat representation; None when the
    * conversion is not exact (sub-unit precision) or the value is not
    * temporal. NTZ values anchor at UTC, matching parquet
    * isAdjustedToUTC=false storage of the local wall-clock. */
  private def temporalValue(v: Any, unit: Option[TimeUnit]): Option[Any] = {
    import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
    unit match {
      case None => v match { // DATE column: stats are epoch days (int)
        case d: LocalDate => Some(Int.box(d.toEpochDay.toInt))
        case d: java.sql.Date => Some(Int.box(d.toLocalDate.toEpochDay.toInt))
        case _ => None
      }
      case Some(u) =>
        val micros: Option[Long] = v match {
          case t: java.sql.Timestamp =>
            Some(Math.floorDiv(t.getTime, 1000L) * 1000000L +
              t.getNanos / 1000L)
          case i: Instant =>
            Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
          case l: LocalDateTime =>
            val i = l.toInstant(ZoneOffset.UTC)
            Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
          case _ => None
        }
        micros.flatMap { us =>
          u match {
            case TimeUnit.MICROS => Some(Long.box(us))
            case TimeUnit.MILLIS =>
              if (us % 1000L == 0L) Some(Long.box(us / 1000L)) else None
            case TimeUnit.NANOS =>
              try Some(Long.box(Math.multiplyExact(us, 1000L)))
              catch { case _: ArithmeticException => None }
          }
        }
    }
  }

  /** Replace comparison values on temporal columns with their numeric
    * stat form; untouched values stay and prune conservatively. */
  private def rewriteTemporal(f: Filter,
      cols: Map[String, Option[TimeUnit]]): Filter = {
    import org.apache.spark.sql.sources._
    if (cols.isEmpty) return f
    def conv(a: String, v: Any): Option[Any] =
      cols.get(a).flatMap(u => temporalValue(v, u))
    f match {
      case EqualTo(a, v) => conv(a, v).map(EqualTo(a, _)).getOrElse(f)
      case LessThan(a, v) => conv(a, v).map(LessThan(a, _)).getOrElse(f)
      case LessThanOrEqual(a, v) =>
        conv(a, v).map(LessThanOrEqual(a, _)).getOrElse(f)
      case GreaterThan(a, v) =>
        conv(a, v).map(GreaterThan(a, _)).getOrElse(f)
      case GreaterThanOrEqual(a, v) =>
        conv(a, v).map(GreaterThanOrEqual(a, _)).getOrElse(f)
      case In(a, vs) =>
        val cs = vs.map(conv(a, _))
        if (cs.forall(_.isDefined)) In(a, cs.map(_.get)) else f
      case And(l, r) =>
        And(rewriteTemporal(l, cols), rewriteTemporal(r, cols))
      case Or(l, r) =>
        Or(rewriteTemporal(l, cols), rewriteTemporal(r, cols))
      case Not(c) => Not(rewriteTemporal(c, cols))
      case other => other
    }
  }

  /** Rewrite temporal comparison values into Spark's INTERNAL numeric
    * form (timestamps -> epoch micros, dates -> epoch days), driven by
    * the table schema. The executor-side delete rewrite evaluates
    * predicates against internal rows, where the reader has already
    * normalized every file's parquet unit to micros/days — so unlike
    * [[classify]]'s per-file stat units, one conversion serves all
    * files. */
  def internalizeTemporal(f: Filter,
      schema: org.apache.spark.sql.types.StructType): Filter = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val cols: Map[String, Option[TimeUnit]] = schema.fields.flatMap { sf =>
      sf.dataType match {
        case TimestampType | TimestampNTZType =>
          Some(sf.name -> Some(TimeUnit.MICROS))
        case DateType => Some(sf.name -> None)
        case _ => None
      }
    }.toMap
    rewriteTemporal(f, cols)
  }

  /** Structural gate for predicate overwrite — the
    * `RowFilterEval.supports` shapes, with comparison values extended
    * to temporal types (classification converts them per file; the
    * residue job compares them natively). */
  def supportsOverwrite(f: Filter,
      schema: org.apache.spark.sql.types.StructType): Boolean = {
    import org.apache.spark.sql.sources._
    def col(a: String) = schema.fieldNames.contains(a)
    def value(v: Any): Boolean = v match {
      case _: Number | _: String | _: Boolean => true
      case _: java.sql.Timestamp | _: java.time.Instant |
           _: java.time.LocalDateTime | _: java.sql.Date |
           _: java.time.LocalDate => true
      case _ => false
    }
    f match {
      case EqualTo(a, v) => col(a) && value(v)
      case LessThan(a, v) => col(a) && value(v)
      case LessThanOrEqual(a, v) => col(a) && value(v)
      case GreaterThan(a, v) => col(a) && value(v)
      case GreaterThanOrEqual(a, v) => col(a) && value(v)
      case IsNull(a) => col(a)
      case IsNotNull(a) => col(a)
      case In(a, vs) => col(a) && vs.forall(value)
      case StringStartsWith(a, _) => col(a)
      case StringEndsWith(a, _) => col(a)
      case StringContains(a, _) => col(a)
      case And(l, r) => supportsOverwrite(l, schema) &&
        supportsOverwrite(r, schema)
      case Or(l, r) => supportsOverwrite(l, schema) &&
        supportsOverwrite(r, schema)
      case Not(c) => supportsOverwrite(c, schema)
      case _ => false
    }
  }

  /** Rows to KEEP when deleting `cond` matches: NOT(cond), null-safe. */
  def residueCondition(cond: Filter): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    !coalesce(filterToColumn(cond), lit(false))
  }

  /** The distributed boundary rewrite both predicate overwrite and
    * DELETE run: read the boundary files, keep the rows where `cond`
    * is not definitely true, append them into `staging`, and return
    * exactly the part files THIS job added (staging may already hold
    * a concurrent write's staged output). */
  def residueJob(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, cond: Filter,
      rewrite: Seq[Path], staging: Path): Seq[Path] = {
    val before =
      if (!fs.exists(staging)) Set.empty[String]
      else fs.listStatus(staging).map(_.getPath.getName).toSet
    // pin the engine's canonical timestamp encoding for the residue
    // files (every other graft write path does): under Spark's INT96
    // default, timestamp-bearing residues would lose their parquet
    // unit (tsUnit reads None for INT96), degrading stat-based
    // temporal pruning/classification on those files afterwards.
    // The overrides live in a CLONED session (own SQLConf, shared
    // SparkContext) — mutate-and-restore of the caller's session conf
    // would race concurrent writes on the same session and could leak
    // the override permanently
    val iso = spark.newSession()
    // newSession starts from the builder-time conf, NOT the caller's
    // runtime session conf — carry the caller's settings over (rebase
    // modes, timezone, ANSI flags all shape how the boundary files
    // read back), THEN pin the two parquet write knobs. Static/
    // non-settable entries are skipped.
    spark.conf.getAll.foreach { case (k, v) =>
      try iso.conf.set(k, v) catch { case _: Throwable => () }
    }
    iso.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    iso.conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    iso.read.parquet(rewrite.map(_.toString): _*)
      .filter(residueCondition(cond))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(staging.toString)
    fs.listStatus(staging).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") &&
        !before.contains(p.getName)).toSeq
  }

  /** Parse a SQL predicate string (`"ts >= DATE '2024-01-01' AND v < 10"`)
    * into a source [[Filter]] — the ergonomic face of predicate
    * overwrite. Only the evaluable subset translates; anything else
    * (functions, arithmetic, subqueries) throws with the offending
    * fragment named, BEFORE any mutation. */
  def parsePredicate(spark: org.apache.spark.sql.SparkSession,
      condSql: String): Filter = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.sources
    def attr(e: ce.Expression): Option[String] = e match {
      case u: UnresolvedAttribute => Some(u.name)
      case _ => None
    }
    def lit(e: ce.Expression): Option[Any] = e match {
      case ce.Literal(v, dt) =>
        Some(CatalystTypeConverters.convertToScala(v, dt))
      case _ => None
    }
    def fail(e: ce.Expression): Nothing =
      throw new IllegalArgumentException(
        s"graft predicate overwrite: cannot translate '${e.sql}' — " +
        "use comparisons/IN/IS NULL/LIKE-prefix over plain columns " +
        "and literals, combined with AND/OR/NOT")
    def translate(e: ce.Expression): Filter = e match {
      case ce.EqualTo(a, b) => (attr(a), lit(b), attr(b), lit(a)) match {
        case (Some(n), Some(v), _, _) => sources.EqualTo(n, v)
        case (_, _, Some(n), Some(v)) => sources.EqualTo(n, v)
        case _ => fail(e)
      }
      case ce.GreaterThan(a, b) => (attr(a), lit(b), attr(b), lit(a)) match {
        case (Some(n), Some(v), _, _) => sources.GreaterThan(n, v)
        case (_, _, Some(n), Some(v)) => sources.LessThan(n, v)
        case _ => fail(e)
      }
      case ce.GreaterThanOrEqual(a, b) =>
        (attr(a), lit(b), attr(b), lit(a)) match {
          case (Some(n), Some(v), _, _) => sources.GreaterThanOrEqual(n, v)
          case (_, _, Some(n), Some(v)) => sources.LessThanOrEqual(n, v)
          case _ => fail(e)
        }
      case ce.LessThan(a, b) => (attr(a), lit(b), attr(b), lit(a)) match {
        case (Some(n), Some(v), _, _) => sources.LessThan(n, v)
        case (_, _, Some(n), Some(v)) => sources.GreaterThan(n, v)
        case _ => fail(e)
      }
      case ce.LessThanOrEqual(a, b) =>
        (attr(a), lit(b), attr(b), lit(a)) match {
          case (Some(n), Some(v), _, _) => sources.LessThanOrEqual(n, v)
          case (_, _, Some(n), Some(v)) => sources.GreaterThanOrEqual(n, v)
          case _ => fail(e)
        }
      case ce.In(a, vs) if attr(a).isDefined && vs.forall(lit(_).isDefined) =>
        sources.In(attr(a).get, vs.map(lit(_).get).toArray)
      case ce.IsNull(a) if attr(a).isDefined => sources.IsNull(attr(a).get)
      case ce.IsNotNull(a) if attr(a).isDefined =>
        sources.IsNotNull(attr(a).get)
      case ce.StartsWith(a, b) if attr(a).isDefined =>
        lit(b) match {
          case Some(s: String) => sources.StringStartsWith(attr(a).get, s)
          case _ => fail(e)
        }
      case ce.EndsWith(a, b) if attr(a).isDefined =>
        lit(b) match {
          case Some(s: String) => sources.StringEndsWith(attr(a).get, s)
          case _ => fail(e)
        }
      case ce.Contains(a, b) if attr(a).isDefined =>
        lit(b) match {
          case Some(s: String) => sources.StringContains(attr(a).get, s)
          case _ => fail(e)
        }
      // the parser produces Like, not StartsWith/EndsWith/Contains —
      // translate the three anchored shapes (and the wildcard-free
      // degenerate), reject patterns with inner wildcards/escapes
      case ce.Like(a, b, '\\') if attr(a).isDefined =>
        lit(b) match {
          case Some(p: String) if !p.contains("\\") && !p.contains("_") =>
            val inner = p.stripPrefix("%").stripSuffix("%")
            if (inner.contains("%")) fail(e)
            else (p.startsWith("%"), p.endsWith("%")) match {
              case (false, true) => sources.StringStartsWith(attr(a).get, inner)
              case (true, false) => sources.StringEndsWith(attr(a).get, inner)
              case (true, true) => sources.StringContains(attr(a).get, inner)
              case (false, false) => sources.EqualTo(attr(a).get, inner)
            }
          case _ => fail(e)
        }
      case ce.And(l, r) => sources.And(translate(l), translate(r))
      case ce.Or(l, r) => sources.Or(translate(l), translate(r))
      case ce.Not(c) => sources.Not(translate(c))
      case other => fail(other)
    }
    translate(spark.sessionState.sqlParser.parseExpression(condSql))
  }

  /** The supported-filter subset as a `Column`, for the distributed
    * residue rewrite. Mirrors `RowFilterEval.supports`. */
  def filterToColumn(f: Filter): Column = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case In(a, vs) => col(a).isInCollection(vs.toSeq)
      case StringStartsWith(a, p) => col(a).startsWith(p)
      case StringEndsWith(a, p) => col(a).endsWith(p)
      case StringContains(a, p) => col(a).contains(p)
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(c) => !filterToColumn(c)
      case other => throw new IllegalArgumentException(
        s"graft predicate overwrite: unsupported predicate $other")
    }
  }
}

package graft.sources

import org.apache.hadoop.fs.Path
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

  /** (keep, deleteWhole, rewrite) for `cond` over `parts`. */
  def classify(cond: Filter, parts: Seq[Path])
      : (Seq[Path], Seq[Path], Seq[Path]) = {
    val k = Seq.newBuilder[Path]
    val d = Seq.newBuilder[Path]
    val r = Seq.newBuilder[Path]
    parts.foreach { p =>
      val rgs = FooterCache.rowGroups(p.toString)
      val may = rgs.exists(rg => RowGroupPruning.mayMatch(cond, rg))
      val must = rgs.nonEmpty &&
        rgs.forall(rg => RowGroupPruning.mustMatch(cond, rg))
      if (!may) k += p else if (must) d += p else r += p
    }
    (k.result(), d.result(), r.result())
  }

  /** Rows to KEEP when deleting `cond` matches: NOT(cond), null-safe. */
  def residueCondition(cond: Filter): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    !coalesce(filterToColumn(cond), lit(false))
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

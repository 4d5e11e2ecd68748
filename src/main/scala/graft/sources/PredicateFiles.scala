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

package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.v2.GraftMv

/** SQL DDL for MATERIALIZED VIEWS, injected through
  * `SparkSessionExtensions.injectParser` ([[graft.GraftExtensions]]):
  *
  * {{{
  * CREATE MATERIALIZED VIEW cat.ns.mv AS
  *   SELECT grp, count(*) AS cnt, sum(amt) AS total
  *   FROM cat.ns.src WHERE amt > 0 GROUP BY grp
  * REFRESH MATERIALIZED VIEW cat.ns.mv
  * DROP MATERIALIZED VIEW [IF EXISTS] cat.ns.mv
  * }}}
  *
  * Everything else delegates verbatim to Spark's parser. The SELECT
  * subset matches what [[GraftMv]] maintains: a single graft-catalog
  * source table, optional WHERE, optional single-level GROUP BY over
  * plain key columns, aliased select/aggregate items. Table names
  * resolve through the registered [[graft.sources.v2.GraftCatalog]]
  * confs (`cat.ns.t` -> `<cat warehouse>/ns/t`), so the created MV is
  * itself a queryable catalog table.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMvSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(
      sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(
      sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

private[graft] object GraftMvSql {

  private val CreateRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s+AS\s+(SELECT\s.+)$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""".r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*$""".r
  // the SQL faces of CALL clone / CALL restore (same engine entry
  // points, DDL-shaped like the open table formats spell them)
  private val CloneRe =
    """(?is)^\s*CREATE\s+TABLE\s+([\w.`]+)\s+CLONE\s+([\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""".r
  private val RestoreRe =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.`]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  // VACUUM t [RETAIN n VERSIONS|HOURS] [DRY RUN] and DESCRIBE HISTORY
  // — the SQL faces of CALL vacuum / CALL history
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+([\w.`]+)(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?(\s+DRY\s+RUN)?\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+([\w.`]+)\s*;?\s*$""".r
  private val DetailRe =
    """(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.`]+)\s*;?\s*$""".r
  // OPTIMIZE t [ZORDER BY (a, b)] — compaction / clustering rewrite
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+([\w.`]+)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r

  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(ifNot, target, select) =>
      Some(parseCreate(target, select.trim.stripSuffix(";"),
        ifNot != null))
    case DropRe(ifEx, target) =>
      Some(DropMvCommand(parts(target), ifEx != null))
    case RefreshRe(target) =>
      Some(RefreshMvCommand(parts(target)))
    case CloneRe(target, source, ver) =>
      Some(CloneTableCommand(parts(target), parts(source),
        Option(ver).map(_.toLong)))
    case RestoreRe(target, ver) =>
      Some(RestoreTableCommand(parts(target), ver.toLong))
    case VacuumRe(target, n, unit, dry) =>
      val versions =
        if (n != null && unit.toUpperCase == "VERSIONS") n.toInt else 2
      val hours =
        if (n != null && unit.toUpperCase == "HOURS") n.toInt else 0
      Some(VacuumTableCommand(parts(target), versions, hours,
        dry != null))
    case HistoryRe(target) =>
      Some(DescribeHistoryCommand(parts(target)))
    case DetailRe(target) =>
      Some(DescribeDetailCommand(parts(target)))
    case OptimizeRe(target, cols) =>
      Some(OptimizeTableCommand(parts(target),
        Option(cols).map(_.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)).getOrElse(Nil)))
    case _ => None
  }

  private def parts(ident: String): Seq[String] =
    ident.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MATERIALIZED VIEW: $msg")

  /** Split on top-level commas (parens and quotes respected). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var i = 0; var start = 0
    var inStr = false; var q = ' '
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) { if (ch == q) inStr = false }
      else ch match {
        case '\'' | '"' | '`' => inStr = true; q = ch
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Index of a top-level keyword (outside parens/quotes), or -1. */
  private def topIndexOf(s: String, kw: String): Int = {
    val u = s.toUpperCase
    val k = kw.toUpperCase
    var depth = 0; var i = 0
    var inStr = false; var q = ' '
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inStr) { if (ch == q) inStr = false }
      else ch match {
        case '\'' | '"' | '`' => inStr = true; q = ch
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && u.startsWith(k, i) &&
              (i == 0 || !u.charAt(i - 1).isLetterOrDigit) &&
              (i + k.length >= u.length ||
                !u.charAt(i + k.length).isLetterOrDigit)) {
            return i
          }
      }
      i += 1
    }
    -1
  }

  private val AsAliasRe = """(?is)^(.+?)\s+AS\s+(`?[\w.]+`?)\s*$""".r
  private val BareIdentRe = """^\s*`?([\w]+)`?\s*$""".r

  private def parseCreate(target: String, select: String,
      ifNotExists: Boolean): LogicalPlan = {
    val fromIdx = topIndexOf(select, "FROM")
    if (fromIdx < 0) fail("the SELECT needs a FROM clause")
    val items = splitTop(select.substring("SELECT".length, fromIdx))
    var rest = select.substring(fromIdx + "FROM".length).trim
    val groupIdx = topIndexOf(rest, "GROUP")
    val groupBy: Option[String] =
      if (groupIdx < 0) None
      else {
        val g = rest.substring(groupIdx)
        rest = rest.substring(0, groupIdx).trim
        val byIdx = topIndexOf(g, "BY")
        if (byIdx < 0) fail("GROUP without BY")
        Some(g.substring(byIdx + 2).trim.stripSuffix(";"))
      }
    val whereIdx = topIndexOf(rest, "WHERE")
    val where: Option[String] =
      if (whereIdx < 0) None
      else {
        val w = rest.substring(whereIdx + "WHERE".length).trim
        rest = rest.substring(0, whereIdx).trim
        Some(w)
      }
    val source = rest.trim.stripSuffix(";").trim
    if (source.isEmpty || topIndexOf(source, "JOIN") >= 0 ||
        source.contains("(")) {
      fail("the FROM clause must be a single graft catalog table " +
        s"(got '$source')")
    }
    def aliased(item: String): (String, String) = item match {
      case AsAliasRe(e, a) =>
        (a.stripPrefix("`").stripSuffix("`"), e.trim)
      case BareIdentRe(n) => (n, n)
      case other =>
        fail(s"select item '$other' needs an AS alias")
    }
    groupBy match {
      case Some(g) =>
        val keys = splitTop(g).map {
          case BareIdentRe(n) => n
          case other => fail(
            s"GROUP BY supports plain key columns (got '$other')")
        }
        val (keyItems, aggItems) = items.map(aliased).partition {
          case (a, e) => keys.contains(a) && a == e
        }
        if (keyItems.map(_._1).sorted != keys.sorted) {
          fail("every GROUP BY key must appear in the select list " +
            s"unchanged (keys $keys, selected ${keyItems.map(_._1)})")
        }
        if (aggItems.isEmpty) fail("an aggregate MV needs aggregates")
        if (where.isDefined) {
          fail("WHERE on an aggregate MV is not maintainable " +
            "incrementally yet — filter in a projection MV first")
        }
        CreateMvCommand(parts(target), parts(source), "aggregate",
          Nil, None, keys, aggItems, ifNotExists)
      case None =>
        CreateMvCommand(parts(target), parts(source), "projection",
          items.map(aliased), where, Nil, Nil, ifNotExists)
    }
  }

  /** `cat.ns.t` -> `<cat warehouse>/ns/t` via the registered graft
    * catalog confs. */
  def dirOf(spark: SparkSession, parts: Seq[String]): String = {
    if (parts.length < 2) {
      fail(s"name '${parts.mkString(".")}' must be " +
        "catalog-qualified (cat.ns.table)")
    }
    val cat = parts.head
    val cls = spark.conf.getOption(s"spark.sql.catalog.$cat")
    if (!cls.exists(_.contains("GraftCatalog"))) {
      fail(s"'$cat' is not a registered graft catalog " +
        s"(spark.sql.catalog.$cat=${cls.getOrElse("unset")})")
    }
    val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      .getOrElse(fail(s"spark.sql.catalog.$cat.warehouse is unset"))
    (wh +: parts.tail).mkString("/")
  }
}

case class CreateMvCommand(target: Seq[String], source: Seq[String],
    mode: String, select: Seq[(String, String)], where: Option[String],
    keys: Seq[String], aggs: Seq[(String, String)],
    ifNotExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val mvDir = GraftMvSql.dirOf(spark, target)
    val srcDir = GraftMvSql.dirOf(spark, source)
    if (GraftMv.describe(spark, mvDir).isDefined) {
      if (ifNotExists) return Seq.empty
      throw new IllegalArgumentException(
        s"materialized view ${target.mkString(".")} already exists")
    }
    if (mode == "aggregate") {
      GraftMv.createAggregate(spark, srcDir, mvDir, keys, aggs)
    } else {
      GraftMv.createProjection(spark, srcDir, mvDir, select, where)
    }
    Seq.empty
  }
}

case class DropMvCommand(target: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val mvDir = GraftMvSql.dirOf(spark, target)
    if (GraftMv.describe(spark, mvDir).isEmpty) {
      if (ifExists) return Seq.empty
      throw new IllegalArgumentException(
        s"no materialized view at ${target.mkString(".")}")
    }
    GraftMv.drop(spark, mvDir)
    Seq.empty
  }
}

/** `CREATE TABLE tgt CLONE src [VERSION AS OF n]` — the SQL face of
  * [[graft.sources.v2.GraftManifest.cloneTo]] (zero-copy on POSIX). */
case class CloneTableCommand(target: Seq[String], source: Seq[String],
    versionAsOf: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cloned_version", LongType, nullable = false)(),
    AttributeReference("files_linked", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcDir = new org.apache.hadoop.fs.Path(
      GraftMvSql.dirOf(spark, source))
    val dstDir = new org.apache.hadoop.fs.Path(
      GraftMvSql.dirOf(spark, target))
    val fs = srcDir.getFileSystem(spark.sessionState.newHadoopConf())
    val (v, linked) = graft.sources.v2.GraftManifest.cloneTo(
      fs, srcDir, dstDir, versionAsOf)
    Seq(Row(v, linked.toLong))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF n` — the SQL face of
  * [[graft.sources.v2.GraftManifest.restore]]. */
case class RestoreTableCommand(target: Seq[String], version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = new org.apache.hadoop.fs.Path(
      GraftMvSql.dirOf(spark, target))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val newV = graft.sources.v2.GraftManifest.restore(fs, dir, version)
    spark.catalog.refreshByPath(dir.toString)
    Seq(Row(version, newV))
  }
}

/** `VACUUM t [RETAIN n VERSIONS|HOURS] [DRY RUN]` — the SQL face of
  * [[graft.sources.v2.GraftManifest.vacuum]] / `vacuumPreview`. DRY
  * RUN reports the retention cut's blast radius without deleting. */
case class VacuumTableCommand(target: Seq[String], keepVersions: Int,
    retainHours: Int, dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(
      AttributeReference("would_drop_versions", LongType,
        nullable = false)(),
      AttributeReference("would_delete_files", LongType,
        nullable = false)(),
      AttributeReference("would_free_bytes", LongType,
        nullable = false)())
    else Seq(
      AttributeReference("retained_versions", LongType,
        nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.sources.v2.GraftManifest
    val dir = new org.apache.hadoop.fs.Path(
      GraftMvSql.dirOf(spark, target))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (dryRun) {
      val (dropV, doomed) = GraftManifest.vacuumPreview(fs, dir,
        keepVersions = keepVersions,
        minRetainMillis = retainHours * 3600000L)
      val bytes = doomed.foldLeft(0L) { (acc, p) =>
        acc + (try fs.getFileStatus(p).getLen
        catch { case _: Throwable => 0L })
      }
      Seq(Row(dropV.length.toLong, doomed.length.toLong, bytes))
    } else {
      GraftManifest.vacuum(fs, dir, keepVersions = keepVersions,
        minRetainMillis = retainHours * 3600000L)
      Seq(Row(GraftManifest.versions(fs, dir).length.toLong))
    }
  }
}

/** `OPTIMIZE t [ZORDER BY (a, b)]` — the SQL face of `CALL compact` /
  * `CALL zorder`: small-file compaction, or the multi-key clustering
  * rewrite when ZORDER BY names columns. */
case class OptimizeTableCommand(target: Seq[String],
    zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftMvSql.dirOf(spark, target)
    val (before, after) =
      if (zorderBy.isEmpty) graft.sources.GraftSink.compact(spark, dir)
      else graft.sources.GraftSink.compactClustered(spark, dir, zorderBy)
    spark.catalog.refreshByPath(dir)
    Seq(Row(before.toLong, after.toLong))
  }
}

/** `DESCRIBE HISTORY t` — the SQL face of `CALL history`: one row per
  * retained version, newest first, from the manifest log only. */
case class DescribeHistoryCommand(target: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp",
      org.apache.spark.sql.types.TimestampType, nullable = true)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("added_files", LongType, nullable = false)(),
    AttributeReference("removed_files", LongType, nullable = false)(),
    AttributeReference("dv_files", LongType, nullable = false)(),
    AttributeReference("changed_dvs", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = new org.apache.hadoop.fs.Path(
      GraftMvSql.dirOf(spark, target))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.sources.v2.GraftManifest.history(fs, dir).map {
      case (v, ts, op, files, added, removed, dvN, dvChanged) =>
        Row(v, ts.map(new java.sql.Timestamp(_)).orNull, op,
          files.toLong, added.toLong, removed.toLong, dvN.toLong,
          dvChanged.toLong)
    }
  }
}

/** `DESCRIBE DETAIL t` — the SQL face of `CALL detail`: one row of
  * operational metadata (version, file/byte counts, DVs, bucket
  * layout, constraints, bloom indexes, stats freshness) from sidecar
  * markers and the manifest head only — no data bytes read. */
case class DescribeDetailCommand(target: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    graft.sources.v2.GraftDetail.schema.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = new org.apache.hadoop.fs.Path(
      GraftMvSql.dirOf(spark, target))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) {
      throw new IllegalArgumentException(
        s"DESCRIBE DETAIL: no table at $dir")
    }
    val d = graft.sources.v2.GraftDetail.summarize(fs, dir)
    Seq(Row(d.version.orNull, d.numFiles, d.sizeBytes, d.numDvs,
      d.retainedVersions, d.lastOperation.orNull,
      d.lastModifiedMillis.map(new java.sql.Timestamp(_)).orNull,
      d.bucketSpec.orNull, d.checkConstraints.orNull,
      d.bloomIndexColumns.orNull, d.statsVersion.orNull))
  }
}

case class RefreshMvCommand(target: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("refresh_mode", StringType, nullable = false)(),
    AttributeReference("from_version", LongType, nullable = false)(),
    AttributeReference("to_version", LongType, nullable = false)(),
    AttributeReference("affected_groups", LongType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val r = GraftMv.refresh(spark, GraftMvSql.dirOf(spark, target))
    Seq(Row(r.mode, r.fromVersion, r.toVersion, r.affectedGroups))
  }
}

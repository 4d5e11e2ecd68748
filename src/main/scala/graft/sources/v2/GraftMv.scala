package graft.sources.v2

import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MATERIALIZED VIEWS with change-feed-driven incremental refresh.
  *
  * An MV is a graft-v2 table plus a definition sidecar
  * (`<mvPath>/.graft-mv`) naming its source table and query shape.
  * Two shapes cover the OLAP staples:
  *
  *  - '''projection''' — `SELECT exprs FROM src [WHERE pred]`.
  *    Stateless: while the source history since the last refresh is
  *    append-only (append/maintenance commits), refresh applies the
  *    projection to the NEW rows only (change feed `insert`s) and
  *    appends. Any delete/update in the range falls back to a full
  *    recompute — honest, because a stateless MV carries no row
  *    identity to propagate deletions through.
  *
  *  - '''aggregate''' — `SELECT keys, agg-exprs FROM src GROUP BY
  *    keys`. Refresh is PARTIAL-RECOMPUTE incremental view
  *    maintenance: the change feed names the rows that moved, their
  *    key set names the AFFECTED GROUPS, those groups alone are
  *    recomputed from the current source (a scan the engine prunes by
  *    footer stats / bloom index on the group keys), and
  *    [[graft.sources.GraftSink.replaceWhere]] swaps exactly those
  *    groups' rows in ONE atomic commit. Groups whose recompute
  *    returns nothing simply vanish — deletions handled. Unlike pure
  *    additive-delta maintenance this needs no decomposability, so
  *    avg/min/max/count(distinct) maintain exactly like sum/count;
  *    the cost scales with the number of affected groups, not the
  *    table. When the affected-group set exceeds
  *    `spark.graft.mv.maxPartialGroups` (default 1000 — the
  *    replaceWhere predicate is a literal list), refresh escalates to
  *    a full recompute, which at that churn is the cheaper plan
  *    anyway.
  *
  * Refresh bookkeeping rides the engine's own machinery: the MV
  * registers a CDF CONSUMER low-water mark on the source
  * ([[GraftCdf.registerConsumer]]) so `vacuum` cannot outrun an MV
  * that has not refreshed lately, and each refresh advances the mark.
  * The `applied=` line in the sidecar records the last source version
  * the MV reflects; a refresh finding nothing newer is a no-op.
  */
object GraftMv {

  val FileName = ".graft-mv"
  private val Header = "graft-mv-1"

  final case class MvDef(source: String, mode: String,
      select: Seq[(String, String)], where: Option[String],
      keys: Seq[String], aggs: Seq[(String, String)], applied: Long)

  final case class RefreshSummary(mode: String, fromVersion: Long,
      toVersion: Long, affectedGroups: Long = -1L)

  private def consumerId(mvPath: String): String =
    "mv-" + java.lang.Integer.toHexString(mvPath.hashCode)

  /** Projection MV: `SELECT select... FROM source [WHERE where]`.
    * Computes the initial state, persists the definition, and
    * registers the refresh subscription on the source feed. */
  def createProjection(spark: SparkSession, source: String,
      mvPath: String, select: Seq[(String, String)],
      where: Option[String] = None): Unit = {
    require(select.nonEmpty, "graft-mv: empty select list")
    GraftCdf.enableChangeFeed(spark, source)
    val df = projectionQuery(spark, source, select, where)
    df.write.format("graft-v2").mode("overwrite").save(mvPath)
    val applied = currentVersion(spark, source)
    writeDef(spark, mvPath, MvDef(source, "projection", select, where,
      Nil, Nil, applied))
    GraftCdf.registerConsumer(spark, source, consumerId(mvPath), applied)
  }

  /** Aggregate MV: `SELECT keys, aggs... FROM source GROUP BY keys`.
    * `keys` are source COLUMN NAMES (group-key expressions would make
    * the affected-group predicate unresolvable); each agg is
    * `(alias, aggExprSql)`. */
  def createAggregate(spark: SparkSession, source: String,
      mvPath: String, keys: Seq[String],
      aggs: Seq[(String, String)]): Unit = {
    require(keys.nonEmpty, "graft-mv: aggregate MV needs group keys")
    require(aggs.nonEmpty, "graft-mv: aggregate MV needs aggregates")
    GraftCdf.enableChangeFeed(spark, source)
    val df = aggregateQuery(spark, source, keys, aggs)
    df.write.format("graft-v2").mode("overwrite").save(mvPath)
    val applied = currentVersion(spark, source)
    writeDef(spark, mvPath, MvDef(source, "aggregate", Nil, None,
      keys, aggs, applied))
    GraftCdf.registerConsumer(spark, source, consumerId(mvPath), applied)
  }

  /** Drop the MV: its table, definition, and source subscription. */
  def drop(spark: SparkSession, mvPath: String): Unit = {
    readDef(spark, mvPath).foreach { d =>
      GraftCdf.unregisterConsumer(spark, d.source, consumerId(mvPath))
    }
    val p = new Path(mvPath)
    Try(p.getFileSystem(GraftHadoopConf.sessionConf()).delete(p, true))
    ()
  }

  /** Bring the MV up to the source's current version. Returns what
    * kind of refresh ran. */
  def refresh(spark: SparkSession, mvPath: String): RefreshSummary = {
    val d = readDef(spark, mvPath).getOrElse(throw
      new IllegalArgumentException(s"graft-mv: no MV at $mvPath"))
    val cur = currentVersion(spark, d.source)
    if (cur <= d.applied) {
      return RefreshSummary("noop", d.applied, d.applied)
    }
    val table = new Path(d.source)
    val fs = table.getFileSystem(GraftHadoopConf.sessionConf())
    val rangeOps = ((d.applied + 1) to cur)
      .map(v => GraftManifest.opOf(fs, table, v).getOrElse("unknown"))
    val summary = d.mode match {
      case "projection" =>
        val appendOnly = rangeOps.forall(op =>
          op == "append" || op == "maintenance")
        if (appendOnly) {
          val inserts = GraftCdf
            .tableChanges(spark, d.source, d.applied + 1, cur)
            .filter(col(GraftCdf.ChangeType) === "insert")
            .drop(GraftCdf.ChangeType, GraftCdf.CommitVersion,
              GraftCdf.CommitTimestamp)
          val delta = applyProjection(inserts, d.select, d.where)
          if (!delta.isEmpty) {
            delta.write.format("graft-v2").mode("append").save(mvPath)
          }
          RefreshSummary("incremental", d.applied + 1, cur)
        } else {
          projectionQuery(spark, d.source, d.select, d.where)
            .write.format("graft-v2").mode("overwrite").save(mvPath)
          RefreshSummary("full", d.applied + 1, cur)
        }
      case "aggregate" =>
        val changes = GraftCdf
          .tableChanges(spark, d.source, d.applied + 1, cur)
        val maxGroups = Try(spark.conf
          .get("spark.graft.mv.maxPartialGroups", "1000").toInt)
          .getOrElse(1000)
        // the affected GROUP KEY SET is small by construction (it is
        // what bounds the partial recompute); +1 row detects overflow
        val affected = changes
          .select(d.keys.map(k => col(quote(k))): _*)
          .distinct().limit(maxGroups + 1).collect()
        if (affected.isEmpty) {
          RefreshSummary("noop", d.applied + 1, cur, 0L)
        } else if (affected.length > maxGroups) {
          aggregateQuery(spark, d.source, d.keys, d.aggs)
            .write.format("graft-v2").mode("overwrite").save(mvPath)
          RefreshSummary("full", d.applied + 1, cur, affected.length)
        } else {
          val cond = affectedPredicate(d.keys, affected)
          deltaPlan(spark, d) match {
            case Some(kinds) =>
              // PURE ADDITIVE DELTA: every aggregate is sum/count-
              // decomposable, so the change feed alone (+insert/post,
              // -delete/pre) updates the affected groups — the SOURCE
              // IS NEVER SCANNED. count(*) doubles as the liveness
              // counter: a group netting to zero rows is dropped.
              val merged = deltaMerge(spark, d, mvPath, kinds,
                changes, cond)
              graft.sources.GraftSink.replaceWhere(merged, mvPath, cond)
              RefreshSummary("delta", d.applied + 1, cur,
                affected.length)
            case None =>
              val recomputed = aggregateQuery(spark, d.source, d.keys,
                d.aggs, restrict = Some(cond))
              graft.sources.GraftSink.replaceWhere(recomputed, mvPath,
                cond)
              RefreshSummary("partial", d.applied + 1, cur,
                affected.length)
          }
        }
      case other => throw new IllegalStateException(
        s"graft-mv: unknown mode '$other' in $mvPath/$FileName")
    }
    writeDef(spark, mvPath, d.copy(applied = cur))
    GraftCdf.advanceConsumer(fs, table, consumerId(mvPath), cur)
    summary
  }

  /** The MV's current contents (a plain graft-v2 read). */
  def read(spark: SparkSession, mvPath: String): DataFrame =
    spark.read.format("graft-v2").load(mvPath)

  def describe(spark: SparkSession, mvPath: String): Option[MvDef] =
    readDef(spark, mvPath)

  // ---- internals ----

  private def quote(c: String): String =
    "`" + c.replace("`", "``") + "`"

  private def currentVersion(spark: SparkSession,
      source: String): Long = {
    val p = new Path(source)
    GraftManifest.current(
      p.getFileSystem(GraftHadoopConf.sessionConf()), p)
      .map(_.version).getOrElse(0L)
  }

  private def projectionQuery(spark: SparkSession, source: String,
      select: Seq[(String, String)],
      where: Option[String]): DataFrame =
    applyProjection(
      spark.read.format("graft-v2").load(source), select, where)

  private def applyProjection(df: DataFrame,
      select: Seq[(String, String)],
      where: Option[String]): DataFrame = {
    val filtered = where.map(w => df.filter(expr(w))).getOrElse(df)
    filtered.select(select.map { case (alias, sql) =>
      expr(sql).as(alias)
    }: _*)
  }

  private def aggregateQuery(spark: SparkSession, source: String,
      keys: Seq[String], aggs: Seq[(String, String)],
      restrict: Option[String] = None): DataFrame = {
    val base = spark.read.format("graft-v2").load(source)
    val scoped = restrict.map(c => base.filter(expr(c))).getOrElse(base)
    val aggCols = aggs.map { case (alias, sql) => expr(sql).as(alias) }
    scoped.groupBy(keys.map(k => col(quote(k))): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** One decomposable aggregate of a delta-capable MV. */
  private sealed trait AggKind { def alias: String }
  private final case class CountStar(alias: String) extends AggKind
  private final case class CountCol(alias: String, col: String)
      extends AggKind
  private final case class SumCol(alias: String, col: String)
      extends AggKind

  private val CountStarRe =
    """(?i)^\s*count\s*\(\s*\*\s*\)\s*$""".r
  private val CountColRe =
    """(?i)^\s*count\s*\(\s*`?([\w.]+)`?\s*\)\s*$""".r
  private val SumColRe =
    """(?i)^\s*sum\s*\(\s*`?([\w.]+)`?\s*\)\s*$""".r

  /** The additive-delta plan, when sound:
    *  - every aggregate is `count(*)`, `count(col)` or `sum(col)`
    *    (plain column argument — expressions fall back to recompute);
    *  - at least one `count(*)` exists (the liveness counter that
    *    detects a group netting to zero rows);
    *  - every SUMMED column is non-nullable in the source schema
    *    (`sum` over a live group that holds only NULLs is NULL, which
    *    additive math cannot distinguish from 0 — `count(col)` has no
    *    such edge and stays allowed on nullable columns). */
  private def deltaPlan(spark: SparkSession,
      d: MvDef): Option[Seq[AggKind]] = Try {
    val kinds = d.aggs.map { case (alias, sql) =>
      sql match {
        case CountStarRe() => CountStar(alias)
        case CountColRe(c) => CountCol(alias, c)
        case SumColRe(c) => SumCol(alias, c)
        case _ => return None
      }
    }
    if (!kinds.exists(_.isInstanceOf[CountStar])) return None
    val schema = spark.read.format("graft-v2").load(d.source).schema
    val byName = schema.fields.map(f => f.name -> f).toMap
    val sound = kinds.forall {
      case SumCol(_, c) => byName.get(c).exists(!_.nullable)
      case CountCol(_, c) => byName.contains(c)
      case _ => true
    }
    if (sound) Some(kinds) else None
  }.toOption.flatten

  /** The affected groups' NEW rows from current MV values + signed
    * feed deltas — no source scan. Output columns cast to the MV's
    * exact schema so replaceWhere's type check holds. */
  private def deltaMerge(spark: SparkSession, d: MvDef,
      mvPath: String, kinds: Seq[AggKind], changes: DataFrame,
      cond: String): DataFrame = {
    val Sign = "__mv_sign"
    val signed = changes.withColumn(Sign,
      when(col(GraftCdf.ChangeType).isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L)))
    val deltaAggs = kinds.map {
      case CountStar(a) => sum(col(Sign)).as(a)
      case CountCol(a, c) =>
        sum(when(col(quote(c)).isNotNull, col(Sign)).otherwise(lit(0L)))
          .as(a)
      case SumCol(a, c) =>
        // negate via when() so the summed TYPE stays the column's
        // (a sign multiply would promote decimals)
        sum(when(col(Sign) === 1L, col(quote(c)))
          .otherwise(col(quote(c)) * lit(-1))).as(a)
    }
    val delta = signed.groupBy(d.keys.map(k => col(quote(k))): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val mv = read(spark, mvPath).filter(expr(cond))
    val joined = mv.as("m").join(delta.as("d"), d.keys, "full_outer")
    val liveness = kinds.collectFirst { case CountStar(a) => a }.get
    val mvSchema = mv.schema
    def mergedCol(a: String) = {
      val m = col(s"m.${quote(a)}"); val dd = col(s"d.${quote(a)}")
      when(m.isNull, dd).when(dd.isNull, m).otherwise(m + dd)
        .cast(mvSchema(a).dataType).as(a)
    }
    val keyCols = d.keys.map(k => col(quote(k)))
    joined.select(keyCols ++ kinds.map(k => mergedCol(k.alias)): _*)
      .filter(col(quote(liveness)) > 0)
  }

  /** `(k1 = v1 AND k2 = v2) OR ...` over the affected key tuples —
    * the replaceWhere scope AND the partial-recompute restriction.
    * Single-key sets render as `k IN (...)`. */
  private def affectedPredicate(keys: Seq[String],
      rows: Array[org.apache.spark.sql.Row]): String = {
    def lit(v: Any): String = v match {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case d: java.sql.Date => s"DATE '$d'"
      case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
      case other => other.toString
    }
    if (keys.length == 1) {
      val vs = rows.map(r => r.get(0)).toSeq
      val (nulls, nonNull) = vs.partition(_ == null)
      val in = if (nonNull.isEmpty) ""
        else s"${quote(keys.head)} IN (${nonNull.map(lit).mkString(", ")})"
      val isNull = if (nulls.isEmpty) ""
        else s"${quote(keys.head)} IS NULL"
      Seq(in, isNull).filter(_.nonEmpty).mkString(" OR ")
    } else {
      rows.map { r =>
        keys.zipWithIndex.map { case (k, i) =>
          val v = r.get(i)
          if (v == null) s"${quote(k)} IS NULL"
          else s"${quote(k)} = ${lit(v)}"
        }.mkString("(", " AND ", ")")
      }.mkString(" OR ")
    }
  }

  private def writeDef(spark: SparkSession, mvPath: String,
      d: MvDef): Unit = {
    val p = new Path(mvPath, FileName)
    val fs = p.getFileSystem(GraftHadoopConf.sessionConf())
    val lines = Seq(Header,
      s"source=${d.source}", s"mode=${d.mode}",
      s"applied=${d.applied}") ++
      d.where.map(w => s"where=$w").toSeq ++
      d.select.map { case (a, e) => s"select=$a:$e" } ++
      d.keys.map(k => s"key=$k") ++
      d.aggs.map { case (a, e) => s"agg=$a:$e" }
    val out = fs.create(p, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readDef(spark: SparkSession,
      mvPath: String): Option[MvDef] = Try {
    val p = new Path(mvPath, FileName)
    val fs = p.getFileSystem(GraftHadoopConf.sessionConf())
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
        def one(k: String): Option[String] = lines
          .find(_.startsWith(s"$k=")).map(_.stripPrefix(s"$k="))
        def many(k: String): Seq[String] = lines
          .filter(_.startsWith(s"$k=")).map(_.stripPrefix(s"$k="))
        def pairs(k: String): Seq[(String, String)] = many(k).map { v =>
          val i = v.indexOf(':')
          (v.substring(0, i), v.substring(i + 1))
        }
        Some(MvDef(one("source").get, one("mode").get,
          pairs("select"), one("where"), many("key"), pairs("agg"),
          one("applied").map(_.toLong).getOrElse(0L)))
      }
    }
  }.toOption.flatten
}

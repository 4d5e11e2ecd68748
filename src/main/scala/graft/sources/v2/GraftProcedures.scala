package graft.sources.v2

import java.util.{Collections, Iterator => JIterator}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL-first maintenance surface: `CALL graft.system.<proc>(...)`
  * through Spark 4's `ProcedureCatalog` — the ops story (retention,
  * compaction, clustering, mask materialization) without leaving SQL,
  * the way every open table format exposes its table services.
  *
  * ```sql
  * CALL graft.system.vacuum(table => 'ns.t', keep_versions => 2)
  * CALL graft.system.compact(table => 'ns.t')
  * CALL graft.system.zorder(table => 'ns.t', columns => 'a,b')
  * CALL graft.system.materialize_dvs(table => 'ns.t')
  * ```
  *
  * Each returns one summary row (a [[LocalScan]]) so the caller sees
  * what happened; the side effects are the same code paths the Scala
  * API runs ([[GraftManifest.vacuum]], [[graft.sources.GraftSink]]
  * compaction, [[GraftDeleteV2.materializeDeleteVectors]]). */
private[v2] object GraftProcedures {

  val Names: Set[String] =
    Set("vacuum", "compact", "zorder", "materialize_dvs", "analyze",
      "history", "bloom_index", "mv_refresh", "restore", "clone",
      "detail", "tag", "tags", "fsck", "wap_publish", "wap_abort",
      "dq_check", "decon_index", "decontaminate")

  private def tableParam = ProcedureParameter
    .in("table", StringType)
    .comment("dotted table name in this catalog, e.g. ns.t").build()

  private def resultScan(schema: StructType, values: Array[Any]): Scan =
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(values))
    }

  private def one(scan: Scan): JIterator[Scan] =
    Collections.singletonList(scan).iterator()

  def unbound(procName: String, dirFor: String => Path): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = procName match {
        case "vacuum" =>
          "drop manifest versions beyond keep_versions (min-retention " +
          "guarded), sweeping unreferenced archive files and sidecars"
        case "compact" =>
          "merge small files (materializing deletion vectors first)"
        case "zorder" =>
          "clustering rewrite on the given columns: footer-stats file " +
          "skipping on every cluster key"
        case "analyze" =>
          "one-pass per-column distinct/null counts for the cost-based " +
          "optimizer, persisted beside the table"
        case "history" =>
          "the table's commit log, newest first: one row per retained " +
          "version with its timestamp, operation, and file/DV deltas"
        case "bloom_index" =>
          "build (or incrementally extend) per-file bloom filters on " +
          "the given columns so equality/IN predicates prune files; " +
          "drop => true removes the columns' index instead"
        case "mv_refresh" =>
          "bring a materialized view up to its source's current " +
          "version (change-feed incremental / affected-group partial " +
          "recompute / full, whichever the history allows)"
        case "restore" =>
          "roll the table back to a retained version AS A NEW COMMIT " +
          "(history preserved, change-feed visible); metadata and " +
          "renames only, no data rewritten"
        case "clone" =>
          "shallow-clone the table (or a retained version of it) to a " +
          "new independent table: hard links on POSIX (zero data " +
          "bytes), schema/constraints/DVs/bloom sidecars ride along"
        case "detail" =>
          "one-row operational summary of the table: current version, " +
          "live file/byte counts, deletion vectors, bucket layout, " +
          "constraints, bloom indexes, stats freshness"
        case "tag" =>
          "pin a retained manifest version under a name: VERSION AS " +
          "OF '<name>' reads it and vacuum keeps it alive until the " +
          "tag is dropped (drop => true removes the tag instead)"
        case "tags" =>
          "list the table's tags, one row per (tag, version)"
        case "fsck" =>
          "report (and with repair => true, drop) manifest references " +
          "to data files that no longer exist on storage — recovery " +
          "after external deletion"
        case "wap_publish" =>
          "atomically publish a write-audit-publish branch staged via " +
          "graft.sources.v2.Wap.stage: one manifest commit makes the " +
          "audited files visible (idempotent across crashed retries)"
        case "wap_abort" =>
          "drop a staged write-audit-publish branch without " +
          "publishing — no manifest version is written"
        case "dq_check" =>
          "evaluate named boolean contracts over the table in ONE " +
          "scan — one result row per rule (rows, violations, passed); " +
          "NULL predicate results count as violations"
        case "decon_index" =>
          "persist the decontamination index for a benchmark table " +
          "ONCE (distinct n-grams as parquet + a meta sidecar with " +
          "the pre-built XL bloom) so repeated decon sweeps are " +
          "O(corpus probe)"
        case "decontaminate" =>
          "sweep the table against a persisted decon index (see " +
          "decon_index): one summary row — docs scanned, contaminated " +
          "count, max contamination share"
        case _ =>
          "rewrite every vector-masked file without its deleted rows"
      }
      // ONE stable bound instance: the analyzer's fixed-point loop
      // re-binds until the plan stops changing — a fresh object per
      // bind() call never converges
      private lazy val boundOnce = bound(procName, dirFor)
      override def bind(inputType: StructType): BoundProcedure =
        boundOnce
    }

  private def bound(procName: String,
      dirFor: String => Path): BoundProcedure = new BoundProcedure {
    override def name(): String = procName
    override def description(): String = procName
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = procName match {
      case "vacuum" => Array(tableParam,
        ProcedureParameter.in("keep_versions", IntegerType)
          .defaultValue("2").build(),
        ProcedureParameter.in("min_retain_hours", IntegerType)
          .defaultValue("0")
          .comment("versions younger than this always survive").build(),
        ProcedureParameter.in("min_feed_versions", IntegerType)
          .defaultValue("0")
          .comment("keep at least this many newest versions for " +
            "change-feed consumers sized by count").build(),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false")
          .comment("report what this policy would drop (versions, " +
            "files, bytes) without deleting anything").build())
      case "zorder" => Array(tableParam,
        ProcedureParameter.in("columns", StringType)
          .comment("comma-separated cluster columns").build(),
        ProcedureParameter.in("target_mb", IntegerType)
          .defaultValue("128").build(),
        ProcedureParameter.in("curve", StringType)
          .defaultValue("'zorder'")
          .comment("space-filling curve: zorder | hilbert (tighter " +
            "per-file regions, same rewrite cost)").build())
      case "bloom_index" => Array(tableParam,
        ProcedureParameter.in("columns", StringType)
          .comment("comma-separated columns to index").build(),
        ProcedureParameter.in("fpp", DoubleType)
          .defaultValue("0.03")
          .comment("false-positive probability per file").build(),
        ProcedureParameter.in("drop", BooleanType)
          .defaultValue("false").build(),
        ProcedureParameter.in("auto", BooleanType)
          .defaultValue("false")
          .comment("auto-extend the index after every write/compaction " +
            "so new files are covered immediately").build())
      case "restore" => Array(tableParam,
        ProcedureParameter.in("version", LongType)
          .comment("retained version to roll back to").build())
      case "clone" => Array(tableParam,
        ProcedureParameter.in("target", StringType)
          .comment("dotted name for the new table in this catalog")
          .build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1")
          .comment("retained source version to clone (-1 = latest)")
          .build())
      case "analyze" => Array(tableParam,
        ProcedureParameter.in("histogram_bins", IntegerType)
          .defaultValue("0")
          .comment("equi-height histogram buckets over numeric " +
            "columns (0 = NDV/null counts only)").build(),
        ProcedureParameter.in("if_stale_fraction", DoubleType)
          .defaultValue("0.0")
          .comment("skip when the row count drifted less than this " +
            "fraction since the last analyze — makes scheduled " +
            "re-analyze a metadata no-op on quiet tables").build())
      case "fsck" => Array(tableParam,
        ProcedureParameter.in("repair", BooleanType)
          .defaultValue("false")
          .comment("commit a new version dropping references to " +
            "missing files (default: report only)").build())
      case "compact" => Array(tableParam,
        ProcedureParameter.in("where", StringType)
          .defaultValue("''")
          .comment("scope the merge to files whose stats may hold " +
            "matching rows (OPTIMIZE WHERE; empty = whole table)")
          .build())
      case "wap_publish" | "wap_abort" => Array(tableParam,
        ProcedureParameter.in("branch", StringType)
          .comment("branch name staged via Wap.stage").build())
      case "dq_check" => Array(tableParam,
        ProcedureParameter.in("rules", StringType)
          .comment("semicolon-separated name:SQL-predicate pairs, " +
            "e.g. 'qty_pos: qty > 0; disc_cap: discount <= 0.1'")
          .build())
      case "decon_index" => Array(tableParam,
        ProcedureParameter.in("path", StringType)
          .comment("directory to persist the index under").build(),
        ProcedureParameter.in("n", IntegerType)
          .defaultValue("3").comment("n-gram size").build(),
        ProcedureParameter.in("id_col", StringType)
          .defaultValue("'doc_id'").build(),
        ProcedureParameter.in("text_col", StringType)
          .defaultValue("'text'").build())
      case "decontaminate" => Array(tableParam,
        ProcedureParameter.in("index", StringType)
          .comment("a decon_index directory").build(),
        ProcedureParameter.in("id_col", StringType)
          .defaultValue("'doc_id'").build(),
        ProcedureParameter.in("text_col", StringType)
          .defaultValue("'text'").build(),
        ProcedureParameter.in("max_broadcast_grams", LongType)
          .defaultValue("2000000")
          .comment("gram count above which the probe switches to " +
            "the bloom-prefiltered shuffled join").build())
      case "tag" => Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("tag name: starts with a letter; letters, digits, " +
            "'.', '_', '-'").build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1")
          .comment("retained version to pin (-1 = latest)").build(),
        ProcedureParameter.in("drop", BooleanType)
          .defaultValue("false").build(),
        ProcedureParameter.in("replace", BooleanType)
          .defaultValue("false")
          .comment("re-point an existing tag instead of refusing")
          .build())
      case _ => Array(tableParam)
    }

    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val dir = dirFor(table)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(dir)) {
        throw new IllegalArgumentException(
          s"graft procedure $procName: no table at $dir")
      }
      procName match {
        case "vacuum" =>
          val keep = input.getInt(1)
          val retainH = input.getInt(2)
          val feedKeep = input.getInt(3)
          if (input.getBoolean(4)) {
            // dry run: the same policy's blast radius, deleting nothing
            val (dropV, doomed) = GraftManifest.vacuumPreview(fs, dir,
              keepVersions = keep,
              minRetainMillis = retainH * 3600000L,
              minFeedVersions = feedKeep)
            val bytes = doomed.foldLeft(0L) { (acc, p) =>
              acc + (try fs.getFileStatus(p).getLen
              catch { case _: Throwable => 0L })
            }
            one(resultScan(
              StructType(Seq(
                StructField("would_drop_versions", IntegerType, false),
                StructField("would_delete_files", IntegerType, false),
                StructField("would_free_bytes", LongType, false))),
              Array(dropV.length, doomed.length, bytes)))
          } else {
            GraftManifest.vacuum(fs, dir, keepVersions = keep,
              minRetainMillis = retainH * 3600000L,
              minFeedVersions = feedKeep)
            val retained = GraftManifest.versions(fs, dir).length
            one(resultScan(
              StructType(Seq(
                StructField("retained_versions", IntegerType, false))),
              Array(retained)))
          }
        case "fsck" =>
          val repair = input.getBoolean(1)
          def missingOf(names: Seq[String]): Seq[String] =
            names.filterNot { n =>
              val p = new Path(dir, n)
              fs.exists(p) ||
                GraftManifest.archiveTwin(p).exists(fs.exists)
            }
          val missing = missingOf(GraftManifest.liveState(fs, dir).names)
          var repaired = false
          if (repair && missing.nonEmpty) {
            GraftManifest.commitLock(fs, dir).synchronized {
              var attempts = 0
              while (!repaired && attempts < 50) {
                val cur = GraftManifest.liveState(fs, dir)
                val miss = missingOf(cur.names).toSet
                if (miss.isEmpty) repaired = true
                else repaired = GraftManifest.tryCommit(fs, dir,
                  cur.version, cur.names.filterNot(miss),
                  extraMeta = Seq("op=fsck"))
                attempts += 1
              }
            }
          }
          one(resultScan(
            StructType(Seq(
              StructField("missing_files", IntegerType, false),
              StructField("repaired", BooleanType, false))),
            Array(missing.length, repaired)))
        case "compact" =>
          val cw = Option(input.getUTF8String(1))
            .map(_.toString).filter(_.nonEmpty)
          val (before, after) =
            graft.sources.GraftSink.compact(spark, dir.toString,
              where = cw)
          one(resultScan(
            StructType(Seq(
              StructField("merged_files", IntegerType, false),
              StructField("written_files", IntegerType, false))),
            Array(before, after)))
        case "zorder" =>
          val cols = input.getUTF8String(1).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val targetMb = input.getInt(2)
          val curve = input.getUTF8String(3).toString
          val (before, after) = graft.sources.GraftSink.compactClustered(
            spark, dir.toString, cols,
            targetBytes = targetMb.toLong * 1024 * 1024,
            curve = curve)
          one(resultScan(
            StructType(Seq(
              StructField("files_before", IntegerType, false),
              StructField("files_after", IntegerType, false))),
            Array(before, after)))
        case "materialize_dvs" =>
          val n = GraftDeleteV2.materializeDeleteVectors(dir.toString)
          one(resultScan(
            StructType(Seq(
              StructField("files_materialized", IntegerType, false))),
            Array(n)))
        case "analyze" =>
          val bins = input.getInt(1)
          val ifStale = input.getDouble(2)
          val schema = StructType(Seq(
            StructField("rows", LongType, false),
            StructField("columns_analyzed", IntegerType, false),
            StructField("at_version", LongType, false),
            StructField("refreshed", BooleanType, false)))
          val skip = ifStale > 0 &&
            GraftStats.staleness(spark, dir.toString).exists(_ < ifStale)
          if (skip) {
            val prior = GraftStats.read(fs, dir).get
            one(resultScan(schema,
              Array(prior.rows, prior.cols.size, prior.version, false)))
          } else {
            val ts = GraftStats.analyze(spark, dir.toString,
              histogramBins = bins)
            one(resultScan(schema,
              Array(ts.rows, ts.cols.size, ts.version, true)))
          }
        case "mv_refresh" =>
          val r = GraftMv.refresh(spark, dir.toString)
          one(resultScan(
            StructType(Seq(
              StructField("refresh_mode", StringType, false),
              StructField("from_version", LongType, false),
              StructField("to_version", LongType, false),
              StructField("affected_groups", LongType, false))),
            Array(org.apache.spark.unsafe.types.UTF8String
              .fromString(r.mode),
              r.fromVersion, r.toVersion, r.affectedGroups)))
        case "bloom_index" =>
          val cols = input.getUTF8String(1).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val fpp = input.getDouble(2)
          val dropIt = input.getBoolean(3)
          val schema = StructType(Seq(
            StructField("files_indexed", IntegerType, false),
            StructField("files_already_indexed", IntegerType, false),
            StructField("columns", StringType, false)))
          if (dropIt) {
            cols.foreach(c => BloomIndex.drop(fs, dir, c))
            one(resultScan(schema, Array(0, 0,
              org.apache.spark.unsafe.types.UTF8String.fromString(
                cols.mkString(",") + " (dropped)"))))
          } else {
            val (n, already) = BloomIndex.build(spark, dir.toString,
              cols, fpp, auto = input.getBoolean(4))
            one(resultScan(schema, Array(n, already,
              org.apache.spark.unsafe.types.UTF8String.fromString(
                cols.mkString(",")))))
          }
        case "clone" =>
          val target = input.getUTF8String(1).toString
          val v = input.getLong(2)
          val dstDir = dirFor(target)
          // cloneAcross delegates to the hard-link path when the
          // target shares the source filesystem, and fans the byte
          // copies out over executors when it does not
          val (srcV, linked) = GraftManifest.cloneAcross(spark, dir,
            dstDir, if (v >= 0) Some(v) else None)
          one(resultScan(
            StructType(Seq(
              StructField("cloned_version", LongType, false),
              StructField("files_linked", IntegerType, false),
              StructField("target_path", StringType, false))),
            Array(srcV, linked,
              org.apache.spark.unsafe.types.UTF8String.fromString(
                dstDir.toString))))
        case "restore" =>
          val toVersion = input.getLong(1)
          val newV = GraftManifest.restore(fs, dir, toVersion)
          // cached plans/footers describe the pre-restore state;
          // invalidate so the next scan resolves fresh
          spark.catalog.refreshByPath(dir.toString)
          one(resultScan(
            StructType(Seq(
              StructField("restored_to", LongType, false),
              StructField("new_version", LongType, false))),
            Array(toVersion, newV)))
        case "history" =>
          val logRows: Array[InternalRow] =
            GraftManifest.history(fs, dir).map {
              case (v, ts, op, files, added, removed, dvN, dvChanged) =>
                new GenericInternalRow(Array[Any](
                  v, ts.map(_ * 1000L).getOrElse(null),
                  org.apache.spark.unsafe.types.UTF8String
                    .fromString(op),
                  files, added, removed, dvN, dvChanged))
                  : InternalRow
            }.toArray
          one(new LocalScan {
            override def readSchema(): StructType = StructType(Seq(
              StructField("version", LongType, false),
              StructField("timestamp", TimestampType, true),
              StructField("operation", StringType, false),
              StructField("num_files", IntegerType, false),
              StructField("added_files", IntegerType, false),
              StructField("removed_files", IntegerType, false),
              StructField("dv_files", IntegerType, false),
              StructField("changed_dvs", IntegerType, false)))
            override def rows(): Array[InternalRow] = logRows
          })
        case "detail" =>
          import org.apache.spark.unsafe.types.UTF8String
          val d = GraftDetail.summarize(fs, dir)
          def s(o: Option[String]): Any =
            o.map(UTF8String.fromString).orNull
          one(resultScan(GraftDetail.schema,
            Array(
              d.version.map(v => v: Any).orNull,
              d.numFiles, d.sizeBytes, d.numDvs, d.retainedVersions,
              s(d.lastOperation),
              d.lastModifiedMillis.map(m => (m * 1000L): Any).orNull,
              s(d.bucketSpec), s(d.checkConstraints),
              s(d.bloomIndexColumns),
              d.statsVersion.map(v => v: Any).orNull)))
        case "tag" =>
          import org.apache.spark.unsafe.types.UTF8String
          val tagName = input.getUTF8String(1).toString
          val v = input.getLong(2)
          val dropIt = input.getBoolean(3)
          val schema = StructType(Seq(
            StructField("tag", StringType, false),
            StructField("version", LongType, true),
            StructField("action", StringType, false)))
          if (dropIt) {
            val existed = GraftTags.drop(fs, dir, tagName)
            one(resultScan(schema, Array(
              UTF8String.fromString(tagName), null,
              UTF8String.fromString(
                if (existed) "dropped" else "did not exist"))))
          } else {
            val target =
              if (v >= 0) v
              else GraftManifest.current(fs, dir).map(_.version)
                .getOrElse(throw new IllegalArgumentException(
                  s"graft procedure tag: $dir has no manifest log"))
            GraftTags.create(fs, dir, tagName, target,
              replace = input.getBoolean(4))
            one(resultScan(schema, Array(
              UTF8String.fromString(tagName), target,
              UTF8String.fromString("created"))))
          }
        case "wap_publish" =>
          import org.apache.spark.unsafe.types.UTF8String
          val branch = input.getUTF8String(1).toString
          val names = Wap.publish(spark, dir.toString, branch)
          one(resultScan(
            StructType(Seq(
              StructField("branch", StringType, false),
              StructField("published_files", IntegerType, false))),
            Array(UTF8String.fromString(branch), names.size)))
        case "wap_abort" =>
          import org.apache.spark.unsafe.types.UTF8String
          val branch = input.getUTF8String(1).toString
          Wap.abort(spark, dir.toString, branch)
          one(resultScan(
            StructType(Seq(
              StructField("branch", StringType, false),
              StructField("action", StringType, false))),
            Array(UTF8String.fromString(branch),
              UTF8String.fromString("aborted"))))
        case "dq_check" =>
          import org.apache.spark.unsafe.types.UTF8String
          import org.apache.spark.sql.functions.{coalesce, count, expr, lit, sum, when}
          val raw = input.getUTF8String(1).toString
          val rules = raw.split(';').map(_.trim).filter(_.nonEmpty)
            .map { r =>
              val i = r.indexOf(':')
              if (i <= 0) throw new IllegalArgumentException(
                s"dq_check rule '$r' must be name:predicate")
              (r.substring(0, i).trim, r.substring(i + 1).trim)
            }.toSeq
          if (rules.isEmpty) throw new IllegalArgumentException(
            "dq_check: no rules given")
          if (rules.map(_._1).distinct.size != rules.size) {
            throw new IllegalArgumentException(
              s"dq_check: duplicate rule names in ${rules.map(_._1)}")
          }
          val df = spark.read.format("graft-v2")
            .option("path", dir.toString).load()
          // two rule kinds: row predicates, and referential rules of
          // the form `foreign_key(child_col, parent_table, parent_col)`
          // (Profile.dqSuite's contract — violations are orphans, the
          // anti-join NULL-key-counts-as-orphan semantics of riCheck)
          val FkForm =
            """(?i)^foreign_key\s*\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)$""".r
          val parsed = rules.map {
            case (n, FkForm(ck, pt, pk)) => (n, Right((ck, pt, pk)))
            case (n, p) =>
              if (p.trim.toLowerCase.startsWith("foreign_key")) {
                throw new IllegalArgumentException(
                  s"dq_check rule '$n' must be " +
                  "foreign_key(child_col, parent_table, parent_col)")
              }
              (n, Left(p))
          }
          val rowRules = parsed.collect { case (n, Left(p)) => (n, p) }
          // row rules: one map-side-combinable aggregate over one scan,
          // however many ride along (Profile.expectations' contract)
          val measures = rowRules.map { case (n, p) =>
            sum(when(coalesce(expr(p), lit(false)), 0L).otherwise(1L))
              .as(s"__dq_$n")
          }
          val row = df.agg(count(lit(1)).as("__dq_rows"),
            measures: _*).head()
          val nRows = row.getLong(0)
          val rowViolations = rowRules.zipWithIndex.map {
            case ((n, _), i) =>
              n -> (if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
          }.toMap
          // fk rules: one anti-join count each, strategy per stats
          val fkViolations = parsed.collect {
            case (n, Right((ck, pt, pk))) =>
              import org.apache.spark.sql.functions.col
              n -> df.select(col(ck).as("__ri_k"))
                .join(spark.table(pt).select(col(pk).as("__ri_k")),
                  Seq("__ri_k"), "left_anti")
                .count()
          }.toMap
          val data: Array[InternalRow] =
            parsed.map { case (n, _) =>
              val v = rowViolations.getOrElse(n, fkViolations(n))
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(n), nRows, v,
                v == 0L)): InternalRow
            }.toArray
          one(new LocalScan {
            override def readSchema(): StructType = StructType(Seq(
              StructField("rule", StringType, false),
              StructField("n_rows", LongType, false),
              StructField("n_violations", LongType, false),
              StructField("passed", BooleanType, false)))
            override def rows(): Array[InternalRow] = data
          })
        case "decon_index" =>
          import org.apache.spark.unsafe.types.UTF8String
          val path = input.getUTF8String(1).toString
          val n = input.getInt(2)
          val idCol = input.getUTF8String(3).toString
          val textCol = input.getUTF8String(4).toString
          val bench = spark.read.format("graft-v2")
            .option("path", dir.toString).load()
          graft.operators.CorpusOps.buildDeconIndex(bench, path,
            n = n, idCol = idCol, textCol = textCol)
          val meta = spark.read.parquet(s"$path/meta").head()
          one(resultScan(
            StructType(Seq(
              StructField("benchmark_grams", LongType, false),
              StructField("n", IntegerType, false),
              StructField("index_path", StringType, false))),
            Array(meta.getAs[Long]("gram_count"), n,
              UTF8String.fromString(path))))
        case "decontaminate" =>
          import org.apache.spark.sql.functions.{count, lit, max, sum, when}
          val idx = input.getUTF8String(1).toString
          val idCol = input.getUTF8String(2).toString
          val textCol = input.getUTF8String(3).toString
          val maxBroadcast = input.getLong(4)
          val corpus = spark.read.format("graft-v2")
            .option("path", dir.toString).load()
          val res = graft.operators.CorpusOps.decontaminateWithIndex(
            corpus, idx, idCol = idCol, textCol = textCol,
            maxBroadcastGrams = maxBroadcast)
          val row = res.agg(count(lit(1)).as("d"),
            sum(when(org.apache.spark.sql.functions
              .col("contaminated"), 1L).otherwise(0L)).as("c"),
            max(org.apache.spark.sql.functions.col("contamination"))
              .as("m")).head()
          one(resultScan(
            StructType(Seq(
              StructField("docs", LongType, false),
              StructField("contaminated", LongType, false),
              StructField("max_contamination", DoubleType, true))),
            Array(row.getLong(0),
              if (row.isNullAt(1)) 0L else row.getLong(1),
              if (row.isNullAt(2)) null else row.getDouble(2))))
        case "tags" =>
          import org.apache.spark.unsafe.types.UTF8String
          val tagRows: Array[InternalRow] =
            GraftTags.list(fs, dir).map { case (n, v) =>
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(n), v)): InternalRow
            }.toArray
          one(new LocalScan {
            override def readSchema(): StructType = StructType(Seq(
              StructField("tag", StringType, false),
              StructField("version", LongType, false)))
            override def rows(): Array[InternalRow] = tagRows
          })
        case other => throw new IllegalStateException(
          s"graft: unknown procedure $other")
      }
    }
  }
}

/** The one-row operational summary behind `CALL graft.system.detail`
  * and `DESCRIBE DETAIL t` — metadata reads only (manifest head, file
  * statuses, sidecar markers); never touches data bytes. */
private[graft] object GraftDetail {

  final case class Summary(version: Option[Long], numFiles: Int,
      sizeBytes: Long, numDvs: Int, retainedVersions: Int,
      lastOperation: Option[String], lastModifiedMillis: Option[Long],
      bucketSpec: Option[String], checkConstraints: Option[String],
      bloomIndexColumns: Option[String], statsVersion: Option[Long])

  val schema: StructType = StructType(Seq(
    StructField("version", LongType, true),
    StructField("num_files", IntegerType, false),
    StructField("size_bytes", LongType, false),
    StructField("num_delete_vectors", IntegerType, false),
    StructField("retained_versions", IntegerType, false),
    StructField("last_operation", StringType, true),
    StructField("last_modified", TimestampType, true),
    StructField("bucket_spec", StringType, true),
    StructField("check_constraints", StringType, true),
    StructField("bloom_index_columns", StringType, true),
    StructField("stats_version", LongType, true)))

  def summarize(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Summary = {
    val snapOpt = GraftManifest.current(fs, dir)
    val names = snapOpt.map(_.names)
      .getOrElse(GraftManifest.listingNames(fs, dir))
    val bytes = GraftManifest.resolve(fs, dir, names)
      .foldLeft(0L) { (acc, p) =>
        acc + (try fs.getFileStatus(p).getLen
        catch { case _: Throwable => 0L })
      }
    Summary(
      version = snapOpt.map(_.version),
      numFiles = names.length,
      sizeBytes = bytes,
      numDvs = snapOpt.map(_.dvs.size).getOrElse(0),
      retainedVersions = GraftManifest.versions(fs, dir).length,
      lastOperation = snapOpt
        .flatMap(s => GraftManifest.opOf(fs, dir, s.version)),
      lastModifiedMillis = snapOpt
        .flatMap(s => GraftManifest.commitTimeMillis(fs, dir,
          s.version)),
      bucketSpec = graft.sources.BucketLayout.read(fs, dir)
        .map(b => s"${b.numBuckets} buckets by " +
          b.bucketCols.mkString("(", ", ", ")")),
      checkConstraints = Some(GraftCatalog.readChecks(fs, dir)
        .map(_.name)).filter(_.nonEmpty).map(_.mkString(",")),
      bloomIndexColumns = Some(BloomIndex.indexedColumns(fs, dir))
        .filter(_.nonEmpty).map(_.mkString(",")),
      statsVersion = GraftStats.read(fs, dir).map(_.version))
  }
}

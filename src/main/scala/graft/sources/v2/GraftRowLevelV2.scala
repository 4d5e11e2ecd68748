package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Group-based (copy-on-write) row-level operations: SQL `UPDATE` and
  * `MERGE INTO`, plus the `DELETE FROM` shapes whose predicates the
  * metadata-only path cannot translate (Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` keeps translatable deletes on
  * the [[GraftDeleteV2]] fast path; everything else lands here).
  *
  * The contract Spark's rewrite rules (`RewriteUpdateTable`,
  * `RewriteMergeIntoTable`, `RewriteDeleteFromTable`) expect:
  *
  *  - the operation's SCAN determines the affected GROUPS — for graft,
  *    whole FILES. The rewrite plan reads every row of those files,
  *    applies the update/merge/delete logic, and writes all surviving
  *    rows back; the WRITE's commit then atomically replaces exactly
  *    the scanned files with the rewritten output (backup-park swap).
  *  - the command's condition is pushed into the scan builder
  *    (`GroupBasedRowLevelOperationScanPlanning`) for GROUP pruning
  *    only: a file none of whose row groups may match has no affected
  *    rows and is left untouched (same footer-stats classification as
  *    REPLACE WHERE / DELETE). Crucially the scan must NOT drop
  *    individual rows of a surviving file — they are the copy half of
  *    copy-on-write — so every filter is reported back as residual
  *    and the readers run unfiltered.
  *
  * The scan and write communicate through the shared operation
  * instance: `planInputPartitions` records the affected file list
  * driver-side; the commit swaps those files for the staged output.
  * Bucketed tables ride the same machinery as a bucketed INSERT — the
  * write requests clustering by the bucket transform and splits rows
  * into suffix-named per-bucket files, so the layout (and its
  * shuffle-free join contract) survives an UPDATE/MERGE.
  *
  * Cost model at 100 TB: proportional to the affected-file boundary,
  * not the table. A stats-aligned UPDATE rewrites only the files its
  * condition touches; the worst case (unconditioned UPDATE) is one
  * full parallel rewrite, which is the floor for copy-on-write.
  */
case class GraftRowLevelOperation(path: String, tableSchema: StructType,
    bucketSpec: Option[graft.sources.BucketLayout],
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Files the copy-on-write scan planned (driver-side handshake):
    * the write's commit replaces exactly these. */
  @volatile private[v2] var scannedFiles: Seq[String] = Seq.empty

  /** The manifest snapshot the scan planned against — the commit's
    * CAS expectation: a concurrent commit between plan and write-back
    * makes this operation lose cleanly instead of silently clobbering
    * ([[GraftSwapV2.parkAndSwapVersioned]]). */
  @volatile private[v2] var readState: GraftManifest.Snapshot = _

  /** The command's pushed condition (None = unconditioned): lets the
    * commit prove a racing APPEND's files could not hold matching
    * rows, so pure appends don't fail an unrelated UPDATE/MERGE. */
  @volatile private[v2] var groupCond: Option[Filter] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft-cow-${cmd.toString.toLowerCase}"

  /** `_file` rides along so Spark plans the projecting write task
    * (the writer sees clean data rows, not the rewrite plan's
    * `__row_operation` column) and can runtime-group-filter: before
    * the rewrite runs, a subquery finds the files that actually hold
    * matching rows and the scan narrows to them. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftFileColumn.Name))

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftCowScanBuilder(this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val op = this
    new WriteBuilder {
      override def build(): Write = GraftCowWrite(op, info.schema())
    }
  }
}

/** Accepts the command's condition for FILE-level pruning only —
  * everything is handed back as residual so no row of a surviving
  * file is dropped before the write-back. */
class GraftCowScanBuilder(op: GraftRowLevelOperation)
    extends ScanBuilder with SupportsPushDownFilters {

  private var groupFilters: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    groupFilters = filters
    filters // all residual
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = GraftCowScan(op, groupFilters)
}

case class GraftCowScan(op: GraftRowLevelOperation,
    groupFilters: Array[Filter]) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  import org.apache.spark.sql.types.{StringType, StructField}

  override def readSchema(): StructType =
    StructType(op.tableSchema.fields :+
      StructField(GraftFileColumn.Name, StringType, nullable = false))

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftCowScan(${op.cmd}) ${op.path.split('/').last}, " +
    s"GroupFilters: [${groupFilters.mkString(", ")}]"

  /** Runtime GROUP filtering
    * (`RowLevelOperationRuntimeGroupFiltering`): Spark first runs the
    * condition as a subquery projecting `_file`, then hands the
    * matching file set back here as an In filter — the rewrite
    * narrows from "files whose STATS admit a match" to "files that
    * HOLD a match". Driver-side only, same discipline as
    * [[GraftScanV2]]'s DPP filter. */
  @transient private var runtimeFiles: Option[Set[String]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftFileColumn.Name))

  override def filter(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.sources.In
    filters.foreach {
      case In(c, vs) if c == GraftFileColumn.Name =>
        runtimeFiles = Some(vs.map(String.valueOf).toSet)
      case _ => ()
    }
  }

  /** Affected files = the delete-whole + boundary classes of the same
    * footer-stats classification REPLACE WHERE uses; `keep` files have
    * no possibly-matching row group and stay out of the rewrite. All
    * row groups of every affected file are scheduled (file
    * granularity — the commit swaps whole files). */
  override def planInputPartitions(): Array[InputPartition] = {
    // pin the snapshot this operation rewrites (bootstrapping the
    // manifest log on a table's first-ever mutation)
    val tdir = new Path(op.path)
    val fs = tdir.getFileSystem(GraftHadoopConf.sessionConf())
    val pinned = GraftManifest.pinForMutation(fs, tdir)
    op.readState = pinned
    val groups = FooterCache.rowGroupsFor(
      GraftManifest.resolve(fs, tdir, pinned.names).map(_.toString))
    val files = groups.map(_.file).distinct.map(new Path(_))
    val statAffected: Set[String] =
      if (groupFilters.isEmpty) { op.groupCond = None; files.map(_.toString).toSet }
      else {
        import org.apache.spark.sql.sources.And
        val cond = groupFilters.reduce[Filter](And(_, _))
        op.groupCond = Some(cond)
        val (_, deleteWhole, rewrite) =
          graft.sources.PredicateFiles.classify(cond, files)
        (deleteWhole ++ rewrite).map(_.toString).toSet
      }
    val affected = runtimeFiles match {
      case Some(rf) => statAffected.filter(rf.contains)
      case None => statAffected
    }
    op.scannedFiles = affected.toSeq.sorted
    // the pinned version's deletion vectors ride into the partitions:
    // the rewrite must not resurrect position-deleted rows — and the
    // rewritten replacement files materialize them (the victim's
    // sidecar mapping drops out of the commit with the victim's name)
    val dvs = pinned.dvs
    val affectedGroups = groups.filter(rg => affected.contains(rg.file))
    val starts =
      if (dvs.isEmpty) Map.empty[(String, Int), Long]
      else DeleteVectors.rowStarts(affectedGroups.filter(rg =>
        dvs.contains(new Path(rg.file).getName)))
    // DROP/RENAME mapping: the rewrite reads old files by physical
    // name and writes back logical names — materializing the rename
    // for every rewritten file
    val renames = GraftCatalog.readMapping(fs, tdir).renames
    val logical = op.tableSchema.fieldNames.toSeq
    affectedGroups
      .map { rg =>
        val nm = PhysicalNames.mapFor(rg.file, logical, renames)
        val dvName = dvs.get(new Path(rg.file).getName)
        (dvName match {
          case Some(d) => GraftInputPartition(rg.file, rg.index,
            rg.startingPos, rg.compressedBytes,
            dvFile = new Path(DeleteVectors.dvDir(tdir), d).toString,
            rowStart = starts.getOrElse((rg.file, rg.index), 0L),
            nameMap = nm)
          case None => GraftInputPartition(rg.file, rg.index,
            rg.startingPos, rg.compressedBytes, nameMap = nm)
        }): InputPartition
      }
      .toArray
  }

  /** The plain batch readers with NO filters (every row of an
    * affected file reaches the rewrite plan — they are the copy half
    * of copy-on-write), wrapped to append `_file`. Vectorized when
    * the directory's types allow it, same as the main scan — and the
    * same guard as [[GraftScanBuilderV2.build]]: nested columns only
    * read through the vectorized path, which a NANOS timestamp rules
    * out, so that combination fails fast here instead of as an obscure
    * converter error mid-rewrite. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val rowMode = FooterCache.hasNanosTimestamp(op.path)
    if (rowMode) {
      op.tableSchema.fields.find(f => ParquetMeta.isNested(f.dataType))
        .foreach { f =>
          throw new IllegalArgumentException(
            s"graft-v2 row-level ${op.cmd}: column '${f.name}' is " +
            "nested and needs the vectorized reader, but a NANOS " +
            s"timestamp in ${op.path} forces row mode — rewrite the " +
            "table to TIMESTAMP_MICROS (any graft write path does) " +
            "before running UPDATE/MERGE/DELETE on it")
        }
    }
    FileAppendReaderFactory(
      GraftScanV2(op.path, op.tableSchema, Array.empty, -1,
        vectorized = !rowMode,
        groupByBucket = false).createReaderFactory())
  }
}

/** The write-back half: same staged writers as a batch INSERT
  * (bucket-splitting when the table is bucketed, with the clustered
  * distribution request), but commit replaces the scanned files. */
case class GraftCowWrite(op: GraftRowLevelOperation, schema: StructType)
    extends Write with RequiresDistributionAndOrdering {

  override def toBatch: BatchWrite = new GraftCowBatchWrite(op, schema)

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    BucketWriteContract.distribution(op.bucketSpec)
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    BucketWriteContract.ordering(op.bucketSpec)
}

class GraftCowBatchWrite(op: GraftRowLevelOperation, schema: StructType)
    extends GraftBatchWriteV2(op.path, schema, truncateFirst = false,
      overwriteCond = None, bucketSpec = op.bucketSpec) {

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = hconf()
    val target = new Path(op.path)
    val fs = target.getFileSystem(conf)
    val staging = new Path(target, stagingName)
    try {
      val readState = Option(op.readState)
        .getOrElse(GraftManifest.pinForMutation(fs, target))
      GraftSwapV2.parkAndSwapVersioned(fs, target, readState,
        op.scannedFiles.map(new Path(_)),
        collectFiles(messages).map(new Path(_)),
        // a racing append conflicts only when its files MIGHT hold
        // rows this operation's condition matches; an unconditioned
        // UPDATE/MERGE touches everything, so any added file conflicts
        addedSafe = added => op.groupCond.exists(cond =>
          GraftSwapV2.appendSafeUnder(target, cond)(added)),
        op = op.command().toString.toLowerCase)
    } finally {
      // sweeps zombie/speculative attempts
      try fs.delete(staging, true) catch { case _: Throwable => () }
    }
    // an operation that emptied the table pins its schema (same
    // invariant as DELETE/TRUNCATE). Same listing predicate as
    // GraftManifest.listingNames / FooterCache: dot-prefixed *.parquet
    // files are VISIBLE data — a table whose only files are
    // dot-prefixed is not empty
    val anyData = fs.listStatus(target).exists(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet"))
    if (!anyData) GraftDeleteV2.ensureSchemaMarker(fs, target, schema)
  }
}

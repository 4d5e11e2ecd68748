package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.spark.TaskContext
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{BucketLayout, InternalRowParquetBuilder, PredicateFiles}

/** SQL `DELETE FROM` / `TRUNCATE TABLE` for graft tables — the
  * mutation a training-data pipeline runs constantly at corpus scale
  * (opt-out removal, contamination purges, retention) and the
  * file-level heir of the reference's compensating delete
  * (ExtJdbcUtils.scala:323-337, `DELETE FROM t WHERE xmin IN (...)`:
  * identify exactly the rows a predicate names, remove them, leave
  * everything else untouched).
  *
  * The cost model is the same as REPLACE WHERE
  * ([[graft.sources.PredicateFiles]]): footer statistics classify the
  * table's files into keep / delete-whole / boundary, so a
  * stats-aligned predicate (a time range over time-clustered files, a
  * banned-source purge over source-partitioned files) deletes metadata-
  * only — zero data bytes read regardless of table size. Only the
  * boundary is rewritten, by a one-task-per-file executor job with NO
  * shuffle: each task streams its file's row groups, keeps the rows
  * where the predicate is not definitely true (SQL DELETE keeps
  * NULL-valued rows), and writes one replacement file that preserves
  * the original's bucket suffix — so a bucketed layout (and its
  * storage-partitioned-join contract) survives a DELETE, as does the
  * within-file sort order a sorted-bucket read reports.
  *
  * Commit is the shared backup-park swap ([[GraftSwapV2]]): victims
  * are parked, residues rename in, and any failure restores the
  * original contents — readers see complete-old or complete-new,
  * never a mix.
  */
object GraftDeleteV2 {

  /** `TRUNCATE TABLE`: atomically removes every data file. The schema
    * marker is (re)written FIRST, so the emptied table keeps its
    * schema even if the swap fails midway. */
  def truncate(path: String, schema: StructType): Boolean = {
    val conf = GraftHadoopConf.sessionConf()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    if (!fs.exists(target)) return true
    ensureSchemaMarker(fs, target, schema)
    val readState = GraftManifest.pinForMutation(fs, target)
    if (readState.names.nonEmpty) {
      // truncate absorbs racing appends: a retry re-victims the
      // then-current live set
      GraftSwapV2.parkAndSwapVersioned(fs, target, readState,
        readState.names.map(new Path(target, _)), Seq.empty,
        expandVictims = true)
    }
    true
  }

  /** `DELETE FROM ... WHERE cond` over the directory at `path`. */
  def deleteWhere(path: String, schema: StructType, cond: Filter): Unit = {
    val spark = SparkSession.active
    val conf = GraftHadoopConf.sessionConf()
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    if (!fs.exists(target)) return
    // pin the snapshot this DELETE mutates: classification, rewrite
    // and commit all run against ONE version; a concurrent commit
    // in between makes the CAS lose cleanly
    val readState = GraftManifest.pinForMutation(fs, target)
    val parts = readState.names.map(new Path(target, _))
    val (keep, deleteWhole, rewrite) =
      PredicateFiles.classify(cond, parts)
    if (deleteWhole.isEmpty && rewrite.isEmpty) return // nothing matches
    val jobId = UUID.randomUUID().toString.take(8)
    val staging = new Path(target, s".graft-v2-delete-$jobId")
    try {
      val residue: Seq[Path] =
        if (rewrite.isEmpty) Seq.empty
        else {
          fs.mkdirs(staging)
          val flat = schema.fields.forall(_.dataType match {
            case _: StructType | _: ArrayType | _: MapType => false
            case _ => true
          })
          if (flat) {
            rewritePerFile(spark, cond, schema, rewrite, staging, jobId)
          } else if (BucketLayout.read(fs, target).isEmpty) {
            // nested-schema fallback (unbucketed only): the same
            // distributed DataFrame residue job REPLACE WHERE runs
            PredicateFiles.residueJob(spark, fs, cond, rewrite, staging)
          } else {
            throw new UnsupportedOperationException(
              s"graft-v2 DELETE: the bucketed table at $path has " +
              "nested columns; the bucket-preserving per-file rewrite " +
              "covers flat schemas only — rewrite with " +
              "GraftSink.saveBucketedFiles instead")
          }
        }
      if (keep.isEmpty && residue.isEmpty) {
        // the delete empties the table: pin its schema first
        ensureSchemaMarker(fs, target, schema)
      }
      GraftSwapV2.parkAndSwapVersioned(fs, target, readState,
        deleteWhole ++ rewrite, residue,
        // a racing append conflicts only if its files MIGHT hold rows
        // this DELETE's predicate matches (footer-stats proof); a
        // racer that touched our victims always makes us lose cleanly
        addedSafe = GraftSwapV2.appendSafeUnder(target, cond))
    } finally {
      // sweeps zombie/speculative attempts too
      try fs.delete(staging, true) catch { case _: Throwable => () }
    }
  }

  /** (Re)writes the schema marker with the table's CURRENT schema —
    * unconditionally, so a table whose schema evolved past its CREATE
    * marker (footers won while data existed) keeps the evolved schema
    * when a DELETE/TRUNCATE empties it. */
  private[v2] def ensureSchemaMarker(fs: FileSystem, target: Path,
      schema: StructType): Unit = {
    val out = fs.create(new Path(target, GraftCatalog.SchemaMarker), true)
    try out.write(schema.toDDL.getBytes("UTF-8")) finally out.close()
  }

  /** One executor task per boundary file, no shuffle: stream row
    * groups, keep rows where `cond` is not definitely TRUE, emit one
    * replacement file carrying the original's bucket suffix. Names are
    * attempt-unique; only the attempt whose result Spark collected is
    * renamed in, and the staging sweep drops zombies — the same
    * speculative-duplicate discipline as the batch writers. */
  private def rewritePerFile(spark: SparkSession, cond: Filter,
      schema: StructType, files: Seq[Path], staging: Path,
      jobId: String): Seq[Path] = {
    val internal = PredicateFiles.internalizeTemporal(cond, schema)
    if (!RowFilterEval.supports(internal, schema)) {
      throw new UnsupportedOperationException(
        s"graft-v2 DELETE: cannot evaluate predicate $cond row-side — " +
        "supported: comparisons (incl. date/timestamp)/In/IsNull/" +
        "StartsWith/EndsWith/Contains over flat columns, with And/Or/Not")
    }
    val sconf = new SerializableConfiguration(GraftHadoopConf.sessionConf())
    val stagingStr = staging.toString
    val jobs: Seq[(String, String)] = files.zipWithIndex.map {
      case (p, i) =>
        // the `_<bucket%05d>` suffix must stay the LAST `_digits`
        // group, so the attempt marker is hyphen-joined
        val suffix = BucketLayout.bucketIdOf(p.getName)
          .map(b => f"_$b%05d").getOrElse("")
        (p.toString, s"part-del-$jobId-$i$suffix.c000.snappy.parquet")
    }
    spark.sparkContext.parallelize(jobs, jobs.size)
      .map { case (in, outName) =>
        val attempt = Option(TaskContext.get())
          .map(_.attemptNumber()).getOrElse(0)
        val named =
          if (attempt == 0) outName
          else outName.replaceFirst("^part-del-", s"part-del-a$attempt-")
        rewriteOne(sconf.value, in, s"$stagingStr/$named", internal)
      }
      .collect().toSeq.flatten.map(new Path(_))
  }

  /** Task body: rewrite `inFile` minus the definitely-matching rows
    * into `outFile`. Returns None (and writes nothing) when no row
    * survives. Evaluation is [[RowFilterEval]]'s three-valued compile:
    * a row is DELETED only when the predicate is definitely TRUE —
    * UNKNOWN (null operand) rows survive, matching SQL DELETE.
    *
    * Rewritten files are emitted in the engine's canonical
    * TIMESTAMP_MICROS (like every other graft write path): a NANOS
    * source file's survivors normalize to micros — the same value
    * every graft read already produced for them. */
  private def rewriteOne(conf: Configuration, inFile: String,
      outFile: String, internalCond: Filter): Option[String] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(inFile), conf))
    var writer: ParquetWriter[InternalRow] = null
    try {
      val fileSchema = reader.getFileMetaData.getSchema
      val struct = ParquetMeta.toStruct(fileSchema)
      // schema evolution: the predicate may reference columns this
      // (older) file lacks — evaluate over a padded row, so they read
      // NULL -> UNKNOWN -> the row survives, same as a live query
      val missing = internalCond.references.distinct
        .filterNot(struct.fieldNames.contains)
      val evalSchema = org.apache.spark.sql.types.StructType(
        struct.fields ++ missing.map(
          org.apache.spark.sql.types.StructField(_,
            org.apache.spark.sql.types.StringType)))
      val compiled = RowFilterEval.compile(Array(internalCond), evalSchema)
      val matches: InternalRow => Boolean =
        if (missing.isEmpty) compiled
        else {
          val nulls = new GenericInternalRow(missing.length)
          val joined =
            new org.apache.spark.sql.catalyst.expressions.JoinedRow
          r => compiled(joined(r, nulls))
        }
      val converters = struct.fields.zipWithIndex.map { case (f, i) =>
        ParquetMeta.converter(fileSchema.getType(i), f.dataType)
      }
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rr = new ColumnIOFactory().getColumnIO(fileSchema)
          .getRecordReader(pages, new GroupRecordConverter(fileSchema))
        val total = pages.getRowCount
        var n = 0L
        while (n < total) {
          val g = rr.read()
          n += 1
          if (g != null) {
            val row = new GenericInternalRow(struct.length)
            var i = 0
            while (i < struct.length) {
              row.update(i,
                if (g.getFieldRepetitionCount(i) == 0) null
                else converters(i)(g, i))
              i += 1
            }
            if (!matches(row)) {
              if (writer == null) writer = openWriter(conf, struct, outFile)
              writer.write(row)
            }
          }
        }
        pages = reader.readNextRowGroup()
      }
      if (writer != null) Some(outFile) else None
    } finally {
      try reader.close() finally {
        if (writer != null) writer.close()
      }
    }
  }

  private def openWriter(conf: Configuration, struct: StructType,
      outFile: String): ParquetWriter[InternalRow] = {
    ParquetWriteSupport.setSchema(struct, conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled",
      "false")
    new InternalRowParquetBuilder(
        HadoopOutputFile.fromPath(new Path(outFile), conf))
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

}

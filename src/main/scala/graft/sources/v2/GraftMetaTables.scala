package graft.sources.v2

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES — the Iceberg-style `SELECT * FROM cat.ns.t.<meta>`
  * face of the observability the `CALL` procedures already expose
  * (`history`, `detail`, tags): Spark resolves `cat.ns.t.files` as
  * identifier (namespace = [ns, t], name = "files"), and
  * [[GraftCatalog.loadTable]] falls through to here when the FULL
  * identifier is not a table but its parent is. A real table named
  * `files` always wins (the fallback only fires on resolution
  * failure).
  *
  *  - `t.files`     — the CURRENT snapshot's data files: name, size,
  *    footer row count, deletion-vector sidecar (NULL when unmasked);
  *    manifest-free tables report their listing.
  *  - `t.history`   — the commit log, one row per retained version
  *    (exactly `CALL graft.system.history`'s shape).
  *  - `t.tags`      — named version tags.
  *  - `t.profile`   — zero-scan per-column rows/nulls/min/max folded
  *    from the manifest skip stats (`SkipStats.profileRows`); empty
  *    when DVs are present or no column is covered on every file.
  *
  * All four are tiny driver-materialized [[LocalScan]]s — metadata
  * volume, not data volume; the snapshot is pinned once per scan. */
object GraftMetaTables {

  val Names: Set[String] = Set("files", "history", "tags", "profile")

  def load(fs: FileSystem, dir: Path, kind: String,
      versionAsOf: Option[Long] = None): Table =
    new MetaTable(fs, dir, kind, versionAsOf)

  private final class MetaTable(fs: FileSystem, dir: Path,
      kind: String, versionAsOf: Option[Long] = None)
      extends Table with SupportsRead {
    override def name(): String = s"graft-v2:${dir.getName}.$kind"
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def schema(): StructType = kind match {
      case "files" => StructType(Seq(
        StructField("file", StringType, false),
        StructField("size_bytes", LongType, false),
        StructField("row_count", LongType, true),
        StructField("dv_file", StringType, true),
        StructField("skip_stats", StringType, true),
        StructField("partition_tokens", StringType, true),
        StructField("bloom_cols", StringType, true)))
      case "history" => StructType(Seq(
        StructField("version", LongType, false),
        StructField("timestamp", TimestampType, true),
        StructField("operation", StringType, false),
        StructField("num_files", IntegerType, false),
        StructField("added_files", IntegerType, false),
        StructField("removed_files", IntegerType, false),
        StructField("dv_files", IntegerType, false),
        StructField("changed_dvs", IntegerType, false)))
      case "tags" => StructType(Seq(
        StructField("tag", StringType, false),
        StructField("version", LongType, false)))
      case "profile" => StructType(Seq(
        StructField("column_name", StringType, false),
        StructField("n_rows", LongType, false),
        StructField("n_nulls", LongType, false),
        StructField("min_repr", StringType, true),
        StructField("max_repr", StringType, true),
        StructField("exact", BooleanType, false)))
      case other => throw new IllegalArgumentException(
        s"unknown graft metadata table $other")
    }

    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = {
      val sch = schema()
      val data: Array[InternalRow] = kind match {
        case "files" =>
          val snap = versionAsOf match {
            case Some(v) =>
              Some(GraftManifest.read(fs, dir, v))
            case None => GraftManifest.current(fs, dir)
          }
          val names = snap.map(_.names).getOrElse {
            if (!fs.exists(dir)) Seq.empty
            else fs.listStatus(dir).toSeq.map(_.getPath.getName)
              .filter(_.endsWith(".parquet")).sorted
          }
          val dvs = snap.map(_.dvs).getOrElse(Map.empty)
          val fstats = snap.map(_.fstats).getOrElse(Map.empty)
          val layout = scala.util.Try(
            graft.sources.PartitionLayout.read(fs, dir)).toOption
            .flatten
          // per-column bloom sidecar coverage: one listing per
          // indexed column (metadata volume), membership by file name
          val bloomCover: Seq[(BloomIndex.ColIndex, Set[String])] =
            scala.util.Try(BloomIndex.indexMeta(fs, dir))
              .getOrElse(Seq.empty)
              .map(ci => ci -> scala.util.Try(
                BloomIndex.sidecarFiles(fs, dir, ci.col))
                .getOrElse(Set.empty[String]))
          names.map { n =>
            // a pinned file may have been archived by a later commit:
            // resolve like every snapshot read does
            val p0 = new Path(dir, n)
            val p =
              if (fs.exists(p0)) p0
              else GraftManifest.archiveTwin(p0).filter(fs.exists)
                .getOrElse(p0)
            val (size, rows) =
              if (fs.exists(p)) {
                val st = fs.getFileStatus(p)
                val rc = scala.util.Try(FooterCache
                  .rowGroupsFor(Seq(p.toString)).map(_.rowCount).sum)
                  .toOption
                (st.getLen, rc)
              } else (0L, None)
            // the manifest's skip ranges and the name's partition
            // digests, rendered for operators eyeballing pruning
            val skipRepr = fstats.get(n).map(cols =>
              cols.toSeq.sortBy(_._1).map { case (c, st) =>
                s"$c=[${st.lo.getOrElse("null")}," +
                  s"${st.hi.getOrElse("null")}] nulls=${st.nulls}"
              }.mkString("; "))
            val pvRepr = layout.flatMap(pl =>
              graft.sources.PartitionLayout.fileTokens(n, pl)
                .map(ts => pl.cols.zip(ts).map { case (c, t) =>
                  s"$c:$t" }.mkString("; ")))
            val bloomRepr = {
              val covered = bloomCover.filter(_._2.contains(n))
                .map { case (ci, _) =>
                  s"${ci.col}(fpp=${ci.fpp}" +
                    (if (ci.auto) ",auto)" else ")")
                }
              if (covered.isEmpty) None
              else Some(covered.mkString("; "))
            }
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(n), size,
              rows.map(r => r: Any).orNull,
              dvs.get(n).map(UTF8String.fromString).orNull,
              skipRepr.map(UTF8String.fromString).orNull,
              pvRepr.map(UTF8String.fromString).orNull,
              bloomRepr.map(UTF8String.fromString).orNull))
              : InternalRow
          }.toArray
        case "history" =>
          GraftManifest.history(fs, dir).map {
            case (v, ts, op, files, added, removed, dvN, dvChanged) =>
              new GenericInternalRow(Array[Any](
                v, ts.map(_ * 1000L).getOrElse(null),
                UTF8String.fromString(op),
                files, added, removed, dvN, dvChanged)): InternalRow
          }.toArray
        case "tags" =>
          GraftTags.list(fs, dir).sortBy(_._1).map { case (t, v) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(t), v)): InternalRow
          }.toArray
        case "profile" =>
          // zero-scan per-column profile from the manifest fstat=
          // lines (SkipStats.profileRows); a SELECTable face returns
          // EMPTY rather than throwing when the snapshot carries
          // deletion vectors (footer counts would overcount) or no
          // column is covered on every file
          val snap = versionAsOf match {
            case Some(v) => Some(GraftManifest.read(fs, dir, v))
            case None => GraftManifest.current(fs, dir)
          }
          snap.filter(_.dvs.isEmpty).toSeq
            .flatMap(SkipStats.profileRows)
            .map { case (c, nRows, nNulls, mn, mx, exact) =>
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(c), nRows, nNulls,
                mn.map(UTF8String.fromString).orNull,
                mx.map(UTF8String.fromString).orNull,
                exact)): InternalRow
            }.toArray
        case other => throw new IllegalArgumentException(other)
      }
      new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def readSchema(): StructType = sch
          override def rows(): Array[InternalRow] = data
        }
      }
    }
  }
}

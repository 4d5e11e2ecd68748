package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarArray, ColumnarMap}
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.RoaringBitmap

/** POSITION DELETE files ("deletion vectors"): the file-format answer
  * to the reference's row-granular `DELETE ... WHERE xmin IN (...)`
  * (ExtJdbcUtils.scala:324-337) without copy-on-write's one-full-file-
  * rewrite floor.
  *
  * A deletion vector is an immutable sidecar under
  * `<table>/.graft-dv/` holding the FILE-ORDINAL positions of deleted
  * rows of ONE data file, as a roaring bitmap (the same public
  * compressed-bitset design every open table format's deletion vectors
  * use; RoaringBitmap ships with Spark). The manifest version that
  * commits a DV maps the data-file name to the DV name in its
  * `dv=<file>:<dvfile>` meta lines, so:
  *
  *  - snapshot isolation extends to deletes: a pinned `VERSION AS OF`
  *    before the DV commit reads the file whole; after, minus the
  *    positions — one atomic manifest CAS either way;
  *  - a further DELETE on the same file writes a NEW sidecar holding
  *    the UNION of positions and re-maps (sidecars are immutable, so
  *    concurrent pinned readers never see a vector change underfoot);
  *  - vacuum drops sidecars no retained version references, exactly
  *    like archived data files.
  *
  * Readers apply DVs in BOTH modes at the innermost layer, where
  * physical row ordinals are still visible (before any filter/limit
  * skipping): the row-group row reader skips deleted ordinals as it
  * streams ([[GraftRowGroupReader]]), and the vectorized reader wraps
  * each batch's vectors in a selection view ([[SelectedColumnVector]])
  * — zero copy, surviving-rows-only, still columnar.
  *
  * Cost model at 100 TB: a point DELETE writes bytes ∝ DELETED ROWS
  * (one small sidecar per touched file) instead of rewriting every
  * touched file; reads pay one tiny sidecar fetch per DV'd file and a
  * per-batch selection. [[GraftDeleteV2]] escalates to the classic
  * rewrite when the deleted fraction crosses
  * `spark.graft.dv.maxFraction` — a file mostly deleted is better
  * rewritten than carried as an ever-larger mask.
  */
object DeleteVectors {

  val Dir = ".graft-dv"
  private val Magic = 0x47445631 // "GDV1"

  def dvDir(table: Path): Path = new Path(table, Dir)

  /** Threshold above which DELETE materializes (rewrites) instead of
    * writing a DV: deleted-fraction of the file, unioned with any
    * existing vector. */
  def maxFraction: Double =
    try org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.dv.maxFraction", "0.2").toDouble
    catch { case _: Throwable => 0.2 }

  def serialize(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(Magic)
    bm.serialize(dos)
    dos.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val dis = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val magic = dis.readInt()
    if (magic != Magic) {
      throw new java.io.IOException(
        f"graft-dv: bad deletion-vector magic 0x$magic%08x")
    }
    val bm = new RoaringBitmap()
    bm.deserialize(dis)
    bm
  }

  def write(fs: FileSystem, path: Path, bm: RoaringBitmap): Unit = {
    val out = fs.create(path, true)
    try out.write(serialize(bm)) finally out.close()
  }

  def read(fs: FileSystem, path: Path): RoaringBitmap = {
    val st = fs.getFileStatus(path)
    val in = fs.open(path)
    try {
      val bytes = new Array[Byte](st.getLen.toInt)
      in.readFully(0, bytes)
      deserialize(bytes)
    } finally in.close()
  }

  /** Executor-side sidecar cache: DV files are immutable (a new DELETE
    * writes a new name), so a path maps to one bitmap forever. Bounded
    * by a coarse entry cap — vectors are small, and a long-lived
    * executor scanning many tables must not accumulate without end. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, RoaringBitmap]()
  private val CacheMax = 4096

  def load(dvFile: String, conf: Configuration): RoaringBitmap = {
    val hit = cache.get(dvFile)
    if (hit != null) return hit
    val p = new Path(dvFile)
    val bm = read(p.getFileSystem(conf), p)
    if (cache.size() < CacheMax) cache.putIfAbsent(dvFile, bm)
    bm
  }

  /** Driver-side: total deleted rows across a snapshot's vectors (for
    * scan statistics). Best-effort — an unreadable sidecar contributes
    * zero rather than failing planning. */
  def cardinality(table: Path, dvNames: Iterable[String],
      conf: Configuration): Long =
    dvNames.foldLeft(0L) { (acc, n) =>
      acc + (try load(new Path(dvDir(table), n).toString, conf)
        .getLongCardinality
      catch { case _: Throwable => 0L })
    }

  /** Per-(file, rowGroup) starting FILE ordinal: row groups of a file
    * in index order, prefix-summed. The planner attaches these to
    * partitions of DV'd files so readers can translate group-local
    * ordinals to file ordinals. */
  def rowStarts(groups: Seq[FooterCache.RowGroupMeta])
      : Map[(String, Int), Long] = {
    groups.groupBy(_.file).flatMap { case (f, rgs) =>
      val sorted = rgs.sortBy(_.index)
      sorted.zip(sorted.scanLeft(0L)(_ + _.rowCount))
        .map { case (rg, start) => (f, rg.index) -> start }
    }
  }
}

/** Read-only selection view over a columnar vector: logical row `i`
  * delegates to physical row `sel(i)` of `base`. Applying a deletion
  * vector to a batch wraps every column (children too, so
  * struct/array/map getters resolve through the same mapping) — no
  * data copied, surviving rows only, the batch stays columnar. */
private[v2] class SelectedColumnVector(base: ColumnVector,
    sel: Array[Int]) extends ColumnVector(base.dataType()) {

  override def close(): Unit = () // base owned by the inner reader

  // conservative: may overstate (selection can drop the null rows);
  // overstating only costs the null-checking path, never correctness
  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = base.numNulls()

  override def isNullAt(rowId: Int): Boolean = base.isNullAt(sel(rowId))
  override def getBoolean(rowId: Int): Boolean = base.getBoolean(sel(rowId))
  override def getByte(rowId: Int): Byte = base.getByte(sel(rowId))
  override def getShort(rowId: Int): Short = base.getShort(sel(rowId))
  override def getInt(rowId: Int): Int = base.getInt(sel(rowId))
  override def getLong(rowId: Int): Long = base.getLong(sel(rowId))
  override def getFloat(rowId: Int): Float = base.getFloat(sel(rowId))
  override def getDouble(rowId: Int): Double = base.getDouble(sel(rowId))
  override def getArray(rowId: Int): ColumnarArray =
    base.getArray(sel(rowId))
  override def getMap(ordinal: Int): ColumnarMap = base.getMap(sel(ordinal))
  override def getDecimal(rowId: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    base.getDecimal(sel(rowId), precision, scale)
  override def getUTF8String(rowId: Int): UTF8String =
    base.getUTF8String(sel(rowId))
  override def getBinary(rowId: Int): Array[Byte] = base.getBinary(sel(rowId))

  private lazy val kids =
    scala.collection.mutable.HashMap.empty[Int, SelectedColumnVector]
  override def getChild(ordinal: Int): ColumnVector =
    kids.getOrElseUpdate(ordinal,
      new SelectedColumnVector(base.getChild(ordinal), sel))
}

/** Synthetic `_pos` column: row `i` IS the long `start + i` — the
  * RAW-ORDINAL channel of the vectorized read path. A batch decoded
  * from physical rows [start, start+n) appends one of these; the
  * deletion-vector selection view then composes on top
  * ([[SelectedColumnVector]] over this yields `start + sel(i)`), so
  * survivors keep their exact physical file ordinals with zero
  * per-row work and no materialized array. */
private[v2] class OrdinalColumnVector(start: Long)
    extends ColumnVector(org.apache.spark.sql.types.LongType) {

  override def close(): Unit = ()
  override def hasNull: Boolean = false
  override def numNulls(): Int = 0
  override def isNullAt(rowId: Int): Boolean = false
  override def getLong(rowId: Int): Long = start + rowId

  private def nope = throw new UnsupportedOperationException(
    "graft-v2: _pos ordinal vector is LongType-only")
  override def getBoolean(rowId: Int): Boolean = nope
  override def getByte(rowId: Int): Byte = nope
  override def getShort(rowId: Int): Short = nope
  override def getInt(rowId: Int): Int = nope
  override def getFloat(rowId: Int): Float = nope
  override def getDouble(rowId: Int): Double = nope
  override def getArray(rowId: Int): ColumnarArray = nope
  override def getMap(ordinal: Int): ColumnarMap = nope
  override def getDecimal(rowId: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal = nope
  override def getUTF8String(rowId: Int): UTF8String = nope
  override def getBinary(rowId: Int): Array[Byte] = nope
  override def getChild(ordinal: Int): ColumnVector = nope
}

/** Read-only CONTIGUOUS-slice view: logical row `i` delegates to
  * physical row `start + i` of `base` — the zero-copy batch-slice
  * primitive of the columnar k-way merge ([[KWayBatchMergeReader]]).
  * Same delegation shape as [[SelectedColumnVector]] without the
  * indirection array. */
private[v2] class OffsetColumnVector(base: ColumnVector,
    start: Int) extends ColumnVector(base.dataType()) {

  override def close(): Unit = () // base owned by the inner reader

  override def hasNull: Boolean = base.hasNull
  override def numNulls(): Int = base.numNulls()

  override def isNullAt(rowId: Int): Boolean = base.isNullAt(start + rowId)
  override def getBoolean(rowId: Int): Boolean =
    base.getBoolean(start + rowId)
  override def getByte(rowId: Int): Byte = base.getByte(start + rowId)
  override def getShort(rowId: Int): Short = base.getShort(start + rowId)
  override def getInt(rowId: Int): Int = base.getInt(start + rowId)
  override def getLong(rowId: Int): Long = base.getLong(start + rowId)
  override def getFloat(rowId: Int): Float = base.getFloat(start + rowId)
  override def getDouble(rowId: Int): Double =
    base.getDouble(start + rowId)
  override def getArray(rowId: Int): ColumnarArray =
    base.getArray(start + rowId)
  override def getMap(ordinal: Int): ColumnarMap =
    base.getMap(start + ordinal)
  override def getDecimal(rowId: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    base.getDecimal(start + rowId, precision, scale)
  override def getUTF8String(rowId: Int): UTF8String =
    base.getUTF8String(start + rowId)
  override def getBinary(rowId: Int): Array[Byte] =
    base.getBinary(start + rowId)

  private lazy val kids =
    scala.collection.mutable.HashMap.empty[Int, OffsetColumnVector]
  override def getChild(ordinal: Int): ColumnVector =
    kids.getOrElseUpdate(ordinal,
      new OffsetColumnVector(base.getChild(ordinal), start))
}

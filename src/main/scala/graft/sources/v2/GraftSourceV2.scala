package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 twin of the graft source (`format("graft-v2")`) — the
  * modern-API expression of the same pushdown contract the V1
  * [[graft.sources.GraftRelation]] re-derives from the reference:
  *
  *  - column pruning  -> `SupportsPushDownRequiredColumns`
  *    (reference JDBCRDDWithLimit.scala:36-40),
  *  - filter pushdown + residuals -> `SupportsPushDownFilters`
  *    (JDBCRDDWithLimit.scala:45-48 / JDBCRelationWithLimit.scala:29-31),
  *  - limit pushdown -> `SupportsPushDownLimit` with
  *    `isPartiallyPushed=true`, i.e. at most `limit` rows per partition
  *    and Spark keeps the global limit — exactly the reference rule's
  *    retained-`LocalLimit` contract (PropagateJDBCLimit.scala:26). In V2
  *    no custom optimizer rule is needed: Catalyst's
  *    `V2ScanRelationPushDown` drives these interfaces.
  *
  * Execution is a custom `PartitionReader` over parquet-mr: ONE INPUT
  * PARTITION PER ROW GROUP (the file's natural parallel unit — the
  * analog of the reference's one-query-per-`JDBCPartition`,
  * JDBCRDDWithLimit.scala:31), reading only the projected columns,
  * evaluating pushed filters source-side, stopping at `limit` rows.
  *
  * Scope: flat schemas of primitive columns (int/long/float/double/
  * boolean/string/binary/timestamp/date). Nested/array columns are the
  * V1 path's job; `inferSchema` rejects them with a clear error.
  */
class GraftSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-v2"

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-v2 source requires a 'path' option"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ParquetMeta.sparkSchema(path(options), new Configuration())

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    GraftTableV2(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

case class GraftTableV2(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-v2:${path.split('/').last}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftScanBuilderV2(path, tableSchema)
}

class GraftScanBuilderV2(path: String, fullSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep file column order for the reader; Spark projects above
    val names = requiredSchema.fieldNames.toSet
    this.requiredSchema =
      StructType(fullSchema.fields.filter(f => names.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rejected) = filters.partition(f =>
      RowFilterEval.supports(f, fullSchema))
    pushed = ok
    rejected // residuals: Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(limit: Int): Boolean = {
    this.limit = limit
    true // pushed — but only per-partition:
  }
  override def isPartiallyPushed: Boolean = true // Spark keeps GlobalLimit

  override def build(): Scan =
    GraftScanV2(path, requiredSchema, pushed, limit)
}

case class GraftScanV2(path: String, projectedSchema: StructType,
    filters: Array[Filter], limit: Int)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = projectedSchema

  /** Footer-derived stats (row count + byte size) so Catalyst can make
    * broadcast decisions for graft-v2 tables — without this the scan
    * reports unknown size and dim joins never broadcast. */
  override def estimateStatistics(): Statistics = {
    val conf = new Configuration()
    var rows = 0L; var bytes = 0L
    ParquetMeta.listRowGroupStats(path, conf).foreach { case (r, b) =>
      rows += r; bytes += b
    }
    val (fr, fb) = (rows, bytes)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(fb)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(fr)
    }
  }
  override def toBatch: Batch = this
  override def description(): String = {
    val lim = if (limit >= 0) s", PushedLimit: $limit" else ""
    s"GraftScanV2 ${path.split('/').last}, " +
      s"PushedFilters: [${filters.mkString(", ")}]$lim, " +
      s"ReadSchema: ${projectedSchema.catalogString}"
  }

  override def planInputPartitions(): Array[InputPartition] =
    ParquetMeta.listRowGroups(path, new Configuration()).map {
      case (file, rg, start, len) => GraftInputPartition(file, rg, start, len)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(projectedSchema, filters, limit)
}

/** One parquet row group = one partition (file offset + byte span pin
  * the group: parquet-mr's range filter keeps groups whose MIDPOINT is
  * inside the range, so the span must cover the group). */
case class GraftInputPartition(file: String, rowGroup: Int,
    startingPos: Long, byteLen: Long) extends InputPartition

case class GraftReaderFactory(readSchema: StructType,
    filters: Array[Filter], limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new GraftRowGroupReader(p, readSchema, filters, limit)
  }
}

/** Reads exactly one row group through parquet-mr with column projection,
  * source-side filter evaluation, and a per-partition row cap. */
class GraftRowGroupReader(part: GraftInputPartition,
    readSchema: StructType, filters: Array[Filter], limit: Int)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  private val inputFile =
    HadoopInputFile.fromPath(new Path(part.file), conf)
  // select ONLY this row group via its byte offset
  private val reader = ParquetFileReader.open(inputFile,
    ParquetReadOptions.builder()
      .withRange(part.startingPos, part.startingPos + part.byteLen).build())
  private val fileSchema = reader.getFileMetaData.getSchema
  // Spark prunes filter-only columns out of the projection once a filter
  // is pushed — the reader must still materialize them to evaluate the
  // filter, then emit only the projected columns.
  private val extraCols: Array[String] = filters.flatMap(_.references)
    .distinct.filterNot(readSchema.fieldNames.contains)
  private val extNames: Array[String] = readSchema.fieldNames ++ extraCols
  private val requested: MessageType = ParquetMeta.project(
    fileSchema, extNames)
  private val extSchema: StructType = ParquetMeta.toStruct(requested)
  reader.setRequestedSchema(requested)

  private val pages = reader.readNextRowGroup()
  private val recordReader =
    if (pages == null) null
    else new ColumnIOFactory().getColumnIO(requested)
      .getRecordReader(pages, new GroupRecordConverter(requested))
  private val totalRows: Long = if (pages == null) 0L else pages.getRowCount
  private val converters = extSchema.fields.zipWithIndex.map {
    case (f, i) => ParquetMeta.converter(requested.getType(i), f.dataType)
  }
  private val predicate = RowFilterEval.compile(filters, extSchema)

  private var readCount = 0L
  private var emitted = 0
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (recordReader == null) return false
    while (readCount < totalRows && (limit < 0 || emitted < limit)) {
      val g = recordReader.read()
      readCount += 1
      if (g != null) {
        val ext = new GenericInternalRow(extSchema.length)
        var i = 0
        while (i < extSchema.length) {
          ext.update(i,
            if (g.getFieldRepetitionCount(i) == 0) null
            else converters(i)(g, i))
          i += 1
        }
        if (predicate(ext)) {
          current =
            if (extraCols.isEmpty) ext
            else {
              val out = new GenericInternalRow(readSchema.length)
              var j = 0
              while (j < readSchema.length) {
                out.update(j, ext.get(j, readSchema(j).dataType)); j += 1
              }
              out
            }
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** Parquet footer/metadata helpers shared by driver and executors. */
object ParquetMeta {

  /** All parquet part files of `path` (file or directory). */
  private def partFiles(path: String, conf: Configuration): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory) {
      fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    } else Seq(p)
  }

  /** (rowCount, totalByteSize) per row group — for scan statistics. */
  def listRowGroupStats(path: String, conf: Configuration)
      : Seq[(Long, Long)] =
    partFiles(path, conf).flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        r.getRowGroups.asScala.toSeq.map(bm =>
          (bm.getRowCount, bm.getTotalByteSize))
      } finally r.close()
    }

  /** (file, rowGroupIndex, startingPos, compressedByteSize) per group. */
  def listRowGroups(path: String, conf: Configuration)
      : Seq[(String, Int, Long, Long)] =
    partFiles(path, conf).flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        r.getRowGroups.asScala.toSeq.zipWithIndex.map { case (bm, i) =>
          (f.toString, i, bm.getStartingPos, bm.getCompressedSize)
        }
      } finally r.close()
    }

  def sparkSchema(path: String, conf: Configuration): StructType = {
    val f = partFiles(path, conf).head
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
    try toStruct(r.getFileMetaData.getSchema) finally r.close()
  }

  def project(file: MessageType, names: Array[String]): MessageType = {
    val kept = names.map(n => file.getType(file.getFieldIndex(n)))
    new MessageType(file.getName, kept: _*)
  }

  private[v2] def toStruct(m: MessageType): StructType = StructType(
    m.getFields.asScala.toSeq.map { t =>
      StructField(t.getName, sparkType(t),
        t.getRepetition != Type.Repetition.REQUIRED)
    })

  private def sparkType(t: Type): DataType = {
    if (!t.isPrimitive) {
      throw new IllegalArgumentException(
        s"graft-v2 supports flat primitive schemas only; " +
        s"column '${t.getName}' is nested — use format(\"graft\") " +
        "(V1) or spark.read.parquet for nested/array columns")
    }
    val p = t.asPrimitiveType()
    val logical = p.getLogicalTypeAnnotation
    p.getPrimitiveTypeName match {
      case INT32 =>
        logical match {
          case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
          case _ => IntegerType
        }
      case INT64 =>
        logical match {
          case ts: TimestampLogicalTypeAnnotation =>
            // isAdjustedToUTC=false parquet timestamps are NTZ in Spark
            if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
          case _ => LongType
        }
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case BOOLEAN => BooleanType
      case BINARY =>
        logical match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
            StringType
          case _ => BinaryType
        }
      case other => throw new IllegalArgumentException(
        s"graft-v2: unsupported parquet type $other for '${t.getName}'")
    }
  }

  /** Group-field -> Catalyst value converter for one column. */
  def converter(t: Type, dt: DataType): (Group, Int) => Any = {
    val p = t.asPrimitiveType()
    (p.getPrimitiveTypeName, dt) match {
      case (INT32, DateType) => (g, i) => g.getInteger(i, 0)
      case (INT32, _) => (g, i) => g.getInteger(i, 0)
      case (INT64, TimestampType | TimestampNTZType) =>
        val unit = p.getLogicalTypeAnnotation
          .asInstanceOf[TimestampLogicalTypeAnnotation].getUnit
        unit match {
          case TimeUnit.MILLIS => (g, i) => g.getLong(i, 0) * 1000L
          case TimeUnit.MICROS => (g, i) => g.getLong(i, 0)
          case TimeUnit.NANOS => (g, i) => g.getLong(i, 0) / 1000L
        }
      case (INT64, _) => (g, i) => g.getLong(i, 0)
      case (FLOAT, _) => (g, i) => g.getFloat(i, 0)
      case (DOUBLE, _) => (g, i) => g.getDouble(i, 0)
      case (BOOLEAN, _) => (g, i) => g.getBoolean(i, 0)
      case (BINARY, StringType) =>
        (g, i) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case (BINARY, _) => (g, i) => g.getBinary(i, 0).getBytes
      case (other, _) => throw new IllegalArgumentException(
        s"graft-v2: no converter for $other")
    }
  }
}

/** Interprets `sources.Filter`s against materialized rows — the V2
  * analog of compiling filters into the source query. Only filters this
  * object `supports` are accepted for pushdown; everything else stays a
  * Spark-side residual.
  */
object RowFilterEval extends Serializable {
  import org.apache.spark.sql.sources._

  def supports(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, v) => comparable(a, v, schema)
    case LessThan(a, v) => comparable(a, v, schema)
    case LessThanOrEqual(a, v) => comparable(a, v, schema)
    case GreaterThan(a, v) => comparable(a, v, schema)
    case GreaterThanOrEqual(a, v) => comparable(a, v, schema)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case In(a, vs) => vs.forall(v => comparable(a, v, schema))
    case StringStartsWith(a, _) => isString(a, schema)
    case StringEndsWith(a, _) => isString(a, schema)
    case StringContains(a, _) => isString(a, schema)
    case And(l, r) => supports(l, schema) && supports(r, schema)
    case Or(l, r) => supports(l, schema) && supports(r, schema)
    case Not(c) => supports(c, schema)
    case _ => false
  }

  private def isString(a: String, schema: StructType): Boolean = {
    val i = schema.fieldNames.indexOf(a)
    i >= 0 && schema(i).dataType == StringType
  }

  private def comparable(a: String, v: Any, schema: StructType): Boolean =
    schema.fieldNames.contains(a) && (v match {
      case _: Number | _: String | _: Boolean => true
      case _ => false
    })

  /** Compile to a predicate over rows laid out as `schema`.
    *
    * Evaluation is SQL THREE-VALUED: `eval` returns `Option[Boolean]`
    * with `None` for UNKNOWN (null operand), combined with Kleene
    * and/or/not. Since accepted filters are removed from Spark's plan
    * (only residuals are re-checked), a plain-boolean evaluation of
    * `Not`/`Or` over nullable columns would let rows through that SQL
    * filters out — e.g. `a <> 5 OR b > 2` on (a=NULL, b=1). A row is
    * emitted only when every pushed filter is definitely TRUE.
    */
  def compile(filters: Array[Filter], schema: StructType)
      : InternalRow => Boolean = {
    if (filters.isEmpty) return _ => true
    val idx = schema.fieldNames.zipWithIndex.toMap
    val types = schema.fields.map(_.dataType)

    def value(row: InternalRow, a: String): Any = {
      val i = idx(a)
      if (row.isNullAt(i)) null else row.get(i, types(i))
    }
    def isIntegral(n: Number): Boolean = n match {
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
           _: java.lang.Long => true
      case _ => false
    }
    // None = incomparable (null operand). Integral pairs compare as
    // longs — a double round-trip corrupts ordering past 2^53. Mixed
    // integral/floating compares exactly via BigDecimal (NaN excepted:
    // Spark orders NaN greatest, which Double.compare matches).
    def cmp(x: Any, lit: Any): Option[Int] = (x, lit) match {
      case (null, _) | (_, null) => None
      case (a: Number, b: Number) if isIntegral(a) && isIntegral(b) =>
        Some(java.lang.Long.compare(a.longValue(), b.longValue()))
      case (a: Number, b: Number) =>
        val (ad, bd) = (a.doubleValue(), b.doubleValue())
        if (ad.isNaN || bd.isNaN) Some(java.lang.Double.compare(ad, bd))
        else Some(new java.math.BigDecimal(a.toString)
          .compareTo(new java.math.BigDecimal(b.toString)))
      case (a: UTF8String, b: String) => Some(a.toString.compareTo(b))
      case (a: Boolean, b: Boolean) => Some(a.compareTo(b))
      case _ => None
    }
    def strOp(row: InternalRow, a: String)(
        op: String => Boolean): Option[Boolean] =
      value(row, a) match {
        case null => None
        case s: UTF8String => Some(op(s.toString))
        case _ => Some(false)
      }
    def eval(f: Filter, row: InternalRow): Option[Boolean] = f match {
      case EqualTo(a, v) => cmp(value(row, a), v).map(_ == 0)
      case LessThan(a, v) => cmp(value(row, a), v).map(_ < 0)
      case LessThanOrEqual(a, v) => cmp(value(row, a), v).map(_ <= 0)
      case GreaterThan(a, v) => cmp(value(row, a), v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(value(row, a), v).map(_ >= 0)
      case IsNull(a) => Some(value(row, a) == null)
      case IsNotNull(a) => Some(value(row, a) != null)
      case In(a, vs) =>
        val x = value(row, a)
        if (x == null) None
        else Some(vs.exists(v => cmp(x, v).contains(0)))
      case StringStartsWith(a, v) => strOp(row, a)(_.startsWith(v))
      case StringEndsWith(a, v) => strOp(row, a)(_.endsWith(v))
      case StringContains(a, v) => strOp(row, a)(_.contains(v))
      case And(l, r) => (eval(l, row), eval(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(l, row), eval(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval(c, row).map(!_)
      case _ => None
    }
    row => filters.forall(eval(_, row).contains(true))
  }
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Bucket layout of a graft directory: `numBuckets` hash buckets over
  * `bucketCols`, each data file carrying its bucket id in the
  * `_<bucket%05d>` file-name suffix that [[GraftSink.saveBucketedTable]]
  * writes and Spark's own `BucketingUtils` convention defines. The
  * layout is recorded in a `.graft-buckets.json` marker next to the
  * data, which is what lets a V2 catalog read rediscover the bucketing
  * and plan storage-partitioned (shuffle-free) joins — the
  * metadata-travels-with-the-data analog of the reference's partitioned
  * read contract (reference: src/main/scala/org/apache/spark/sql/
  * JDBCRDDWithLimit.scala:53-63, where partition clauses are the
  * source-side contract the scan relies on).
  *
  * The hash is Spark's `HashPartitioning`: `pmod(murmur3(cols, 42), n)`
  * — identical to what `repartition(n, cols)` produced on the write
  * side, so file bucket id, read-side partition key, and any
  * function-evaluated re-shuffle all agree.
  */
final case class BucketLayout(numBuckets: Int, bucketCols: Seq[String],
    sortCols: Seq[String]) {
  require(numBuckets > 0, s"numBuckets must be positive: $numBuckets")
  require(bucketCols.nonEmpty, "bucketCols must be non-empty")

  def json: String = {
    def arr(xs: Seq[String]) =
      xs.map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
    s"""{"numBuckets":$numBuckets,"bucketCols":${arr(bucketCols)},""" +
      s""""sortCols":${arr(sortCols)}}"""
  }
}

object BucketLayout {
  val MarkerName = ".graft-buckets.json"

  /** Bucket id from a data-file name — Spark's `BucketingUtils` shape:
    * the last `_<digits>` group before the extensions. */
  private val BucketIdPattern = ".*_(\\d+)(?:\\..*)?$".r

  def bucketIdOf(fileName: String): Option[Int] = fileName match {
    case BucketIdPattern(id) => scala.util.Try(id.toInt).toOption
    case _ => None
  }

  /** Bucket a single VALUE lands in — Spark's `HashPartitioning` id
    * (`pmod(murmur3(v, 42), n)`), the same hash the write side used.
    * None for types whose filter-value representation differs from the
    * hashed internal form (dates, timestamps, decimals) — callers must
    * then scan all buckets. */
  /** One step of the `Murmur3Hash(cols, 42)` left-fold: hash `v` with
    * the running hash `h` as seed. None for unsupported types; a NULL
    * value leaves the fold untouched (Spark's semantics) — callers
    * pass the previous hash through for nulls themselves. */
  private def hashStep(v: Any, h: Int): Option[Int] = v match {
    case i: java.lang.Integer => Some(Murmur3_x86_32.hashInt(i, h))
    case l: java.lang.Long => Some(Murmur3_x86_32.hashLong(l, h))
    case s: java.lang.Short => Some(Murmur3_x86_32.hashInt(s.toInt, h))
    case b: java.lang.Byte => Some(Murmur3_x86_32.hashInt(b.toInt, h))
    case s: String => hashStep(UTF8String.fromString(s), h)
    case u: UTF8String => Some(Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes, h))
    case _ => None
  }

  def valueBucket(v: Any, n: Int): Option[Int] =
    hashStep(v, 42).map(h => ((h % n) + n) % n)

  /** Bucket of an [[InternalRow]]'s key columns (internal values —
    * dates as days, timestamps as micros — exactly what
    * `HashPartitioning` hashed on the repartition write path). For
    * writers that split rows into per-bucket files. */
  def rowBucket(row: InternalRow, ords: Array[Int],
      dts: Array[DataType], n: Int): Int = {
    var h = 42
    var i = 0
    while (i < ords.length) {
      if (!row.isNullAt(ords(i))) {
        h = hashStep(row.get(ords(i), dts(i)), h).getOrElse(
          throw new UnsupportedOperationException(
            s"graft bucketed write: unsupported bucket-column type " +
            s"${dts(i)}"))
      }
      i += 1
    }
    ((h % n) + n) % n
  }

  /** Bucket of a full key TUPLE (null entries = SQL NULL values):
    * the multi-column write-side fold. */
  def tupleBucket(vs: Seq[Any], n: Int): Option[Int] = {
    var h = 42
    vs.foreach { v =>
      if (v != null) hashStep(v, h) match {
        case Some(next) => h = next
        case None => return None
      }
    }
    Some(((h % n) + n) % n)
  }

  /** NULL never updates the murmur fold, so every null row hashed to
    * `pmod(seed, n)` on the write side. */
  def nullBucket(n: Int): Int = 42 % n

  /** The set of buckets a pushed-filter conjunction can possibly
    * match on the layout's (single) bucket column — None means
    * unconstrained. This is BUCKET PRUNING: a point lookup on a
    * bucketed 100 TB table reads 1/n of it no matter what the
    * min/max statistics say (a hash scatters every value range across
    * all files, so stats pruning is useless exactly where this is
    * strongest). Runtime (DPP) `In` filters qualify too, so a
    * selective dim join prunes the fact scan to the joined buckets. */
  def allowedBuckets(layout: BucketLayout,
      preds: Seq[org.apache.spark.sql.sources.Filter]): Option[Set[Int]] = {
    import org.apache.spark.sql.sources._
    if (layout.bucketCols.lengthCompare(1) != 0) {
      return compositeAllowed(layout, preds)
    }
    val colName = layout.bucketCols.head
    val n = layout.numBuckets
    def one(f: Filter): Option[Set[Int]] = f match {
      case EqualTo(c, v) if c == colName && v != null =>
        valueBucket(v, n).map(Set(_))
      case EqualNullSafe(c, v) if c == colName =>
        if (v == null) Some(Set(nullBucket(n)))
        else valueBucket(v, n).map(Set(_))
      case IsNull(c) if c == colName => Some(Set(nullBucket(n)))
      case In(c, vs) if c == colName =>
        val bs = vs.toSeq.map(v =>
          if (v == null) Some(nullBucket(n)) else valueBucket(v, n))
        if (bs.exists(_.isEmpty)) None else Some(bs.flatten.toSet)
      case And(l, r) => (one(l), one(r)) match {
        case (Some(a), Some(b)) => Some(a & b)
        case (a, None) => a
        case (None, b) => b
      }
      case Or(l, r) => for { a <- one(l); b <- one(r) } yield a | b
      case _ => None
    }
    val sets = preds.flatMap(one)
    if (sets.isEmpty) None else Some(sets.reduce(_ & _))
  }

  /** Composite (multi-column) bucket keys prune only when the
    * conjunction pins EVERY bucket column to a point value (or NULL) —
    * then the write-side tuple fold yields the single bucket. Range or
    * partial bindings leave a composite hash unconstrained. */
  private def compositeAllowed(layout: BucketLayout,
      preds: Seq[org.apache.spark.sql.sources.Filter]): Option[Set[Int]] = {
    import org.apache.spark.sql.sources._
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // col -> point value; null marks an IsNull/EqualNullSafe-null pin
    val bound = scala.collection.mutable.Map.empty[String, Any]
    preds.flatMap(conjuncts).foreach {
      case EqualTo(c, v) if v != null => bound.getOrElseUpdate(c, v)
      case EqualNullSafe(c, v) => bound.getOrElseUpdate(c, v)
      case IsNull(c) => bound.getOrElseUpdate(c, null)
      case _ => ()
    }
    if (!layout.bucketCols.forall(bound.contains)) return None
    tupleBucket(layout.bucketCols.map(bound), layout.numBuckets)
      .map(Set(_))
  }

  def write(fs: FileSystem, dir: Path, layout: BucketLayout): Unit = {
    val out = fs.create(new Path(dir, MarkerName), true)
    try out.write(layout.json.getBytes("UTF-8")) finally out.close()
  }

  def read(fs: FileSystem, dir: Path): Option[BucketLayout] =
    scala.util.Try {
      // Try covers the exists/open race with a concurrent Overwrite
      // (which deletes the marker) — an unreadable marker downgrades
      // to an unbucketed read, same as an unparseable one
      val p = new Path(dir, MarkerName)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try {
            val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
            in.readFully(0, bytes)
            new String(bytes, "UTF-8")
          } finally in.close()
        parse(text)
      }
    }.toOption.flatten

  /** Minimal parser for the exact shape [[BucketLayout.json]] renders
    * (jackson would be heavier than the format warrants). Returns None
    * on anything malformed — an unreadable marker downgrades the read
    * to unbucketed rather than failing it. */
  private[graft] def parse(text: String): Option[BucketLayout] = {
    val num = "\"numBuckets\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(text).map(_.group(1).toInt)
    def arr(field: String): Option[Seq[String]] =
      (s""""$field"\\s*:\\s*\\[([^\\]]*)\\]""").r
        .findFirstMatchIn(text).map { m =>
          "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1))
            .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
            .toSeq
        }
    (num, arr("bucketCols"), arr("sortCols")) match {
      case (Some(n), Some(bc), Some(sc)) if n > 0 && bc.nonEmpty =>
        Some(BucketLayout(n, bc, sc))
      case _ => None
    }
  }
}

/** V2 `bucket(n, cols...)` function — what lets Catalyst resolve the
  * `bucket` transform a bucketed graft table reports, decide that two
  * tables' clusterings are compatible (same `canonicalName`, same
  * argument list), and — with `spark.sql.sources.v2.bucketing.shuffle
  * .enabled` — hash the unbucketed side of a join into OUR bucket ids.
  * `produceResult` therefore must be bit-identical to the write side:
  * Spark's `Murmur3Hash(cols, seed = 42)` left-fold, `pmod` into `n`.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): Spark HashPartitioning bucket id"

  private def hashable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket(numBuckets, cols...) needs at least 2 args, got $inputType")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: first argument must be int, got ${inputType.fields(0).dataType}")
    val colTypes = inputType.fields.drop(1).map(_.dataType)
    colTypes.find(!hashable(_)).foreach { dt =>
      throw new UnsupportedOperationException(
        s"graft bucket: unsupported bucket-column type $dt")
    }
    GraftBucketBound(colTypes)
  }
}

case class GraftBucketBound(colTypes: Array[DataType])
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = IntegerType +: colTypes
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    var h = 42 // Murmur3Hash's seed; null columns leave the fold untouched
    var i = 0
    while (i < colTypes.length) {
      val ord = i + 1
      if (!input.isNullAt(ord)) {
        h = colTypes(i) match {
          case ByteType => Murmur3_x86_32.hashInt(input.getByte(ord).toInt, h)
          case ShortType => Murmur3_x86_32.hashInt(input.getShort(ord).toInt, h)
          case IntegerType | DateType =>
            Murmur3_x86_32.hashInt(input.getInt(ord), h)
          case LongType | TimestampType | TimestampNTZType =>
            Murmur3_x86_32.hashLong(input.getLong(ord), h)
          case StringType =>
            val s = input.getUTF8String(ord)
            Murmur3_x86_32.hashUnsafeBytes(
              s.getBaseObject, s.getBaseOffset, s.numBytes, h)
          case dt => throw new IllegalStateException(s"unbindable type $dt")
        }
      }
      i += 1
    }
    Integer.valueOf(((h % n) + n) % n)
  }
}

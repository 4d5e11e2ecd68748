package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In, IsNull}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN PARTITIONING — graft's answer to Hive's `col=val/` layout,
  * re-expressed over the engine's flat-directory invariants (manifest
  * snapshots, `.graft-archive/` twins, DV sidecars and `_file`
  * provenance all key data files by NAME at the table root; a
  * subdirectory layout would invade every one of them):
  *
  *  - the WRITE side clusters rows so each data file holds exactly ONE
  *    combination of the partition columns' values (identity-clustered
  *    distribution + sorted tasks + a writer that rolls files on value
  *    change), and embeds a per-column 8-hex murmur3 digest of each
  *    value in the file NAME (`part-...pv-<t1>-<t2>.c000.snappy
  *    .parquet`);
  *  - the READ side prunes the file list from those name tokens for
  *    pushed (and runtime/DPP) equality / IN / IS NULL predicates on
  *    the partition columns — BEFORE any footer is opened, the
  *    listing-level skip Hive layouts buy, without the layout.
  *
  * Pruning is strictly conservative: a file without tokens (written by
  * compaction, REPLACE WHERE residue, the streaming sink, or before
  * the layout existed) always survives, and footer min/max statistics
  * — exact for single-value files — remain the correctness backstop
  * for those and for range predicates. Digest collisions only ever
  * keep extra files. The layout is recorded in a
  * `.graft-partitioned.json` marker next to the data (the
  * metadata-travels-with-the-data convention of [[BucketLayout]];
  * reference contract: src/main/scala/org/apache/spark/sql/
  * JDBCRDDWithLimit.scala:53-63, partition clauses as the scan-side
  * source contract).
  *
  * Tokens hash a CANONICAL STRING rendering of the value — the same
  * rendering reachable from both the writer's internal values
  * (UTF8String, days-since-epoch ints, micros longs) and the
  * filter-side external values (String, java.sql.Date, Instant …), so
  * the two sides can never drift. Types without a stable canonical
  * form (floats, decimals, binary, nested) are refused as partition
  * columns up front.
  */
final case class PartitionLayout(cols: Seq[String]) {
  require(cols.nonEmpty, "partition columns must be non-empty")
  require(cols.distinct == cols, s"duplicate partition columns: $cols")

  def json: String = {
    val arr = cols.map(s =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    s"""{"cols":$arr}"""
  }
}

object PartitionLayout {
  val MarkerName = ".graft-partitioned.json"

  /** All-null partition value token (a value can never hash to it:
    * value tokens are 8 hex chars). */
  val NullToken = "n"

  def write(fs: FileSystem, dir: Path, layout: PartitionLayout): Unit = {
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(dir, s"$MarkerName.tmp")
    val out = fs.create(tmp, true)
    try out.write(layout.json.getBytes("UTF-8")) finally out.close()
    val dst = new Path(dir, MarkerName)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) {
      throw new java.io.IOException(
        s"partition-layout marker publish failed: $tmp -> $dst")
    }
  }

  def read(fs: FileSystem, dir: Path): Option[PartitionLayout] = {
    val m = new Path(dir, MarkerName)
    if (!fs.exists(m)) return None
    val in = fs.open(m)
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // the writer controls the shape — a hand-rolled parse of
    // {"cols":["a","b"]} (escapes as in BucketLayout.json)
    val body = raw.trim.stripPrefix("{\"cols\":[").stripSuffix("]}")
    val cols = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false; var esc = false
    body.foreach { c =>
      if (esc) { sb.append(c); esc = false }
      else if (c == '\\' && inStr) esc = true
      else if (c == '"') {
        if (inStr) { cols += sb.toString; sb.clear() }
        inStr = !inStr
      } else if (inStr) sb.append(c)
    }
    if (cols.isEmpty) None else Some(PartitionLayout(cols.toSeq))
  }

  /** Types with a canonical rendering stable across the writer's
    * internal values and the filter side's external ones. */
  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** Canonical string of an INTERNAL (InternalRow) non-null value:
    * integral types (incl. date days / timestamp micros) as decimal,
    * strings as themselves, booleans as true/false. */
  def canonicalInternal(v: Any, dt: DataType): String = dt match {
    case StringType => v.toString // UTF8String
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType => v.toString // boxed integral
    case BooleanType => v.toString
    case other => throw new IllegalArgumentException(
      s"unsupported partition column type $other")
  }

  /** Canonical string of an EXTERNAL (filter-side) non-null value;
    * None when the value cannot be rendered (pruning then skips the
    * predicate — conservative). */
  def canonicalExternal(v: Any, dt: DataType): Option[String] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    (dt, v) match {
      case (StringType, s: String) => Some(s)
      case (StringType, u: UTF8String) => Some(u.toString)
      case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
        Some(n.longValue.toString)
      case (DateType, d: java.sql.Date) =>
        Some(DateTimeUtils.fromJavaDate(d).toString)
      case (DateType, d: java.time.LocalDate) =>
        Some(d.toEpochDay.toInt.toString)
      case (DateType, n: Number) => Some(n.intValue.toString)
      case (TimestampType, t: java.sql.Timestamp) =>
        Some(DateTimeUtils.fromJavaTimestamp(t).toString)
      case (TimestampType, i: java.time.Instant) =>
        Some(DateTimeUtils.instantToMicros(i).toString)
      case (TimestampType, n: Number) => Some(n.longValue.toString)
      case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
      case _ => None
    }
  }

  /** 8-hex murmur3 (seed 42, the engine's hash convention) of a
    * canonical string. */
  def token(canonical: String): String = {
    val u = UTF8String.fromString(canonical)
    val h = Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
    f"$h%08x"
  }

  /** The `.pv-…` file-name fragment carrying one token per partition
    * column, in layout order. */
  def nameFragment(tokens: Seq[String]): String =
    "pv-" + tokens.mkString("-")

  private val TokensPattern = """\.pv-([0-9a-fn]+(?:-[0-9a-fn]+)*)\.""".r

  /** Tokens embedded in a data-file name; None for un-tokenized files
    * (which pruning must always keep). */
  def fileTokens(fileName: String): Option[Array[String]] =
    TokensPattern.findFirstMatchIn(fileName)
      .map(_.group(1).split('-'))

  /** Per-COLUMN-INDEX allowed token sets implied by the filters'
    * top-level conjuncts (equality / IN / IS NULL on partition
    * columns). Columns absent from the map are unconstrained. An
    * un-renderable value drops its conjunct from pruning, never a
    * file. */
  def allowedTokens(layout: PartitionLayout,
      types: Map[String, DataType],
      filters: Seq[Filter]): Map[Int, Set[String]] = {
    val idx = layout.cols.zipWithIndex.toMap
    def one(col: String, v: Any): Option[(Int, Set[String])] =
      for {
        i <- idx.get(col)
        dt <- types.get(col)
        c <- canonicalExternal(v, dt)
      } yield i -> Set(token(c))
    filters.flatMap {
      case EqualTo(c, v) if v != null => one(c, v)
      case EqualNullSafe(c, null) => idx.get(c).map(_ -> Set(NullToken))
      case EqualNullSafe(c, v) => one(c, v)
      case IsNull(c) => idx.get(c).map(_ -> Set(NullToken))
      case In(c, vs) =>
        for {
          i <- idx.get(c)
          dt <- types.get(c)
          // SQL IN: a null element matches no row — only non-null
          // values contribute tokens; if ANY value is un-renderable
          // the whole conjunct is skipped (conservative)
          toks <- {
            val nn = vs.filter(_ != null)
            val cs = nn.map(canonicalExternal(_, dt))
            if (cs.contains(None)) None
            else Some(cs.flatten.map(token).toSet)
          }
        } yield i -> toks
      case _ => None
    }.groupBy(_._1)
      .map { case (i, cs) => i -> cs.map(_._2).reduce(_ intersect _) }
  }

  /** Whether a file named `fileName` may hold rows satisfying the
    * constraints — false ONLY when the name carries tokens and some
    * constrained column's token is outside its allowed set. */
  def mayMatch(fileName: String, allowed: Map[Int, Set[String]])
      : Boolean =
    fileTokens(fileName) match {
      case Some(toks) =>
        allowed.forall { case (i, set) =>
          i >= toks.length || set.contains(toks(i))
        }
      case None => true
    }
}

package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Parquet-backed V1 relation with column pruning, filter pushdown,
  * residual-filter reporting, per-partition predicates, and a
  * limit-carrying scan.
  *
  * This is the Spark-4-native re-derivation of the reference's
  * `JDBCRelationWithLimit` (reference:
  * src/main/scala/org/apache/spark/sql/JDBCRelationWithLimit.scala:15-86):
  * a `BaseRelation with PrunedFilteredScan` whose scan receives the
  * required columns + pushable filters from the planner and, when the
  * [[graft.plans.PropagateLimitToGraft]] optimizer rule has propagated a
  * limit into it (reference: PropagateJDBCLimit.scala:14-27), caps each
  * partition's output at `limit` rows — the parquet analog of appending
  * `LIMIT n` to the per-partition JDBC SQL (reference:
  * JDBCRDDWithLimit.scala:65-71,131-133). Global limit semantics remain
  * enforced by the `LocalLimit` the rule leaves on top.
  *
  * Scale notes (100 TB stance):
  *  - The inner scan is Spark's vectorized parquet reader, so pruning and
  *    pushed filters reach the parquet footers (PushedFilters/ReadSchema),
  *    and file splits give horizontal parallelism for free.
  *  - `numPartitions > 1` with `partitionColumn` delivers the reference's
  *    per-partition contract (JDBCRDDWithLimit.scala:53-63: partition i
  *    holds exactly the rows with `hash(pc) % N = i`) as ONE scan plus
  *    ONE hash exchange (`repartition(N, pc)`) instead of N re-scans
  *    with bucket predicates. A DB prunes a `WHERE hash % N = i` query;
  *    parquet cannot, so the predicate formulation reads the table N
  *    times — at 100 TB that is N full passes, while the exchange moves
  *    the data once (write+read ≈ 2×) and is AQE-skew-safe. Rows land
  *    hash-clustered by `pc`, ready for per-partition consumers.
  *  - The limited scan takes `limit` rows per partition with no shuffle
  *    (the global cap is Spark-side), so a `LIMIT 10` on a 100 TB table
  *    reads at most `10 * numPartitions` rows past the scan.
  */
case class GraftRelation(
    @transient sparkSession: SparkSession,
    path: String,
    numPartitions: Int = 1,
    partitionColumn: Option[String] = None,
    limit: Int = -1)
  extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  override def sqlContext: SQLContext = sparkSession.sqlContext

  /** Plan-friendly rendering, mirroring the reference's
    * `JDBCRelationWithLimit(table) [limit=n]` display
    * (JDBCRelationWithLimit.scala:84-85 / README.md:58). */
  override def toString: String = {
    val lim = if (limit >= 0) s" [limit=$limit]" else ""
    val parts = if (numPartitions > 1)
      s" [partitions=$numPartitions on ${partitionColumn.getOrElse("?")}]"
    else ""
    s"GraftRelation(${path.split('/').last})$parts$lim"
  }

  /** Eager schema resolution from the parquet footer — the analog of the
    * reference's `JDBCRDD.resolveTable` metadata query
    * (JDBCRelationWithLimit.scala:26).
    */
  override val schema: StructType = sparkSession.read.parquet(path).schema

  /** The scan already emits Catalyst internal rows (`UnsafeRow` straight
    * from the inner plan's `toRdd`), so Spark must not re-convert — same
    * declaration as the reference (JDBCRelationWithLimit.scala:24).
    * Without this every row takes a Row->InternalRow round-trip, which
    * profiled ~10x slower on the 600k-row scans.
    */
  override def needConversion: Boolean = false

  /** On-disk size of the backing files. Without this the V1 default is
    * `spark.sql.defaultSizeInBytes` (effectively infinite), so a graft
    * table would NEVER be auto-broadcast and every dim join would
    * shuffle — a silent 100 TB-scale planning bug. */
  override def sizeInBytes: Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sparkSession.sessionState.newHadoopConf())
    fs.getContentSummary(p).getLength
  }

  /** `INSERT INTO` / `INSERT OVERWRITE` a graft relation — the write half
    * of the reference's `BaseRelation with PrunedFilteredScan with
    * InsertableRelation` (JDBCRelationWithLimit.scala:18-20, insert
    * at :45: `data.write.mode(overwrite ? Overwrite : Append)`).
    * Overwrite uses the truncate-preserving path: `insertInto` targets an
    * EXISTING relation, so the "table object" (the directory) survives —
    * matching the reference's table-preserving INSERT OVERWRITE. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    GraftSink.saveAtomic(data, path,
      if (overwrite) SaveMode.Overwrite else SaveMode.Append,
      truncate = overwrite)

  /** Filters we cannot push are reported back so Spark re-evaluates them
    * above the scan (reference residual contract:
    * JDBCRelationWithLimit.scala:29-31).
    */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filter(f => GraftFilters.compile(f).isEmpty)

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    // the V1 scan reads raw parquet (no manifest resolution): a table
    // whose current version carries deletion vectors would resurrect
    // its position-deleted rows here — refuse with the fix spelled out
    locally {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(sparkSession.sessionState.newHadoopConf())
      if (graft.sources.v2.GraftManifest.current(fs, p)
          .exists(_.dvs.nonEmpty)) {
        throw new IllegalStateException(
          s"graft: $path carries deletion vectors (position deletes); " +
          "the V1 format(\"graft\") scan cannot apply them — read via " +
          "format(\"graft-v2\") / the catalog, or run " +
          "GraftDeleteV2.materializeDeleteVectors first")
      }
      if (!graft.sources.v2.GraftCatalog.readMapping(fs, p).isEmpty) {
        throw new IllegalStateException(
          s"graft: $path carries a DROP/RENAME column mapping; the V1 " +
          "format(\"graft\") scan reads physical names — read via " +
          "format(\"graft-v2\") / the catalog")
      }
    }
    def branch(partPred: Option[Column]): DataFrame = {
      var df = sparkSession.read.parquet(path)
      val pushed = filters.flatMap(GraftFilters.compile)
      val all = pushed ++ partPred
      if (all.nonEmpty) df = df.filter(all.reduce(_ && _))
      // Partitioned read BEFORE projection: the partition column need
      // not be among requiredColumns (e.g. a bare count()), so the
      // exchange must see it while it still exists. Catalyst prunes the
      // parquet scan to requiredColumns + pc either way.
      partitionColumn match {
        case Some(pc) if numPartitions > 1 =>
          df = df.repartition(numPartitions, col(pc))
        case _ => ()
      }
      // Column pruning: only required columns reach the parquet reader.
      // Zero columns requested (count-only query) degenerates to a
      // constant column, mirroring the reference's `SELECT 1`
      // (JDBCRDDWithLimit.scala:36-40).
      df = if (requiredColumns.isEmpty) df.select(lit(1))
           else df.select(requiredColumns.map(col).toSeq: _*)
      df
    }
    // With needConversion=false the contract is RDD[InternalRow] typed
    // as RDD[Row] (same V1 idiom as the reference's internal-row RDD,
    // JDBCRDDWithLimit.scala:26): hand back the inner plan's UnsafeRows.
    def internalRows(df: DataFrame): RDD[Row] =
      df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
    // Partitioned read (reference JDBCRDDWithLimit.scala:53-63): the
    // reference fans out N bucket-predicate queries because the DB can
    // prune them; parquet can't, so the same contract — partition i owns
    // hash bucket i of `pc` — is produced by a single scan feeding one
    // hash exchange (inside `branch`, before projection). Each byte is
    // read once; Spark's HashPartitioning (murmur3 pmod N) supplies the
    // disjoint buckets.
    val rdd: RDD[Row] = internalRows(branch(None))
    // Rows-read accounting: BASELINE.md's pushdown gate is "limit n =>
    // the source emits <= n rows per partition", observable via this
    // named accumulator rather than wall-clock.
    val emitted = sparkSession.sparkContext.longAccumulator(
      s"graft.rowsEmitted.${path.split('/').last}")
    GraftRelation.lastRowsEmitted.set(emitted)
    // count on the InternalRow-typed view — a Row-typed lambda would
    // insert a bridge cast that UnsafeRow fails
    val counted = rdd
      .asInstanceOf[RDD[org.apache.spark.sql.catalyst.InternalRow]]
      .mapPartitions(_.map { r => emitted.add(1L); r },
        preservesPartitioning = true)
      .asInstanceOf[RDD[Row]]
    // Limit-carrying scan: cap every partition at `limit` rows, the
    // parquet analog of per-partition `... LIMIT n` SQL (reference
    // JDBCRDDWithLimit.scala:131-133). No shuffle; the retained
    // Spark-side LocalLimit enforces the global cap.
    if (limit >= 0)
      counted.mapPartitions(_.take(limit), preservesPartitioning = true)
    else counted
  }
}

object GraftRelation {
  /** Accumulator of the most recent buildScan on this driver — test/
    * observability hook for the rows-read pushdown gate. */
  val lastRowsEmitted =
    new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.util.LongAccumulator]()
}

/** Compiles Spark `sources.Filter`s to `Column` predicates — the analog of
  * the reference's `JDBCRDD.compileFilter` usage
  * (JDBCRDDWithLimit.scala:45-48). Unsupported filters return None and are
  * reported as residuals.
  */
object GraftFilters {
  def compile(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case Not(c)                   => compile(c).map(!_)
    case And(l, r) =>
      for { lc <- compile(l); rc <- compile(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- compile(l); rc <- compile(r) } yield lc || rc
    case _ => None
  }
}

package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write–audit–publish (WAP) staging for graft-v2 tables — the
  * Iceberg `write.wap.enabled` / Delta "stage on a branch, then fast
  * forward" workflow, public in both formats' docs: a producer stages
  * a batch WITHOUT making it visible, an audit job validates the
  * would-be table (row counts, constraint scans, dedup ratios), and
  * only then does one atomic manifest commit publish the files.
  * Readers never observe a half-audited batch; an abort costs one
  * directory delete and NO manifest version.
  *
  * Mechanics on this format: staged files live under the dot
  * directory `.graft-wap/<branch>/` inside the table — dot-prefixed,
  * so root listings, manifest bootstraps, and vacuum's live-set
  * reasoning never see them. [[publish]] renames them into the table
  * root under `wap-<branch>-` names and issues ONE `commitAppend`
  * (the manifest CAS makes visibility atomic; commit-time
  * [[SkipStats]] collection garnishes the new files like any other
  * append). The crash window between the renames and the CAS is the
  * same one the streaming sink documents: deterministic names make
  * the residue sweepable, and re-running [[publish]] after a crash
  * completes the commit (files already at the root are re-used, not
  * re-staged).
  *
  * Scale notes: staging writes the data files ONCE, at full cluster
  * parallelism, through the same sink the table itself uses; audit
  * reads stage-side parquet directly (no copy); publish moves
  * metadata only. At 100 TB the publish is O(files) renames + one
  * manifest line set — no data bytes move.
  */
object Wap {

  private def fsFor(spark: SparkSession, table: Path): FileSystem =
    table.getFileSystem(spark.sessionState.newHadoopConf())

  private[graft] def branchDir(table: Path, branch: String): Path =
    new Path(new Path(table, ".graft-wap"), branch)

  private def requireValid(branch: String): Unit =
    require(branch.nonEmpty && branch.head.isLetter &&
      branch.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"graft-wap: invalid branch name '$branch' — letters, digits, " +
        "'_' and '-' only, starting with a letter")

  /** Stage `df` for table `table` on `branch`, replacing any prior
    * un-published stage of the same branch. Returns the number of
    * staged data files. Nothing becomes visible to readers. */
  def stage(spark: SparkSession, table: String, df: DataFrame,
      branch: String): Int = {
    requireValid(branch)
    val t = new Path(table)
    val fs = fsFor(spark, t)
    val dir = branchDir(t, branch)
    fs.delete(dir, true)
    // through graft's own writer so the staged files are exactly what
    // the table's reader expects (timestamp spelling, stats footers)
    graft.sources.GraftSink.saveCompensating(df, dir.toString,
      SaveMode.Overwrite)
    fs.listStatus(dir)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** The audit view: the table as it WOULD read after publishing
    * `branch` — current snapshot UNION the staged files. Validation
    * queries (counts, constraint predicates, dedup rates) run against
    * this; the real table is untouched. */
  def audit(spark: SparkSession, table: String,
      branch: String): DataFrame = {
    requireValid(branch)
    val t = new Path(table)
    val dir = branchDir(t, branch)
    val staged = spark.read.parquet(dir.toString)
    spark.read.format("graft-v2").load(table).unionByName(staged)
  }

  /** Atomically publish `branch`: move its staged files into the
    * table root and commit ONE manifest version referencing them.
    * Idempotent across crashes — already-moved files are adopted,
    * an already-committed publish (empty stage dir, files live)
    * returns the live names. Returns the published file names. */
  def publish(spark: SparkSession, table: String,
      branch: String): Seq[String] = {
    requireValid(branch)
    val t = new Path(table)
    val fs = fsFor(spark, t)
    val dir = branchDir(t, branch)
    GraftManifest.commitLock(fs, t).synchronized {
      val staged =
        if (!fs.exists(dir)) Array.empty[org.apache.hadoop.fs.FileStatus]
        else fs.listStatus(dir).filter(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
      val moved = staged.zipWithIndex.map { case (st, i) =>
        val dst = new Path(t, f"wap-$branch-$i%05d.parquet")
        if (fs.exists(dst)) fs.delete(dst, false) // crashed retry residue
        if (!fs.rename(st.getPath, dst)) {
          throw new java.io.IOException(
            s"graft-wap: publish rename to $dst failed")
        }
        dst.getName
      }.toSeq
      // a crashed prior publish may have moved files it never
      // committed — adopt any root-level files carrying this branch's
      // deterministic prefix that the manifest does not know yet
      val livePrefix = fs.listStatus(t).filter(st => st.isFile &&
        st.getPath.getName.startsWith(s"wap-$branch-") &&
        st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName).toSeq
      val known = GraftManifest.current(fs, t)
        .map(_.names.toSet).getOrElse(Set.empty[String])
      val names = (moved ++ livePrefix).distinct.filterNot(known).sorted
      if (names.nonEmpty) {
        GraftManifest.commitAppend(fs, t, names,
          extraMeta = Seq("op=wap-publish", s"wapbranch=$branch"))
      }
      fs.delete(dir, true)
      names
    }
  }

  /** Drop `branch`'s staged files without publishing. No manifest
    * version is written; the table never saw the batch. */
  def abort(spark: SparkSession, table: String, branch: String): Unit = {
    requireValid(branch)
    val t = new Path(table)
    fsFor(spark, t).delete(branchDir(t, branch), true)
  }
}

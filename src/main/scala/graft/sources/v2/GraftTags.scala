package graft.sources.v2

import org.apache.hadoop.fs.{FileSystem, Path}

/** Named version references — tags — over the manifest log (the
  * Iceberg tag / Delta "pin a snapshot" pattern, public in both
  * formats' specs): a tag is a human name for one retained manifest
  * version. `VERSION AS OF 'name'` reads through it, and vacuum keeps
  * every tagged version (and therefore every file it references)
  * alive until the tag is dropped — the release-audit workflow
  * ("training-run-3 read THIS data") without copying a byte.
  *
  * Storage: one file per tag under `.graft-tags/`, content
  * `version=N` + the creation wall-clock. Writes stage to a dotted
  * temp name and rename into place; creation and the retention sweep
  * both run under the per-table [[GraftManifest.commitLock]], so a
  * tag created against a retained version can never race the vacuum
  * that would have dropped it.
  *
  * Tag names must start with a letter and use only letters, digits,
  * `._-` — which keeps them disjoint from numeric version literals,
  * so `VERSION AS OF` stays unambiguous. */
object GraftTags {
  val Dir = ".graft-tags"

  private val NameRe = "[A-Za-z][A-Za-z0-9._-]*".r

  private def tagDir(table: Path) = new Path(table, Dir)
  private def tagPath(table: Path, name: String) =
    new Path(tagDir(table), name)

  def validName(name: String): Boolean =
    NameRe.pattern.matcher(name).matches() && !name.startsWith(".")

  /** Tag `version` of `table` as `name`. The version must be retained
    * in the manifest log; `replace = false` (the default) refuses to
    * move an existing tag — re-pointing a name an auditor relies on
    * should be a deliberate two-step (drop, re-create) or an explicit
    * replace. */
  def create(fs: FileSystem, table: Path, name: String, version: Long,
      replace: Boolean = false): Unit = {
    require(validName(name),
      s"graft-v2: invalid tag name '$name' — tags start with a letter " +
      "and use only letters, digits, '.', '_', '-'")
    GraftManifest.commitLock(fs, table).synchronized {
      val vs = GraftManifest.versions(fs, table)
      if (vs.isEmpty) throw new IllegalArgumentException(
        s"graft-v2: cannot tag $table — it has no manifest log (tags " +
        "name manifest versions; write through graft-v2 first)")
      if (!vs.contains(version)) throw new IllegalArgumentException(
        s"graft-v2: cannot tag version $version of $table — retained " +
        s"versions are ${vs.min}..${vs.max}" +
        (if (version < vs.min) " (older versions were vacuumed)" else ""))
      val dst = tagPath(table, name)
      if (!replace && fs.exists(dst)) {
        throw new IllegalArgumentException(
          s"graft-v2: tag '$name' already exists on $table (at version " +
          s"${read(fs, dst).getOrElse(-1L)}); drop it first or pass " +
          "replace")
      }
      fs.mkdirs(tagDir(table))
      val tmp = new Path(tagDir(table),
        s".tmp-$name-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(
        s"version=$version\nts=${System.currentTimeMillis()}\n"
          .getBytes("UTF-8"))
      finally out.close()
      if (fs.exists(dst)) fs.delete(dst, false) // replace: settle inside
      if (!fs.rename(tmp, dst)) {               // the lock
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        throw new java.io.IOException(
          s"graft-v2: publishing tag '$name' on $table failed")
      }
    }
  }

  /** Drop tag `name`; false when it did not exist. The versions it
    * pinned become ordinary retention candidates on the next vacuum. */
  def drop(fs: FileSystem, table: Path, name: String): Boolean =
    GraftManifest.commitLock(fs, table).synchronized {
      fs.delete(tagPath(table, name), false)
    }

  /** All tags on `table`, name → version, name-sorted. */
  def list(fs: FileSystem, table: Path): Seq[(String, Long)] = {
    val d = tagDir(table)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).toSeq
      .filter(st => st.isFile && validName(st.getPath.getName))
      .flatMap(st => read(fs, st.getPath).map(st.getPath.getName -> _))
      .sortBy(_._1)
  }

  /** The version tag `name` points at, if the tag exists. */
  def resolve(fs: FileSystem, table: Path, name: String): Option[Long] = {
    val p = tagPath(table, name)
    if (validName(name) && fs.exists(p)) read(fs, p) else None
  }

  /** Versions pinned by ANY tag — the retention sweep's keep set. */
  def pinnedVersions(fs: FileSystem, table: Path): Set[Long] =
    list(fs, table).map(_._2).toSet

  private def read(fs: FileSystem, p: Path): Option[Long] =
    scala.util.Try {
      val in = fs.open(p)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](256)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toString("UTF-8")
      } finally in.close()
      bytes.linesIterator
        .collectFirst { case l if l.startsWith("version=") =>
          l.stripPrefix("version=").trim.toLong }
    }.toOption.flatten
}

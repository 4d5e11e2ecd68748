package graft.sources.v2

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable COMMIT-SLOT publication: the one primitive the manifest
  * CAS ([[GraftManifest.tryCommit]]) needs from storage is "place this
  * content into the version slot iff the slot is empty, atomically
  * across processes". How that primitive is obtained differs by store
  * class — the same boundary the reference pushed onto Postgres's
  * transaction machinery for its all-or-nothing save
  * (ExtJdbcUtils.scala:70-109) and every open table format documents
  * as its LogStore seam:
  *
  *  - POSIX local FS: hard link (`link(2)` fails EEXIST atomically).
  *  - HDFS-semantics stores: rename-if-absent (rename refuses an
  *    existing destination).
  *  - S3-class object stores: NEITHER exists — rename is copy+delete
  *    and silently replaces the destination, so two drivers racing a
  *    version slot would both "win" and one commit would vanish. The
  *    public fix (Delta's `BaseExternalLogStore`/DynamoDB commit log;
  *    S3's own conditional `If-None-Match` PUT is the native form) is
  *    an EXTERNAL compare-and-swap on the slot name plus a recoverable
  *    copy of the staged content: [[ExternalCasCommit]].
  *
  * Resolution ([[CommitStores.forFs]]): an explicitly registered store
  * for the filesystem's scheme wins; else Hadoop conf
  * `graft.commit.store.<scheme>` / `graft.commit.store` selects
  * `auto` (the atomic-FS default), `external-file` (external CAS over
  * a shared directory, `graft.commit.cas.dir`), `tcp-cas` (external
  * CAS through a [[CasServer]]-protocol service at
  * `graft.commit.cas.endpoint` — the multi-host deployment), or a
  * fully-qualified [[CommitStore]] class name. Set via
  * `spark.hadoop.graft.commit.store.s3a=...` — per-scheme, so a local
  * warehouse keeps hard-link semantics beside an S3 one in the same
  * session.
  */
trait CommitStore {

  /** Publish `tmp` into the empty slot `dst`; true iff THIS caller
    * created the slot. A winning call must leave no `tmp` behind; a
    * losing call must leave `tmp` untouched (the caller sweeps it). */
  def publishIfAbsent(fs: FileSystem, tmp: Path, dst: Path): Boolean

  /** Reader-side hook, called before a version listing: complete any
    * claimed-but-unmaterialized slots a crashed writer left behind so
    * committed versions are never invisible. No-op by default. */
  def beforeRead(fs: FileSystem, manifestDir: Path): Unit = ()
}

/** The atomic-primitive store for filesystems that have one: hard
  * link on `file:` (kernel-atomic EEXIST), exists-check + rename
  * elsewhere (rename-if-absent on HDFS-semantics stores). This is the
  * default and carries the exact semantics the manifest shipped with
  * before the seam existed. */
object AtomicFsCommit extends CommitStore {
  override def publishIfAbsent(fs: FileSystem, tmp: Path,
      dst: Path): Boolean = {
    if (fs.getUri.getScheme == "file") {
      import java.nio.file.{FileAlreadyExistsException, Files, Paths}
      val t = Paths.get(fs.makeQualified(tmp).toUri.getPath)
      val d = Paths.get(fs.makeQualified(dst).toUri.getPath)
      try {
        Files.createLink(d, t)
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        true
      } catch {
        case _: FileAlreadyExistsException => false
      }
    } else {
      !fs.exists(dst) && fs.rename(tmp, dst)
    }
  }
}

/** External compare-and-swap service: the small, strongly-consistent
  * key→value register an object-store commit log coordinates through
  * (DynamoDB in the published designs; any conditional-PUT store
  * qualifies). Keys are fully-qualified slot URIs; values are staged
  * temp-file names. Implementations must make [[putIfAbsent]] atomic
  * ACROSS PROCESSES. */
trait CasBackend {
  /** Record `value` under `key` iff absent. Returns the value that
    * holds the key after the call — `value` itself iff this caller
    * won the slot. Implementations must never report the caller's own
    * value unless the caller actually holds the key. */
  def putIfAbsent(key: String, value: String): String
  def get(key: String): Option[String]
  def delete(key: String): Unit
  /** Live claims under `prefix`: (key, value, ageMillis). `ageMillis`
    * counts from the last [[refresh]] (or the initial put) — the
    * LEASE age, not the claim's wall-clock age. */
  def list(prefix: String): Seq[(String, String, Long)]
  /** Heartbeat: reset the claim's lease age iff `key` is still held
    * by `value` (a lost or replaced claim is left untouched). What
    * lets a slow-but-alive winner be distinguished from a dead one:
    * live holders refresh, corpses do not. No-op default for
    * backends whose deployments never lease. */
  def refresh(key: String, value: String): Unit = ()
}

/** [[CasBackend]] over a shared POSIX directory: each claim is one
  * file (first line = key, second = value) published by hard link —
  * the same kernel-atomic EEXIST primitive the local manifest CAS
  * uses, here applied to the COORDINATION ENTRY rather than the
  * manifest itself, so the DATA can live on a store with no atomic
  * primitive at all. Stands in for a DynamoDB-class service in
  * deployments that have a shared NFS/local mount; the trait is the
  * seam a real service plugs into. */
class FileCasBackend(dir: java.io.File) extends CasBackend {
  import java.nio.file.{FileAlreadyExistsException, Files}

  dir.mkdirs()

  private def keyFile(key: String): java.io.File = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    new java.io.File(dir, s"claim-$hex")
  }

  private def readEntry(f: java.io.File): Option[(String, String)] =
    if (!f.isFile) None
    else {
      val lines = new String(
        Files.readAllBytes(f.toPath), "UTF-8").split("\n", 2)
      if (lines.length == 2) Some((lines(0), lines(1))) else None
    }

  /** Test seam: called when a link attempt loses to a standing claim,
    * before the claim is read back — lets a test delete the claim in
    * exactly the race window the retry loop exists for. */
  protected[v2] def onLinkLost(): Unit = ()

  override def putIfAbsent(key: String, value: String): String = {
    val target = keyFile(key)
    val stage = new java.io.File(dir,
      s".stage-${UUID.randomUUID().toString.take(12)}")
    Files.write(stage.toPath, s"$key\n$value".getBytes("UTF-8"))
    try {
      // stable-read retry: a lost link re-reads the standing claim; if
      // that claim vanished mid-read (a concurrent sweep dropped a dead
      // holder), the slot is genuinely free again — retry the LINK, so
      // the only two exits are "this caller created the claim file" and
      // "a value actually read from a standing claim file". Returning
      // the caller's own value without linking (the old fallback) let
      // two losers both claim a win and break exactly-one-winner.
      var result: String = null
      while (result == null) {
        try {
          Files.createLink(target.toPath, stage.toPath)
          result = value
        } catch {
          case _: FileAlreadyExistsException =>
            onLinkLost()
            readEntry(target) match {
              case Some((_, held)) => result = held
              case None => () // claim vanished mid-read: retry the link
            }
        }
      }
      result
    } finally {
      try Files.deleteIfExists(stage.toPath) catch { case _: Throwable => () }
    }
  }

  override def get(key: String): Option[String] =
    readEntry(keyFile(key)).map(_._2)

  override def refresh(key: String, value: String): Unit = {
    val target = keyFile(key)
    try {
      if (readEntry(target).exists(_._2 == value)) {
        Files.setLastModifiedTime(target.toPath,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis()))
      }
    } catch { case _: Throwable => () } // lost mid-refresh: not ours
  }

  override def delete(key: String): Unit = {
    try Files.deleteIfExists(keyFile(key).toPath)
    catch { case _: Throwable => () }
  }

  override def list(prefix: String): Seq[(String, String, Long)] = {
    val now = System.currentTimeMillis()
    Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("claim-"))
      .flatMap(f => readEntry(f).map { case (k, v) =>
        (k, v, now - f.lastModified()) })
      .filter(_._1.startsWith(prefix))
  }
}

/** In-memory [[CasBackend]] — single-JVM coordination and tests. */
final class InMemoryCasBackend extends CasBackend {
  private val entries = new ConcurrentHashMap[String, (String, Long)]()
  override def putIfAbsent(key: String, value: String): String = {
    val prev = entries.putIfAbsent(
      key, (value, System.currentTimeMillis()))
    if (prev == null) value else prev._1
  }
  override def get(key: String): Option[String] =
    Option(entries.get(key)).map(_._1)
  override def delete(key: String): Unit = entries.remove(key)
  override def refresh(key: String, value: String): Unit =
    entries.computeIfPresent(key, (_, e) =>
      if (e._1 == value) (e._1, System.currentTimeMillis()) else e)
  override def list(prefix: String): Seq[(String, String, Long)] = {
    val now = System.currentTimeMillis()
    import scala.jdk.CollectionConverters._
    entries.asScala.toSeq.collect {
      case (k, (v, t)) if k.startsWith(prefix) => (k, v, now - t)
    }
  }
}

/** Commit publication for stores WITHOUT an atomic create/rename:
  * claim the slot in the external CAS, then materialize the content
  * with a plain overwriting copy (one PUT on a real object store).
  * The claim — not the object — is the commit point:
  *
  *  1. `putIfAbsent(slotUri, tmpName)` — exactly one writer per slot
  *     wins, atomically, in the external register.
  *  2. The winner copies `tmp` → `dst` (idempotent: same bytes), then
  *     deletes the claim, then its temp — HEARTBEATING the claim
  *     ([[CasBackend.refresh]]) throughout, so its lease age stays
  *     fresh however long the copy stalls (GC pause, slow store).
  *  3. A claim whose lease has gone STALE (`staleClaimMillis` with no
  *     heartbeat) marks a dead holder: [[beforeRead]] (and any later
  *     committer of the same slot) finishes the copy from the
  *     surviving temp, so a claim-committed version can never be
  *     lost, only delayed by at most the lease. A FRESH claim is
  *     left entirely alone — its holder is alive and will finish.
  *     A stale claim whose temp AND object are both gone is
  *     unreachable by this protocol (temps outlive claims by
  *     construction); it is dropped as operator-damage hygiene.
  *
  * `staleClaimMillis <= 0` disables the lease: every standing claim
  * is immediately recoverable (single-writer deployments and tests
  * that fabricate dead claims).
  *
  * Readers tolerate the overwrite-copy because a recovery copy writes
  * the same bytes, and a real object store makes each PUT atomically
  * visible; the manifest header check rejects a torn local read
  * loudly. A winner whose temp a recovering peer swept mid-stall
  * checks the slot: `dst` present means its OWN bytes were
  * materialized for it — still a win, never a misreport. */
final class ExternalCasCommit(backend: CasBackend,
    staleClaimMillis: Long = 10 * 60 * 1000L) extends CommitStore {

  private def key(fs: FileSystem, dst: Path): String =
    fs.makeQualified(dst).toUri.toString

  /** Run `body` while a daemon thread heartbeats the claim, so the
    * lease age reflects liveness, not progress. */
  private def withHeartbeat[T](k: String, mine: String)(body: => T): T = {
    if (staleClaimMillis <= 0) return body // lease disabled
    val interval = math.max(1L, staleClaimMillis / 4)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      while (!stop.get()) {
        try backend.refresh(k, mine) catch { case _: Throwable => () }
        try Thread.sleep(interval)
        catch { case _: InterruptedException => stop.set(true) }
      }
    }, "graft-commit-heartbeat")
    t.setDaemon(true)
    t.start()
    try body finally { stop.set(true); t.interrupt() }
  }

  private def copy(fs: FileSystem, src: Path, dst: Path): Unit = {
    val in = fs.open(src)
    try {
      val out = fs.create(dst, true)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()
  }

  /** Finish a STALE claimed slot (its lease ran out — the holder is
    * dead): materialize `dst` from the claimed temp if the winner died
    * mid-copy; clear the claim once `dst` exists. A FRESH claim is
    * left entirely alone — heartbeats keep a live holder's lease
    * fresh, so fresh means alive and mid-commit. Idempotent and safe
    * to race — every participant writes the same bytes. */
  private def recoverSlot(fs: FileSystem, dst: Path, tmpName: String,
      ageMillis: Long): Unit = {
    if (staleClaimMillis > 0 && ageMillis <= staleClaimMillis) return
    val k = key(fs, dst)
    val tmp = new Path(dst.getParent, tmpName)
    if (fs.exists(dst)) {
      // torn-dst guard: the holder may have died MID-copy on a store
      // whose writes are not atomically visible — as long as its temp
      // survives, re-copy (same bytes, idempotent) before declaring
      // the slot complete and sweeping the only good copy
      if (fs.exists(tmp)) copy(fs, tmp, dst)
      backend.delete(k)
      try { if (fs.exists(tmp)) fs.delete(tmp, false) }
      catch { case _: Throwable => () }
    } else if (fs.exists(tmp)) {
      copy(fs, tmp, dst)
      backend.delete(k)
      try fs.delete(tmp, false) catch { case _: Throwable => () }
    } else {
      backend.delete(k) // unreachable by protocol: operator damage
    }
  }

  override def publishIfAbsent(fs: FileSystem, tmp: Path,
      dst: Path): Boolean = {
    val k = key(fs, dst)
    val mine = tmp.getName
    val winner = backend.putIfAbsent(k, mine)
    if (winner == mine) {
      // the claim register empties again once a winner completes
      // (copy → claim delete), so winning the claim is only half the
      // proof: a slot already materialized means a PREVIOUS winner
      // fully committed and this claim is spurious — drop it and
      // lose. Sound because the claim is deleted only after the copy
      // is durable, and the object store reads-after-writes.
      if (fs.exists(dst)) {
        backend.delete(k)
        // sweep the spurious temp NOW: leaving it on disk is the raw
        // material of the recover-over-completed-slot hazard below
        try { if (fs.exists(tmp)) fs.delete(tmp, false) }
        catch { case _: Throwable => () }
        false
      } else {
        try withHeartbeat(k, mine)(copy(fs, tmp, dst))
        catch {
          case e: java.io.FileNotFoundException =>
            // a peer recovered THIS claim's slot from this temp while
            // the copy stalled past its lease: dst holds this
            // caller's own bytes — the commit stands, still a win
            if (!fs.exists(dst)) throw e
        }
        backend.delete(k)
        try { if (fs.exists(tmp)) fs.delete(tmp, false) }
        catch { case _: Throwable => () }
        true
      }
    } else {
      // lost — but if the winner's claim lease has gone stale (its
      // writer died between claim and copy), make its commit visible
      // so this loser's own retry reads the version it lost to. A
      // fresh claim's holder is alive: leave it to finish. The claim
      // must still be PRESENT and still name the same temp: a vanished
      // or replaced claim means the slot completed (or its claim was
      // spurious-dropped) between our CAS and this listing — treating
      // that as "infinitely stale" once re-copied a LOSER's temp over
      // a completed slot, silently replacing a committed version's
      // bytes (racing committers stage DIFFERENT contents for the
      // same slot, so "same bytes, idempotent" does not hold across
      // claimants — only across recoverers of ONE claim).
      backend.list(k)
        .collectFirst { case (kk, v, a) if kk == k && v == winner => a }
        .foreach(age => recoverSlot(fs, dst, winner, age))
      false
    }
  }

  override def beforeRead(fs: FileSystem, manifestDir: Path): Unit = {
    val prefix = key(fs, manifestDir)
    backend.list(prefix).foreach { case (k, tmpName, age) =>
      val dst = new Path(java.net.URI.create(k))
      recoverSlot(fs, dst, tmpName, age)
    }
  }
}

/** [[CommitStore]] resolution: explicit per-scheme registration (the
  * programmatic seam, used by embedding applications and tests), then
  * Hadoop conf, then the atomic-FS default. Conf-resolved stores are
  * cached per spec string so a backend is shared across tables. */
object CommitStores {

  private val byScheme = new ConcurrentHashMap[String, CommitStore]()
  private val bySpec = new ConcurrentHashMap[String, CommitStore]()

  /** Schemes whose rename is copy+delete with silent overwrite —
    * [[AtomicFsCommit]]'s primitives do not exist there, so a
    * DEFAULTED `auto` would silently keep double-winner commit
    * semantics (the exact hole this seam closes). Resolution fails
    * fast for them unless the operator explicitly configured a store
    * (including an explicit `auto`, which is honored as a deliberate
    * single-writer opt-out). */
  private val ObjectStoreSchemes = Set(
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "oss", "cos",
    "wasb", "wasbs")

  def register(scheme: String, store: CommitStore): Unit =
    byScheme.put(scheme, store)
  def unregister(scheme: String): Unit = byScheme.remove(scheme)

  def forFs(fs: FileSystem): CommitStore = {
    val scheme = fs.getUri.getScheme
    val reg = byScheme.get(scheme)
    if (reg != null) return reg
    val conf = fs.getConf
    val explicit = Option(conf.get(s"graft.commit.store.$scheme"))
      .orElse(Option(conf.get("graft.commit.store")))
    val spec = explicit.getOrElse("auto")
    spec match {
      case "auto" | "" =>
        if (explicit.isEmpty && ObjectStoreSchemes.contains(scheme)) {
          throw new IllegalStateException(
            s"graft commit store: $scheme has no atomic " +
            "create-if-absent — the default commit path cannot " +
            "guarantee exactly one winner per version slot there. " +
            s"Configure graft.commit.store.$scheme (external-file + " +
            "graft.commit.cas.dir over a shared mount, or a " +
            "CommitStore class backed by a conditional-PUT service); " +
            s"set graft.commit.store.$scheme=auto explicitly only " +
            "for a deliberately single-writer deployment")
        }
        AtomicFsCommit
      case "external-file" =>
        val dir = conf.get("graft.commit.cas.dir")
        require(dir != null && dir.nonEmpty,
          "graft.commit.store=external-file needs graft.commit.cas.dir " +
          "(a shared directory for the commit claims)")
        bySpec.computeIfAbsent(s"external-file:$dir",
          _ => new ExternalCasCommit(new FileCasBackend(
            new java.io.File(dir))))
      case "s3-sim" =>
        // the S3 adapter shape over the file-backed simulated store:
        // cross-process conditional writes on a shared directory, so
        // multi-JVM deployments (and the two-process race tests)
        // drive S3CasBackend end to end without a cloud endpoint
        val dir = conf.get("graft.commit.cas.dir")
        require(dir != null && dir.nonEmpty,
          "graft.commit.store=s3-sim needs graft.commit.cas.dir " +
          "(a shared directory for the simulated object store)")
        bySpec.computeIfAbsent(s"s3-sim:$dir",
          _ => new ExternalCasCommit(new S3CasBackend(
            new FileSimulatedS3Store(new java.io.File(dir)))))
      case "tcp-cas" =>
        val ep = conf.get("graft.commit.cas.endpoint")
        require(ep != null && ep.contains(":"),
          "graft.commit.store=tcp-cas needs graft.commit.cas.endpoint " +
          "(host:port of a graft CasServer or any service speaking " +
          "its 5-verb protocol)")
        bySpec.computeIfAbsent(s"tcp-cas:$ep", _ => {
          val Array(host, port) = ep.split(":", 2)
          new ExternalCasCommit(new TcpCasBackend(host, port.toInt))
        })
      case cls =>
        bySpec.computeIfAbsent(cls, c =>
          Class.forName(c).getDeclaredConstructor()
            .newInstance().asInstanceOf[CommitStore])
    }
  }
}

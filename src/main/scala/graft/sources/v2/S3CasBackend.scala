package graft.sources.v2

import java.util.concurrent.ConcurrentHashMap

/** The exact object-store API subset a [[CasBackend]] register needs —
  * shaped 1:1 on the S3 operations that exist today, so a production
  * adapter is a mechanical transcription to the AWS SDK:
  *
  *  - [[putIfNoneMatch]]  = `PutObject` + `If-None-Match: *`
  *    (S3 conditional writes, GA since 2024 — atomic create-if-absent;
  *    412 Precondition Failed on a standing object)
  *  - [[get]] / [[delete]] = `GetObject` / `DeleteObject`
  *  - [[list]]            = `ListObjectsV2(prefix)` — keys and
  *    `LastModified`, NO content (S3 listings never carry bodies)
  *  - [[touchIfMatch]]    = self-`CopyObject` with
  *    `x-amz-copy-source-if-match: <etag>` and REPLACE metadata —
  *    the holder-gated lease heartbeat (the copy refreshes
  *    `LastModified`; the `If-Match` gate makes it a no-op when the
  *    claim changed hands)
  *
  * S3 has been strongly consistent for reads-after-writes and
  * listings since 2020, which is what lets the claim register live in
  * the same store as the data. GCS (`x-goog-if-generation-match: 0`)
  * and ABS (`If-None-Match: *` on Put Blob) expose the same three
  * primitives, so one adapter shape covers all three clouds.
  */
trait ConditionalObjectStore {
  /** Create-if-absent: true iff this call created the object. */
  def putIfNoneMatch(key: String, value: Array[Byte]): Boolean
  def get(key: String): Option[Array[Byte]]
  def delete(key: String): Unit
  /** Keys under `prefix` with their `LastModified` epoch millis. */
  def list(prefix: String): Seq[(String, Long)]
  /** Holder-gated touch: refresh `LastModified` iff the object's
    * current content equals `expected` (S3: `If-Match` on the content
    * ETag). Returns whether the touch applied. */
  def touchIfMatch(key: String, expected: Array[Byte]): Boolean
}

/** In-process [[ConditionalObjectStore]] with S3's documented
  * atomicity surface — conditional writes decide exactly one winner,
  * reads/listings are strongly consistent, `touchIfMatch` is an
  * atomic compare-on-content. The simulation backs
  * [[S3CasBackend]] through the contract battery
  * (CasBackendContractSpec), proving the CAS seam needs nothing
  * beyond this API; a real deployment swaps in an SDK-backed
  * implementation of the same five calls. */
final class SimulatedS3Store extends ConditionalObjectStore {
  // (content, lastModifiedMillis) per key; all mutation goes through
  // compute-style atomics, matching S3's per-key conditional-write
  // serialization
  private val objects =
    new ConcurrentHashMap[String, (Array[Byte], Long)]()

  override def putIfNoneMatch(key: String,
      value: Array[Byte]): Boolean =
    objects.putIfAbsent(key,
      (value.clone(), System.currentTimeMillis())) == null

  override def get(key: String): Option[Array[Byte]] =
    Option(objects.get(key)).map(_._1.clone())

  override def delete(key: String): Unit = objects.remove(key)

  override def list(prefix: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    objects.asScala.toSeq.collect {
      case (k, (_, lm)) if k.startsWith(prefix) => (k, lm)
    }
  }

  override def touchIfMatch(key: String,
      expected: Array[Byte]): Boolean = {
    var applied = false
    objects.computeIfPresent(key, (_, e) =>
      if (java.util.Arrays.equals(e._1, expected)) {
        applied = true
        (e._1, System.currentTimeMillis())
      } else e)
    applied
  }
}

/** FILE-BACKED [[ConditionalObjectStore]] over a shared POSIX
  * directory — the same five S3-shaped calls as [[SimulatedS3Store]]
  * but with CROSS-PROCESS atomicity, so the multi-JVM commit-race
  * tests (and any multi-driver deployment over a shared mount) can
  * exercise the S3 adapter shape end to end:
  *
  *  - `putIfNoneMatch` = stage + `link(2)` (kernel-atomic
  *    create-if-absent; a reader can never observe a torn object
  *    because the content is complete before the link lands) — the
  *    FileCasBackend publish primitive.
  *  - `touchIfMatch` = compare + `setLastModified` under an OS file
  *    lock (`FileChannel.lock`), making the compare-and-touch atomic
  *    across processes like S3's `If-Match` copy; same-JVM lock
  *    overlap retries (advisory locks are per-process).
  *  - keys URL-encode into one flat directory, so `list(prefix)` is
  *    one directory listing + a decoded startsWith filter.
  */
final class FileSimulatedS3Store(root: java.io.File)
    extends ConditionalObjectStore {
  import java.nio.file.{FileAlreadyExistsException, Files,
    StandardOpenOption}

  root.mkdirs()

  private def enc(key: String): java.io.File =
    new java.io.File(root,
      java.net.URLEncoder.encode(key, "UTF-8"))
  private def dec(name: String): String =
    java.net.URLDecoder.decode(name, "UTF-8")

  override def putIfNoneMatch(key: String,
      value: Array[Byte]): Boolean = {
    val stage = new java.io.File(root,
      s".stage-${java.util.UUID.randomUUID().toString.take(12)}")
    Files.write(stage.toPath, value)
    try {
      Files.createLink(enc(key).toPath, stage.toPath)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally {
      try Files.deleteIfExists(stage.toPath)
      catch { case _: Throwable => () }
    }
  }

  override def get(key: String): Option[Array[Byte]] =
    try Some(Files.readAllBytes(enc(key).toPath))
    catch { case _: java.io.IOException => None }

  override def delete(key: String): Unit = {
    try Files.deleteIfExists(enc(key).toPath)
    catch { case _: Throwable => () }
  }

  override def list(prefix: String): Seq[(String, Long)] = {
    val fs = Option(root.listFiles()).getOrElse(Array.empty)
    fs.toSeq.filterNot(_.getName.startsWith(".stage-")).flatMap { f =>
      val k = dec(f.getName)
      if (k.startsWith(prefix)) Some((k, f.lastModified())) else None
    }
  }

  override def touchIfMatch(key: String,
      expected: Array[Byte]): Boolean = {
    val target = enc(key)
    var done = false
    var applied = false
    while (!done) {
      var ch: java.nio.channels.FileChannel = null
      try {
        ch = java.nio.channels.FileChannel.open(target.toPath,
          StandardOpenOption.READ, StandardOpenOption.WRITE)
        val lock = ch.lock()
        try {
          val buf = java.nio.ByteBuffer.allocate(ch.size().toInt)
          while (buf.hasRemaining && ch.read(buf) >= 0) {}
          if (java.util.Arrays.equals(buf.array(), expected)) {
            Files.setLastModifiedTime(target.toPath,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis()))
            applied = true
          }
          done = true
        } finally lock.release()
      } catch {
        // advisory locks are per-PROCESS: a same-JVM overlap just
        // means another thread holds it — yield and retry
        case _: java.nio.channels.OverlappingFileLockException =>
          Thread.sleep(1L)
        case _: java.io.IOException => done = true // vanished: not ours
      } finally if (ch != null) ch.close()
    }
    applied
  }
}

/** [[CasBackend]] over an S3-class object store's conditional-write
  * API — the cloud-native claim register for [[ExternalCasCommit]]
  * when no DynamoDB/etcd service is available: claims live as tiny
  * objects in the store itself.
  *
  *  - `putIfAbsent` races on `If-None-Match: *`; a loser reads the
  *    standing claim back, and a claim that vanished mid-read (the
  *    sweeper collected a corpse) re-races the conditional put — the
  *    same stable-read retry loop as [[FileCasBackend]], so the only
  *    exits are "created" and "read from a standing claim".
  *  - `refresh` is the holder-gated self-copy; `list` GETs each
  *    listed claim for its value (claims under one table prefix are
  *    few — the slot being contended plus stragglers), skipping keys
  *    deleted between the listing and the read.
  *
  * Lease age rides `LastModified`, exactly the FileCasBackend mtime
  * design. All operations are the five [[ConditionalObjectStore]]
  * calls — nothing outside the documented S3 API.
  */
final class S3CasBackend(store: ConditionalObjectStore,
    prefix: String = "cas/") extends CasBackend {

  private def objKey(key: String): String = prefix + key
  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")
  private def str(b: Array[Byte]): String = new String(b, "UTF-8")

  override def putIfAbsent(key: String, value: String): String = {
    val k = objKey(key)
    var result: String = null
    while (result == null) {
      if (store.putIfNoneMatch(k, bytes(value))) result = value
      else store.get(k) match {
        case Some(held) => result = str(held)
        case None       => () // swept mid-read: the slot is free again
      }
    }
    result
  }

  override def get(key: String): Option[String] =
    store.get(objKey(key)).map(str)

  override def delete(key: String): Unit = store.delete(objKey(key))

  override def refresh(key: String, value: String): Unit = {
    store.touchIfMatch(objKey(key), bytes(value))
    ()
  }

  override def list(pfx: String): Seq[(String, String, Long)] = {
    val now = System.currentTimeMillis()
    store.list(objKey(pfx)).flatMap { case (k, lm) =>
      store.get(k).map(v =>
        (k.stripPrefix(prefix), str(v), math.max(0L, now - lm)))
    }
  }
}

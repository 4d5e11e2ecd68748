package graft.sources.v2

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.net.{URLDecoder, URLEncoder}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

/** A standalone commit-coordination SERVICE for multi-driver
  * deployments: the strongly-consistent key→value register
  * [[ExternalCasCommit]] coordinates through, reachable over TCP so
  * MANY DRIVER PROCESSES (on many hosts) share one linearization
  * point — the role DynamoDB plays in the published object-store
  * commit designs, self-hosted with zero dependencies.
  *
  * Linearizability is by construction: every mutation funnels through
  * one synchronized in-memory map in the server process; the claim
  * lease ages ([[CasBackend.list]]) are measured on the SERVER clock,
  * so heartbeat staleness is immune to client clock skew.
  *
  * Durability: with `walPath` set, every acknowledged mutation is
  * fsync'd to a write-ahead log BEFORE its reply leaves the server —
  * a winner's `HELD` response implies the claim survives a crash. On
  * restart the log replays (records are CRC32-framed, so a torn
  * final line — a crash mid-append — fails its checksum and is
  * discarded rather than possibly parsing as a DIFFERENT valid
  * mutation) and is compacted to
  * a snapshot of the live registers. Entry timestamps persist
  * absolute server time, so after downtime a restored claim's lease
  * age INCLUDES the outage — exactly the takeover semantics a stale
  * claim should have. Without `walPath` the register is in-memory
  * (matching DynamoDB's API contract, not its replication): a
  * restart loses in-flight CLAIMS only; already-materialized slots
  * are safe (the claim is deleted after the copy, and
  * `publishIfAbsent`'s dst-exists check refuses to re-win a completed
  * slot).
  *
  * Wire protocol (one line per request, URL-encoded fields):
  * {{{
  *   PUT <key> <value>      -> HELD <holder>
  *   GET <key>              -> VAL <value> | NONE
  *   DEL <key>              -> OK
  *   REFRESH <key> <value>  -> OK
  *   LIST <prefix>          -> N, then N lines: <key> <value> <ageMs>
  * }}}
  */
final class CasServer(bindPort: Int = 0,
    walPath: Option[java.nio.file.Path] = None) extends AutoCloseable {

  private val entries = new ConcurrentHashMap[String, (String, Long)]()

  // durable mode: replay whatever the previous incarnation
  // acknowledged, then compact the log to one snapshot line per live
  // register — BEFORE the socket starts accepting
  private val wal: Option[java.io.FileOutputStream] = walPath.map { p =>
    replayWal(p)
    compactWal(p)
  }

  /** CRC32 (hex) of a record payload: every appended line is framed
    * `C <crc> <payload>` so a torn tail can NEVER replay as a
    * different valid mutation — a crash mid-append can leave a
    * prefix that still parses (`D longkey` truncated to `D long` is
    * a delete of the WRONG live key); the checksum rejects it. */
  private def crc(s: String): String = {
    val c = new java.util.zip.CRC32()
    val b = s.getBytes("UTF-8")
    c.update(b, 0, b.length)
    java.lang.Long.toHexString(c.getValue)
  }

  private def applyRecord(payload: String): Unit =
    payload.split(" ").toSeq match {
      case Seq("P", ts, k, v) if ts.forall(_.isDigit) =>
        entries.put(dec(k), (dec(v), ts.toLong))
      case Seq("D", k) => entries.remove(dec(k))
      case Seq("R", ts, k) if ts.forall(_.isDigit) =>
        entries.computeIfPresent(dec(k), (_, e) => (e._1, ts.toLong))
      case _ => () // unacknowledged fragment — drop it
    }

  private def replayWal(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val it = java.nio.file.Files.lines(p,
        java.nio.charset.StandardCharsets.UTF_8)
      var torn = false
      var framedSeen = false
      var legacyApplied = 0L
      try it.forEach { line =>
        if (!torn) {
          if (line.startsWith("C ")) {
            val parts = line.split(" ", 3)
            if (parts.length == 3 && crc(parts(2)) == parts(1)) {
              framedSeen = true
              applyRecord(parts(2))
            } else {
              // checksum mismatch = torn tail from a crash
              // mid-append; appends are sequential, so nothing after
              // this point was acknowledged either — stop replaying
              torn = true
            }
          } else if (framedSeen) {
            // an unframed line AFTER framed ones cannot be legacy —
            // every post-upgrade append is framed, so this is a torn
            // tail whose head happened not to start with "C " (e.g.
            // a framed record truncated past its prefix). The legacy
            // field-wise parse could replay it as a wrong mutation —
            // exactly the bug the framing closed — so stop here too
            torn = true
          } else {
            // pre-checksum record (legacy log, first boot after the
            // framing change); compaction rewrites it framed
            legacyApplied += 1
            applyRecord(line)
          }
        }
      } finally it.close()
      if (legacyApplied > 0) {
        System.err.println(s"[graft-cas] replayed $legacyApplied " +
          s"unframed legacy WAL record(s) from $p; compaction will " +
          "rewrite them CRC-framed")
      }
    }
  }

  private def compactWal(
      p: java.nio.file.Path): java.io.FileOutputStream = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".compact")
    val out = new java.io.FileOutputStream(tmp.toFile)
    try {
      import scala.jdk.CollectionConverters._
      entries.asScala.foreach { case (k, (v, t)) =>
        val rec = s"P $t ${enc(k)} ${enc(v)}"
        out.write(s"C ${crc(rec)} $rec\n".getBytes("UTF-8"))
      }
      out.flush(); out.getFD.sync()
    } finally out.close()
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    new java.io.FileOutputStream(p.toFile, true)
  }

  /** Append + fsync one mutation record. Called under the entries
    * lock, before the mutation's reply is written — the ack implies
    * durability. */
  private def logMutation(rec: String): Unit = wal.foreach { w =>
    w.write(s"C ${crc(rec)} $rec\n".getBytes("UTF-8"))
    w.flush(); w.getFD.sync()
  }
  private val socket = new ServerSocket()
  // a restarted coordinator must be able to re-bind its port
  // immediately (the restart IS the scenario the WAL exists for)
  socket.setReuseAddress(true)
  socket.bind(new InetSocketAddress("127.0.0.1", bindPort))
  private val running = new AtomicBoolean(true)

  /** The bound port (ephemeral when constructed with 0). */
  def port: Int = socket.getLocalPort

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val conn = socket.accept()
        val t = new Thread(() => serve(conn), "graft-cas-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // closed during accept
    }
  }, "graft-cas-server")
  acceptor.setDaemon(true)
  acceptor.start()

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  private def serve(conn: Socket): Unit = {
    try {
      val in = new BufferedReader(
        new InputStreamReader(conn.getInputStream, "UTF-8"))
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(conn.getOutputStream, "UTF-8"))
      var line = in.readLine()
      while (line != null) {
        out.print(handle(line.split(" ").toSeq))
        out.flush()
        line = in.readLine()
      }
    } catch { case _: Throwable => () }
    finally { try conn.close() catch { case _: Throwable => () } }
  }

  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  private def handle(cmd: Seq[String]): String = cmd match {
    case Seq("PUT", k, v) =>
      val key = dec(k); val value = dec(v)
      val held = entries.synchronized {
        val prev = entries.get(key)
        if (prev == null) {
          val ts = System.currentTimeMillis()
          logMutation(s"P $ts ${enc(key)} ${enc(value)}")
          entries.put(key, (value, ts)); value
        } else prev._1
      }
      s"HELD ${enc(held)}\n"
    case Seq("GET", k) =>
      Option(entries.get(dec(k))) match {
        case Some((v, _)) => s"VAL ${enc(v)}\n"
        case None => "NONE\n"
      }
    case Seq("DEL", k) =>
      entries.synchronized {
        logMutation(s"D ${enc(dec(k))}")
        entries.remove(dec(k))
      }
      "OK\n"
    case Seq("REFRESH", k, v) =>
      val key = dec(k); val value = dec(v)
      entries.synchronized {
        val cur = entries.get(key)
        if (cur != null && cur._1 == value) {
          val ts = System.currentTimeMillis()
          logMutation(s"R $ts ${enc(key)}")
          entries.put(key, (cur._1, ts))
        }
      }
      "OK\n"
    case Seq("LIST") | Seq("LIST", _) => // bare LIST = empty prefix
      val prefix = cmd.drop(1).headOption.map(dec).getOrElse("")
      val now = System.currentTimeMillis()
      import scala.jdk.CollectionConverters._
      val hits = entries.asScala.toSeq.collect {
        case (k, (v, t)) if k.startsWith(prefix) => (k, v, now - t)
      }
      (s"${hits.size}\n" +: hits.map { case (k, v, a) =>
        s"${enc(k)} ${enc(v)} $a\n"
      }).mkString
    case _ => "ERR bad-command\n"
  }

  override def close(): Unit = {
    running.set(false)
    try socket.close() catch { case _: Throwable => () }
    wal.foreach(w => try w.close() catch { case _: Throwable => () })
  }
}

/** [[CasBackend]] client for [[CasServer]]'s protocol: one short-lived
  * connection per operation (a commit performs a handful of CAS calls —
  * connection reuse would buy nothing and add failure modes), hard
  * `timeoutMillis` on connect AND read so a hung coordinator fails the
  * commit loudly instead of wedging the driver. Network failures
  * propagate: a commit MUST NOT guess whether its claim landed.
  */
final class TcpCasBackend(host: String, port: Int,
    timeoutMillis: Int = 10000) extends CasBackend {

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  private def call[T](line: String)(read: BufferedReader => T): T = {
    val s = new Socket()
    try {
      s.connect(new InetSocketAddress(host, port), timeoutMillis)
      s.setSoTimeout(timeoutMillis)
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      out.print(line + "\n")
      out.flush()
      read(new BufferedReader(
        new InputStreamReader(s.getInputStream, "UTF-8")))
    } finally { try s.close() catch { case _: Throwable => () } }
  }

  private def one(line: String): String =
    call(line) { in =>
      val r = in.readLine()
      if (r == null) throw new java.io.IOException(
        s"graft cas service closed the connection on: $line")
      r
    }

  override def putIfAbsent(key: String, value: String): String =
    one(s"PUT ${enc(key)} ${enc(value)}") match {
      case s if s.startsWith("HELD ") => dec(s.drop(5))
      case other => throw new java.io.IOException(
        s"graft cas service: unexpected reply '$other' to PUT")
    }

  override def get(key: String): Option[String] =
    one(s"GET ${enc(key)}") match {
      case s if s.startsWith("VAL ") => Some(dec(s.drop(4)))
      case "NONE" => None
      case other => throw new java.io.IOException(
        s"graft cas service: unexpected reply '$other' to GET")
    }

  override def delete(key: String): Unit = one(s"DEL ${enc(key)}")

  override def refresh(key: String, value: String): Unit = {
    // heartbeats are advisory: a missed beat must not kill the copy
    // it protects (the lease just ages one interval)
    try one(s"REFRESH ${enc(key)} ${enc(value)}")
    catch { case _: java.io.IOException => () }
  }

  override def list(prefix: String): Seq[(String, String, Long)] =
    call(s"LIST ${enc(prefix)}") { in =>
      val n = Option(in.readLine()).map(_.toInt).getOrElse(
        throw new java.io.IOException(
          "graft cas service closed the connection on LIST"))
      (0 until n).map { _ =>
        val parts = in.readLine().split(" ")
        (dec(parts(0)), dec(parts(1)), parts(2).toLong)
      }
    }
}

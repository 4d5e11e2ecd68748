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
  * Durability: the register is in-memory — the stand-in matches
  * DynamoDB's API contract, not its replication. A service restart
  * loses in-flight CLAIMS only; already-materialized slots are safe
  * (the claim is deleted after the copy, and `publishIfAbsent`'s
  * dst-exists check refuses to re-win a completed slot). Deployments
  * needing claim durability across coordinator restarts point the same
  * [[TcpCasBackend]] at a replicated implementation of this 5-verb
  * protocol.
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
final class CasServer(bindPort: Int = 0) extends AutoCloseable {

  private val entries = new ConcurrentHashMap[String, (String, Long)]()
  private val socket = new ServerSocket()
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
          entries.put(key, (value, System.currentTimeMillis())); value
        } else prev._1
      }
      s"HELD ${enc(held)}\n"
    case Seq("GET", k) =>
      Option(entries.get(dec(k))) match {
        case Some((v, _)) => s"VAL ${enc(v)}\n"
        case None => "NONE\n"
      }
    case Seq("DEL", k) =>
      entries.synchronized { entries.remove(dec(k)) }
      "OK\n"
    case Seq("REFRESH", k, v) =>
      val key = dec(k); val value = dec(v)
      entries.synchronized {
        entries.computeIfPresent(key, (_, e) =>
          if (e._1 == value) (e._1, System.currentTimeMillis()) else e)
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

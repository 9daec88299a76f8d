package graft.streaming

import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import scala.util.control.NonFatal

/** Cache-invalidation control plane (SURVEY §2 O22).
  *
  * Reference: a TCP server on `0.0.0.0:8088` accepting the text command
  * `invalidate`, which re-runs the opt-out dimension query and swaps the
  * cached set (`/root/reference/src/main.rs:1019-1056, 800-822`); anything
  * else answers `Unknown command`.
  *
  * The Spark pipeline normally doesn't need this — the dimension is
  * re-resolved every micro-batch (SURVEY §3.3) — but the endpoint is kept
  * for contract parity and for deployments that cache the dimension
  * DataFrame between triggers: `onInvalidate` swaps whatever the
  * `dimProvider` closure reads (e.g. an `AtomicReference[DataFrame]`).
  *
  * Unlike the reference, the refresh runs on the accept thread WITHOUT
  * holding any lock visible to the insert path (the reference refreshes
  * while holding the RwLock write guard, stalling all inserts — SURVEY
  * §3.3); swapping an AtomicReference is the coherence boundary here.
  */
final class InvalidationServer(port: Int, onInvalidate: () => Unit) {

  private val running = new AtomicBoolean(false)
  @volatile private var server: ServerSocket = _
  @volatile private var boundPort: Int = -1

  /** Actual port after bind (use port=0 for ephemeral in tests). */
  def listeningPort: Int = boundPort

  def start(): Unit = {
    if (!running.compareAndSet(false, true)) return
    server = new ServerSocket()
    server.bind(new InetSocketAddress(port))
    boundPort = server.getLocalPort
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          try {
            sock.setSoTimeout(5000)
            // Read to newline/EOF/1024-byte cap (reference caps at 1024,
            // src/main.rs:804) — a single read() would misparse a command
            // split across TCP segments as 'Unknown command'.
            val buf = new Array[Byte](1024)
            val in = sock.getInputStream
            var n = 0
            var eof = false
            def parsed: String = {
              // parse up to the first newline only
              val upto = buf.take(n).indexOf('\n'.toByte) match {
                case -1 => n
                case i => i
              }
              new String(buf, 0, upto, StandardCharsets.UTF_8).trim
            }
            try {
              // read until newline, EOF, or the 1024-byte cap. The FIRST
              // read waits the full 5 s (client connect-then-write
              // latency); once bytes have arrived, later reads wait only a
              // short linger — reference clients single-write "invalidate"
              // with no newline and no shutdownOutput, so without the
              // linger they would wait out the full SoTimeout, and WITH an
              // accumulated-bytes == "invalidate" early exit a longer
              // command (e.g. "invalidateall") split by TCP exactly at the
              // 10-byte boundary would spuriously invalidate: one write's
              // segments arrive well inside the linger, so the tail is
              // seen and the command correctly answers Unknown.
              // 100 ms linger (ADVICE r15, halved from 200): reference-
              // style clients (single write, no newline, connection held
              // open) always pay one full linger before a reply, so it is
              // the fixed per-command latency; it only needs to exceed one
              // inter-segment gap of a split write — same-write TCP
              // segments arrive microseconds apart, and the deliberately
              // split OpsSpec client (50 ms gap) keeps 2x margin.
              while (!eof && n < buf.length && !buf.take(n).contains('\n'.toByte)) {
                if (n > 0) sock.setSoTimeout(100)
                val r = in.read(buf, n, buf.length - n)
                if (r < 0) eof = true else n += r
              }
            } catch {
              // no newline, no EOF, client idle: parse what arrived
              case _: java.net.SocketTimeoutException => ()
            }
            val cmd = parsed
            val reply = cmd match {
              case "invalidate" =>
                onInvalidate()
                "Cache invalidated successfully\nOK\n"
              case _ => "Unknown command\n"
            }
            sock.getOutputStream.write(reply.getBytes(StandardCharsets.UTF_8))
            sock.getOutputStream.flush()
          } finally sock.close()
        } catch {
          // keep serving on transient accept/handler failures, but with a
          // pause: a PERSISTENT failure (e.g. fd exhaustion making every
          // accept() throw) must not busy-spin the thread at 100% CPU
          case NonFatal(_) if running.get() => Thread.sleep(100)
          case NonFatal(_) => // socket closed during stop → loop exits
          // a fatal error (OOM, linkage) propagates and ends the daemon
          // thread instead of looping inside a corrupted JVM
        }
      }
    }, "graft-invalidation-server")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) try server.close() catch { case NonFatal(_) => () }
  }
}

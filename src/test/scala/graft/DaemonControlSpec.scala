package graft

import graft.streaming.{DaemonControl, Ingest}
import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Pidfile protocol (T4/T6 parity with spawn_daemon/status_daemon/
  * kill_daemon, wsprnet-scraper.sh:446-524). No SparkSession needed — the
  * whole point of the protocol is that status/stop work from a second
  * process without touching the engine. */
class DaemonControlSpec extends AnyFunSuite {

  private def ckptDir(): String =
    Files.createTempDirectory("daemon-ckpt").toString

  // a pid that is certainly not a live process (max Linux pid is < 2^22)
  private val deadPid = 4104104L

  test("no pidfile: status and stop are clean no-ops") {
    val ckpt = ckptDir()
    assert(DaemonControl.status(ckpt) == DaemonControl.NotRunning)
    assert(DaemonControl.stop(ckpt) == DaemonControl.NotRunning)
  }

  test("acquire writes this JVM's pid; status reports running with cursor position") {
    val ckpt = ckptDir()
    assert(DaemonControl.acquirePidfile(ckpt))
    Ingest.writeCursor(ckpt, Ingest.CursorState(3, 10, 42))
    DaemonControl.status(ckpt) match {
      case DaemonControl.Running(pid, cur) =>
        assert(pid == ProcessHandle.current().pid())
        assert(cur.contains(Ingest.CursorState(3, 10, 42)))
      case other => fail(s"expected Running, got $other")
    }
    // a second daemon on the same checkpoint must be refused while we live
    assert(Files.readString(Path.of(ckpt, "graft.pid")).trim.toLong ==
      ProcessHandle.current().pid())
  }

  test("dead pidfile: status reports and removes it (reference :487-490)") {
    val ckpt = ckptDir()
    Files.writeString(Path.of(ckpt, "graft.pid"), deadPid.toString)
    assert(DaemonControl.status(ckpt) == DaemonControl.DeadPidFile(deadPid))
    assert(!Files.exists(Path.of(ckpt, "graft.pid")), "dead pidfile must be removed")
    assert(DaemonControl.status(ckpt) == DaemonControl.NotRunning)
  }

  test("stop with dead pidfile cleans up; acquire replaces a dead pidfile") {
    val ckpt = ckptDir()
    Files.writeString(Path.of(ckpt, "graft.pid"), deadPid.toString)
    assert(DaemonControl.stop(ckpt) == DaemonControl.DeadPidFile(deadPid))
    assert(!Files.exists(Path.of(ckpt, "graft.pid")))
    Files.writeString(Path.of(ckpt, "graft.pid"), deadPid.toString)
    assert(DaemonControl.acquirePidfile(ckpt), "a dead pidfile must not block startup")
    assert(Files.readString(Path.of(ckpt, "graft.pid")).trim.toLong ==
      ProcessHandle.current().pid())
  }

  test("stop terminates a live daemon process and removes the pidfile") {
    val ckpt = ckptDir()
    // a real subordinate process standing in for the daemon JVM
    val proc = new ProcessBuilder("sleep", "60").start()
    Files.writeString(Path.of(ckpt, "graft.pid"), proc.pid().toString)
    DaemonControl.stop(ckpt) match {
      case DaemonControl.Running(pid, _) => assert(pid == proc.pid())
      case other => fail(s"expected Running, got $other")
    }
    assert(!Files.exists(Path.of(ckpt, "graft.pid")))
    assert(proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS),
      "daemon process must terminate after stop")
  }
}

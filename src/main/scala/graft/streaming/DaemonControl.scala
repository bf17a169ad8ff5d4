package graft.streaming

import java.nio.file.{Files, Path}

/** Daemon process control re-expressing the reference's pidfile management
  * (spawn_daemon/status_daemon/kill_daemon, wsprnet-scraper.sh:446-524):
  * a pidfile next to the stream checkpoint records the daemon JVM, `status`
  * reports liveness plus the checkpointed cursor position, and `stop` sends
  * the daemon a termination signal. The in-flight batch is safe to interrupt:
  * [[Ingest.commitBatch]] replays crash-interrupted batches idempotently.
  */
object DaemonControl {

  sealed trait Status
  case class Running(pid: Long, cursor: Option[Ingest.CursorState]) extends Status
  case class DeadPidFile(pid: Long) extends Status
  case object NotRunning extends Status

  private def pidPath(checkpointDir: String): Path = Path.of(checkpointDir, "graft.pid")

  private def readPid(checkpointDir: String): Option[Long] = {
    val p = pidPath(checkpointDir)
    if (!Files.exists(p)) None
    else Files.readString(p).trim.toLongOption
  }

  private def alive(pid: Long): Boolean =
    ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)

  /** Claim the daemon pidfile for this JVM (T4 mutex, :452-460): refuses if a
    * live daemon holds it, replaces a dead pidfile, registers cleanup at JVM
    * exit. Returns false (no side effects) when another daemon is running. */
  def acquirePidfile(checkpointDir: String): Boolean = readPid(checkpointDir) match {
    case Some(pid) if alive(pid) && pid != ProcessHandle.current().pid() => false
    case other =>
      if (other.isDefined) Files.delete(pidPath(checkpointDir)) // dead pidfile
      Files.createDirectories(pidPath(checkpointDir).getParent)
      Files.writeString(pidPath(checkpointDir), ProcessHandle.current().pid().toString)
      sys.addShutdownHook { Files.deleteIfExists(pidPath(checkpointDir)); () }
      true
  }

  /** -s equivalent (:479-494): liveness from the pidfile; a dead pidfile is
    * removed (as the reference does) and reported. Cursor position comes from
    * the checkpointed cursor state — no Spark session needed. */
  def status(checkpointDir: String): Status = readPid(checkpointDir) match {
    case Some(pid) if alive(pid) => Running(pid, Ingest.readCursor(checkpointDir))
    case Some(pid) => Files.delete(pidPath(checkpointDir)); DeadPidFile(pid)
    case None => NotRunning
  }

  /** -z equivalent (:496-524): terminate the recorded daemon (SIGTERM-style
    * ProcessHandle.destroy) and remove the pidfile; dead pidfiles are cleaned
    * and reported, a missing pidfile is a successful no-op. */
  def stop(checkpointDir: String): Status = readPid(checkpointDir) match {
    case Some(pid) if alive(pid) =>
      ProcessHandle.of(pid).ifPresent(h => { h.destroy(); () })
      Files.deleteIfExists(pidPath(checkpointDir))
      Running(pid, None)
    case Some(pid) =>
      Files.deleteIfExists(pidPath(checkpointDir))
      DeadPidFile(pid)
    case None => NotRunning
  }
}

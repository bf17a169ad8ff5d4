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
    // the daemon may delete its pidfile between our exists check and the
    // read (shutdown race) — that is simply "not running"
    if (!Files.exists(p)) None
    else
      try Files.readString(p).trim.toLongOption
      catch { case _: java.io.IOException => None }
  }

  private def alive(pid: Long): Boolean =
    ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)

  /** Claim the daemon pidfile for this JVM (T4 mutex, :452-460): refuses if a
    * live daemon holds it, replaces a dead pidfile, registers cleanup at JVM
    * exit. Returns false (no side effects) when another daemon is running.
    * The claim itself is atomic (CREATE_NEW): two daemons racing through the
    * liveness check cannot both write the pidfile — the loser of the create
    * re-examines the winner's pid and backs off. */
  def acquirePidfile(checkpointDir: String): Boolean = {
    val p = pidPath(checkpointDir)
    val self = ProcessHandle.current().pid()
    var attempts = 0
    while (attempts < 2) {
      attempts += 1
      readPid(checkpointDir) match {
        case Some(pid) if alive(pid) && pid != self => return false
        case other =>
          if (other.isDefined) Files.deleteIfExists(p) // dead (or our own) pidfile
          Files.createDirectories(p.getParent)
          try {
            Files.writeString(p, self.toString,
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            sys.addShutdownHook { Files.deleteIfExists(p); () }
            return true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => () // lost the race; re-check
          }
      }
    }
    false
  }

  /** -s equivalent (:479-494): liveness from the pidfile; a dead pidfile is
    * removed (as the reference does) and reported. Cursor position comes from
    * the checkpointed cursor state — no Spark session needed. */
  def status(checkpointDir: String): Status = readPid(checkpointDir) match {
    case Some(pid) if alive(pid) => Running(pid, Ingest.readCursor(checkpointDir))
    case Some(pid) => Files.deleteIfExists(pidPath(checkpointDir)); DeadPidFile(pid)
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

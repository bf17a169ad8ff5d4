package graft.sinks

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The drain side of the K4 spool-queue contract — the reference's uploader
  * daemon (upload_to_wd1_daemon, wsprnet-scraper.sh:96-124) re-expressed
  * engine-side with a pluggable transport: sweep the queue, attempt each
  * payload, delete on success, RETAIN on failure so the next sweep retries
  * (the reference's exact semantics: rm only when curl returns 0), idle-sleep
  * between empty sweeps. The FTP-specific `curl -T` becomes a
  * `transport: Path => Boolean` so the zero-egress build tests the full drain
  * protocol; a production deployment passes an FTP/HTTP/object-store client.
  *
  * Units of work are the batch directories [[Sinks.spoolCompressed]] writes
  * (`batch_<epochTag>/part-*.csv.bz2`). Only COMMITTED batches — directories
  * containing the writer's _SUCCESS marker — are eligible, so a sweep never
  * races a batch that is still being written. Payloads upload in
  * deterministic (name) order; a batch directory is removed only when every
  * payload in it has been uploaded, and partially-drained batches resume from
  * the files that remain.
  */
object SpoolDrain {

  /** Materialized directory listing — Files.list streams hold an open file
    * descriptor until closed, which a long-running daemon cannot leave to GC. */
  private def children(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** One sweep over the queue. Returns (uploaded, failed) payload counts. */
  def drainOnce(spoolDir: String, transport: Path => Boolean): (Int, Int) = {
    val root = Path.of(spoolDir)
    if (!Files.isDirectory(root)) return (0, 0)
    var uploaded = 0
    var failed = 0
    val batches = children(root)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("batch_"))
      .filter(p => Files.exists(p.resolve("_SUCCESS"))) // committed batches only
      .sortBy(_.getFileName.toString)
    batches.foreach { batch =>
      val payloads = children(batch)
        .filter(p => p.getFileName.toString.endsWith(".bz2"))
        .sortBy(_.getFileName.toString)
      payloads.foreach { file =>
        val ok =
          try transport(file)
          catch {
            case e: Exception =>
              System.err.println(s"[spool] upload of $file failed: ${e.getMessage}")
              false
          }
        if (ok) { Files.deleteIfExists(file); uploaded += 1 }
        else failed += 1 // retained; retried on the next sweep
      }
      // the batch is done only when no payload remains
      val rest = children(batch)
      if (!rest.exists(_.getFileName.toString.endsWith(".bz2"))) {
        rest.filterNot(Files.isDirectory(_)).foreach(Files.deleteIfExists(_))
        if (children(batch).isEmpty) Files.deleteIfExists(batch)
      }
    }
    (uploaded, failed)
  }

  /** The daemon loop: sweep while `running()`, sleeping `idleSleepMs`
    * (reference: 10 s) after a sweep that found nothing to upload. A sweep
    * that throws (transient filesystem error, concurrent operator cleanup)
    * is logged and retried on the next cycle — one bad sweep must not kill
    * the uploader while the queue backs up. */
  def run(spoolDir: String, transport: Path => Boolean,
      running: () => Boolean, idleSleepMs: Long = 10000L): Unit =
    while (running()) {
      val quiet =
        try {
          val (up, fail) = drainOnce(spoolDir, transport)
          up == 0 || fail > 0
        } catch {
          case e: Exception =>
            System.err.println(s"[spool] sweep failed, will retry: ${e.getMessage}")
            true
        }
      if (quiet) Thread.sleep(idleSleepMs)
    }
}

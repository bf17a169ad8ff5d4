package graft.sources.v2

import graft.sources.WsprNetClient
import graft.spots.SpotSchema
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch form of the wsprnet connector: the Spotnum
  * cursor IS the stream offset, checkpointed by the engine itself —
  * `spark.readStream.format("graft.sources.v2.WsprNetSourceProvider")`.
  *
  * This is the fully Spark-idiomatic expression of the reference's polling
  * daemon (S2/S3, wsprnet-scraper.sh:191-255): restart/replay semantics come
  * from the streaming offset log, not from a hand-rolled cursor file — the
  * file-drop path ([[graft.streaming.Ingest]]) remains for deployments that
  * stage batches on disk.
  *
  * Polling happens driver-side in `latestOffset` (one fetch per trigger,
  * exactly like the reference's one scrape per cycle); fetched rows are
  * buffered on the driver keyed by Spotnum (bounded: the reference's own
  * batch envelope is <= 9999 spots/scrape) and shipped to executors in the
  * planned partition. `commit` prunes everything at or below the committed
  * cursor. Transports are injectable through a registry so the zero-egress
  * build drives the full engine path with a scripted HTTP double.
  */
class WsprNetSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpotSchema.apiSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WsprNetTable(new CaseInsensitiveStringMap(properties))
}

object WsprNetSourceProvider {
  /** Injectable transports (option `transportId`); "jdk" = real HTTP. */
  private val transports =
    new java.util.concurrent.ConcurrentHashMap[String, WsprNetClient.HttpTransport]()

  def registerTransport(id: String, t: WsprNetClient.HttpTransport): Unit = {
    transports.put(id, t); ()
  }

  private[v2] def transportFor(id: String, timeoutSeconds: Long): WsprNetClient.HttpTransport =
    if (id == "jdk") new WsprNetClient.JdkTransport(timeoutSeconds)
    else {
      val t = transports.get(id)
      require(t != null, s"no transport registered under id '$id'")
      t
    }
}

private[v2] class WsprNetTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "wsprnet_spots"
  override def schema(): StructType = SpotSchema.apiSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SpotSchema.apiSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WsprNetMicroBatchStream(options)
      }
    }
}

/** Offset = the Spotnum cursor (reference cursor file semantics,
  * wsprnet-scraper.sh:341, carried by the engine's offset log instead). */
case class SpotnumOffset(spotnum: Long) extends Offset {
  override def json(): String = s"""{"spotnum":$spotnum}"""
}

private[graft] class WsprNetMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val cfg = WsprNetClient.Config(
    baseUrl = options.getOrDefault("baseUrl", "http://wsprnet.org"),
    user = options.getOrDefault("user", ""),
    password = options.getOrDefault("password", ""),
    excludeSpecial = options.getBoolean("excludeSpecial", false))
  private val transport = WsprNetSourceProvider.transportFor(
    options.getOrDefault("transportId", "jdk"), cfg.fetchTimeoutSeconds)
  private val startSpotnum = options.getLong("startSpotnum", 0L)
  // minimum ms between HTTP polls (0 = poll every trigger). With the default
  // ProcessingTime(0) trigger the engine re-asks for offsets continuously, so
  // a production deployment should set this to the scrape cadence (the
  // reference's is 30 s) or use an explicit trigger.
  private val pollIntervalMs = options.getLong("pollIntervalMs", 0L)
  private var lastPollNanos = Long.MinValue

  private var session: Option[WsprNetClient.Session] = None
  // driver-side buffer of fetched-but-uncommitted rows, keyed by Spotnum;
  // bounded by the API's batch envelope x the handful of in-flight triggers
  private val pending = new java.util.TreeMap[Long, Array[Any]]()
  private var fetchedThrough = startSpotnum

  override def initialOffset(): Offset = SpotnumOffset(startSpotnum)

  override def deserializeOffset(json: String): Offset = {
    val off = SpotnumOffset(""""spotnum"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))
    // Seed the poll cursor from restored offsets so a restart (a) never
    // reports a latest offset BELOW the checkpointed one and (b) does not
    // refetch the full already-committed history into the buffer. Replay of
    // an uncommitted batch is unaffected: planInputPartitions refetches its
    // own range on demand.
    fetchedThrough = math.max(fetchedThrough, off.spotnum)
    off
  }

  /** Fetch everything past `cursor` into the buffer, with one re-login on an
    * invalidated session (F4). */
  private def poll(cursor: Long): Unit = {
    val sess = session.getOrElse(WsprNetClient.login(transport, cfg))
    val (raw, used) =
      try (WsprNetClient.fetchRaw(transport, cfg, sess, cursor), sess)
      catch {
        case _: WsprNetClient.AuthFailure =>
          val fresh = WsprNetClient.login(transport, cfg)
          (WsprNetClient.fetchRaw(transport, cfg, fresh, cursor), fresh)
      }
    session = Some(used)
    raw.foreach { json =>
      SpotJson.parseRows(json).foreach { row =>
        val spotnum = row(0).asInstanceOf[java.lang.Long]
        if (spotnum != null && spotnum.longValue() > cursor) {
          pending.put(spotnum.longValue(), row) // duplicate Spotnums collapse
          fetchedThrough = math.max(fetchedThrough, spotnum.longValue())
        }
      }
    }
  }

  /** One poll per trigger (the reference's one scrape per cycle), rate-capped
    * by `pollIntervalMs` so a fast engine trigger cannot hammer the endpoint
    * beyond the configured cadence. */
  override def latestOffset(): Offset = {
    val now = System.nanoTime()
    if (lastPollNanos == Long.MinValue || (now - lastPollNanos) / 1000000L >= pollIntervalMs) {
      lastPollNanos = now
      poll(fetchedThrough)
    }
    SpotnumOffset(fetchedThrough)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SpotnumOffset].spotnum
    val hi = end.asInstanceOf[SpotnumOffset].spotnum
    if (hi <= lo) return Array.empty // empty or regressed range: nothing to plan
    // Replay after restart: the engine re-executes the last uncommitted
    // (start, end] from the offset log, but the buffer lived in the previous
    // JVM — refetch past `lo` on demand (the API retains spots, so the
    // replayed range is re-servable; anything past `hi` stays buffered for
    // the next trigger).
    if (pending.subMap(lo, false, hi, true).isEmpty) poll(lo)
    val rows = pending.subMap(lo, false, hi, true).values.asScala.toArray
    if (rows.isEmpty) Array.empty else Array(SpotRowsPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = new SpotRowsReaderFactory

  override def commit(end: Offset): Unit = {
    val hi = end.asInstanceOf[SpotnumOffset].spotnum
    pending.headMap(hi, true).clear()
  }

  override def stop(): Unit = ()
}

/** The planned rows travel to the executor as plain JVM values (String/Long/
  * Integer/Double/null), converted to InternalRow at read time. */
private[v2] case class SpotRowsPartition(rows: Array[Array[Any]]) extends InputPartition

private[graft] class SpotRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[SpotRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i).map {
          case s: String => UTF8String.fromString(s)
          case other => other
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

/** Driver-side JSON-to-row parsing against [[SpotSchema.apiSchema]], using
  * the Jackson shipped with Spark (string-or-number coercion mirrors
  * spark.read.json's permissive numeric reads; JSON escape sequences —
  * including the API's `\/` — decode per the JSON spec). */
private[graft] object SpotJson {
  def parseRows(json: String): Seq[Array[Any]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val nodes =
      if (root.isArray) root.elements().asScala.toSeq
      else root.properties().asScala.toSeq.map(_.getValue) // map-of-spots form
    nodes.filter(n => n.isObject && n.has("Spotnum")).map { node =>
      SpotSchema.apiSchema.fields.map { f =>
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else convert(v, f.dataType)
      }: Array[Any]
    }
  }

  private def convert(v: com.fasterxml.jackson.databind.JsonNode, t: DataType): Any =
    t match {
      case LongType => java.lang.Long.valueOf(v.asLong())
      case IntegerType => java.lang.Integer.valueOf(v.asInt())
      case DoubleType => java.lang.Double.valueOf(v.asDouble())
      case _ => v.asText()
    }
}

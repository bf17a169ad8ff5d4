package graft.sinks

import graft.spots.SpotSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output boundaries of the pipeline (reference: K2 csv, K3 TimescaleDB
  * batch INSERT, K5 multi-sink fan-out).
  */
object Sinks {

  /** K2: 27-column enriched CSV, canonical order, no header, minimal quoting
    * (Spark's csv writer quotes only when needed = csv.QUOTE_MINIMAL,
    * wsprnet_azi_calc.py:227). */
  def writeCsv27(df: DataFrame, path: String): Unit =
    df.select(SpotSchema.enriched27Columns.map(col): _*)
      .write.mode("overwrite").option("header", value = false).csv(path)

  /** K3: transactional batched JDBC append. One transaction per partition
    * with `batchsize`-row execute batches — the Spark-native equivalent of
    * psycopg2 execute_batch + single commit (ts_upload_batch.py:37-41).
    * Spark's JDBC writer quotes mixed-case identifiers via the dialect,
    * matching insert-spots.sql:1-2. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      props: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 1000): Unit =
    df.write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** At-rest layout for the 100 TB spot corpus: parquet partitioned by UTC
    * day (derived from Date). Day partitions turn the cursor/time filters
    * into partition pruning, and within-file min/max Spotnum stats prune
    * row groups for id-range scans. */
  def writeSpotsPartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("wd_date", to_date(from_unixtime(col("Date"))))
      .repartition(col("wd_date"))
      .sortWithinPartitions("Spotnum")
      .write.mode("append").partitionBy("wd_date").parquet(path)

  /** Quote a COLUMN name for hand-built SQL with the same dialect rules
    * Spark's JDBC writer uses in CREATE TABLE, so the MERGE references
    * resolve to the writer-created (case-exact) columns. Table names are the
    * opposite contract: Spark's writer passes them VERBATIM and lets the
    * database apply its own case normalization, so quoting a table here
    * would miss the table the writer created — [[sqlTableName]] instead
    * validates and passes through. */
  private def quoteColumn(url: String, name: String): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(name)

  /** Validate a table name for verbatim interpolation (Spark's own .jdbc
    * contract: pre-quote it yourself if you need case-sensitivity or a
    * reserved word). Rejects anything that could smuggle SQL out of the
    * identifier position when the name comes from untrusted config. */
  private def sqlTableName(name: String): String = {
    require(name.matches("""[A-Za-z0-9_.$"]+"""),
      s"illegal characters in table name: $name")
    name
  }

  /** Idempotent variant of [[jdbcAppend]]: stage the batch, then MERGE on the
    * key — re-delivered batches (at-least-once upstream) become no-ops, giving
    * exactly-once warehouse contents without coordinating with the cursor.
    * The reference is INSERT-only and duplicates on replay (SURVEY.md §3 E3);
    * this is the documented robustness upgrade.
    *
    * Identifier contract: `table` is interpreted exactly as Spark's own
    * `.jdbc(url, table)` writer interprets it — verbatim, with the database
    * applying its case rules — so the MERGE always hits the writer-created
    * table (pre-quote the name yourself for case-sensitive or reserved-word
    * targets, as you would with Spark). Column names (including `keyCol`)
    * are dialect-quoted to match the writer's case-exact CREATE TABLE.
    * Names are validated before interpolation, so an untrusted-config value
    * cannot smuggle SQL out of the identifier position.
    *
    * Concurrency caveat: idempotence is per re-delivered BATCH. Two upserts
    * of the same key running concurrently under READ COMMITTED can both pass
    * their WHEN NOT MATCHED probe and both insert; serialize writers per
    * target table (the ingest pipeline does — one foreachBatch writer), or
    * put a unique constraint on the key so the second MERGE fails instead of
    * duplicating. */
  def jdbcUpsert(df: DataFrame, url: String, table: String, keyCol: String,
      props: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 1000): Unit = {
    val target = sqlTableName(table)
    val conn = java.sql.DriverManager.getConnection(url, props)
    val exists =
      try { conn.createStatement().executeQuery(s"SELECT 1 FROM $target WHERE 1=0"); true }
      catch { case _: java.sql.SQLException => false }
    if (!exists) {
      conn.close()
      jdbcAppend(df, url, table, props, batchSize) // first batch creates the table
    } else {
      // unique per-call staging table: concurrent upserts into the same target
      // must not share (and overwrite) one staging name; dropped when done.
      // Short suffix — long names get identifier-truncated (e.g. Postgres 63
      // bytes), which would silently re-collide concurrent stagings. The base
      // strips quotes and schema qualifiers from the target so a pre-quoted
      // or qualified `table` still yields a plain valid staging identifier
      // (its own case/schema don't matter — it only lives for this call).
      val stagingBase = table.replace("\"", "").replace(".", "_")
      val staging = s"${stagingBase}_stg_${java.util.UUID.randomUUID().toString.take(8)}"
      try {
        df.write.mode("errorifexists").option("batchsize", batchSize).jdbc(url, staging, props)
        val cols = df.columns
        val quoted = cols.map(quoteColumn(url, _)).mkString(", ")
        val values = cols.map(c => s"s.${quoteColumn(url, c)}").mkString(", ")
        val key = quoteColumn(url, keyCol)
        val merge =
          s"""MERGE INTO $target t USING ${sqlTableName(staging)} s
             |ON t.$key = s.$key
             |WHEN NOT MATCHED THEN INSERT ($quoted) VALUES ($values)""".stripMargin
        conn.createStatement().executeUpdate(merge)
      } finally {
        try conn.createStatement().executeUpdate(s"DROP TABLE ${sqlTableName(staging)}")
        catch {
          case e: java.sql.SQLException =>
            System.err.println(s"[sink] leaked staging table $staging: ${e.getMessage}")
        }
        conn.close()
      }
    }
  }

  /** K4 shape: compressed spool-queue mirror. The reference queues bzip2'd
    * CSVs with unique epoch-suffixed names into a directory that an
    * independent uploader daemon drains (wsprnet-scraper.sh:94-141); the
    * engine's side of that contract is the atomic spool write — the uploader
    * stays a separate process. `batchTag` plays the epoch-suffix role
    * (unique per batch, monotonic). */
  def spoolCompressed(df: DataFrame, spoolDir: String, batchTag: Long): Unit =
    df.select(SpotSchema.enriched27Columns.map(col): _*)
      .write.mode("errorifexists")
      .option("header", value = false).option("compression", "bzip2")
      .csv(s"$spoolDir/batch_$batchTag")

  /** Bucketed at-rest layout — the storage-side half of every "only the
    * small table moves" claim in this library. `bucketBy(n, keys)` +
    * `sortBy(keys)` hash-partitions rows into a FIXED number of buckets on
    * the join/aggregation keys and sorts within each, so a later
    * equi-join or groupBy on those keys between two tables bucketed the
    * same way runs as a sort-merge join with no exchange on the key
    * (and, once buckets are compacted to one file each, no read-side
    * sort) — the co-location PageRank/CC/LSH simulate per-job with
    * `repartition(col).checkpoint` becomes a property of the DATA, paid
    * once at write time and amortized over every subsequent query.
    * At 100 TB this is the difference between shuffling the fact table
    * per join and never shuffling it at all.
    *
    * Spark's bucketing metadata lives in the catalog, so this writes a
    * TABLE (`saveAsTable`), not a bare path — callers point
    * `spark.sql.warehouse.dir` wherever the lake lives. Bucket count is
    * a layout contract: both sides of a co-located join must agree on it
    * (or divide evenly, with `spark.sql.bucketing.coalesceBucketsInJoin`).
    * BucketedJoinSpec pins the exchange-free join and aggregate plans. */
  def writeBucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketedTable needs bucket columns")
    require(buckets > 0, "writeBucketedTable needs a positive bucket count")
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** K5 shape: fan a single materialized batch out to several sinks without
    * recomputing the plan (the reference re-reads the CSV per mirror; here we
    * cache the batch once). */
  def fanOut(df: DataFrame, sinks: Seq[DataFrame => Unit]): Unit = {
    df.persist()
    try sinks.foreach(s => s(df))
    finally df.unpersist()
  }
}

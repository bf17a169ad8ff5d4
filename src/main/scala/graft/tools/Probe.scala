package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for hot-path decomposition (not part of the bench). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1000000
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dim = 64
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val idx = toks.select(col("doc_id"), pmod(xxhash64(col("token")), lit(dim.toLong)).as("idx"))
    val counts0 = idx.groupBy("doc_id", "idx").agg(count(lit(1)).as("c"))
    val counts = counts0.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("c")))).as("m"))
    val joined = docs.select(col("doc_id")).join(counts, Seq("doc_id"), "left")
    val vec = joined.select(col("doc_id"),
      transform(sequence(lit(0L), lit(dim.toLong - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L)).cast("double")).as("embedding"))
    for ((n, df) <- Seq("toks" -> toks, "idx" -> idx, "counts0" -> counts0,
        "counts" -> counts, "joined" -> joined, "vec" -> vec)) {
      force(df); println(s"$n: ${force(df)} ms")
    }
    val vecs = graft.operators.TextAnalysis.hashingVectorize(docs, 64)
      .withColumnRenamed("doc_id", "vec_id")
    val pairs = graft.operators.Dedup.embeddingNearDupPairs(vecs, 0.95)
    for (i <- 1 to 2) println(s"vectorize run $i: ${force(vecs)} ms")
    for (i <- 1 to 2) println(s"q46 run $i: ${force(pairs)} ms")
    // q13 decomposition: synth -> enrich (trig) -> formatted
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val spots = graft.sources.SpotSynth.fromEvents(events)
    val enriched = graft.operators.Enrich.enrich(spots)
    val formatted = graft.operators.Enrich.formatted(spots)
    val sortedF = graft.sources.SpotSource.sorted(formatted)
    // Parallelized variant: the sf fixtures are single-row-group parquet, so
    // the narrow enrich stage otherwise runs in ONE task.
    val eventsPar = events.repartition(32)
    val spotsPar = graft.sources.SpotSynth.fromEvents(eventsPar)
    val formattedPar = graft.operators.Enrich.formatted(spotsPar)
    val sortedPar = graft.sources.SpotSource.sorted(formattedPar)
    for ((n, df) <- Seq("spots" -> spots, "enrich(trig)" -> enriched,
        "formatted" -> formatted, "formatted+sort" -> sortedF,
        "spotsPar" -> spotsPar, "formattedPar" -> formattedPar,
        "formattedPar+sort" -> sortedPar)) {
      force(df); force(df); println(s"$n: ${force(df)} ms")
    }
    spark.stop()
  }
}

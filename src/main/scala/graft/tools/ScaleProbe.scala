package graft.tools

import graft.operators.{Audit, Bpe, Cdc, Classify, Dedup, Enrich, Experiment, Graph, LangModel, Packing, Pca, Pipeline, RangeJoin, Retrieval, Sampling, Similarity, Sketches, Stats, TextAnalysis}
import graft.sources.SpotSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: amplify the sf0.1 fixtures by K via id-offset unions and
  * measure the heavy operators, to validate the scaling claims in SCALING.md
  * with observed numbers rather than assertions. Not part of the driver
  * contract; run manually. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def amplify(df: DataFrame, idCols: Seq[String], step: Long): DataFrame =
      (0 until k).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * step)))
      }.reduce(_.unionByName(_))

    val dir = "/root/testdata/sf0.1"
    // Normalize ts to the integer-ns contract regardless of whether the
    // fixture shipped as TIMESTAMP(NANOS) (nanosAsLong -> raw long) or
    // TIMESTAMP(MICROS) (timestamp column) — the SparkEntry.t rule.
    def nsNormalize(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(TimestampType) =>
          df.withColumn("ts", unix_micros(col("ts")) * 1000L)
        case Some(TimestampNTZType) =>
          df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
        case _ => df
      }
    }
    val events = amplify(nsNormalize(spark.read.parquet(s"$dir/events.parquet")),
      Seq("event_id"), 1000000L)
    val docs = amplify(spark.read.parquet(s"$dir/documents.parquet"),
      Seq("doc_id"), 1000000L)

    // Optional comma-separated allowlist (SPARK_GRAFT_PROBE_ONLY): at 100x
    // the exact-pair ops die by design (documented failure mode), so deep
    // amplification runs select just the ops under study.
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def time(name: String)(f: => Long): Unit =
      if (only.forall(_.contains(name))) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s   rows=$n")
      }

    println(s"amplification x$k: events=${events.count()}, docs=${docs.count()}")
    time("enrich (events->27col)") {
      val e = Enrich.formatted(SpotSynth.fromEvents(events))
      e.select(xxhash64(e.columns.map(col): _*)).agg(count(lit(1))).first().getLong(0)
    }
    time("gap_audit bucketed") {
      Audit.gapAudit(events.filter(col("event_type") =!= "error"), "event_id")
        .collect().head.getLong(0)
    }
    time("ngram_jaccard") {
      Dedup.ngramJaccardPairs(docs, 3, 0.5).count()
    }
    time("minhash_lsh") {
      Dedup.minhashLshPairs(docs).count()
    }
    time("simhash") {
      Dedup.simhashPairs(docs).count()
    }
    val emb = amplify(spark.read.parquet(s"$dir/embeddings.parquet"),
      Seq("vec_id"), 1000000L)
    time("embed_exact_pairs") {
      Dedup.embeddingNearDupPairs(emb, 0.4).count()
    }
    time("embed_lsh_pairs") {
      Dedup.embeddingNearDupPairsLsh(emb, 0.4).count()
    }
    // -- round-6 additions: the operators whose 100 TB verdicts previously
    //    rested on plan-shape reasoning alone --------------------------------
    locally {
      // q53 split: candidate-pair generation vs star contraction
      val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("cc_pairs_upstream")(pairs.count())
      time("cc_star_contraction") {
        val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
        val n = labels.count()
        println(s"  cc rounds=$rounds")
        n
      }
      pairs.unpersist()
    }
    locally {
      // incremental CC maintenance, the q62 shape: the arriving "batch" is
      // the pairs touching a FIXED 500-doc slice (a real ingest delta),
      // while the at-rest corpus — and its pair set — grows with k. Warm =
      // rep-level contraction of the batch + broadcast relabel + labels
      // re-checkpoint; cold = the full star contraction. Pairs are
      // persisted so the upstream n-gram pipeline prices into neither side.
      def inSlice(c: org.apache.spark.sql.Column) =
        c < 1000000L && c % 100 === 0
      val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).select("a_id", "b_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val touched = inSlice(col("a_id")) || inSlice(col("b_id"))
      if (only.forall(s => s.contains("cc_warm_batch") ||
          s.contains("cc_cold_rebuild"))) {
        pairs.count()
        val labels = Dedup.connectedComponents(pairs.filter(!touched))
        time("cc_warm_batch") {
          Dedup.ccInsert(labels, pairs.filter(touched)).count()
        }
        time("cc_cold_rebuild") { Dedup.connectedComponents(pairs).count() }
      }
      pairs.unpersist()
    }
    // eval side stays the BASE corpus slice: a real eval set doesn't grow
    // with the training corpus, and the broadcast side must stay bounded
    val baseDocs = spark.read.parquet(s"$dir/documents.parquet")
    time("decontaminate") {
      Dedup.contaminatedBy(
        docs.filter(col("doc_id") % 10 =!= 0),
        baseDocs.filter(col("doc_id") % 10 === 0), 5).count()
    }
    time("pack_sequences") {
      val d = docs.select(
        concat(col("source"), lit("#"), expr("doc_id div 100").cast("string"))
          .as("pack_group"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Packing.packGreedy(d, "pack_group", "doc_id", "n_tokens", 512).count()
    }
    time("quota_sample") {
      // groups grow k-fold while the quota stays 30: exactly the bounded
      // top-k aggregate's scale case
      Sampling.quotaPerGroup(docs, "source", "doc_id", 30).count()
    }
    time("chunk_tokens") {
      TextAnalysis.chunkTokens(docs, 64, 48).count()
    }
    locally {
      // incremental LSH dedup: the index scales with the corpus (built once,
      // amortized); the probe is a FIXED base-corpus batch — its cost should
      // track batch size + collision count, never the corpus rescan
      val dir = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_lsh_x$k")
      val path = dir.toString
      try {
        val existing = docs.filter(col("doc_id") % 10 =!= 0)
        val incoming = baseDocs.filter(col("doc_id") % 10 === 0)
        time("lsh_index_build") {
          Dedup.writeLshIndex(existing, path)
          spark.read.parquet(s"$path/bands").count()
        }
        time("lsh_index_probe") {
          Dedup.minhashLshAgainstIndex(spark, path, incoming).count()
        }
      } finally { // a corpus-scale parquet tree must not outlive the probe
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir.toFile)
      }
    }
    locally {
      // BPE apply: merges trained once on the base corpus (merges are data,
      // fixed size); the amplified corpus goes through BOTH join strategies
      val merges = Bpe.fitMerges(baseDocs, numMerges = 200)
      time("bpe_apply_broadcast") {
        Bpe.subwordCounts(docs, merges,
          maxBroadcastTokens = Long.MaxValue).count()
      }
      time("bpe_apply_shuffle") {
        Bpe.subwordCounts(docs, merges, maxBroadcastTokens = 0L).count()
      }
    }
    // -- round-7 additions ---------------------------------------------------
    // same scan fan-out as the bench queries (tp): a raw one-file sf0.1 scan
    // is a single input partition, and without the repartition the x1 probe
    // measures partition starvation, not operator work (x1 dup_windows: 16 s
    // starved vs 1.4 s fanned — the bench number)
    val docsP = docs.repartition(spark.sparkContext.defaultParallelism)
    time("bm25_topk") {
      Retrieval.bm25TopK(docsP, graft.SparkEntry.Bm25Terms, 20).count()
    }
    time("bigram_lm_score") {
      LangModel.bigramNll(docsP).count()
    }
    time("cms_topk") {
      Sketches.cmsTopK(docsP, 4, 1024, 20).count()
    }
    time("dup_windows") {
      Dedup.dupWindowStats(docsP, 8).count()
    }
    time("weighted_sample") {
      // groups grow k-fold while k=30 stays fixed: the bounded top-k shape
      Sampling.weightedPerGroup(docsP, "source", "doc_id", "n_chars", 30).count()
    }
    time("hist_quantiles") {
      Sketches.histQuantiles(events, "event_type", "value", 5.0,
        Seq(25, 50, 75, 90, 99)).count()
    }
    time("pmi_collocations") {
      LangModel.collocationsTopK(docsP, 20, 5).count()
    }
    time("token_diversity") {
      TextAnalysis.tokenDiversity(docsP).count()
    }
    time("span_removal") {
      Dedup.removeDupSpans(docsP, 8).count()
    }
    time("hll_distinct") {
      Sketches.hllDistinct(docsP, 3, "source").count()
    }
    locally {
      // PQ: codebook train + encode (one-time, corpus-scale, amortized) vs
      // the ADC probe — compressed codes join broadcast partials, the
      // original vectors never read at query time
      val dir3 = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_pq_x$k")
      try {
        time("pq_index_build") {
          graft.operators.Pq.writePqIndex(emb, dir3.toString, m = 8, ksub = 16, dim = 64)
          spark.read.parquet(s"${dir3.toString}/codes").count()
        }
        time("pq_adc_topk") {
          graft.operators.Pq.pqTopKIndexed(spark, dir3.toString,
            spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 20),
            10, m = 8, dim = 64).count()
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir3.toFile)
      }
    }
    locally {
      // IVF-PQ: composed build vs the partition-pruned ADC probe
      val dir4 = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_ivfpq_x$k")
      try {
        time("ivfpq_index_build") {
          graft.operators.Pq.writeIvfPqIndex(emb, dir4.toString, nlist = 16,
            m = 8, ksub = 16, dim = 64)
          spark.read.parquet(s"${dir4.toString}/codes").count()
        }
        time("ivfpq_probe") {
          graft.operators.Pq.ivfPqTopK(spark, dir4.toString,
            spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 20),
            10, nprobe = 4).count()
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir4.toFile)
      }
    }
    time("range_join") {
      // the q72 pipeline on the amplified events: points AND intervals grow
      // with k, so this measures the bucketized equi-join (never a nested
      // loop) at growing sizes on both sides
      val ev = events.select(col("event_id"), expr("ts div 1000").as("t_us"), col("value"))
      val iv = ev.filter(col("event_id") % 100 === 0)
        .select(col("event_id").as("interval_id"), col("t_us").as("start_us"),
          (col("t_us") + (col("event_id") % 7 + 1) * lit(3600000000L)).as("end_us"))
      RangeJoin.pointInInterval(ev, "t_us", iv, "start_us", "end_us", 3600000000L)
        .groupBy("interval_id").agg(count(lit(1))).count()
    }
    time("knn_graph_banded") {
      // band-local candidate pairs grow ~quadratically with per-bucket
      // occupancy (fixed 2^planesPerBand buckets), so the knob to hold at
      // real scale is planesPerBand ~ log2(n); SPARK_GRAFT_KNN_PLANES
      // overrides it so deep amplification can demonstrate the scaled knob
      // (e.g. 12 planes at 100x) against the fixed-knob death
      val planes = sys.env.getOrElse("SPARK_GRAFT_KNN_PLANES", "8").toInt
      Similarity.knnGraph(emb, k = 3, bands = 4, planesPerBand = planes,
        dim = 64).count()
    }
    time("pipeline_curate_to_packs") {
      // the q89 composition end-to-end: corpus-sized until the mixture
      // stage, budget-bounded after it
      Pipeline.curateToPacks(docs).count()
    }
    time("semantic_clusters") {
      // q91: banded kNN graph -> mutual filter -> connected components;
      // the CC star contraction is the only super-knn-cost term
      val planes = sys.env.getOrElse("SPARK_GRAFT_KNN_PLANES", "8").toInt
      Similarity.mutualKnnClusters(emb, k = 3, bands = 4,
        planesPerBand = planes, dim = 64).count()
    }
    time("quantile_gate") {
      // q93: the per-source rank window is the only sort; bounds broadcast
      TextAnalysis.quantileLengthGate(docs, 10, 90).count()
    }
    time("bloom_build") {
      // the sketch collapse: grid rows bounded by mBits/32 at any key count
      Sketches.bloomBuild(docs.select(col("text")), "text", 4096, 4).count()
    }
    time("cdc_compact") {
      // user key space stays FIXED (5k users) while the changelog grows
      // k-fold: the map-side latest-wins combine is what the exchange sees
      Cdc.applyChangelog(
        events.select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", "d").otherwise("u").as("op")),
        Seq("user_id"), Seq("ts", "event_id"), "op").count()
    }
    time("bfs_hops_6") {
      // frontier BFS from 100 seeds over the same growing random graph:
      // per-round cost tracks the frontier's out-edges, not the graph
      val nNodes = 100000L * k
      val edges = events.select(
        pmod(xxhash64(col("event_id"), lit(1)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("event_id"), lit(2)), lit(nNodes)).as("dst"))
      val seeds = edges.select((col("src") % 1000L).as("node")).distinct().limit(100)
      Graph.shortestHops(edges, seeds, maxHops = 6).count()
    }
    time("hits_2rounds") {
      val nNodes = 100000L * k
      val edges = events.select(
        pmod(xxhash64(col("event_id"), lit(1)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("event_id"), lit(2)), lit(nNodes)).as("dst"))
      Graph.hits(edges, iters = 2).count()
    }
    time("keyness") {
      TextAnalysis.keyness(docs, col("lang") === "en").count()
    }
    time("ols2_per_group") {
      graft.operators.Stats.ols2(
        events.select(col("event_type"),
          (col("user_id") % 97).cast("double").as("x1"),
          (col("event_id") % 31).cast("double").as("x2"), col("value")),
        "event_type", "value", "x1", "x2").count()
    }
    time("triangles") {
      // same growing random graph as the pagerank probe: ~1M·k directed
      // edges over 100k·k nodes; wedge volume stays near-linear because the
      // orientation bounds every out-degree
      val nNodes = 100000L * k
      val edges = events.select(
        pmod(xxhash64(col("event_id"), lit(1)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("event_id"), lit(2)), lit(nNodes)).as("dst"))
      Graph.trianglesPerNode(edges).count()
    }
    time("pagerank_5rounds") {
      // random graph growing WITH the amplification: ~1M·k edges over
      // 100k·k nodes (avg degree ~20 after symmetrize) — node AND edge
      // count scale linearly in k, so this measures the per-round
      // edges⋈ranks join + contribution aggregate at growing graph size
      val nNodes = 100000L * k
      val edges = Graph.symmetrize(events.select(
        pmod(xxhash64(col("event_id"), lit(1)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("event_id"), lit(2)), lit(nNodes)).as("dst")))
      Graph.pageRank(edges, 5).count()
    }
    locally {
      // incremental maintenance: fold a FIXED-size edge batch into warm
      // checkpointed rank state vs recomputing the grown graph cold. The
      // warm path's per-batch cost = batch-sized anti-join + degree delta
      // + one merged-edge re-checkpoint (compaction) + 2 rounds, vs the
      // cold path's full init + 5 rounds.
      val nNodes = 100000L * k
      val all = Graph.symmetrize(events.select(
        pmod(xxhash64(col("event_id"), lit(1)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("event_id"), lit(2)), lit(nNodes)).as("dst")))
      val batch = Graph.symmetrize(events.limit(10000).select(
        pmod(xxhash64(col("event_id"), lit(3)), lit(nNodes)).as("src"),
        pmod(xxhash64(col("event_id"), lit(4)), lit(nNodes)).as("dst")))
      if (only.forall(s => s.contains("pagerank_warm_batch") ||
          s.contains("pagerank_cold_rebuild"))) {
        val st = Graph.rankRounds(Graph.rankInit(all), 5)
        time("pagerank_warm_batch") {
          Graph.rankInsert(st, batch, rounds = 2).ranks.count()
        }
        time("pagerank_cold_rebuild") {
          Graph.pageRank(all.union(batch).distinct(), 5).count()
        }
      }
    }
    locally {
      // SemDeDup: cell build (one-time, corpus-scale, amortized) vs the
      // cell-local pair scan — the analogue of the LSH index build/probe split
      val dir2 = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_sem_x$k")
      try {
        time("semdedup_cell_build") {
          Similarity.writeIvfIndex(emb, dir2.toString, nlist = 16)
          spark.read.parquet(s"${dir2.toString}/vectors").count()
        }
        time("semdedup_pairs") {
          Dedup.semanticNearDupPairs(spark, dir2.toString, 0.4).count()
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir2.toFile)
      }
    }
    time("pca_3iters") {
      val emb = amplify(spark.read.parquet(s"$dir/embeddings.parquet"),
        Seq("vec_id"), 1000000L)
      Pca.pcaTopComponent(emb, "embedding", 64, 3).count()
    }
    time("textrank_keywords") {
      TextAnalysis.textRankKeywords(docs, 2, 20).count()
    }
    time("attribution_72h") {
      // amplify USERS too: k x the population, not k x per-user density
      // (offsetting only event_id would square the per-user pairing)
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val normTs = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => raw
        case _ => raw.withColumn("ts",
          unix_micros(col("ts").cast("timestamp")) * 1000L)
      }
      // materialize the amplified input once: attribution references the
      // frame from both join sides, and a k-branch union plan recomputed
      // twice would measure the harness, not the operator
      val tmp = java.nio.file.Files.createTempDirectory("attr-probe")
      try {
        amplify(normTs, Seq("event_id", "user_id"), 1000000L)
          .write.mode("overwrite").parquet(tmp.toString)
        val ev = spark.read.parquet(tmp.toString)
        Experiment.attribution(ev, "user_id", "event_type", "ts",
          "event_id", "purchase", Seq("click", "view"), 259200000000000L).count()
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(tmp.toFile)
      }
    }
    time("label_noise_nb") {
      Classify.labelNoiseReport(docs.select(col("doc_id"),
        col("lang").as("label"), col("text"))).count()
    }
    time("image_ahash") {
      val media = graft.operators.Multimodal.synthMedia(spark, docs)
      graft.operators.Multimodal.imageHashes(spark, media).count()
    }
    time("kn_score") {
      LangModel.kneserNeyNll(docs).count()
    }
    time("link_prediction") {
      // the events user->user co-occurrence graph (users sharing an event
      // type+hour) — denser than the doc near-dup graph, so the wedge cap
      // is actually exercised
      val e = events.filter(col("value").isNotNull)
        .select(col("user_id").as("src"),
          (col("user_id") + expr("ts div 3600000000000") % 97 + 1).as("dst"))
      Graph.linkPrediction(e).count()
    }
    time("changepoint") {
      graft.operators.TimeSeries.changepoint(events, "event_type", "ts",
        "value", "event_id").count()
    }
    time("zipf_readability") {
      TextAnalysis.zipfFit(docs).count() +
        TextAnalysis.readability(docs).agg(count(lit(1))).first().getLong(0)
    }
    time("balance_entropy") {
      graft.operators.Dq.balanceReport(docs, Seq("lang", "source")).count() +
        graft.operators.Dq.balanceReport(events,
          Seq("event_type", "user_id")).count()
    }
    time("copurchase_rfm") {
      val a = graft.operators.Association.itemPairSimilarity(
        events.select(col("user_id").as("basket"),
          (col("event_id") % 500).as("item")), "basket", "item", 2).count()
      val b = graft.operators.Warehouse.rfm(events, "user_id", "ts", "value")
        .count()
      a + b
    }
    time("canonical_ndcg") {
      // canonical pick rides the measured CC pipeline + one cluster window;
      // ndcg is label-set-sized after the bm25 probe's retrieval
      val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).select("a_id", "b_id")
      val cc = Dedup.connectedComponents(pairs)
      val a = Dedup.canonicalPick(cc,
        docs.withColumn("q", TextAnalysis.qualityScore(col("text"))), "q")
        .count()
      val res = Retrieval.bm25TopK(docs, Seq("spark", "vector", "stream"), 20)
        .select(lit("q0").as("qid"), col("doc_id").as("item"), col("rank"))
      val lab = docs.select(col("doc_id").as("item"),
        lit(1L).as("rel")).limit(5000).withColumn("qid", lit("q0"))
      a + Retrieval.ndcgAtK(res, lab, 10).count()
    }
    time("skew_reshard") {
      val a = graft.operators.Layout.skewReport(events, Seq("user_id"), 64)
        .count()
      val b = graft.operators.Layout.reshardPlan(events, "event_id", 8, 12)
        .count()
      a + b
    }
    time("bradley_terry") {
      val ev = events.select(col("event_id"), col("event_type"), col("value"))
      val nxt = ev.select((col("event_id") - 1).as("event_id"),
        col("event_type").as("t2"), col("value").as("v2"))
      val win = col("value") > col("v2") ||
        (col("value") === col("v2") && col("event_type") < col("t2"))
      val m = ev.join(nxt, "event_id").filter(col("event_type") =!= col("t2"))
        .select(when(win, col("event_type")).otherwise(col("t2")).as("winner"),
          when(win, col("t2")).otherwise(col("event_type")).as("loser"))
      Experiment.bradleyTerry(m).count()
    }
    time("quantile_normalize") {
      // persisted input: the operator is multi-pass and the k-way-union
      // harness would otherwise multiply the union cost into the number
      val ev = events.filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        ev.count()
        Stats.quantileNormalize(ev, "event_type", "value", "event_id", 10.0)
          .agg(count(lit(1))).first().getLong(0)
      } finally { ev.unpersist(); () }
    }
    time("interarrival_ks") {
      graft.operators.TimeSeries.interarrivalKs(events, "event_type", "ts",
        "event_id").count()
    }
    time("winsorize_gini") {
      val w = Stats.winsorizedMeans(events, "event_type", "value").count()
      val per = events.filter(col("value").isNotNull)
        .groupBy(col("event_type").as("grp"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("x"))
      w + Stats.giniPerGroup(per, "grp", "x").count()
    }
    time("group_quantiles_mad") {
      // multi-pass operators re-read their input once per stage; the
      // k-way-union probe harness must materialize it or the union cost
      // multiplies into the number (the r8b attribution lesson) — real
      // inputs are at-rest parquet where the re-read is a cheap scan
      val dv = docs.select(col("source"),
          TextAnalysis.tokenCount(col("text")).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ev = events.filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        dv.count(); ev.count()
        val q = Stats.exactQuantilesPerGroup(dv, "source", "v",
          Seq(0.25, 0.5, 0.9)).count()
        q + Stats.madPerGroup(ev, "event_type", "value").count()
      } finally { dv.unpersist(); ev.unpersist(); () }
    }
    time("containment_pairs") {
      Dedup.containmentPairs(docs, 3, 0.8).count()
    }
    time("self_bleu") {
      val d = docs.select(col("doc_id"), col("source"), col("text"))
      val pairs = d.alias("a").join(d.alias("b"),
          col("a.source") === col("b.source") &&
            col("b.doc_id") === col("a.doc_id") + 20)
        .select(col("a.doc_id").as("pid"), col("a.text").as("cand"),
          col("b.text").as("ref"))
      TextAnalysis.bleuPairs(pairs, "pid", "cand", "ref", 2).count()
    }
    time("rfm_bucketed") {
      graft.operators.Warehouse.rfm(
        events.filter(col("value").isNotNull).select(col("user_id"),
          col("ts"), col("value")), "user_id", "ts", "value").count()
    }

    time("html_extract") {
      TextAnalysis.synthHtml(docs)
        .select(col("doc_id"),
          TextAnalysis.htmlExtract(col("html")).as("clean"))
        .agg(sum(length(col("clean")))).collect()
      docs.count()
    }
    time("domain_cap") {
      TextAnalysis.domainCap(
        TextAnalysis.synthUrls(docs).select(col("doc_id"), col("n_chars"),
          TextAnalysis.urlHost(col("url")).as("host")),
        "host", col("n_chars"), k = 2).count()
    }

    // -- round-11 additions: the daemon fold + gate family -------------------
    locally {
      // perturbed amplification (the Sf1Ladder convention: copy 0 verbatim,
      // clone copies spread per-dim) so the cosine gate measures 10x MORE
      // DATA, not 10x-clone cliques of the same vectors
      val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
      val embP = (0 until k).map { i =>
        val d = emb0.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        if (i == 0) d else d.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            (x * (lit(1.0f) + ((lit(i) * 31 + j * 7) % 13 - 6)
              .cast("float") / 100.0f)).cast("float")))
      }.reduce(_.unionByName(_))
      val dir5 = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_ivfd_x$k")
      try {
        val base = embP.filter(col("vec_id") % 10 =!= 0)
        val batch = embP.filter(col("vec_id") % 10 === 0)
        time("ivf_daemon_base_build") {
          Similarity.writeIvfIndex(base, dir5.toString, nlist = 16)
          spark.read.parquet(s"${dir5.toString}/vectors").count()
        }
        time("emb_gate_verdicts") {
          Similarity.embGateVerdicts(spark, dir5.toString, batch,
            threshold = 0.95, nprobe = 2).count()
        }
        time("ivf_fold") {
          Similarity.ivfInsert(spark, dir5.toString, batch, 1L)
          spark.read.parquet(s"${dir5.toString}/vectors").count()
        }
        time("ivf_retrain") {
          Similarity.ivfRetrain(spark, dir5.toString, nlist = 16)
          // count the NEW version root the retrain published
          spark.read.parquet(
            s"${Similarity.ivfRoot(spark, dir5.toString)}/vectors").count()
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir5.toFile)
      }
      val dir5b = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_ivfpqd_x$k")
      try {
        val base = embP.filter(col("vec_id") % 10 =!= 0)
        val batch = embP.filter(col("vec_id") % 10 === 0)
        time("ivfpq_daemon_base_build") {
          graft.operators.Pq.writeIvfPqIndex(base, dir5b.toString, nlist = 16)
          spark.read.parquet(s"${dir5b.toString}/codes").count()
        }
        time("ivfpq_fold") {
          graft.operators.Pq.ivfPqInsert(spark, dir5b.toString, batch, 1L)
          spark.read.parquet(s"${dir5b.toString}/codes").count()
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir5b.toFile)
      }
    }
    locally {
      // media daemon: decode runs ONCE into a cached hash frame (decode
      // cost is image_ahash's row above) so the fold + gate measure the
      // hash-only index work on their own — the 100 TB argument is exactly
      // that the gates never touch payload bytes again
      val hashes = graft.operators.Multimodal.imageHashes(spark,
          graft.operators.Multimodal.synthMedia(spark, docs)).toDF()
        .select(col("doc_id"), col("ahash")).persist()
      if (only.forall(s => s.contains("media_hash_fold") ||
          s.contains("media_gate_verdicts"))) hashes.count()
      val dir6 = java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_media_x$k")
      try {
        val base = hashes.filter(col("doc_id") % 10 =!= 0)
        val batch = hashes.filter(col("doc_id") % 10 === 0)
        time("media_hash_fold") {
          graft.operators.Multimodal.hashIndexInsert(spark, dir6.toString,
            base, 0L)
          graft.operators.Multimodal.servedHashes(spark, dir6.toString).count()
        }
        time("media_gate_verdicts") {
          graft.operators.Multimodal.mediaGateVerdicts(spark, dir6.toString,
            batch, maxDist = 6).count()
        }
      } finally {
        hashes.unpersist()
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(dir6.toFile)
      }
    }
    spark.stop()
  }
}

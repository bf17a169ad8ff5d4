package graft.operators

import graft.functions.ArrayMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale corpus:
  *
  *  - exact (hash-groupBy on a normalization key);
  *  - n-gram Jaccard pairs via an inverted-index self-join (exact, but
  *    O(sum of bucket^2) — bounded by dropping ultra-common grams);
  *  - MinHash + banded LSH (scale path: candidates via band-bucket join, then
  *    exact verification only on candidates);
  *  - SimHash (64-bit signature; near-dups = small Hamming distance, found by
  *    16-bit chunk bucketing — pigeonhole guarantees recall for distance <= 3);
  *  - embedding cosine near-dup (exact pairwise; LSH variant in Similarity).
  *
  * Every variant emits candidate pairs with doc_id ordering (a < b) so results
  * are deterministic and oracle-comparable.
  */
object Dedup {

  /** Exact dedup groups by `key`: representative = min(doc_id). */
  def exactGroups(docs: DataFrame, key: Column): DataFrame =
    docs.groupBy(key.as("dup_key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-grams of `text` (space-tokenized), distinct, as an array column. */
  def wordNGrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val ids = sequence(lit(0), size(toks) - n) // inclusive => size-n+1 grams
    val grams = transform(ids, i =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard similar pairs (jaccard >= threshold), via inverted
    * index: explode grams -> self-join on gram -> count common -> filter.
    * `maxGramDocs` drops grams present in more than that many docs (stopword
    * shingles) to bound bucket blowup at scale; dropped grams are excluded
    * from BOTH the common count and the per-doc gram counts, keeping the
    * jaccard exact over the filtered gram space.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      maxGramDocs: Long = 1000000L): DataFrame = {
    val grams = docs.select(col("doc_id"), explode(wordNGrams(col("text"), n)).as("gram"))
    val kept = grams.join(
      grams.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxGramDocs).select("gram"),
      "gram")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val withSize = kept.join(sizes, "doc_id")
    val a = withSize.select(col("doc_id").as("a_id"), col("gram"), col("n_grams").as("a_n"))
    val b = withSize.select(col("doc_id").as("b_id"), col("gram"), col("n_grams").as("b_n"))
    a.join(b, Seq("gram")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("a_n") + col("b_n") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("common"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: numHashes min-values of seeded xxhash64 over the gram
    * set, as an array column. */
  def minhashSignature(grams: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(grams, g => xxhash64(g, lit(i))))): _*)

  /** MinHash-LSH near-dup pairs: band the signature (bands x rowsPerBand =
    * numHashes), bucket-join on (band index, band hash), then verify exact
    * jaccard on the candidate pairs only. Output: pairs with estimated and
    * exact jaccard >= threshold.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.35): DataFrame = {
    val rowsPer = numHashes / bands
    val withGrams = docs.select(col("doc_id"), wordNGrams(col("text"), n).as("grams"))
      .filter(size(col("grams")) > 0)
    val withSig = withGrams.withColumn("sig", minhashSignature(col("grams"), numHashes))
    val banded = withSig.select(col("doc_id"), col("grams"),
      explode(array((0 until bands).map(bnd =>
        struct(lit(bnd).as("band"),
          xxhash64(slice(col("sig"), bnd * rowsPer + 1, rowsPer)).as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("grams"), col("bb.band"), col("bb.bucket"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.grams").as("a_grams"), col("y.grams").as("b_grams"))
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("common", size(array_intersect(col("a_grams"), col("b_grams"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("a_grams")) + size(col("b_grams")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("common"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over the token multiset: bit b of the signature is the sign
    * of sum over tokens of +-1 according to bit b of xxhash64(token). */
  def simhash(text: Column): Column = {
    val toks = split(text, " ")
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (< 16-bit
    * chunk count), via pigeonhole chunk bucketing: any pair within distance 3
    * agrees on at least one of the four 16-bit chunks. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(cNo => struct(lit(cNo).as("c"),
        shiftright(col("sig"), cNo * 16).bitwiseAND(0xFFFFL).as("v"))): _*)).as("ch"))
      .select(col("doc_id"), col("sig"), col("ch.c"), col("ch.v"))
    chunked.as("x").join(chunked.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact embedding cosine near-dup pairs (cos >= threshold). O(n^2) baseline;
    * the LSH-bucketed scale path is Similarity.lshTopK's bucketing. */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", ArrayMath.cosineKey(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token statistics, quality scoring, heuristic language scoring, and
  * rolling-hash document fingerprinting. All pure narrow column expressions —
  * no shuffle except the explicit aggregations — so they scale linearly.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a")

  /** Marker-word profiles for heuristic language scoring. (The fixture corpus
    * shares one vocabulary across langs, so this scores style markers
    * deterministically rather than recovering the fixture's lang label.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("batch", "window"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "query"),
    "fr" -> Seq("fast", "slow"),
    "zh" -> Seq("join", "merge"))

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def countIn(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words))).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Composite quality score in [0,1]:
    * 0.4 * min(1, tokens/100) + 0.3 * (1 - stopword_ratio) + 0.3 * distinct_ratio.
    * Mirrored verbatim in the DuckDB oracle. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stop = countIn(text, Stopwords).cast("double")
    val dist = distinctTokenCount(text).cast("double")
    round(lit(0.4) * least(lit(1.0), n / 100) +
      lit(0.3) * (lit(1.0) - stop / n) + lit(0.3) * (dist / n), 6)
  }

  /** Deterministic argmax over marker-hit counts; ties resolve to the
    * alphabetically-first language (LangMarkers is alphabetical). */
  def langPredict(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, words) => (lang, countIn(text, words)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.reverse.tail.foldLeft(lit(scored.reverse.head._1)) {
      case (acc, (lang, score)) => when(score === best, lit(lang)).otherwise(acc)
    }
  }

  /** Polynomial rolling hash over the document's characters:
    * h = fold(chars, 0, (acc, c) => (acc*131 + ascii(c)) mod (2^31-1)).
    * Stable across engines (pure integer arithmetic); native codegen loop
    * (graft.functions.expressions.PolyHash). */
  def fingerprint(text: Column): Column =
    graft.functions.expressions.TextFunctions.poly_hash(text)

  /** Built-in HOF formulation of [[fingerprint]] — same values, interpreted
    * eval; kept as a semantic cross-check for the native expression. */
  def fingerprintHof(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, x) => (acc * 131 + x) % 2147483647L)

  /** Canonical text normalization for dedup keys: lowercase, strip everything
    * but [a-z0-9 ], collapse whitespace runs, trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** BPE-ish subword count: tokens are runs of letters, runs of digits, or
    * single other non-space characters — the usual pre-tokenizer shape, a
    * deterministic stand-in for a learned BPE vocab. Counted via
    * regexp_count (mirrored with DuckDB's regexp_extract_all length). */
  val SubwordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(SubwordPattern), lit(0))).cast("long")

  /** PII scrubbing patterns: email addresses and international-ish phone
    * numbers. Deliberately restricted to the regex subset where Java
    * (Spark codegen) and RE2 (DuckDB) agree — character classes,
    * alternation, bounded repetition; no lookaround, no backreferences. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9 -]{6,}[0-9]"

  /** Deterministic HTML wrapping of a document frame — the fixture
    * synthesizer for [[htmlExtract]] (the [[Multimodal.synthMedia]]
    * convention: derive the raw container from document fields so the
    * DuckDB oracle can rebuild the identical input and replay the whole
    * extraction as SQL). The template exercises every extraction rule:
    * a style block, a script block CONTAINING a bare `<` and quoted
    * entities, an HTML comment, nav/footer boilerplate tags around real
    * text, and literal entities in the body. */
  def synthHtml(docs: DataFrame): DataFrame =
    docs.withColumn("html", concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), col("doc_id"),
      lit("</title><style>body{font-size:"), pmod(col("doc_id"), lit(7)),
      lit("px}</style><script>var x="), col("doc_id"),
      lit("; if (x < 10) { y = \"&amp;\"; }</script></head><body>"),
      lit("<!-- build "), col("doc_id"), lit(" --><nav><a href=\"/home\">"),
      lit("home</a><a href=\"/about\">about</a></nav><p>"), col("text"),
      lit(" &amp; entities &lt;b&gt;bold&#39;s&quot;quote&nbsp;end</p>"),
      lit("<footer>(c) "), col("source"), lit("</footer></body></html>")))

  /** Main-content extraction from raw HTML — the boilerplate-stripping
    * step every web-crawl curation pipeline runs before any text gate.
    * Fixed rule order (the oracle replays it verbatim):
    *   1. script blocks, 2. style blocks, 3. comments (all three with
    *      (?s) non-greedy spans, so a bare `<` or entity INSIDE a script
    *      never leaks), 4. every remaining tag -> space,
    *   5. entity decode with `&amp;` LAST (so `&amp;lt;` decodes to the
    *      literal `&lt;` the author wrote, never double-decodes),
    *   6. whitespace collapse + trim.
    * Narrow codegen'd regexp chain — linear in characters, zero shuffle;
    * patterns stay in the Java/RE2 common subset so the DuckDB mirror is
    * bit-identical. A DOM-fidelity build would swap this body for a real
    * parser behind the same Column signature. */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Deterministic URL column for a document frame — [[synthHtml]]'s
    * sibling synthesizer, so the URL curation family below is
    * oracle-replayable from the same table. */
  def synthUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(
      lit("https://"), col("source"), lit("-"), pmod(col("doc_id"), lit(3)),
      lit(".example.com/p/"), col("doc_id"), lit("?ref="), col("lang")))

  /** URL components via anchored regexp_extract in the Java/RE2 common
    * subset (portable to the DuckDB oracle): scheme-stripped host, the
    * last host label (tld), the registered-ish domain (last two labels),
    * and the path without query. Unmatched parts extract as ''. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)
  def urlTld(url: Column): Column =
    regexp_extract(urlHost(url), "\\.([a-z0-9-]+)$", 1)
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)
  def urlPath(url: Column): Column =
    regexp_extract(url, "^[a-z]+://[^/?#]+(/[^?#]*)", 1)

  /** Per-domain document cap — the CCNet/Gopher-style crawl-curation rule:
    * a single hot site must not dominate the corpus, so each domain keeps
    * only its `k` best documents by (`quality` DESC, doc_id ASC — total
    * order, replay-stable). Plans through the bounded-heap TopKPerKey
    * execs ([[graft.plans.TopK.perKey]]): map-side <= k rows per domain
    * before the exchange, never a per-domain sort — the same plan shape
    * at 148 domains or 10^8. Output: the kept rows + their `rank`. */
  def domainCap(docs: DataFrame, domainCol: String, quality: Column,
      k: Int): DataFrame =
    graft.plans.TopK.perKey(docs.withColumn("__q", quality),
        Seq(col(domainCol)), Seq(col("__q").desc, col("doc_id").asc), k)
      .drop("__q")

  /** Redact emails then phones with typed placeholder tokens. Narrow,
    * codegen'd regexp_replace (global) — linear in characters, no shuffle.
    * Email runs first so a phone-like digit run inside an address can't be
    * half-redacted. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of PII matches per kind (profiling / gating before redaction). */
  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long"))

  /** Feature-hashing vectorizer: token counts hashed into a fixed `dim`-wide
    * dense double array (the hashing trick) — turns text into an embedding
    * column compatible with every vector operator (cosine near-dup, ANN,
    * vec_dot), with no vocabulary to build or broadcast. One explode + one
    * groupBy; the array assembles from a per-doc index->count map.
    *
    * `tokenHash` picks the slotting hash: xxhash64 (default, fastest mixing)
    * or [[graft.functions.expressions.TextFunctions.poly_hash]] when the
    * result must be reproducible by an external SQL engine (the DuckDB
    * oracle mirrors the poly_hash variant bit-for-bit). */
  def hashingVectorize(docs: DataFrame, dim: Int,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "") // split artifacts: empty/whitespace-only text
      .select(col("doc_id"), pmod(tokenHash(col("token")), lit(dim.toLong)).as("idx"))
      .groupBy("doc_id", "idx").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("c")))).as("m"))
    // left join keeps token-less docs as zero vectors (element_at(null,_) -> 0)
    docs.select(col("doc_id")).join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(dim.toLong - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double")).as("embedding"))
  }

  /** Within-document repetition profile — the standard pretraining-corpus
    * repetition filters (boilerplate/template detection): the fraction of
    * word n-gram OCCURRENCES that are repeats of an earlier n-gram in the
    * same document, and the share of tokens taken by the single most
    * frequent token. Both are integer-ratio deterministic, so the DuckDB
    * oracle reproduces them exactly. Linear: one narrow per-row gram pass
    * plus one token-count aggregation keyed by doc_id. */
  def repetitionStats(docs: DataFrame, n: Int = 3): DataFrame = {
    val top = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("mx"), sum(col("c")).as("n_tok"))
      .select(col("doc_id"),
        round(col("mx").cast("double") / col("n_tok"), 6).as("top_token_ratio"))
    // gram pass as explode + codegen aggregates: the scalar formulation
    // (size(array_distinct(grams))/size(grams) per row) re-evaluates the
    // interpreted gram-building lambda per referencing expression and runs
    // it all on the scan's partitioning; exploding builds each doc's gram
    // array once and pushes the counting into a shuffled hash aggregate
    val toks = split(col("text"), " ")
    val gramRows = docs
      .select(col("doc_id"), explode(when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val rep = gramRows.groupBy("doc_id")
      .agg(count(lit(1)).as("total"), count_distinct(col("gram")).as("dist"))
      .select(col("doc_id"),
        round(lit(1.0) - col("dist").cast("double") / col("total"), 6)
          .as("ngram_repetition"))
    // docs too short for any n-gram produce no gram rows -> repetition 0
    docs.select(col("doc_id")).join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ngram_repetition"), lit(0.0)).as("ngram_repetition"))
      .join(top, Seq("doc_id"))
  }

  /** Gopher-style rule gate (Rae et al. '21 §A1.1, the MassiveText
    * quality filters — the de-facto standard pretraining hygiene set),
    * restricted to the rules whose signals exist in a whitespace-token
    * corpus: word-count bounds, mean-word-length bounds, a minimum
    * alphabetic-word fraction, a required stopword-hit count, and a
    * top-token concentration cap (the [[repetitionStats]] measure as a
    * hard rule). Every measure is an exact integer ratio or a round-6
    * double, so the gate replays in SQL; each rule reports individually
    * (the tuning view) alongside the conjunction.
    *
    * Scale shape: one token explode + two word-count-shaped aggregates
    * keyed by doc — map-side combined, nothing wider than (doc, token)
    * on any exchange. Output: (doc_id, n_words, mean_word_len,
    * alpha_ratio, stop_hits, top_token_share, pass). */
  def gopherGate(docs: DataFrame, minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.8, minStopHits: Int = 2,
      maxTopTokenShare: Double = 0.2): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val perTok = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val perDoc = perTok.groupBy("doc_id").agg(
      sum(col("c")).as("n_words"),
      max(col("c")).as("top_c"))
    val lens = toks.groupBy("doc_id").agg(
      sum(length(col("t")).cast("long")).as("chars"),
      sum(when(col("t").rlike("[A-Za-z]"), 1L).otherwise(0L)).as("alpha"),
      sum(when(col("t").isin(Stopwords: _*), 1L).otherwise(0L)).as("stop_hits"))
    perDoc.join(lens, "doc_id")
      .select(col("doc_id"), col("n_words"),
        round(col("chars").cast("double") / col("n_words").cast("double"), 6)
          .as("mean_word_len"),
        round(col("alpha").cast("double") / col("n_words").cast("double"), 6)
          .as("alpha_ratio"),
        col("stop_hits"),
        round(col("top_c").cast("double") / col("n_words").cast("double"), 6)
          .as("top_token_share"))
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen &&
          col("alpha_ratio") >= minAlphaRatio &&
          col("stop_hits") >= minStopHits &&
          col("top_token_share") <= maxTopTokenShare)
  }

  /** BLEU-style n-gram overlap per (candidate, reference) pair — the
    * classic MT metric (Papineni et al., ACL'02) as a corpus operator:
    * per pair, modified n-gram precision p_n = Σ_g min(cnt_cand(g),
    * cnt_ref(g)) / |cand n-grams| for n = 1..maxN, geometric mean with
    * the brevity penalty BP = min(1, e^(1 − ref_len/cand_len)). In a
    * data pipeline this scores paraphrase/near-copy pairs, and with
    * within-corpus pairings it is SELF-BLEU (Zhu et al. '18) — the
    * corpus-diversity readout (high self-BLEU = templated text).
    *
    * Determinism: clipped counts and lengths are exact integers; each
    * precision rounds to 6; every transcendental follows the round-6 libm
    * rule (round(ln p, 6) summed, round(exp ·, 6) once) — the q78/q168
    * convention, replayable in SQL. Any p_n = 0 makes bleu 0 (the
    * standard degenerate case, no ln(0) evaluated).
    *
    * Scale shape: one (pair, n, gram)-keyed count per side (word-count
    * aggregates, map-side combined), one equi-join on the gram key, one
    * per-(pair, n) collapse, one per-pair collapse — all narrow or
    * key-partitioned; nothing pair-quadratic. Output: (pair id, cand_len,
    * ref_len, p1..pmaxN, bleu). */
  def bleuPairs(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, "maxN in [1, 4]")
    def gramsAll(c: Column, n: Int): Column = {
      val toks = split(c, " ")
      when(size(toks) >= n, transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    }
    def sideCounts(c: String, out: String) = (1 to maxN).map { n =>
      pairs.select(col(idCol).as("pid"), explode(gramsAll(col(c), n)).as("gram"))
        .groupBy("pid", "gram").agg(count(lit(1)).as(out))
        .withColumn("n", lit(n))
    }.reduce(_.unionByName(_))
    val cand = sideCounts(candCol, "cc")
    val ref = sideCounts(refCol, "rc")
    val perN = cand.join(ref, Seq("pid", "n", "gram"), "left")
      .groupBy("pid", "n")
      .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("clipped"),
        sum(col("cc")).as("total"))
      .withColumn("p", round(col("clipped").cast("double") /
        col("total").cast("double"), 6))
    val lens = pairs.select(col(idCol).as("pid"),
      size(split(col(candCol), " ")).cast("long").as("cand_len"),
      size(split(col(refCol), " ")).cast("long").as("ref_len"))
    val pCols = (1 to maxN).map(n =>
      max(when(col("n") === n, col("p"))).as(s"p$n"))
    val aggCols = pCols :+ min(col("p")).as("pmin") :+
      sum(when(col("p") > 0.0, round(log(col("p")), 6))).as("slog") :+
      count(lit(1)).as("kn")
    val perPair = perN.groupBy("pid").agg(aggCols.head, aggCols.tail: _*)
    val bp = when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(round(exp(lit(1.0) - col("ref_len").cast("double") /
        col("cand_len").cast("double")), 6))
    // a pair too short for every order (kn < maxN) or with a zero
    // precision scores 0 — no ln(0) is ever evaluated
    val bleu = when(col("pmin") > 0.0 && col("kn") === maxN,
        round(bp * round(exp(col("slog") / maxN), 6), 6))
      .otherwise(lit(0.0))
    lens.join(perPair, Seq("pid"), "left")
      .select(Seq(col("pid").as(idCol), col("cand_len"), col("ref_len")) ++
        (1 to maxN).map(n => coalesce(col(s"p$n"), lit(0.0)).as(s"p$n")) :+
        coalesce(bleu, lit(0.0)).as("bleu"): _*)
  }

  /** Token-window chunking with overlap — the standard context-window /
    * retrieval chunker: windows of `chunkSize` tokens starting every
    * `stride` tokens (overlap = chunkSize - stride; stride = chunkSize means
    * disjoint windows), the final window shorter when the document runs out.
    * Output: (doc_id, chunk_id, chunk, n_tokens), chunk_id 0-based in
    * document order.
    *
    * Scale shape: pure narrow codegen — one `sequence`/`transform`/`slice`
    * expression per row then a posexplode; no shuffle at all, so it
    * pipelines into whatever consumes the chunks (embedding, packing,
    * dedup). Chunk counts are data-dependent but bounded per row by
    * n_tokens / stride + 1. */
  def chunkTokens(docs: DataFrame, chunkSize: Int, stride: Int,
      textCol: String = "text"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in 1..chunkSize: $stride")
    docs
      .select(col("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(toks) - 1, $stride),
           |  s -> struct(array_join(slice(toks, s + 1, $chunkSize), ' ') AS txt,
           |              size(slice(toks, s + 1, $chunkSize)) AS n))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.txt").as("chunk"), col("col.n").cast("long").as("n_tokens"))
  }

  /** Per-document top-k keywords by smoothed TF-IDF:
    * score = tf * ln((N + 1) / (df + 1)), rounded to 6 decimals so rank
    * order can't flip on libm ulp differences (rank ties break by token).
    * Output: (doc_id, token, tf, score, rank), rank 1..k.
    *
    * Scale shape: two corpus aggregates (tf by (doc, token), df by token)
    * plus a bounded top-k per document through the partial-agg
    * [[graft.functions.RowTopKAggregator]] — k rows per doc cross the
    * shuffle instead of every scored token (the window formulation is kept
    * only as the DuckDB oracle). N is one scalar count job — a dimension
    * of the formula, not data movement. */
  def tfidfTopK(docs: DataFrame, k: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("token").agg(count_distinct(col("doc_id")).as("df"))
    val n = docs.count()
    val scored = tf.join(dfreq, "token")
      .select(col("doc_id"), col("token"), col("tf"),
        round(col("tf") * log((lit(n.toDouble) + 1.0) /
          (col("df").cast("double") + 1.0)), 6).as("score"))
    val ord: Ordering[(Double, String, Long)] =
      Ordering.by[(Double, String, Long), (Double, String)] {
        case (s, t, _) => (-s, t)
      }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))
    scored.select(col("doc_id"), col("score"), col("token"), col("tf"))
      .as[(Long, Double, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3, r._4))
      .agg(new graft.functions.RowTopKAggregator(k, ord).toColumn)
      .toDF("doc_id", "topk")
      .select(col("doc_id"), posexplode(col("topk")))
      .select(col("doc_id"), col("col._2").as("token"), col("col._3").as("tf"),
        col("col._1").as("score"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Per-document stats frame. */
  /** Lexical-diversity metrics per document: type-token ratio and token
    * entropy — the Gopher-rules-style signal separating natural prose from
    * boilerplate (low entropy: repeated menus/templates) and token soup
    * (entropy near its ln(n) maximum with TTR ~ 1).
    *
    * Entropy over the doc's token histogram, H = ln n − (Σ c·ln c)/n,
    * computed so the oracle replays it bit-for-bit: each c·ln(c) term is a
    * double from an exact integer, rounded to 6 decimals, summed as
    * DECIMAL(38,6) (order-independent), then two fixed-parenthesization
    * double ops. Scale shape: one exploded word-count aggregate per doc
    * (map-side partials) then a per-doc combine — linear, two shuffles.
    * Output: (doc_id, n_tokens, n_types, ttr, entropy). */
  def tokenDiversity(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val cnts = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    cnts.groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")), 6)
          .cast("decimal(38,6)")).as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr"),
        round(log(col("n_tokens").cast("double"))
          - (col("s").cast("double") / col("n_tokens").cast("double")), 6)
          .as("entropy"))
  }

  /** Quantile-gated length curation: keep documents whose token count lies
    * within [P`pLo`, P`pHi`] of THEIR OWN source's length distribution —
    * data-driven gates instead of hand-picked constants (a fixed "min 20
    * tokens" rule that fits web text guts a code corpus). Thresholds are
    * exact rank quantiles (the same integer ceil-rank targets
    * `(n*p + 99) div 100` as [[Sketches.histQuantiles]]' exact side).
    * Output: the surviving (doc_id, source, n_tokens).
    *
    * Scale shape: one per-source window sort to rank lengths, one count
    * aggregate, then a broadcast of the per-source (lo, hi) bound rows into
    * a narrow filter. The window sort is the pragmatic form for corpora
    * where a per-source sort fits (lengths are one long per doc); at
    * extreme skew swap the threshold derivation for histQuantiles' est_q —
    * the gate join is unchanged. */
  def quantileLengthGate(docs: DataFrame, pLo: Int = 10, pHi: Int = 90): DataFrame = {
    require(1 <= pLo && pLo < pHi && pHi <= 100,
      s"need 1 <= pLo < pHi <= 100, got ($pLo, $pHi)")
    val lens = docs.select(col("doc_id"), col("source"),
      tokenCount(col("text")).as("n_tokens"))
    val ranked = lens.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(col("n_tokens"), col("doc_id"))))
    val targets = lens.groupBy("source").agg(count(lit(1)).as("n"))
      .select(col("source"),
        expr(s"(n * $pLo + 99) div 100").as("tlo"),
        expr(s"(n * $pHi + 99) div 100").as("thi"))
    val bounds = ranked.join(broadcast(targets), Seq("source"))
      .filter(col("rn") === col("tlo") || col("rn") === col("thi"))
      .groupBy("source")
      .agg(min(when(col("rn") === col("tlo"), col("n_tokens"))).as("lo"),
        max(when(col("rn") === col("thi"), col("n_tokens"))).as("hi"))
    lens.join(broadcast(bounds), Seq("source"))
      .filter(col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  /** Cross-corpus novelty: per document, the fraction of its distinct word
    * `n`-grams that occur in NO other document (corpus doc-frequency 1) —
    * high for genuinely novel content, low for boilerplate/templates that
    * repeat across the corpus. The complement of what the dedup family
    * measures (repetitionStats is WITHIN-doc; this is cross-doc).
    * Output: (doc_id, n_grams, n_unique, novelty_ppm) for every doc with at
    * least n tokens; ppm = exact integer floor division.
    *
    * Scale shape: word-count family — one gram doc-frequency aggregate
    * (map-side combining), one join back on the gram, one per-doc count
    * aggregate. Linear, no pairing, hot grams are AQE-splittable join
    * keys. */
  def noveltyScore(docs: DataFrame, n: Int = 3): DataFrame = {
    val g = Dedup.gramRows(docs, n)
    val df = g.groupBy("gram").agg(count(lit(1)).as("df"))
    g.join(df, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        expr("(n_unique * 1000000L) div n_grams").as("novelty_ppm"))
  }

  /** Corpus keyness by weighted log-odds with an informative Dirichlet
    * prior (Monroe, Colaresi & Quinn, Political Analysis 2008 — the
    * "fightin' words" statistic): which words are over-represented in the
    * target slice vs the rest of the corpus, shrunk toward corpus-wide
    * usage so rare words can't dominate on noise. The curation use:
    * characterize what a source/language/cluster actually contains before
    * deciding its mixture weight, and surface contamination-style
    * vocabulary drift between slices (the word-level complement of the
    * distribution-level PSI drift report).
    *
    *   α_w     = α0 · (y_aw + y_bw) / n          (informative prior)
    *   δ_w     = ln[(y_aw+α_w)/(n_a+α0−y_aw−α_w)]
    *           − ln[(y_bw+α_w)/(n_b+α0−y_bw−α_w)]
    *   z_w     = δ_w / sqrt(1/(y_aw+α_w) + 1/(y_bw+α_w))
    *
    * Scale shape: word-count family — one token-count aggregate
    * (map-side combining, hot words collapse before the exchange), one
    * 3-scalar corpus-total row cross-joined back as plan-time constants
    * (the catalog-statistic analogue), then a narrow per-word formula.
    * Linear, no pairing, no window.
    *
    * Determinism: counts are exact longs; α_w is one IEEE multiply+divide;
    * each ln is rounded to 6 decimals before the subtraction (the bigram-LM
    * discipline — engine `ln` implementations may differ in the last ulp,
    * 6-decimal rounding absorbs it), and δ, z are rounded to 6.
    * Output: (word, cnt_a, cnt_b, delta, z) for words with
    * cnt_a + cnt_b ≥ `minCount`. */
  def keyness(docs: DataFrame, target: Column, alpha0: Double = 500.0,
      minCount: Long = 20L): DataFrame = {
    val tok = docs.select(target.cast("boolean").as("tgt"),
        explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val counts = tok.groupBy("word").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("tgt"), 1L).otherwise(0L)).as("cnt_b"))
    val totals = counts.agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    val j = counts.filter(col("cnt_a") + col("cnt_b") >= minCount)
      .crossJoin(broadcast(totals))
    val aw = (col("cnt_a") + col("cnt_b")).cast("double") * lit(alpha0) /
      (col("n_a") + col("n_b")).cast("double")
    def lnOdds(cnt: Column, n: Column): Column = round(log(
      (cnt.cast("double") + col("aw")) /
        (n.cast("double") + lit(alpha0) - cnt.cast("double") - col("aw"))), 6)
    j.withColumn("aw", aw)
      .withColumn("la", lnOdds(col("cnt_a"), col("n_a")))
      .withColumn("lb", lnOdds(col("cnt_b"), col("n_b")))
      .withColumn("delta", round(col("la") - col("lb"), 6))
      .select(col("word"), col("cnt_a"), col("cnt_b"), col("delta"),
        round(col("delta") / sqrt(lit(1.0) / (col("cnt_a").cast("double") + col("aw"))
          + lit(1.0) / (col("cnt_b").cast("double") + col("aw"))), 6).as("z"))
  }

  def docStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      distinctTokenCount(col("text")).as("n_distinct"),
      countIn(col("text"), Stopwords).as("n_stopwords"),
      qualityScore(col("text")).as("quality"),
      langPredict(col("text")).as("lang_pred"),
      fingerprint(col("text")).as("fp"))

  /** TextRank keyword extraction (Mihalcea & Tarau EMNLP'04): PageRank
    * over the corpus-wide word co-occurrence graph — words that keep
    * company with many well-connected words rank highest, an unsupervised
    * keyword/keyphrase signal with no training data.
    *
    * Graph construction: undirected unique edges between tokens
    * co-occurring within `window` positions (the paper's window-2..10),
    * built from per-doc `lead` windows — per-key (doc) windows, never
    * global — then DISTINCT'd corpus-wide. Nodes are portable polynomial
    * hashes of words ([[graft.functions.PortableHashes]]); a hash
    * collision merges two words' vertices (documented trade — at the
    * 2^31−1 modulus, collisions need ~50k distinct words to reach 1%
    * pair probability; the oracle replays the same hashes so results
    * stay exact).
    *
    * Ranking is [[Graph.pageRank]]'s 5-round fixed-point INTEGER
    * iteration — bit-stable under any partitioning — then the bounded
    * global top-k (TakeOrderedAndProject), ties by word ascending.
    *
    * Scale shape: edge building is narrow per-doc windows + one DISTINCT
    * (word-pair-sized); PageRank moves only the node-sized rank table per
    * round (the q69 shape); the word↔hash map is the distinct-token
    * table, joined back once at the end. Stopwords and short tokens are
    * excluded up front — the paper's syntactic filter analogue. */
  def textRankKeywords(docs: DataFrame, window: Int = 2, k: Int = 20,
      minLen: Int = 3): DataFrame = {
    require(window >= 1 && k >= 1, "window and k must be positive")
    import graft.functions.expressions.TextFunctions.poly_hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) >= minLen && !col("tok").isin(Stopwords: _*))
    val withLeads = (1 to window).foldLeft(toks) { (df, o) =>
      df.withColumn(s"nxt$o", lead(col("tok"), o).over(w))
    }
    val edges = (1 to window).map { o =>
      withLeads.filter(col(s"nxt$o").isNotNull && col(s"nxt$o") =!= col("tok"))
        .select(poly_hash(col("tok")).as("src"), poly_hash(col(s"nxt$o")).as("dst"))
    }.reduce(_.unionByName(_)).distinct()
    val words = toks.select(col("tok").as("word")).distinct()
      .select(col("word"), poly_hash(col("word")).as("node"))
    Graph.pageRank(Graph.symmetrize(edges), 5)
      .join(words, "node")
      .select(col("word"), col("deg"), col("rank"))
      .orderBy(col("rank").desc, col("word").asc)
      .limit(k)
  }

  /** Flesch–Kincaid readability (Kincaid et al. 1975) over the corpus —
    * the classic complexity gate a curation pipeline runs next to
    * [[qualityScore]] (too-easy and too-hard tails both correlate with
    * boilerplate and garbage).
    *
    * Syllables are the portable vowel-run heuristic, defined EXACTLY so
    * the oracle replays it: syllables(doc) = (count of maximal
    * `[aeiouy]+` runs in the lowercased text) + (count of tokens with no
    * vowel at all — each clamped to one syllable). Sentences = maximal
    * `[.!?]+` runs, floored at 1. Tokens are the corpus convention
    * (single-space split). Both engines evaluate the same two double
    * ratios in one fixed parenthesization, rounded to 6.
    *
    * Scale shape: pure narrow column expressions — zero shuffle, linear,
    * whole-stage codegen. Output: (id, n_words, n_sentences,
    * n_syllables, fk_grade, reading_ease). */
  def readability(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toksL = split(lower(col(textCol)), " ")
    val nWords = size(toksL).cast("long")
    val nSent = greatest(lit(1L),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("long"))
    val vowelRuns =
      size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
        .cast("long")
    val noVowelWords =
      nWords - size(filter(toksL, t => t.rlike("[aeiouy]"))).cast("long")
    val nSyll = vowelRuns + noVowelWords
    val wps = nWords.cast("double") / nSent.cast("double")
    val spw = nSyll.cast("double") / nWords.cast("double")
    docs.select(col(idCol),
      nWords.as("n_words"), nSent.as("n_sentences"), nSyll.as("n_syllables"),
      round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6).as("fk_grade"),
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)
        .as("reading_ease"))
  }

  /** Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the top
    * `maxRank` vocabulary words — the one-row corpus health check
    * (natural text sits near slope −1; a synthetic or template-flooded
    * corpus drifts flat or cliff-shaped) published on a data card next
    * to the q82 fragments.
    *
    * Rank is dense position under the TOTAL order (count desc, word asc);
    * the regression runs on (x, y) = (round(ln rank, 6),
    * round(ln count, 6)) with all five cross-sums as DECIMAL(38,6) —
    * reduction-order-independent — collapsed by the q84 fixed-formula
    * double arithmetic, round-6.
    *
    * Scale shape: ONE corpus-sized word-count aggregate (map-side
    * combined); everything after runs on the VOCABULARY table. The rank
    * window sorts vocab only — dimension-sized, with the q138 bucket
    * refinement as the documented swap-in if the vocabulary itself
    * outgrows one sort. Output: one row (n_types, n_tokens, fit_n,
    * zipf_slope, zipf_intercept, r2). */
  def zipfFit(docs: DataFrame, textCol: String = "text",
      maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2, "maxRank must be >= 2")
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("word").asc)
    // DECIMAL(18,6) terms: the (18,6)x(18,6) product is EXACT at (37,12)
    // in both engines — no product-rounding tie for the sums to disagree on
    val ranked = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxRank)
      .select(round(log(col("rank").cast("double")), 6)
          .cast("decimal(18,6)").as("x"),
        round(log(col("cnt").cast("double")), 6)
          .cast("decimal(18,6)").as("y"))
    val tot = counts.agg(count(lit(1)).as("n_types"),
      sum(col("cnt")).as("n_tokens"))
    val s = ranked.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,12)")).as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,12)")).as("sxy"),
      sum((col("y") * col("y")).cast("decimal(38,12)")).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val covN = n * d("sxy") - d("sx") * d("sy")
    val varXN = n * d("sxx") - d("sx") * d("sx")
    val varYN = n * d("syy") - d("sy") * d("sy")
    tot.crossJoin(s).select(
      col("n_types"), col("n_tokens"), col("n").as("fit_n"),
      round(covN / varXN, 6).as("zipf_slope"),
      round((d("sy") - (covN / varXN) * d("sx")) / n, 6).as("zipf_intercept"),
      round(covN * covN / (varXN * varYN), 6).as("r2"))
  }

  /** Word n-grams of a token array as a narrow column expression —
    * `concat_ws`-joined windows over `sequence(1, size-n+1)`; empty for
    * docs shorter than n tokens. */
  private def wordGrams(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Gopher-style intra-document REPETITION signals (Rae et al. 2021,
    * MassiveText §A1.1 — the repetition half of the hygiene family;
    * [[gopherGate]] is the composition/length half): per document,
    *   - `dup2_frac` / `dup3_frac`: the fraction of word 2-/3-grams that
    *     are repeats of an earlier identical gram (1 − distinct/total —
    *     gram-count weighted; Gopher weights by characters, an
    *     implementation choice this operator deliberately simplifies and
    *     documents);
    *   - `top2_share`: the most frequent 2-gram's share of all 2-grams
    *     (the "top n-gram" rule);
    *   - `pass`: the conjunction under the given ceilings.
    * A doc stuffed with a repeated phrase fails long before its token
    * counts or stopword ratios look wrong — which is exactly why the
    * repetition rules exist alongside the composition rules.
    *
    * Scale shape: one explode per n + two hash aggregations keyed by
    * (doc_id, gram) then doc_id — fully distributed, no windows; docs
    * with fewer than 3 tokens are excluded (no 3-gram denominator).
    * Output: (doc_id, n_words, dup2_frac, top2_share, dup3_frac, pass),
    * measures round-6. */
  def repetitionSignals(docs: DataFrame, maxDup2: Double = 0.05,
      maxTop2: Double = 0.05, maxDup3: Double = 0.03): DataFrame = {
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
    def measures(n: Int): DataFrame =
      toks.select(col("doc_id"), explode(wordGrams(col("ts"), n)).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum(col("c")).as(s"total$n"),
          count(lit(1)).as(s"distinct$n"),
          max(col("c")).as(s"max$n"))
    measures(2).join(measures(3), "doc_id")
      .select(col("doc_id"),
        (col("total2") + 1).as("n_words"), // total 2-grams = words - 1
        round(lit(1) - col("distinct2").cast("double") /
          col("total2").cast("double"), 6).as("dup2_frac"),
        round(col("max2").cast("double") /
          col("total2").cast("double"), 6).as("top2_share"),
        round(lit(1) - col("distinct3").cast("double") /
          col("total3").cast("double"), 6).as("dup3_frac"))
      .withColumn("pass",
        col("dup2_frac") <= maxDup2 && col("top2_share") <= maxTop2 &&
          col("dup3_frac") <= maxDup3)
  }
}

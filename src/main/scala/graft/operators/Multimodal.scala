package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed by a batched per-partition decoder.
  *
  * The decode is REAL: payloads are actual image containers — 24-bit
  * uncompressed BMP (the Windows BITMAPINFOHEADER layout) and binary PPM
  * (netpbm `P6`, with multi-frame streams as back-to-back concatenated
  * frames, the classic pipe format for video frames) — parsed byte-by-byte
  * by [[decode]] with no codec library. The fixtures are synthesized by
  * [[synthMedia]] with dimensions derived deterministically from document
  * fields, so the DuckDB oracle can compute the EXPECTED metadata from
  * those same fields while the Spark side must recover it by parsing the
  * bytes — an encode→decode round trip, verified end to end.
  *
  * The partition-level batching shape (decoders amortize codec/model init
  * per batch, like a mapInPandas / mapInArrow decoder would) and the
  * Arrow-columnar variant (the zero-copy layout a native vectorized codec
  * reads) are the same plumbing a compressed-format (JPEG/PNG/MP4) build
  * would use: swapping [[decode]]'s body for a JNI call changes nothing
  * else.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long)

  // ---- fixture synthesis ---------------------------------------------------

  /** Derived media dimensions for a document — the deterministic contract
    * the oracle mirrors: width from the UTF-8 byte length, height and frame
    * count from the id, format alternating by id parity (even → BMP,
    * odd → multi-frame PPM). Exception: the PLANTED near-dup ids
    * (`doc_id % 16 ∈ {2, 4}`, both even → BMP) are fixed 32×32 so each
    * 16-id block carries one near-duplicate image pair — see [[synthMedia]]. */
  private def dims(docId: Long, utf8Len: Int): (Int, Int, Int, Boolean) = {
    if (isPlant(docId)) (32, 32, 1, true)
    else {
      val w = 1 + utf8Len % 64
      val h = 1 + (docId % 64).toInt
      val frames = 1 + (docId % 8).toInt
      (w, h, frames, (docId % 2) == 0L)
    }
  }

  /** Planted near-dup membership: ids ≡ 2 and ≡ 4 (mod 16). */
  private def isPlant(docId: Long): Boolean =
    docId % 16 == 2 || docId % 16 == 4

  /** Perturb the planted-pair variant in place: force the two aHash lattice
    * sample sites (bx,by)=(1,1)→pixel(4,4) and (5,3)→pixel(20,12) of the
    * 32×32 grid to white. A handful of hash bits move (the two forced
    * samples plus any sample the ~1.5% mean shift crosses), so the pair
    * lands at a small nonzero Hamming distance — the near-dup case the
    * pigeonhole chunk join (and its brute-force oracle mirror) must find. */
  private def plantPerturb(bmp: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    for ((x, y) <- Seq((4, 4), (20, 12))) {
      val off = 54 + (h - 1 - y) * rowSize + 3 * x // bottom-up raster
      bmp(off) = 0xFF.toByte; bmp(off + 1) = 0xFF.toByte
      bmp(off + 2) = 0xFF.toByte
    }
    bmp
  }

  /** Attach a binary payload column holding a REAL image container per
    * document: even doc_ids get a 24-bit BMP, odd a multi-frame P6 PPM,
    * sized by [[dims]]. The planted ids (`doc_id % 16 ∈ {2, 4}`) share one
    * 32×32 BMP seeded by the block index (`doc_id div 16`), with the ≡ 4
    * member perturbed at two lattice sites — a deterministic near-duplicate
    * image pair per block, so Hamming-join fixtures contain real positives.
    * Byte assembly is per-row imperative work Catalyst cannot express — the
    * one legitimate mapPartitions case — and it is narrow: no shuffle,
    * encode runs where the document row lives. */
  def synthMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val utf8 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (w, h, frames, bmp) = dims(id, utf8.length)
        val payload =
          if (isPlant(id)) {
            val base = encodeBmp(w, h, seed = id / 16)
            if (id % 16 == 4) plantPerturb(base, w, h) else base
          } else if (bmp) encodeBmp(w, h, seed = id)
          else encodePpm(w, h, frames, seed = id)
        MediaRow(id, payload)
      }).toDF()
  }

  /** A real 24-bit uncompressed BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes. Pixels are a
    * deterministic xorshift stream off `seed`, so payload bytes are stable
    * across runs and partitionings. */
  def encodeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"bad BMP dims ${w}x$h")
    val rowSize = ((3 * w + 3) / 4) * 4
    val imageSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + imageSize)    // file size
    out.putInt(0)                 // reserved
    out.putInt(54)                // pixel data offset
    out.putInt(40)                // BITMAPINFOHEADER size
    out.putInt(w)
    out.putInt(h)                 // positive: bottom-up
    out.putShort(1)               // planes
    out.putShort(24)              // bits per pixel
    out.putInt(0)                 // BI_RGB, uncompressed
    out.putInt(imageSize)
    out.putInt(2835).putInt(2835) // 72 DPI in px/metre
    out.putInt(0).putInt(0)       // palette sizes (none at 24bpp)
    var s = seed * 0x9E3779B97F4A7C15L + 1
    var row = 0
    while (row < h) {
      var i = 0
      while (i < rowSize) { // pixel bytes then zero pad, one pass
        if (i < 3 * w) {
          s ^= s << 13; s ^= s >>> 7; s ^= s << 17
          out.put((s & 0xFF).toByte)
        } else out.put(0.toByte)
        i += 1
      }
      row += 1
    }
    out.array()
  }

  /** A multi-frame binary PPM stream: `frames` back-to-back P6 images, each
    * `P6\n<w> <h>\n255\n` + w·h RGB triples. Deterministic pixel stream as
    * in [[encodeBmp]]. */
  def encodePpm(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0, s"bad PPM dims ${w}x$h x$frames")
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = java.nio.ByteBuffer.allocate((header.length + 3 * w * h) * frames)
    var s = seed * 0x9E3779B97F4A7C15L + 1
    var f = 0
    while (f < frames) {
      out.put(header)
      var i = 0
      while (i < 3 * w * h) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out.put((s & 0xFF).toByte)
        i += 1
      }
      f += 1
    }
    out.array()
  }

  // ---- the decoder ---------------------------------------------------------

  /** Parse one payload into its metadata by reading the container bytes:
    * BMP width/height come from the BITMAPINFOHEADER (negative height =
    * top-down, reported as magnitude), PPM dims from the first frame's
    * ASCII header with frames counted by walking the concatenated stream.
    * Truncated or foreign bytes throw IllegalArgumentException — a decode
    * error, not a silent zero. */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 2, s"doc $docId: payload too short to carry a magic")
    (payload(0), payload(1)) match {
      case ('B', 'M') => decodeBmp(docId, payload)
      case ('P', '6') => decodePpm(docId, payload)
      case (a, b) => throw new IllegalArgumentException(
        s"doc $docId: unsupported media magic 0x${"%02x%02x".format(a, b)}")
    }
  }

  private def decodeBmp(docId: Long, payload: Array[Byte]): MediaMeta = {
    require(payload.length >= 54, s"doc $docId: truncated BMP header")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22) // negative = top-down row order
    require(w > 0 && h != 0, s"doc $docId: bad BMP dims ${w}x$h")
    val rowSize = ((3 * w + 3) / 4) * 4
    require(payload.length >= pixelOffset + rowSize * math.abs(h),
      s"doc $docId: BMP pixel data truncated")
    MediaMeta(docId, payload.length.toLong, w.toLong, math.abs(h).toLong, 1L)
  }

  private def decodePpm(docId: Long, payload: Array[Byte]): MediaMeta = {
    // ASCII header token reader: skips whitespace and '#' comments, as the
    // netpbm grammar allows between tokens
    var pos = 0
    def readToken(): String = {
      while (pos < payload.length &&
          (Character.isWhitespace(payload(pos)) || payload(pos) == '#')) {
        if (payload(pos) == '#')
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < payload.length && !Character.isWhitespace(payload(pos))) pos += 1
      require(pos > start, s"doc $docId: truncated PPM header")
      new String(payload, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    var frames = 0L
    var w0 = 0L
    var h0 = 0L
    while (pos < payload.length) {
      require(readToken() == "P6", s"doc $docId: frame $frames is not P6")
      val w = readToken().toInt
      val h = readToken().toInt
      val maxval = readToken().toInt
      require(w > 0 && h > 0 && maxval > 0 && maxval < 65536,
        s"doc $docId: bad PPM frame header ${w}x$h max=$maxval")
      pos += 1 // exactly one whitespace byte separates header from raster
      val bytesPerSample = if (maxval < 256) 1 else 2
      val raster = 3 * w * h * bytesPerSample
      require(pos + raster <= payload.length,
        s"doc $docId: PPM raster truncated at frame $frames")
      pos += raster
      if (frames == 0L) { w0 = w.toLong; h0 = h.toLong }
      frames += 1
    }
    require(frames > 0, s"doc $docId: empty PPM stream")
    MediaMeta(docId, payload.length.toLong, w0, h0, frames)
  }

  /** Batch decoder: the signature a vectorized codec presents (decode cost
    * amortized over the batch). */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] =
    batch.map(r => decode(r.doc_id, r.payload))

  /** Batched per-partition decode: groups rows into fixed-size batches inside
    * each partition (the shape a vectorized decoder needs), no shuffle. */
  def decodeMeta(spark: SparkSession, media: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq))
    }
  }

  /** COLUMNAR decoder over one Arrow batch (`VectorSchemaRoot` — the exact
    * object a `mapInArrow` decoder receives): payloads arrive as one
    * contiguous data buffer + offsets (VarBinaryVector), the zero-copy
    * layout a real vectorized codec (or a C-Data-handed native library)
    * reads directly. Parses the same containers as [[decode]]; only the
    * access path differs. Returns a STRICT Seq — callers reuse the root's
    * buffers for the next batch. */
  def decodeArrow(root: org.apache.arrow.vector.VectorSchemaRoot): Seq[MediaMeta] = {
    val ids = root.getVector("doc_id")
      .asInstanceOf[org.apache.arrow.vector.BigIntVector]
    val pay = root.getVector("payload")
      .asInstanceOf[org.apache.arrow.vector.VarBinaryVector]
    (0 until root.getRowCount).map { i =>
      // pay.get(i) copies the slice because the shared header/raster parser
      // takes Array[Byte]; a native codec would read the ArrowBuf range in
      // place via the offsets vector
      decode(ids.get(i), pay.get(i))
    }
  }

  /** Arrow-columnar variant of [[decodeMeta]]: inside each partition, rows
    * are transposed into Arrow `VectorSchemaRoot` batches (BigIntVector ids +
    * VarBinaryVector payloads — the very batch a `mapInArrow` decoder would
    * receive) and decoded column-wise. Same results as the row-batched form
    * for every batchSize (spec-pinned); the reason this path exists is the
    * handoff shape: a real codec consumes the Arrow buffers without
    * per-row JVM object materialization, and the same root can cross the
    * C Data Interface to a native decoder. Allocator lifecycle is per
    * partition (one allocator, one root reused across batches), freed when
    * the partition drains and on failure. */
  def decodeMetaArrow(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VectorSchemaRoot}
    media.as[MediaRow].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val alloc = new RootAllocator()
        val ids = new BigIntVector("doc_id", alloc)
        val pay = new VarBinaryVector("payload", alloc)
        val root = VectorSchemaRoot.of(ids, pay)
        var closed = false
        def closeAll(): Unit = if (!closed) {
          closed = true; root.close(); alloc.close()
        }
        // Native Arrow memory must be freed even when the iterator is never
        // drained (limit/take, a downstream failure mid-partition): the
        // task-completion listener fires on every exit path. The drain-time
        // close below stays as the eager fast path.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
        val out = it.grouped(batchSize).flatMap { rows =>
          try {
            ids.allocateNew(rows.size)
            pay.allocateNew()
            rows.zipWithIndex.foreach { case (r, i) =>
              ids.setSafe(i, r.doc_id)
              pay.setSafe(i, r.payload)
            }
            root.setRowCount(rows.size)
            decodeArrow(root)
          } catch { case e: Throwable => closeAll(); throw e }
        }
        // free the partition's Arrow memory after the last batch drains
        new Iterator[MediaMeta] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) closeAll()
            h
          }
          def next(): MediaMeta = out.next()
        }
      }
    }
  }

  // ---- perceptual hashing (image near-dup) --------------------------------

  case class MediaHash(doc_id: Long, ahash: Long, width: Long, height: Long)

  /** First-frame grayscale grid in TOP-DOWN image order: (w, h, gray) with
    * gray = r+g+b per pixel (0..765 — the sum, not the mean: no division,
    * no rounding convention to mirror). BMP rows arrive bottom-up (positive
    * height) in BGR with 4-byte padding; PPM frame 0 is top-down RGB. */
  def grayGrid(docId: Long, payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(payload.length >= 2, s"doc $docId: payload too short")
    (payload(0), payload(1)) match {
      case ('B', 'M') =>
        val buf = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val off = buf.getInt(10)
        val w = buf.getInt(18)
        val hRaw = buf.getInt(22)
        val h = math.abs(hRaw)
        val rowSize = ((3 * w + 3) / 4) * 4
        require(w > 0 && h > 0 && payload.length >= off + rowSize * h,
          s"doc $docId: truncated BMP raster")
        val g = new Array[Int](w * h)
        var fileRow = 0
        while (fileRow < h) {
          val imgRow = if (hRaw > 0) h - 1 - fileRow else fileRow
          var x = 0
          while (x < w) {
            val p = off + fileRow * rowSize + 3 * x
            g(imgRow * w + x) = (payload(p) & 0xFF) + (payload(p + 1) & 0xFF) +
              (payload(p + 2) & 0xFF)
            x += 1
          }
          fileRow += 1
        }
        (w, h, g)
      case ('P', '6') =>
        // reuse the header walk: find frame 0's raster start
        var pos = 0
        def tok(): String = {
          while (pos < payload.length &&
              (Character.isWhitespace(payload(pos)) || payload(pos) == '#')) {
            if (payload(pos) == '#')
              while (pos < payload.length && payload(pos) != '\n') pos += 1
            else pos += 1
          }
          val st = pos
          while (pos < payload.length && !Character.isWhitespace(payload(pos)))
            pos += 1
          require(pos > st, s"doc $docId: truncated PPM header")
          new String(payload, st, pos - st,
            java.nio.charset.StandardCharsets.US_ASCII)
        }
        require(tok() == "P6", s"doc $docId: not P6")
        val w = tok().toInt; val h = tok().toInt; val maxval = tok().toInt
        require(w > 0 && h > 0 && maxval > 0 && maxval < 256,
          s"doc $docId: bad PPM header")
        pos += 1
        require(payload.length >= pos + 3 * w * h,
          s"doc $docId: truncated PPM raster")
        val g = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          g(i) = (payload(pos + 3 * i) & 0xFF) + (payload(pos + 3 * i + 1) & 0xFF) +
            (payload(pos + 3 * i + 2) & 0xFF)
          i += 1
        }
        (w, h, g)
      case (a, b) => throw new IllegalArgumentException(
        s"doc $docId: unsupported media magic 0x${"%02x%02x".format(a, b)}")
    }
  }

  /** Average-hash (aHash) of the first frame: point-sample the grayscale
    * grid at an 8×8 lattice (x = ⌊bx·w/8⌋ clamped — exact integer
    * arithmetic, no resampling kernel to make bit-portable), then one bit
    * per cell: set iff 64·sample > Σsamples (the strict integer form of
    * "above the mean" — no division). Bit i = (by·8 + bx), LSB first.
    *
    * The classic perceptual-dedup property holds by construction: any
    * uniform brightness shift adds the same amount to every sample AND to
    * the mean, leaving every bit — and therefore the hash — unchanged
    * (spec-pinned). Near-identical images land within a few bits;
    * unrelated ones at ~32. */
  def aHash(w: Int, h: Int, gray: Array[Int]): Long = {
    val samples = new Array[Int](64)
    var by = 0
    var total = 0L
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val x = math.min(w - 1, bx * w / 8)
        val y = math.min(h - 1, by * h / 8)
        val v = gray(y * w + x)
        samples(by * 8 + bx) = v
        total += v
        bx += 1
      }
      by += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (64L * samples(i) > total) bits |= (1L << i)
      i += 1
    }
    bits
  }

  case class PixelRow(doc_id: Long, width: Long, height: Long, gray: Array[Long])

  /** Materialized decode boundary: the first-frame grayscale rows as a
    * (doc_id, width, height, gray[]) frame — the ONE product of the
    * JVM-only byte codec. Everything downstream of this frame (the 8×8
    * grid sample, the [[aHash]] bit pack, the pigeonhole Hamming join) is
    * integer arithmetic any engine replays, so persisting it as parquet
    * turns the rest of the multimodal dedup pipeline oracle-checkable;
    * only the byte decode itself stays spec-gated. Same narrow
    * mapPartitions shape as [[decodeMeta]] — decode runs where the payload
    * row lives, nothing shuffles. */
  def grayPixels(spark: SparkSession, media: DataFrame): Dataset[PixelRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, g) = grayGrid(r.doc_id, r.payload)
        PixelRow(r.doc_id, w.toLong, h.toLong, g.map(_.toLong))
      })
  }

  /** [[aHash]] recomputed from the materialized pixel frame with Column
    * arithmetic ONLY — bit-identical to the JVM loop (spec-pinned), but
    * the plan is declarative: 64 literal-index `element_at` samples, one
    * integer total, and a conditional bit sum, all inside whole-stage
    * codegen and replayable by the SQL oracle. Bit 63's weight is
    * Long.MinValue (two's complement); the fold adds bits 0..62 first so
    * no partial sum leaves the long range under ANSI mode. Output matches
    * [[MediaHash]]: (doc_id, ahash, width, height). */
  def aHashFromPixels(px: DataFrame): DataFrame = {
    val samples = (0 until 64).map { i =>
      val bx = i % 8; val by = i / 8
      expr(s"element_at(gray, CAST(least(height - 1, ($by * height) div 8)" +
        s" * width + least(width - 1, ($bx * width) div 8) AS INT) + 1)")
    }
    val bits = (0 until 64).map { i =>
      val weight = if (i == 63) Long.MinValue else 1L << i
      when(lit(64L) * element_at(col("s"), i + 1) > col("total"), lit(weight))
        .otherwise(lit(0L))
    }
    px.select(col("doc_id"), col("width"), col("height"),
        array(samples: _*).as("s"))
      .withColumn("total", aggregate(col("s"), lit(0L), (a, v) => a + v))
      .select(col("doc_id"), bits.reduce(_ + _).as("ahash"),
        col("width"), col("height"))
  }

  /** Per-image perceptual hashes over a (doc_id, payload) frame — the same
    * narrow mapPartitions shape as [[decodeMeta]]; decode runs where the
    * payload row lives, nothing shuffles. */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, g) = grayGrid(r.doc_id, r.payload)
        MediaHash(r.doc_id, aHash(w, h, g), w.toLong, h.toLong)
      })
  }

  /** Image near-dup pairs by Hamming distance over [[aHash]] values — the
    * multimodal member of the dedup family, built on the SimHash
    * pigeonhole: split the 64 bits into `maxDist + 1` chunks; two hashes
    * within `maxDist` bits MUST agree on at least one chunk, so the
    * candidate join is chunk-equality (word-count-shaped buckets), never
    * all-pairs, and each candidate verifies exactly with one
    * bit_count(xor). Output: (a_id, b_id, hamming), a_id < b_id. */
  /** The pigeonhole chunk pieces of a 64-bit hash column: `maxDist + 1`
    * (j, cv) structs — shared by the in-plan pair join, the at-rest index
    * layout and its probe, so all three agree bit-for-bit on the family. */
  private def hashChunkPieces(hash: org.apache.spark.sql.Column,
      maxDist: Int): Seq[org.apache.spark.sql.Column] = {
    require(maxDist >= 0 && maxDist < 64, "maxDist in [0, 64)")
    val chunks = maxDist + 1
    val step = 64 / chunks
    (0 until chunks).map { j =>
      val width = if (j == chunks - 1) 64 - j * step else step
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(j).as("j"),
        (shiftrightunsigned(hash, j * step).bitwiseAND(lit(mask))).as("cv"))
    }
  }

  /** Exploded pigeonhole chunk rows of a (doc_id, ahash) frame:
    * (doc_id, ahash, j, cv), `maxDist + 1` rows per hash. */
  def hashChunkRows(hashes: DataFrame, maxDist: Int): DataFrame =
    hashes.select(col("doc_id"), col("ahash"),
        explode(array(hashChunkPieces(col("ahash"), maxDist): _*)).as("p"))
      .select(col("doc_id"), col("ahash"), col("p.j").as("j"),
        col("p.cv").as("cv"))

  def imageNearDupPairs(hashes: DataFrame, maxDist: Int = 6): DataFrame = {
    val exploded = hashChunkRows(hashes, maxDist)
    val a = exploded.select(col("j"), col("cv"), col("doc_id").as("a_id"),
      col("ahash").as("a_hash"))
    val b = exploded.select(col("j"), col("cv"), col("doc_id").as("b_id"),
      col("ahash").as("b_hash"))
    a.join(b, Seq("j", "cv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ---- at-rest perceptual-hash index (the media daemon's state tree) -------

  /** Fold a batch of (doc_id, ahash) rows into an at-rest pigeonhole
    * chunk index — the perceptual-hash member of the warm-fold family
    * ([[graft.operators.Similarity.ivfInsert]] /
    * [[graft.operators.Retrieval.invIndexInsert]]): chunk rows land in
    * `tb=` hash buckets (xxhash64(j, cv) mod `nBuckets`) as a batch-marked
    * LSM append under [[graft.util.Lsm]] protocol 2, the meta marker
    * (`last_batch`, plus the chunking family `max_dist`/`n_buckets` —
    * signatures are data, the family is their schema) committing LAST via
    * the protocol-1 swap. Retry of a committed id no-ops; an uncommitted
    * retry sweeps exactly its own partial move and redoes the fold.
    * Batch doc_ids must be new — re-delivery is the caller's id gate. */
  def hashIndexInsert(spark: SparkSession, path: String, hashes: DataFrame,
      batchId: Long, maxDist: Int = 6, nBuckets: Int = 8): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = Lsm.fs(spark, path)
    Lsm.recoverSwap(fs, path, "meta")
    if (fs.exists(new Path(s"$path/meta"))) {
      val m = spark.read.parquet(s"$path/meta").collect()(0)
      require(m.getAs[Long]("max_dist") == maxDist &&
        m.getAs[Long]("n_buckets") == nBuckets,
        s"index at $path was built with max_dist=${m.getAs[Long]("max_dist")} " +
          s"n_buckets=${m.getAs[Long]("n_buckets")}; the probe/fold family " +
          "must match at every call")
    }
    // shared entry: committed no-op, or sweep this batch's partial move
    if (Lsm.enterBatch(spark, fs, path, batchId,
        markedRoots = Seq("chunks")).alreadyCommitted) return
    val marker = s"b$batchId-"
    val chunksRoot = new Path(s"$path/chunks")
    val staged = new Path(s"$path/staged")
    fs.delete(staged, true)
    hashChunkRows(hashes, maxDist)
      .withColumn("tb", pmod(xxhash64(col("j"), col("cv")), lit(nBuckets.toLong)))
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(staged.toString)
    Lsm.moveMarked(fs, staged, chunksRoot, marker)
    fs.delete(staged, true)
    Seq((batchId, maxDist.toLong, nBuckets.toLong))
      .toDF("last_batch", "max_dist", "n_buckets")
      .write.mode("overwrite").parquet(Lsm.stagedPath(path, "meta", batchId))
    Lsm.commitSwap(fs, path, "meta", batchId)
  }

  /** Merge each `tb=` bucket's LSM fragments back to one file,
    * content-identical — [[graft.util.Lsm.compactBuckets]] with the
    * crashed-swap recovery and orphan sweep at entry. */
  def hashIndexCompact(spark: SparkSession, path: String,
      maxFilesPerBucket: Int = 1): Unit = {
    import graft.util.Lsm
    import org.apache.hadoop.fs.Path
    val fs = Lsm.fs(spark, path)
    val chunksRoot = new Path(s"$path/chunks")
    if (!fs.exists(chunksRoot)) return
    val stagedRoot = new Path(s"$path/compact_staged")
    val oldRoot = new Path(s"$path/compact_old")
    Lsm.recoverBucketSwap(fs, chunksRoot, stagedRoot, oldRoot)
    Lsm.recoverSwap(fs, path, "meta")
    val lastBatch =
      if (fs.exists(new Path(s"$path/meta")))
        spark.read.parquet(s"$path/meta").collect()(0)
          .getAs[Long]("last_batch")
      else -1L
    Lsm.sweepAboveBatch(fs, chunksRoot, lastBatch)
    fs.delete(new Path(s"$path/staged"), true)
    Lsm.compactBuckets(spark, fs, chunksRoot, stagedRoot, oldRoot, "tb=",
      maxFilesPerBucket)
  }

  /** The (doc_id, ahash) rows a [[hashIndexInsert]] tree currently serves:
    * chunk j = 0 holds every indexed hash exactly once (column-pruned scan;
    * the separate-ids-table trick the text index uses via `sizes`). */
  def servedHashes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/chunks")
      .filter(col("j") === 0).select(col("doc_id"), col("ahash"))

  /** Image near-dup pairs of a batch AGAINST a [[hashIndexInsert]] tree:
    * the batch side explodes into chunk rows and BROADCASTS (an ingest
    * batch is orders of magnitude smaller than the corpus — the
    * [[Dedup.minhashLshAgainstIndex]] regime), so the stored chunk scan
    * streams map-side with no shuffle of either side; candidates verify
    * exactly with one bit_count(xor). The stored index is hashes only
    * (16 bytes/doc exploded ~7x) — the payload bytes that dominate a
    * 100 TB media corpus are never rescanned. `maxDist` must equal the
    * index's family (checked against meta). Output (a_id = batch,
    * b_id = stored, hamming), same-id rows excluded. */
  def imageNearDupAgainstIndex(spark: SparkSession, path: String,
      batchHashes: DataFrame, maxDist: Int = 6): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").collect()(0)
    require(m.getAs[Long]("max_dist") == maxDist,
      s"index family is max_dist=${m.getAs[Long]("max_dist")}, probe asked $maxDist")
    val stored = spark.read.parquet(s"$path/chunks")
      .select(col("j"), col("cv"), col("doc_id").as("b_id"),
        col("ahash").as("b_hash"))
    broadcast(hashChunkRows(batchHashes, maxDist)
        .select(col("j"), col("cv"), col("doc_id").as("a_id"),
          col("ahash").as("a_hash")))
      .join(stored, Seq("j", "cv"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Per-row admission verdict for a batch of image hashes against a
    * [[hashIndexInsert]] tree — the media edition of
    * [[Similarity.embGateVerdicts]], same status precedence
    * (redelivered > neardup_within > neardup_index > admitted) and the
    * same deterministic drop-the-higher within-batch rule. Pure read,
    * shared by the daemon gate and the oracle check. Unlike the IVF gate
    * the candidate rule here is LOSSLESS (pigeonhole guarantees every
    * pair within `maxDist` shares a chunk), so a brute-force Hamming
    * oracle is an exact mirror. */
  def mediaGateVerdicts(spark: SparkSession, path: String,
      batchHashes: DataFrame, maxDist: Int = 6): DataFrame = {
    val uniq = batchHashes.groupBy("doc_id").agg(min(col("ahash")).as("ahash"))
    val stored = servedHashes(spark, path)
      .select(col("doc_id")).distinct().withColumn("f_re", lit(1))
    val within = imageNearDupPairs(uniq, maxDist)
      .select(col("b_id").as("doc_id")).distinct().withColumn("f_w", lit(1))
    val vsIdx = imageNearDupAgainstIndex(spark, path, uniq, maxDist)
      .select(col("a_id").as("doc_id")).distinct().withColumn("f_i", lit(1))
    uniq.select(col("doc_id"))
      .join(stored, Seq("doc_id"), "left")
      .join(within, Seq("doc_id"), "left")
      .join(vsIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("f_re") === 1, "redelivered")
          .when(col("f_w") === 1, "neardup_within")
          .when(col("f_i") === 1, "neardup_index")
          .otherwise("admitted").as("status"))
  }
}

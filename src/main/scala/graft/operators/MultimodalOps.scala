package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Multimodal columns: media as opaque `binary` + typed metadata
  * (BASELINE.json north-star operator family; no reference counterpart).
  *
  * Spark-side plumbing is real — binary columns, schema, partition-friendly
  * per-row transforms, frame explosion. Two decode paths:
  *
  *  - [[realDecode]]: a REAL image decode through the JDK's own
  *    `javax.imageio` (PNG/JPEG/GIF/BMP codecs ship in every JVM — no
  *    external libraries). Exercised end-to-end by the
  *    `media_decode_real` oracle query over synthesized PNG payloads.
  *    Audio/video codecs are not in the JDK; deployments plug e.g. javacv
  *    into the same entry point — everything downstream is codec-agnostic.
  *  - [[fakeWidth]]/[[fakeHeight]]: deterministic pseudo-metadata for the
  *    fixture's TEXT payloads (which are not decodable media), keeping the
  *    rest of the pipeline value-oracle-able.
  *
  * At 100 TB: media tables should be stored with the binary column LAST in
  * wide parquet row groups, metadata columns first (column pruning lets
  * metadata-only queries skip the blobs entirely); decode/feature stages are
  * narrow per-row maps (`mapPartitions`-shaped, one codec init per
  * partition), so they pipeline inside the scan stage with no shuffle.
  */
object MultimodalOps {

  /** Real image decode via the JDK's ImageIO registry: (width, height) of
    * the first decodable frame. Fails loudly on payloads no registered
    * codec matches — route such rows to a quarantine side output rather
    * than letting nulls flow on. Runs per-row inside tasks (a narrow map);
    * ImageIO's reader lookup is threadsafe and cached per JVM. */
  def realDecode(bytes: Array[Byte]): (Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      "undecodable media payload: no registered ImageIO codec matches")
    (img.getWidth, img.getHeight)
  }

  /** Deterministic PNG synthesis (w×h, pixel(x,y) = (x·31 + y·17) RGB) —
    * real compressed image bytes from plain JDK, used to exercise
    * [[realDecode]] end-to-end without fixture media files. */
  def encodePng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic stand-in "decode": pseudo width/height derived from a
    * stable hash of the bytes. Same arithmetic is mirrored in the oracle. */
  def fakeWidth(bytes: Column): Column = stableHash(bytes.cast("string")) % 1280 + 1
  def fakeHeight(bytes: Column): Column = stableHash(bytes.cast("string")) % 720 + 1

  /** View the documents fixture as a media table: the text payload becomes
    * an opaque binary column with typed metadata alongside. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("bytes"))

  /** Per-media feature extraction: byte length, content digest, stubbed
    * decode metadata. Narrow map — no shuffle, codegen throughout. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("media_type"),
      length(col("bytes")).as("n_bytes"),
      md5(col("bytes")).as("digest"),
      fakeWidth(col("bytes")).as("width"),
      fakeHeight(col("bytes")).as("height"))

  /** Aspect-preserving resize plan for image rows: fit (width, height)
    * into (targetW, targetH) with integer floor arithmetic — no floats, so
    * the oracle restates it exactly. The dimensions come from the stubbed
    * decode; a real deployment swaps the codec's dims into the SAME plan
    * (narrow per-row map, no shuffle). */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media.filter(col("media_type") === "image")
      .select(col("media_id"),
        fakeWidth(col("bytes")).as("width"),
        fakeHeight(col("bytes")).as("height"))
      .withColumn("out_w",
        when(col("width") * targetH >= col("height") * targetW,
          lit(targetW).cast("long"))
          .otherwise(greatest(lit(1L),
            expr(s"(width * $targetH) div height"))))
      .withColumn("out_h",
        when(col("width") * targetH >= col("height") * targetW,
          greatest(lit(1L), expr(s"(height * $targetW) div width")))
          .otherwise(lit(targetH).cast("long")))

  /** Perceptual-hash analog (average-hash shape): sample 16 bytes at evenly
    * spaced offsets, set bit i when sample i exceeds the sample mean —
    * integer-compare form `v_i * 16 > Σv` so no division is involved. With
    * a real decoder the samples become downscaled grayscale pixels; the
    * bit-threshold plumbing (and its shuffle-free, codegen'd plan) is
    * identical. Near-duplicate media then joins on hash chunks exactly like
    * [[DedupOps.simhashPairs]]. */
  def perceptualHash(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), col("media_type"),
        expr("""transform(sequence(0, 15), i ->
                  ascii(substring(CAST(bytes AS STRING),
                    CAST((i * length(CAST(bytes AS STRING))) DIV 16 AS INT) + 1,
                    1)))""").as("v"))
      .select(col("media_id"), col("media_type"), col("v"),
        expr("aggregate(v, CAST(0 AS BIGINT), (a, y) -> a + y)").as("vsum"))
      .select(col("media_id"), col("media_type"),
        expr("""aggregate(
                  zip_with(v, sequence(0, 15), (x, i) ->
                    IF(x * 16 > vsum,
                       shiftleft(CAST(1 AS BIGINT), CAST(15 - i AS INT)),
                       CAST(0 AS BIGINT))),
                  CAST(0 AS BIGINT), (a, x) -> a + x)""").as("phash"))

  /** Near-duplicate media pairs: the 16-bit perceptual hash is cut into 4
    * chunks of 4 bits; pairs colliding on any chunk (pigeonhole-complete
    * for hamming ≤ 3) are confirmed by exact hamming distance — the same
    * block-join shape as [[DedupOps.simhashPairs]], over media
    * fingerprints instead of token sketches. */
  def perceptualHashPairs(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    val ph = perceptualHash(media).localCheckpoint()
    val chunkVals = array((0 until 4).map(c =>
      shiftrightunsigned(col("phash"), c * 4) % 16): _*)
    val chunked = ph.select(col("media_id"), col("phash"),
      posexplode(chunkVals).as(Seq("chunk", "cval")))
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") &&
        col("a.cval") === col("b.cval") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Fixed-LENGTH window slicing for audio payloads — the dual of
    * [[sampleFrames]] (fixed count): hop = window length, variable window
    * count per row. Real waveform windowing replaces the byte slices with
    * sample frames; the explode/digest plumbing is identical. */
  def sampleAudioWindows(media: DataFrame, winLen: Int): DataFrame = {
    val slice = (idx: Column) =>
      col("bytes").substr(idx * winLen + lit(1), lit(winLen))
    media.filter(col("media_type") === "audio")
      .select(col("media_id"), col("bytes"),
        expr(s"(length(bytes) + $winLen - 1) div $winLen").as("n_win"))
      .select(col("media_id"),
        posexplode(sequence(lit(0), (col("n_win") - 1).cast("int")))
          .as(Seq("win_idx", "w")),
        col("bytes"))
      .select(col("media_id"), col("win_idx"),
        length(slice(col("win_idx"))).as("win_len"),
        md5(slice(col("win_idx"))).as("win_digest"))
  }

  /** Fixed-count frame sampling for video rows: split the payload into
    * `frames` contiguous byte ranges (a real implementation seeks to
    * keyframes; the slicing plumbing is identical). */
  def sampleFrames(media: DataFrame, frames: Int): DataFrame = {
    val total = length(col("bytes"))
    // NB Column./ is double division — cast back for an integer ceil
    val frameLen = ((total + frames - 1) / frames).cast("int")
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        posexplode(sequence(lit(0), lit(frames - 1))).as(Seq("frame_idx", "f")),
        col("bytes"), frameLen.as("flen"))
      .select(col("media_id"), col("frame_idx"),
        col("bytes").substr(col("frame_idx") * col("flen") + 1, col("flen"))
          .as("frame_bytes"))
      .filter(length(col("frame_bytes")) > 0)
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"),
        md5(col("frame_bytes")).as("frame_digest"))
  }
}

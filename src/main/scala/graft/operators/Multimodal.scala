package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed in partition-parallel batches.
  *
  * The container has no image/audio LIBRARIES, but PPM (P6) is a real
  * binary raster format simple enough to codec in pure JVM code — so
  * the decode step is a genuine binary parse ([[PpmCodec]]: magic,
  * comment-aware header tokenizer, raw RGB plane), not a stub. The
  * image CONTENT is synthesized deterministically from document text
  * (there are no real images in the fixtures), which keeps the features
  * SQL-recomputable for the DuckDB oracle while the Spark side
  * exercises the real codec path: encode in one `mapPartitions` batch,
  * decode/resize/re-encode in another.
  *
  * Scale notes: payloads stay columnar in parquet and are only
  * materialized inside the partition iterator (no driver collect, no
  * per-row task). Metadata-only queries (mm_meta) prune the payload
  * column entirely — the scan reads just the small columns, which is the
  * core trick for 100 TB multimodal tables.
  */
object Multimodal extends QueryModule {

  import Tables._

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * text (stand-in for image/audio bytes), plus typed metadata.
    */
  private def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source"),
        col("lang"),
        col("n_chars").as("orig_size"),
        lit("text/plain").as("mime")).as("meta"))

  // ---- metadata + payload digests (oracle-checked) --------------------

  /** Column-pruned metadata scan + cheap payload digests — no decode. */
  private def mmMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("media_id"),
      col("meta.source").as("source"),
      col("meta.mime").as("mime"),
      length(col("payload")).cast("long").as("n_bytes"),
      substring(hex(col("payload")), 1, 16).as("head_hex"),
      md5(col("payload")).as("payload_md5"))
      .orderBy("media_id")

  private val mmMetaOracle =
    """SELECT doc_id AS media_id, source, 'text/plain' AS mime,
      |  octet_length(CAST(text AS BLOB))::BIGINT AS n_bytes,
      |  substr(hex(CAST(text AS BLOB)), 1, 16) AS head_hex,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY media_id""".stripMargin

  // ---- batched encode / decode: a real binary raster codec ------------

  /** Pure-JVM PPM (P6) codec — binary "P6\n<w> <h>\n255\n" header plus a
    * raw interleaved RGB plane. `decode` is a real parser (magic check,
    * whitespace/comment-tolerant header tokenizer per the netpbm spec,
    * strict plane-length check), the shape a libjpeg/ffmpeg binding
    * would take in this slot.
    */
  object PpmCodec {
    final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
      def channels: Int = 3
      /** Mean pixel byte as exact integer sum / count (one double
        * division — bit-identical to an integer-SQL recomputation). */
      def brightness: Double = {
        var s = 0L
        var i = 0
        while (i < pixels.length) { s += pixels(i) & 0xff; i += 1 }
        if (pixels.length == 0) 0.0 else s.toDouble / pixels.length
      }
    }

    def encode(img: Image): Array[Byte] = {
      require(img.pixels.length == img.width * img.height * 3,
        s"plane length ${img.pixels.length} != ${img.width}x${img.height}x3")
      val header = s"P6\n${img.width} ${img.height}\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    def decode(payload: Array[Byte]): Image = {
      var pos = 0
      def fail(msg: String) =
        throw new IllegalArgumentException(s"bad PPM at byte $pos: $msg")
      def skipSpaceAndComments(): Unit = {
        var more = true
        while (more && pos < payload.length) {
          val c = payload(pos)
          if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
          else if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else more = false
        }
      }
      def readInt(): Int = {
        skipSpaceAndComments()
        val start = pos
        // accumulate in Long and cap: Int accumulation would wrap a
        // crafted value like 4294967297 back to 1 and slip past the
        // dimension bounds check below
        var v = 0L
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0')
          if (v > 1000000000L) fail("integer field out of range")
          pos += 1
        }
        if (pos == start) fail("expected integer")
        v.toInt
      }
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        fail("not a P6 ppm")
      pos = 2
      val (w, h, maxval) = (readInt(), readInt(), readInt())
      if (maxval != 255) fail(s"unsupported maxval $maxval")
      // bounds BEFORE the plane-length product: a crafted header like
      // 65536x65536 overflows w*h*3 in Int (to 0, matching an empty
      // plane) and must be rejected, not decoded
      if (w < 1 || h < 1 || w > 16384 || h > 16384)
        fail(s"dimensions out of range: ${w}x$h")
      // the single byte separating header from plane MUST be whitespace
      // per the spec — accepting any byte here would let a malformed
      // header like "P6\n2 2\n255X<plane>" decode successfully
      if (pos >= payload.length || !(payload(pos) == ' ' || payload(pos) == '\n' ||
          payload(pos) == '\r' || payload(pos) == '\t'))
        fail("missing whitespace after maxval")
      pos += 1
      val n = w * h * 3 // safe: bounded dims keep the product < 2^31
      if (payload.length - pos != n)
        fail(s"plane length ${payload.length - pos} != $n")
      Image(w, h, java.util.Arrays.copyOfRange(payload, pos, pos + n))
    }

    /** Nearest-neighbor downscale by 2 (the resize a thumbnail pipeline
      * runs): output pixel (x,y) = input pixel (2x,2y).
      */
    def halve(img: Image): Image = {
      val (dw, dh) = (math.max(img.width / 2, 1), math.max(img.height / 2, 1))
      val out = new Array[Byte](dw * dh * 3)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          val src = ((y * 2) * img.width + (x * 2)) * 3
          val dst = (y * dw + x) * 3
          out(dst) = img.pixels(src)
          out(dst + 1) = img.pixels(src + 1)
          out(dst + 2) = img.pixels(src + 2)
          x += 1
        }
        y += 1
      }
      Image(dw, dh, out)
    }

    /** Deterministic image synthesis from document text: dimensions from
      * (length, first byte), pixel plane = the text bytes cycled (zeros
      * for empty text). This stands in for real camera/render content so
      * the decoded features are SQL-recomputable from `text`.
      */
    def synthesize(text: Array[Byte]): Image = {
      val b0 = if (text.nonEmpty) text(0) & 0xff else 0
      val (w, h) = (16 + text.length % 48, 16 + b0 % 48)
      val pixels = new Array[Byte](w * h * 3)
      if (text.nonEmpty) {
        var i = 0
        while (i < pixels.length) { pixels(i) = text(i % text.length); i += 1 }
      }
      Image(w, h, pixels)
    }
  }

  private val ppmSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType)))

  /** The encode stage: synthesize and PPM-encode each document's image
    * in partition-parallel batches (one codec instance per partition,
    * iterator in/out). A real ingest pipeline has exactly this shape
    * with the synthesis replaced by reading raw camera/render bytes.
    */
  private def ppmTable(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(ppmSchema)
    documents(s, d).select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("text_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), PpmCodec.encode(
            PpmCodec.synthesize(r.getAs[Array[Byte]](1))))
        }
      }(enc)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("brightness", DoubleType)))

  /** Partition-parallel batch decode via mapPartitions: the PPM payload
    * is parsed for real (header tokenizer + plane), features are the
    * parsed dimensions and the exact mean pixel byte. Because the image
    * content is synthesized deterministically from text, the oracle
    * recomputes the same features from `text` in SQL: brightness over
    * the cycled plane is (full_cycles·Σbytes + prefix-sum(remainder)) /
    * plane_len, all exact integers until one double division.
    */
  private def mmFeatures(s: SparkSession, d: String): DataFrame = {
    val media = ppmTable(s, d)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(featureSchema)
    media.mapPartitions { rows =>
      // real pipeline: initialize codec / model session here, once
      rows.map { r =>
        val img = PpmCodec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), img.width, img.height, img.channels, img.brightness)
      }
    }(enc).orderBy("media_id")
  }

  // ---- batched resize (decode → halve → re-encode) --------------------

  private val resizeSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("src_w", IntegerType),
    StructField("src_h", IntegerType),
    StructField("dst_w", IntegerType),
    StructField("dst_h", IntegerType),
    StructField("out_bytes", LongType)))

  /** Full transcode: parse the PPM, nearest-neighbor downscale by 2,
    * re-encode, report the real output payload size (header included).
    * Same mapPartitions batch shape as mmFeatures (codec per partition,
    * iterator in/out); the oracle recomputes the output size as
    * header_len(dst dims) + dst_w·dst_h·3.
    */
  private def mmResize(s: SparkSession, d: String): DataFrame = {
    val media = ppmTable(s, d)
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(resizeSchema)
    media.mapPartitions { rows =>
      // real pipeline: initialize the codec once per partition
      rows.map { r =>
        val img = PpmCodec.decode(r.getAs[Array[Byte]](1))
        val small = PpmCodec.halve(img)
        val out = PpmCodec.encode(small)
        Row(r.getLong(0), img.width, img.height, small.width, small.height,
          out.length.toLong)
      }
    }(enc).orderBy("media_id")
  }

  // ---- frame sampling (video-style chunked payload access) ------------

  /** Split each payload into fixed 256-byte frames and keep every 4th —
    * the frame-sampling access pattern for video/audio payloads (seek to
    * byte ranges, hash/extract per frame), expressed columnar: the slice
    * + digest runs per-row inside codegen, no UDF, no full-payload
    * explode before the sample filter. Oracle: payloads are ASCII text
    * bytes here, so byte slices == char slices in DuckDB.
    */
  private def mmFrameSample(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("media_id"),
        posexplode(expr(
          """transform(sequence(0, greatest((length(payload)-1) div 256, 0)),
            |  i -> md5(substring(payload, i*256+1, 256)))""".stripMargin))
          .as(Seq("frame_idx", "frame_md5")))
      .filter(col("frame_idx") % 4 === 0)
      .withColumn("frame_idx", col("frame_idx").cast("long"))
      .orderBy("media_id", "frame_idx")

  /** DuckDB CTE `tt`: `documents.text`, guarded by the ASCII
    * precondition every byte-level mm oracle assumes (byte == codepoint,
    * so DuckDB's char functions see the same values Spark's UTF-8 bytes
    * carry). The guard raises via error() where the assumption is MADE,
    * so a future non-ASCII fixture fails the derivation loudly instead
    * of silently invalidating it (round-4 advice).
    */
  private def asciiTextCte(why: String): String =
    s"""tt AS (
       |  SELECT doc_id, CASE WHEN octet_length(encode(text)) = length(text)
       |    THEN text
       |    ELSE error('$why')
       |    END AS text
       |  FROM documents)""".stripMargin

  private val mmFrameSampleOracle =
    s"""WITH ${asciiTextCte("non-ASCII text: byte frames differ from char frames")}
      |SELECT media_id, frame_idx, frame_md5 FROM (
      |  SELECT doc_id AS media_id,
      |    unnest(range(greatest((length(text)-1) // 256, 0) + 1)) AS frame_idx,
      |    unnest(list_transform(range(greatest((length(text)-1) // 256, 0) + 1),
      |      i -> md5(substr(text, i*256+1, 256)))) AS frame_md5
      |  FROM tt)
      |WHERE frame_idx % 4 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"        -> mmMeta _,
    "mm_features"    -> mmFeatures _,
    "mm_resize"      -> mmResize _,
    "mm_framesample" -> mmFrameSample _,
  )

  /** DuckDB twin of [[PpmCodec.synthesize]]'s decoded features, as a CTE
    * over `documents` (payload pixel bytes == cycled ASCII codepoints of
    * `text`, proven by the byte-slice equality mm_framesample already
    * exercises). `m` is the plane length w·h·3; the cycled-plane byte
    * sum is full_cycles·Σ(all bytes) + Σ(first m mod n bytes) — exact
    * BIGINT arithmetic, one double division at the end.
    *
    * The whole derivation assumes codepoint == byte, i.e. ASCII text;
    * the `tt` CTE CHECKS that where it is assumed (octet_length of the
    * UTF-8 encoding vs char length) and raises via error() on a
    * non-ASCII fixture instead of silently deriving wrong features.
    */
  private val ppmDecodeCte =
    s"""${asciiTextCte("non-ASCII text invalidates the byte=codepoint oracle derivation")},
      |f AS (
      |  SELECT doc_id AS media_id, length(text) AS n,
      |    CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b0
      |  FROM tt),
      |d AS (
      |  SELECT media_id, n, (16 + n % 48)::INT AS w, (16 + b0 % 48)::INT AS h,
      |    ((16 + n % 48)::BIGINT * (16 + b0 % 48) * 3) AS m
      |  FROM f),
      |br AS (
      |  SELECT d.media_id, d.w, d.h,
      |    CASE WHEN d.n = 0 THEN 0.0
      |      ELSE ((d.m // d.n) * COALESCE(list_sum(list_transform(range(d.n),
      |          i -> ord(substr(t.text, i + 1, 1))::BIGINT)), 0)
      |        + COALESCE(list_sum(list_transform(range((d.m % d.n)::INT),
      |          i -> ord(substr(t.text, i + 1, 1))::BIGINT)), 0))::DOUBLE / d.m
      |    END AS brightness
      |  FROM d JOIN tt t ON t.doc_id = d.media_id)""".stripMargin

  private val mmFeaturesOracle =
    s"""WITH $ppmDecodeCte
       |SELECT media_id, w AS width, h AS height, 3::INT AS channels, brightness
       |FROM br ORDER BY media_id""".stripMargin

  /** PPM output size: "P6\n" + dims + "\n255\n" header (9 bytes plus the
    * decimal digits of each dimension) + the dst_w·dst_h·3 plane.
    */
  private val mmResizeOracle =
    s"""WITH $ppmDecodeCte,
       |r AS (
       |  SELECT media_id, w AS src_w, h AS src_h,
       |    greatest(w // 2, 1)::INT AS dst_w,
       |    greatest(h // 2, 1)::INT AS dst_h
       |  FROM br)
       |SELECT media_id, src_w, src_h, dst_w, dst_h,
       |  (9 + length(dst_w::VARCHAR) + length(dst_h::VARCHAR)
       |    + dst_w::BIGINT * dst_h * 3)::BIGINT AS out_bytes
       |FROM r ORDER BY media_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_meta"        -> mmMetaOracle,
    "mm_features"    -> mmFeaturesOracle,
    "mm_resize"      -> mmResizeOracle,
    "mm_framesample" -> mmFrameSampleOracle,
  )
}

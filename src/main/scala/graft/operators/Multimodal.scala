package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed in partition-parallel batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (see [[FakeDecoder]]); everything
  * Spark-side — the schema (binary + metadata struct), the
  * `mapPartitions` batch shape, partitioning, and the metadata-only
  * fast path that never touches payload bytes — is real and tested.
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

  // ---- batched decode / feature extraction (STUB decode) --------------

  /** STUB: a real pipeline would decode image/audio bytes here (PIL/
    * ffmpeg/torchvision equivalents are not in this container). The fake
    * is deterministic in the payload bytes so the plumbing is testable:
    * "width/height" from leading bytes, "brightness" = mean byte value.
    */
  object FakeDecoder {
    final case class Features(
        width: Int, height: Int, channels: Int, brightness: Double)

    def decode(payload: Array[Byte]): Features = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val mean =
        if (payload.isEmpty) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / payload.length
      Features(16 + b0 % 64, 16 + b1 % 64, 3, mean)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("brightness", DoubleType)))

  /** Partition-parallel batch decode via mapPartitions: one decoder
    * instance per partition (where a real codec would be initialized
    * once), iterator-in/iterator-out so rows stream without
    * materializing the partition. The STUB decode is deterministic
    * ASCII-byte arithmetic (payload = UTF-8 of ASCII text, so byte k ==
    * codepoint of char k), which makes it SQL-expressible — the oracle
    * recomputes width/height from the leading codepoints and brightness
    * as the exact integer byte sum over length (a single double
    * division on both engines, bit-identical).
    */
  private def mmFeatures(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d).select("media_id", "payload")
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(featureSchema)
    media.mapPartitions { rows =>
      // real pipeline: initialize codec / model session here, once
      rows.map { r =>
        val f = FakeDecoder.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), f.width, f.height, f.channels, f.brightness)
      }
    }(enc).orderBy("media_id")
  }

  // ---- batched resize (STUB codec, real plumbing) ---------------------

  private val resizeSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("src_w", IntegerType),
    StructField("src_h", IntegerType),
    StructField("dst_w", IntegerType),
    StructField("dst_h", IntegerType),
    StructField("out_bytes", LongType)))

  /** STUB resize: halves the fake-decoded dimensions and models the
    * output payload size; a real pipeline would transcode pixels here.
    * Same mapPartitions batch shape as mmFeatures (codec per partition,
    * iterator in/out); oracle-checked the same way (integer halving of
    * the stub dimensions).
    */
  private def mmResize(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d).select("media_id", "payload")
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(resizeSchema)
    media.mapPartitions { rows =>
      // real pipeline: initialize the codec once per partition
      rows.map { r =>
        val f = FakeDecoder.decode(r.getAs[Array[Byte]]("payload"))
        val (dw, dh) = (math.max(f.width / 2, 1), math.max(f.height / 2, 1))
        Row(r.getLong(0), f.width, f.height, dw, dh,
          dw.toLong * dh * f.channels)
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

  private val mmFrameSampleOracle =
    """SELECT media_id, frame_idx, frame_md5 FROM (
      |  SELECT doc_id AS media_id,
      |    unnest(range(greatest((length(text)-1) // 256, 0) + 1)) AS frame_idx,
      |    unnest(list_transform(range(greatest((length(text)-1) // 256, 0) + 1),
      |      i -> md5(substr(text, i*256+1, 256)))) AS frame_md5
      |  FROM documents)
      |WHERE frame_idx % 4 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"        -> mmMeta _,
    "mm_features"    -> mmFeatures _,
    "mm_resize"      -> mmResize _,
    "mm_framesample" -> mmFrameSample _,
  )

  /** DuckDB twin of [[FakeDecoder.decode]] as CTE columns over
    * `documents` (payload bytes == ASCII codepoints, proven by the
    * byte-slice equality mm_framesample already exercises).
    */
  private val fakeDecodeCte =
    """f AS (
      |  SELECT doc_id AS media_id, length(text) AS n,
      |    CASE WHEN length(text) >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b0,
      |    CASE WHEN length(text) >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS b1,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |      ELSE list_sum(list_transform(range(length(text)),
      |        i -> ord(substr(text, i + 1, 1))))::DOUBLE / length(text)
      |    END AS brightness
      |  FROM documents)""".stripMargin

  private val mmFeaturesOracle =
    s"""WITH $fakeDecodeCte
       |SELECT media_id, (16 + b0 % 64)::INT AS width,
       |  (16 + b1 % 64)::INT AS height, 3::INT AS channels, brightness
       |FROM f ORDER BY media_id""".stripMargin

  private val mmResizeOracle =
    s"""WITH $fakeDecodeCte,
       |d AS (
       |  SELECT media_id, (16 + b0 % 64)::INT AS src_w,
       |    (16 + b1 % 64)::INT AS src_h FROM f)
       |SELECT media_id, src_w, src_h,
       |  greatest(src_w // 2, 1)::INT AS dst_w,
       |  greatest(src_h // 2, 1)::INT AS dst_h,
       |  (greatest(src_w // 2, 1)::BIGINT * greatest(src_h // 2, 1) * 3)::BIGINT AS out_bytes
       |FROM d ORDER BY media_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_meta"        -> mmMetaOracle,
    "mm_features"    -> mmFeaturesOracle,
    "mm_resize"      -> mmResizeOracle,
    "mm_framesample" -> mmFrameSampleOracle,
  )
}

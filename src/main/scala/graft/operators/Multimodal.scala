package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, and per-batch feature extraction. No image/audio
  * codec ships in this container, so the DECODE step is a clearly
  * marked deterministic stub ([[fakeDecode]]) — but everything Spark
  * cares about is real: the binary column representation, the schema
  * of the feature struct, the `mapPartitions` batch shape (the Scala
  * analog of `mapInPandas` — one iterator per partition, vectorizable
  * per batch), and the partitioning.
  *
  * At 100 TB: binary payloads ride in parquet alongside metadata;
  * feature extraction is a narrow per-partition pass (no shuffle), and
  * the partition count — not driver memory — bounds parallelism.
  */
object Multimodal {

  /** STUB — stands in for a real image/audio decoder. Deterministic
    * pure function of the bytes so tests and the oracle can check the
    * plumbing: "width/height" are derived from byte statistics the way
    * a real decoder would derive them from the media header. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xFF))
    val width = (sum % 640).toInt + 1
    val height = (n % 480) + 1
    val brightness = if (n == 0) 0.0 else sum.toDouble / n
    (width, height, brightness)
  }

  /** Typed output record of the batched decode — using a product
    * encoder keeps the mapPartitions stage inside the Dataset plan
    * (DeserializeToObject → MapPartitions → SerializeFromObject), so
    * Catalyst still sees column-level schema on both sides instead of
    * an opaque RDD scan barrier. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                                 height: Int, brightness: Double)

  /** One sampled "video frame" (m03): fixed 256-byte frames, every
    * 4th sampled — the frame-sampling batch shape with the codec
    * stubbed, one output row per sampled frame. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, offset: Int,
                                 n_bytes: Int, brightness: Double)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary-column plumbing, SQL-expressible end: text → utf8 bytes as
    // the stand-in payload, plus typed metadata struct fields. Proves
    // the binary representation round-trips through parquet + oracle.
    "m01_binary_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8").cast(BinaryType))
        .select(col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("source").as("media_source"))
        .orderBy("doc_id")),

    // Feature extraction over binary payloads via mapPartitions — the
    // batched-UDF shape. The decode is the stub above; the Spark-side
    // schema/batching/partitioning is the real article.
    // Stays a Dataset the whole way: the tuple/product encoders keep
    // the decode stage in the typed plan (no .rdd barrier), so the
    // surrounding projections/order-by still plan and prune normally.
    "m02_media_features" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").cast(BinaryType).as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val (w, h, bright) = fakeDecode(bytes)
          // HALF_UP to match SQL ROUND semantics (rint would be half-even)
          MediaFeatures(id, bytes.length, w, h,
            BigDecimal(bright).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        })
        .toDF()
        .orderBy("doc_id")
    }),

    // m03: frame sampling — the video path's plumbing. The payload is
    // treated as a stream of fixed 256-byte frames; every 4th frame is
    // sampled (stride 1024 bytes) and per-frame features extracted.
    // Same typed-Dataset stance as m02, but flatMap-shaped: one input
    // row fans out to ceil(len/1024) frame rows inside the partition —
    // no shuffle, no decode on unsampled frames (a real codec would
    // seek keyframes the same way). Fan-out is linear in bytes, so at
    // 100 TB the pass stays scan-shaped and partition-bounded.
    "m03_frame_sample" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").cast(BinaryType).as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          (0 until bytes.length by 1024).iterator.map { off =>
            val n = math.min(256, bytes.length - off)
            var sum = 0L; var i = off
            while (i < off + n) { sum += bytes(i) & 0xFF; i += 1 }
            FrameFeatures(id, off / 256, off, n,
              BigDecimal(sum.toDouble / n)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        })
        .toDF()
        .orderBy("doc_id", "frame_idx")
    })
  )

  val oracle: Map[String, String] = Map(
    // md5(text) == md5 of the utf8 payload bytes (DuckDB's md5 hashes
    // the string's utf8 encoding; it has no BLOB overload).
    "m01_binary_meta" -> """
      SELECT doc_id,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS payload_md5,
        source AS media_source
      FROM documents ORDER BY doc_id""",

    // m02's decode stub is reproducible in SQL too: the fixture text is
    // pure ASCII (verified over sf0.1), so utf8 byte values == ascii
    // codepoints and the byte-sum can be expressed with ascii(substr).
    "m02_media_features" -> """
      WITH s AS (
        SELECT doc_id, length(text) AS n_bytes,
          list_sum(list_transform(range(1, length(text) + 1),
            i -> ascii(substr(text, CAST(i AS INT), 1)))) AS byte_sum
        FROM documents)
      SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
        CAST(byte_sum % 640 + 1 AS INT) AS width,
        CAST(n_bytes % 480 + 1 AS INT) AS height,
        ROUND(CAST(byte_sum AS DOUBLE) / n_bytes, 6) AS brightness
      FROM s ORDER BY doc_id""",

    // same ASCII-fixture reasoning as m02: frame byte sums are ascii
    // sums over substr windows.
    "m03_frame_sample" -> """
      WITH s AS (SELECT doc_id, text, length(text) AS len FROM documents),
      f AS (
        SELECT doc_id, text, len, unnest(range(0, len, 1024)) AS off
        FROM s),
      g AS (
        SELECT doc_id, off, LEAST(256, len - off) AS n,
          list_sum(list_transform(range(1, LEAST(256, len - off) + 1),
            i -> ascii(substr(text, CAST(off + i AS INT), 1)))) AS byte_sum
        FROM f)
      SELECT doc_id, CAST(off // 256 AS INT) AS frame_idx,
        CAST(off AS INT) AS "offset", CAST(n AS INT) AS n_bytes,
        ROUND(CAST(byte_sum AS DOUBLE) / n, 6) AS brightness
      FROM g ORDER BY doc_id, frame_idx"""
  )
}

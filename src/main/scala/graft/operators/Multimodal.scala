package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media payloads as opaque `binary` columns
  * with typed metadata, plus decode/feature-extract pipelines. As of
  * round 2 the image path is a REAL codec (`q_mm_4_image_decode`: PNG
  * encode + decode through JDK `javax.imageio`, oracle-checked via the
  * lossless round-trip); the generic stub (`decodeStub`) remains as the
  * documented swap point for formats whose codecs aren't in this
  * environment (JPEG/webp/audio).
  *
  * Scale notes: blobs ride along as columns — Parquet stores them
  * contiguously per row-group and column pruning skips them unless
  * projected. Decode/feature-extract runs per-partition (mapPartitions) so
  * a real codec would amortize model/codec init across a partition, the
  * same batch shape a vectorized/Arrow UDF would use.
  */
object Multimodal {

  final case class Media(doc_id: Long, blob: Array[Byte], fmt: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, n_frames: Long, feat_norm: Double)
  final case class PxFeatures(doc_id: Long, width: Long, height: Long,
      px_mean_raw: Double, px_min: Long, px_max: Long)

  /** REAL image codec round-trip (JDK `javax.imageio`, no external
    * libraries): render a deterministic 16×16 grayscale image from the
    * payload bytes, ENCODE it to actual PNG bytes, then DECODE those
    * bytes back and extract pixel statistics. PNG is lossless, so the
    * decoded raster equals the source bytes — which is what makes the
    * whole encode→decode path oracle-checkable from SQL.
    */
  private def pngRoundTrip(id: Long, text: String): PxFeatures = {
    val bytes = text.getBytes("UTF-8")
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < 256) {
      raster.setSample(i % 16, i / 16, 0, bytes(i % bytes.length) & 0xFF)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no executor-side tmp files
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val r = dec.getRaster
    var sum = 0L; var mn = 255L; var mx = 0L
    var j = 0
    while (j < 256) {
      val v = r.getSample(j % 16, j / 16, 0).toLong
      sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      j += 1
    }
    PxFeatures(id, dec.getWidth.toLong, dec.getHeight.toLong,
      sum.toDouble / 256.0, mn, mx)
  }

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * "frames" = every 16th byte, "features" = 4 fixed byte statistics.
    * Swap this single function for a real codec (JPEG decode, PCM frame
    * split, …) without touching any of the Spark plumbing around it.
    */
  private def decodeStub(m: Media): MediaFeatures = {
    val frames = m.blob.indices.collect { case i if i % 16 == 0 => m.blob(i) }
    val feats = Array[Double](
      m.blob.length.toDouble,
      if (m.blob.nonEmpty) m.blob.head.toDouble else 0.0,
      if (m.blob.nonEmpty) m.blob.last.toDouble else 0.0,
      frames.length.toDouble)
    val norm = math.sqrt(feats.map(f => f * f).sum)
    MediaFeatures(m.doc_id, m.blob.length.toLong, frames.length.toLong,
      math.rint(norm * 1e6) / 1e6)
  }

  /** The `documents` table dressed as a media table: text bytes as the
    * opaque payload + synthesized typed metadata.
    */
  private def mediaTable(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"))

  val all: Seq[Q] = Seq(

    Q("q_mm_1_blob_meta",
      """SELECT doc_id, CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
        | upper(substring(md5(text), 1, 8)) AS content_id,
        | CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // Metadata pass over opaque blobs: size + content digest + format
      // tag, no decode. This is the always-cheap path at 100 TB (pure
      // column statistics, blob bytes never leave the scan).
      mediaTable(s, d).select(
        col("doc_id"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        upper(substring(md5(col("blob")), 1, 8)).as("content_id"),
        col("fmt"))
        .orderBy("doc_id")
    },

    Q("q_mm_3_frame_sample",
      """SELECT doc_id, i AS frame_idx,
        | md5(substring(text, CAST(i * 128 + 1 AS INTEGER), 64)) AS frame_digest,
        | CAST(length(substring(text, CAST(i * 128 + 1 AS INTEGER), 64)) AS BIGINT) AS frame_len
        |FROM documents, (SELECT unnest(range(0, 4)) AS i)
        |WHERE doc_id < 50 AND length(text) > i * 128
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      // Frame sampling over an opaque payload: every other 64-byte window
      // (stride 128, up to 4 frames) sliced and digested WITHOUT decoding
      // — the "sample k frames per video" shape. Pure per-row projection
      // after a generator: no shuffle, blob bytes stay inside the scan
      // task; a real codec swaps in at the digest step.
      Tables(s, d, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"), explode(sequence(lit(0L), lit(3L))).as("i"))
        .filter(length(col("text")) > col("i") * 128)
        .select(col("doc_id"), col("i").as("frame_idx"),
          md5(expr("substring(text, CAST(i * 128 + 1 AS INT), 64)")).as("frame_digest"),
          length(expr("substring(text, CAST(i * 128 + 1 AS INT), 64)")).cast("long").as("frame_len"))
        .orderBy("doc_id", "frame_idx")
    },

    Q("q_mm_4_image_decode",
      """WITH px AS (
        | SELECT doc_id, ascii(substring(text, (i % len(text)) + 1, 1)) AS v
        | FROM documents, (SELECT unnest(range(0, 256)) AS i) WHERE doc_id < 100)
        |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        | floor((CAST(sum(v) AS DOUBLE) / 256) * 1000000 + 0.5) / 1000000 AS px_mean,
        | CAST(min(v) AS BIGINT) AS px_min, CAST(max(v) AS BIGINT) AS px_max
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // REAL codec, oracle-checked end to end: each doc's bytes render a
      // 16×16 grayscale image, encoded to genuine PNG bytes and decoded
      // back through `javax.imageio` per partition; the emitted features
      // (dimensions + pixel stats) come from the DECODED raster. Because
      // PNG is lossless, DuckDB can verify them from the source bytes
      // with ascii() arithmetic — any codec bug (stride, channel, clamp)
      // breaks the hash. Per-partition mapPartitions amortizes codec
      // setup, the same batch shape a vectorized Arrow UDF would use;
      // lossy codecs (JPEG) would swap in here with a tolerance test
      // instead of a hash oracle.
      import s.implicits._
      Tables(s, d, "documents").filter(col("doc_id") < 100)
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions(_.map { case (id, text) => pngRoundTrip(id, text) })
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          graft.functions.Num.round(col("px_mean_raw"), 6).as("px_mean"),
          col("px_min"), col("px_max"))
        .orderBy("doc_id")
    },

    Q.noOracle("q_mm_2_decode_features") { (s, d) =>
      // Decode + feature-extract via the stub codec: typed Dataset →
      // per-partition batch transform → columnar result. No oracle (the
      // codec is engine-side logic); unit-tested against hand-computed
      // features.
      import s.implicits._
      mediaTable(s, d).select("doc_id", "blob", "fmt").as[Media]
        .mapPartitions(_.map(decodeStub))
        .toDF()
        .orderBy("doc_id")
    }
  )
}

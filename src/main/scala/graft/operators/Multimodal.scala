package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media payloads as opaque `binary` columns
  * with typed metadata, plus decode/feature-extract pipelines. As of
  * round 3 BOTH decode paths are real codecs through JDK `javax.imageio`
  * and oracle-checked end to end: `q_mm_4_image_decode` (PNG round-trip
  * pixel stats) and `q_mm_2_decode_features` (decode → 4×4 mean-pool
  * downsample → feature norm). Formats whose codecs aren't in this
  * environment (JPEG/webp/audio) swap in at the encode step with a
  * tolerance oracle instead of a hash.
  *
  * Scale notes: blobs ride along as columns — Parquet stores them
  * contiguously per row-group and column pruning skips them unless
  * projected. Decode/feature-extract runs per-partition (mapPartitions) so
  * a real codec would amortize model/codec init across a partition, the
  * same batch shape a vectorized/Arrow UDF would use.
  */
object Multimodal {

  final case class Media(doc_id: Long, blob: Array[Byte], fmt: String)
  final case class PooledFeatures(doc_id: Long, pool_first_raw: Double,
      pool_last_raw: Double, feat_norm_raw: Double)
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

  /** REAL decode → transform → feature-extract (the round-2 stub,
    * replaced): the payload renders a 16×16 grayscale image, is encoded
    * to genuine PNG bytes, DECODED back through `javax.imageio`, then
    * DOWNSAMPLED by 4×4 mean-pooling into a 16-dim feature vector — the
    * decode/resize/embed shape of an image-ingest pipeline. Every value
    * downstream of the decode is exact (block sums are integers, /16 is
    * a power-of-two division, squares of k/16 stay inside double's 53
    * bits), so the whole pipeline hash-oracles against ascii()
    * arithmetic in SQL — any codec or pooling bug (stride, channel,
    * clamp, block indexing) breaks the hash. A lossy codec (JPEG) would
    * swap in at the encode step with a tolerance oracle instead.
    */
  private def decodePooled(id: Long, text: String): PooledFeatures = {
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
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", baos)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    val r = dec.getRaster
    val pool = new Array[Double](16)
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 4) {
        var s = 0L
        var dy = 0
        while (dy < 4) {
          var dx = 0
          while (dx < 4) {
            s += r.getSample(bx * 4 + dx, by * 4 + dy, 0)
            dx += 1
          }
          dy += 1
        }
        pool(by * 4 + bx) = s.toDouble / 16.0
        bx += 1
      }
      by += 1
    }
    var ss = 0.0
    var k = 0
    while (k < 16) { ss += pool(k) * pool(k); k += 1 }
    PooledFeatures(id, pool(0), pool(15), math.sqrt(ss))
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

    Q("q_mm_2_decode_features",
      """WITH px AS (
        | SELECT doc_id,
        |  ((i // 16) // 4) * 4 + ((i % 16) // 4) AS blk,
        |  ascii(substring(text, (i % len(text)) + 1, 1)) AS v
        | FROM documents, (SELECT unnest(range(0, 256)) AS i)),
        |pool AS (
        | SELECT doc_id, blk, CAST(sum(v) AS DOUBLE) / 16.0 AS p
        | FROM px GROUP BY doc_id, blk)
        |SELECT doc_id,
        | floor(sum(CASE WHEN blk = 0 THEN p END) * 1000000 + 0.5) / 1000000 AS pool_first,
        | floor(sum(CASE WHEN blk = 15 THEN p END) * 1000000 + 0.5) / 1000000 AS pool_last,
        | floor(sqrt(sum(p * p)) * 1000000 + 0.5) / 1000000 AS feat_norm
        |FROM pool GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // Decode + transform + feature-extract over EVERY document (no id
      // cap — the decode is the workload): real PNG decode via
      // javax.imageio, 4×4 mean-pool downsample, 16-dim feature norm.
      // Per-partition mapPartitions amortizes codec init; blobs never
      // shuffle (features are 3 doubles/row). All post-decode arithmetic
      // is exact in double (see decodePooled), so the hash oracle covers
      // the full decode→pool→norm path cross-engine.
      import s.implicits._
      Tables(s, d, "documents")
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions(_.map { case (id, text) => decodePooled(id, text) })
        .toDF()
        .select(col("doc_id"),
          graft.functions.Num.round(col("pool_first_raw"), 6).as("pool_first"),
          graft.functions.Num.round(col("pool_last_raw"), 6).as("pool_last"),
          graft.functions.Num.round(col("feat_norm_raw"), 6).as("feat_norm"))
        .orderBy("doc_id")
    }
  )
}

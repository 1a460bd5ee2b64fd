package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media payloads as opaque `binary` columns
  * with typed metadata, plus a decode/feature-extract pipeline whose
  * Spark-side plumbing (schema, typed Dataset, partition-parallel batch
  * processing) is real while the codec itself is a clearly-marked
  * deterministic stub (no image/audio libraries exist in this
  * environment).
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

package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryModule, Tables}

/** Multimodal columns: image/audio/video handled as opaque `binary`
  * columns with typed metadata, processed in per-partition batches
  * (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas`: iterator in, iterator out, one invocation per batch,
  * nothing collected to the driver).
  *
  * The codec itself is a STUB (this container has no image/audio
  * libraries): `encodeBlob`/`decodeMeta` write and parse a deterministic
  * fake container format — a 12-byte header (width, height, n_frames as
  * big-endian int32) followed by the raw payload. A real deployment swaps
  * the body of `decodeMeta`/`resizedBytes` for javax.imageio / ffmpeg
  * calls; everything around them — schema, encoders, partition-batch
  * shape, shuffle behavior — is the production path and is what these
  * queries verify (the header fields are derived arithmetically from
  * doc_id, so DuckDB can oracle the full binary round trip).
  */
object Multimodal extends QueryModule {

  case class Blob(doc_id: Long, blob: Array[Byte])
  case class Meta(doc_id: Long, width: Long, height: Long, n_frames: Long, payload_bytes: Long)

  private val HeaderLen = 12

  /** Deterministic fake "media file": header + UTF-8 payload. */
  def encodeBlob(docId: Long, text: String): Array[Byte] = {
    val payload = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
    val bb = ByteBuffer.allocate(HeaderLen + payload.length)
    bb.putInt((64 + docId % 512).toInt)       // width
    bb.putInt((64 + (docId * 7) % 512).toInt) // height
    bb.putInt((1 + docId % 30).toInt)         // n_frames
    bb.put(payload)
    bb.array()
  }

  /** STUB decode: parses the fake header. Real impl: imageio/ffmpeg probe. */
  def decodeMeta(docId: Long, blob: Array[Byte]): Meta = {
    val bb = ByteBuffer.wrap(blob)
    Meta(docId, bb.getInt().toLong, bb.getInt().toLong, bb.getInt().toLong,
      (blob.length - HeaderLen).toLong)
  }

  /** documents + synthesized binary column — the scan-side shape a real
    * multimodal table has (id + binary + metadata columns).
    */
  def withBlobs(spark: SparkSession, sfDir: String): Dataset[Blob] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => Blob(id, encodeBlob(id, text)) })
  }

  private def mmDecodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withBlobs(spark, sfDir)
      .mapPartitions(_.map(b => decodeMeta(b.doc_id, b.blob)))
      .toDF()
      .orderBy("doc_id")
  }

  /** Aspect-preserving resize to a 128-px bound, integer math (stub for
    * the pixel work; the dimension plan is the real logic a resize stage
    * runs before allocating output buffers).
    */
  private def mmResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withBlobs(spark, sfDir)
      .mapPartitions(_.map { b =>
        val m = decodeMeta(b.doc_id, b.blob)
        val (nw, nh) =
          if (m.width >= m.height) (128L, m.height * 128L / m.width)
          else (m.width * 128L / m.height, 128L)
        (b.doc_id, m.width, m.height, nw, nh, nw * nh * 3L)
      })
      .toDF("doc_id", "width", "height", "new_w", "new_h", "out_bytes")
      .orderBy("doc_id")
  }

  /** Video frame sampling: every 5th frame index from the container
    * header — flatMap fan-out per doc, the shape of a real
    * frame-extraction stage (decode is the stub; the fan-out, schema and
    * ordering are real).
    */
  private def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withBlobs(spark, sfDir)
      .flatMap { b =>
        val m = decodeMeta(b.doc_id, b.blob)
        (0L until m.n_frames by 5L).map(i => (b.doc_id, i))
      }
      .toDF("doc_id", "frame_idx")
      .orderBy("doc_id", "frame_idx")
  }

  /** Per-blob feature extraction — the encoder-stage shape: one
    * fixed-length numeric feature row per media object, computed inside
    * the partition batch (a real pipeline runs its image/audio encoder
    * here; the stub derives byte statistics over the payload, which the
    * oracle recomputes from the source text — the fixture is pure ASCII,
    * so text codepoints ARE the payload bytes). Row-local over the binary
    * column: no shuffle, and the blob itself never leaves the scan stage —
    * only the thin feature row moves on.
    */
  private def mmFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withBlobs(spark, sfDir)
      .mapPartitions(_.map { b =>
        var i = HeaderLen
        var sum = 0L
        var mn = 256L
        var mx = -1L
        val seen = new Array[Boolean](256)
        var distinct = 0L
        while (i < b.blob.length) {
          val v = b.blob(i) & 0xFF
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          if (!seen(v)) { seen(v) = true; distinct += 1 }
          i += 1
        }
        val n = (b.blob.length - HeaderLen).toLong
        (b.doc_id, n, sum,
          if (n == 0) None else Some(mn),
          if (n == 0) None else Some(mx),
          distinct)
      })
      .toDF("doc_id", "n_bytes", "sum_bytes", "min_byte", "max_byte", "n_distinct")
      .orderBy("doc_id")
  }

  private val BlobRoot = "/tmp/graft_blobs"

  /** Stable per-fixture tag (same scheme as the bucketed-layout seed):
    * source dir + fixture mtime, so regenerated fixtures never reuse
    * stale blobs.
    */
  private def blobTag(sfDir: String): String = {
    val m = new java.io.File(sfDir, "documents.parquet").lastModified() / 1000
    java.lang.Long.toHexString((sfDir.hashCode.toLong << 24) ^ m)
  }

  /** One-time blob landing zone per fixture (marker-gated, untimed
    * economics like the Derby/bucketed seeds): every 10th document's
    * bytes written as `<doc_id>.bin`, executor-side via foreachPartition
    * — the driver never holds the blobs. In production this directory is
    * the object-store prefix the upstream media pipeline already wrote;
    * the operator under test is the READ side.
    */
  private[graft] def ensureBlobDir(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    val dir = new java.io.File(BlobRoot, blobTag(sfDir))
    val marker = new java.io.File(dir, "_SEEDED")
    if (!marker.exists()) {
      graft.core.Warehouse.deleteRecursively(dir)
      dir.mkdirs()
      val path = dir.getPath
      Tables(spark, sfDir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .foreachPartition { it: Iterator[(Long, String)] =>
          it.foreach { case (id, text) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(path, s"$id.bin"),
              (if (text == null) "" else text).getBytes("UTF-8"))
            ()
          }
        }
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      ()
    }
    dir.getPath
  }

  /** Raw-file ingestion through Spark's `binaryFile` source — the real
    * scan path a multimodal lake uses for image/audio/video objects
    * (path, mtime, length, content), no stub anywhere: the files on disk
    * are read back by the production data source, ids recovered from
    * paths, content digested. The fixture blobs are the documents' bytes,
    * so DuckDB oracles the digest from the `documents` table directly
    * (ASCII: n_chars == byte length, md5(text) == md5(bytes)). At scale
    * binaryFile splits by FILE (one row per object, 2 GB cap per blob)
    * and the digest projection keeps the content column out of
    * everything after the scan.
    */
  private def binaryIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensureBlobDir(spark, sfDir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast(LongType).as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("digest"))
      .orderBy("doc_id")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_binary_ingest" -> QueryDef(binaryIngest, Some("""
      SELECT doc_id, n_chars AS n_bytes, md5(text) AS digest
      FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""")),
    "q_mm_features" -> QueryDef(mmFeatures, Some("""
      WITH ch AS (
        SELECT doc_id, ord(c) AS v FROM (
          SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
          FROM documents)
        WHERE c <> ''),
      f AS (
        SELECT doc_id, count(*) AS n_bytes, CAST(sum(v) AS BIGINT) AS sum_bytes,
               CAST(min(v) AS BIGINT) AS min_byte, CAST(max(v) AS BIGINT) AS max_byte,
               count(DISTINCT v) AS n_distinct
        FROM ch GROUP BY doc_id)
      SELECT d.doc_id, coalesce(f.n_bytes, 0) AS n_bytes,
             coalesce(f.sum_bytes, 0) AS sum_bytes,
             f.min_byte, f.max_byte,
             coalesce(f.n_distinct, 0) AS n_distinct
      FROM documents d LEFT JOIN f USING (doc_id)
      ORDER BY d.doc_id""")),
    "q_mm_decode_meta" -> QueryDef(mmDecodeMeta, Some("""
      SELECT doc_id,
             64 + doc_id % 512 AS width,
             64 + (doc_id * 7) % 512 AS height,
             1 + doc_id % 30 AS n_frames,
             strlen(text) AS payload_bytes
      FROM documents ORDER BY doc_id""")),
    "q_mm_resize" -> QueryDef(mmResize, Some("""
      WITH m AS (
        SELECT doc_id,
               64 + doc_id % 512 AS width,
               64 + (doc_id * 7) % 512 AS height
        FROM documents),
      r AS (
        SELECT doc_id, width, height,
               CASE WHEN width >= height THEN 128 ELSE width * 128 // height END AS new_w,
               CASE WHEN width >= height THEN height * 128 // width ELSE 128 END AS new_h
        FROM m)
      SELECT doc_id, width, height, new_w, new_h, new_w * new_h * 3 AS out_bytes
      FROM r ORDER BY doc_id""")),
    "q_mm_frame_sample" -> QueryDef(mmFrameSample, Some("""
      SELECT doc_id, unnest(range(0, 1 + doc_id % 30, 5)) AS frame_idx
      FROM documents ORDER BY doc_id, frame_idx""")))
}

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

  /** aHash-style 64-bit perceptual signature over the payload bytes —
    * the stub for a real pHash (DCT of a downscaled image): the payload
    * is split into 64 proportional chunks and bit k is set when chunk
    * k's mean byte exceeds the global mean. Like a real perceptual
    * hash, LOCAL edits flip few bits (only the touched chunks' means
    * move), so Hamming distance tracks payload similarity — which is
    * exactly what the banding downstream needs. Deterministic, empty
    * payload → 0.
    */
  def phash64(blob: Array[Byte]): Long = {
    val n = blob.length - HeaderLen
    if (n <= 0) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var i = 0
    var total = 0L
    while (i < n) {
      val v = blob(HeaderLen + i) & 0xFF
      val k = (i.toLong * 64L / n).toInt
      sums(k) += v; counts(k) += 1; total += v
      i += 1
    }
    val mean = total.toDouble / n
    var h = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0 && sums(k).toDouble / counts(k) > mean) h |= (1L << k)
      k += 1
    }
    h
  }

  private val PhashBands = 4
  private val PhashMaxHamming = 3

  /** Perceptual-hash near-duplicate detection over the BINARY corpus —
    * the multimodal member of the dedup family (image/video near-dups
    * survive re-encoding, so exact digests miss them; signatures
    * don't). Pairs within Hamming ≤ [[PhashMaxHamming]] of each other's
    * [[phash64]].
    *
    * Scale shape: the blob dies at the scan (mapPartitions emits only
    * (doc_id, 8-byte signature)); candidates come from LSH banding —
    * [[PhashBands]] disjoint 16-bit bands, band-value equi-join — so
    * pair work is bucket-bounded, never all-pairs. The threshold is
    * chosen ≤ bands−1 ON PURPOSE: by pigeonhole, any pair within
    * Hamming 3 has at least one of the 4 bands intact, so banding is
    * provably LOSSLESS here — and the oracle exploits exactly that: it
    * recomputes the result as the plain all-pairs Hamming filter over
    * the tapped signatures, which means a banding recall bug (not just
    * a scoring bug) hash-mismatches.
    */
  /** Rendition id offset — clear of ScaleGen's copy·10⁹ replica
    * shifts (base doc ids stay far below 5·10⁸).
    */
  private val RenditionOffset = 500000000L

  /** Banded near-dup join over a (doc_id, ph) signature frame —
    * factored out so the spec can feed constructed signatures and pin
    * the pigeonhole recall guarantee directly.
    */
  private[graft] def phashBandedPairs(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until PhashBands).map(k =>
      struct(lit(k).as("band"),
        shiftright(col("ph"), k * 16).bitwiseAND(lit(65535L)).as("bv")))
    val banded = sigs
      .select(col("doc_id"), col("ph"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("ph"), col("b.band").as("band"), col("b.bv").as("bv"))
    val l = banded.select(col("band"), col("bv"),
      col("doc_id").as("da"), col("ph").as("pa"))
    val r = banded.select(col("band").as("band_r"), col("bv").as("bv_r"),
      col("doc_id").as("db"), col("ph").as("pb"))
    l.join(r, col("band") === col("band_r") && col("bv") === col("bv_r") &&
        col("da") < col("db"))
      .select(col("da"), col("db"), col("pa"), col("pb"))
      .distinct() // a pair sharing several bands surfaces once
      .select(col("da"), col("db"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .orderBy("da", "db")
  }

  private def mmPhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // The fixture corpus carries no re-encoded copies, so every 10th
    // blob gets a deterministic RENDITION (single mid-payload byte
    // wobble — a lossy re-encode in miniature), the same
    // both-engines-derive-the-contamination move as q_dq_quarantine /
    // q_fuzzy_join. Renditions flow through the SAME kernel; the tap
    // carries whatever signatures the corpus + renditions produced, so
    // the oracle is agnostic to how blobs were made.
    val sigs = withBlobs(spark, sfDir)
      .mapPartitions(_.flatMap { b =>
        // Fail LOUDLY if the id-layout assumption behind RenditionOffset
        // is ever violated (a within-copy id in [5·10⁸, 10⁹) would make a
        // rendition id land in the next ScaleGen copy's copy·10⁹ range and
        // silently corrupt (da, db) pairs).
        require(b.doc_id % 1000000000L < RenditionOffset,
          s"doc_id ${b.doc_id}: within-copy id >= RenditionOffset $RenditionOffset")
        val base = (b.doc_id, phash64(b.blob))
        if (b.doc_id % 10 == 7 && b.blob.length > HeaderLen) {
          val r = b.blob.clone()
          val p = HeaderLen + (r.length - HeaderLen) / 2
          r(p) = ((r(p) + 1) & 0xFF).toByte
          Iterator(base, (b.doc_id + RenditionOffset, phash64(r)))
        } else Iterator(base)
      })
      .toDF("doc_id", "ph")
    // The tap read-back is the natural materialization point — the
    // signature computation runs once (the parquet write) and each
    // downstream leg re-reads the tiny (doc_id, ph) file, so no
    // persist() is needed (and under tap-disabled Bench the
    // localCheckpoint serves the same role).
    val tapped = OracleTap(spark, "mm_phash", sigs)
    // Staged, like StagedDedup: identical signatures collapse to one
    // representative BEFORE banding, so candidate work rides DISTINCT
    // signatures (a re-encoded corpus is mostly exact signature copies);
    // doc-level pairs are re-expanded afterwards — within-group pairs
    // arithmetically (Hamming 0), cross-group pairs by membership join.
    // Output size is the answer's size; the banding stage no longer
    // inflates with duplication.
    val reps = tapped.groupBy("ph").agg(min(col("doc_id")).as("rep"))
    val within = tapped.as("a").join(tapped.as("b"),
        col("a.ph") === col("b.ph") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        lit(0L).as("hamming"))
    val repPairs = phashBandedPairs(
      reps.select(col("rep").as("doc_id"), col("ph")))
    val cross = repPairs
      .join(reps.select(col("rep").as("da"), col("ph").as("pha")), "da")
      .join(reps.select(col("rep").as("db"), col("ph").as("phb")), "db")
      .join(tapped.select(col("ph").as("pha"), col("doc_id").as("ma")), "pha")
      .join(tapped.select(col("ph").as("phb"), col("doc_id").as("mb")), "phb")
      .select(least(col("ma"), col("mb")).as("da"),
        greatest(col("ma"), col("mb")).as("db"), col("hamming"))
    within.unionByName(cross).orderBy("da", "db")
  }

  // ---- Persisted pHash near-dup index: the multimodal lifecycle --------
  //
  // q_mm_phash_dedup answers the one-shot batch question; this is the
  // ingest-time one — "is this arriving media object a re-encode of
  // anything already ingested" — against a PERSISTED band-postings index,
  // the same production lifecycle the MinHash (text) and semdedup
  // (embedding) modalities already carry: staged-rename appends under a
  // writer lease, an atomically-replaced manifest gating probe visibility,
  // an ingest-key ledger making at-least-once replays no-ops, and a
  // tombstone ledger for takedowns. The postings row is
  // (band, bv, doc_id, ph): 16-bit band values for the equi-join plus the
  // full 64-bit signature, so the Hamming verify is INDEX-LOCAL — unlike
  // the MinHash probe, no doc-store lookup is needed and the blob itself
  // is never touched after signature extraction. A probe hashes only the
  // batch (O(batch) signatures) and bucket-joins the committed postings;
  // threshold ≤ bands−1 keeps the pigeonhole-losslessness of
  // [[phashBandedPairs]], which the tap oracle exploits: it recomputes
  // the probe as the full probe×index Hamming filter over the tapped
  // signatures, so a banding RECALL bug (not just a scoring bug)
  // hash-mismatches. Manifest plumbing is shared with the MinHash index
  // (Dedup.readBatchManifest et al. — one commit protocol across every
  // index family).

  private val PhashIndexRoot = "/tmp/graft_phash"

  /** The dirs a complete phash layout comprises (manifest aside). */
  private[graft] val PhashLayoutSubs = Seq("postings")

  private def phashIndexTag(sfDir: String): String = {
    val f = new java.io.File(sfDir, "documents.parquet")
    val len =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(_.length()).sum).getOrElse(0L)
    "v1-" + java.lang.Long.toHexString((sfDir.hashCode.toLong << 24) ^ f.lastModified()) +
      "-" + java.lang.Long.toHexString(len)
  }

  /** (doc_id, ph) signatures of a (doc_id, text) frame — blob synthesis +
    * phash64 fused in one mapPartitions pass; the blob dies in the task.
    */
  private[graft] def sigsOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, phash64(encodeBlob(id, t))) })
      .toDF("doc_id", "ph")
  }

  /** Rendition signatures (the mid-payload byte wobble of
    * [[mmPhashDedup]]) for docs matching `doc_id % mod == 7` — the
    * deterministic both-engines-agnostic stand-in for re-encoded copies
    * arriving at ingest, carrying [[RenditionOffset]]-shifted ids.
    */
  private[graft] def renditionSigsOf(spark: SparkSession, docs: DataFrame,
      mod: Long): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        require(id % 1000000000L < RenditionOffset,
          s"doc_id $id: within-copy id >= RenditionOffset $RenditionOffset")
        val b = encodeBlob(id, t)
        if (id % mod == 7 && b.length > HeaderLen) {
          val p = HeaderLen + (b.length - HeaderLen) / 2
          b(p) = ((b(p) + 1) & 0xFF).toByte
          Iterator((id + RenditionOffset, phash64(b)))
        } else Iterator.empty
      })
      .toDF("doc_id", "ph")
  }

  /** Explode a (doc_id, ph) signature frame into its band postings
    * (band, bv, doc_id, ph) — the persisted row.
    */
  private[graft] def phashPostings(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until PhashBands).map(k =>
      struct(lit(k).as("band"),
        shiftright(col("ph"), k * 16).bitwiseAND(lit(65535L)).as("bv")))
    sigs.select(col("doc_id"), col("ph"), explode(array(bandStructs: _*)).as("b"))
      .select(col("b.band").as("band"), col("b.bv").as("bv"),
        col("doc_id"), col("ph"))
  }

  /** Write the postings index over `docs` as the single batch 0 —
    * the rebuild/seed writer (`keepIngestKeys` rides in the manifest
    * commit like every index family's).
    */
  private[graft] def writePhashIndex(spark: SparkSession, dir: String,
      docs: DataFrame, keepIngestKeys: Seq[String] = Seq.empty): Unit = {
    phashPostings(sigsOf(spark, docs))
      .withColumn("batch_id", lit(0L))
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(new java.io.File(dir, "postings").getPath)
    Dedup.writeBatchManifest(dir, Seq(0L), ingestKeys = keepIngestKeys)
  }

  /** One-time seed over the sub-400 corpus slice (marker-gated, untimed
    * economics like the MinHash/IVF/Derby seeds).
    */
  private[graft] def ensurePhashIndex(spark: SparkSession, sfDir: String): String = {
    val dir = new java.io.File(PhashIndexRoot, phashIndexTag(sfDir))
    val marker = new java.io.File(dir, "_SEEDED")
    if (!marker.exists()) {
      graft.core.Warehouse.deleteRecursively(dir)
      dir.mkdirs()
      writePhashIndex(spark, dir.getPath,
        Tables(spark, sfDir, "documents").filter(col("doc_id") < 400))
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      ()
    }
    dir.getPath
  }

  /** Append an ingest batch's postings as a new batch_id partition —
    * staged dot-directory, atomic rename, manifest commit, ingest-key
    * ledger: byte-for-byte the MinHash/IVF append protocol.
    */
  private[graft] def phashIndexAppend(spark: SparkSession, dir: String,
      newDocs: DataFrame, ingestKey: Option[String] = None): Unit =
    graft.core.WriterLease.withLease(dir, "phash append") {
      graft.core.StagedSwap.recover(dir, PhashLayoutSubs)
      val ledger = Dedup.readIngestKeys(dir)
      if (!ingestKey.exists(ledger.contains)) {
        val committed = Dedup.readBatchManifest(dir)
        val postingsRoot = new java.io.File(dir, "postings")
        val onDisk = Option(postingsRoot.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
          .map(_.getName.stripPrefix("batch_id=").toLong)
        val newId = (onDisk :+ 0L).max + 1
        val staging = new java.io.File(dir, s".staging_batch_$newId")
        graft.core.Warehouse.deleteRecursively(staging)
        phashPostings(sigsOf(spark, newDocs))
          .write.mode("overwrite").parquet(staging.getPath)
        java.nio.file.Files.move(staging.toPath,
          new java.io.File(postingsRoot, s"batch_id=$newId").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Dedup.writeBatchManifest(dir, committed :+ newId,
          Dedup.readTombstoneManifest(dir), ledger ++ ingestKey)
      }
    }

  /** Takedown: tombstone a doc-id batch (staged + atomic rename +
    * manifest swap — the shared delete protocol).
    */
  private[graft] def phashIndexDelete(spark: SparkSession, dir: String,
      ids: DataFrame): Unit =
    graft.core.WriterLease.withLease(dir, "phash delete") {
      graft.core.StagedSwap.recover(dir, PhashLayoutSubs)
      val batches = Dedup.readBatchManifest(dir)
      val tombs = Dedup.readTombstoneManifest(dir)
      val root = new java.io.File(dir, "tombstones")
      root.mkdirs()
      val onDisk = Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName.stripPrefix("batch_id=").toLong)
      val newId = (onDisk :+ 0L).max + 1
      val staging = new java.io.File(dir, s".tombstone_batch_$newId")
      graft.core.Warehouse.deleteRecursively(staging)
      ids.select(col("doc_id")).distinct()
        .coalesce(1).write.mode("overwrite").parquet(staging.getPath)
      java.nio.file.Files.move(staging.toPath,
        new java.io.File(root, s"batch_id=$newId").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Dedup.writeBatchManifest(dir, batches, tombs :+ newId,
        Dedup.readIngestKeys(dir))
    }

  /** Compact the committed postings batches into one — the shared
    * lifecycle op (staged merged rewrite, atomic rename, manifest swap
    * to the single batch, GC of only the batch ids committed at start;
    * tombstones materialize physically and their ledger clears, ingest
    * keys survive so pre-compaction replays stay no-ops). Probes are
    * row-identical before/after — MultimodalSpec pins it.
    */
  private[graft] def phashIndexCompact(spark: SparkSession, dir: String): Unit =
    graft.core.WriterLease.withLease(dir, "phash compact") {
      graft.core.StagedSwap.recover(dir, PhashLayoutSubs)
      val committed = Dedup.readBatchManifest(dir)
      val tombs = Dedup.readTombstoneManifest(dir)
      if (committed.size > 1 || tombs.nonEmpty) {
        val postingsRoot = new java.io.File(dir, "postings")
        val onDisk = Option(postingsRoot.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
          .map(_.getName.stripPrefix("batch_id=").toLong)
        val newId = (onDisk :+ 0L).max + 1
        val staging = new java.io.File(dir, s".compact_batch_$newId")
        graft.core.Warehouse.deleteRecursively(staging)
        val merged = spark.read.parquet(postingsRoot.getPath)
          .where(col("batch_id").isin(committed: _*))
        val dropped =
          if (tombs.isEmpty) merged
          else merged.join(
            spark.read.parquet(new java.io.File(dir, "tombstones").getPath)
              .where(col("batch_id").isin(tombs: _*)).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
        dropped
          .drop("batch_id")
          .coalesce(8)
          .write.mode("overwrite").parquet(staging.getPath)
        java.nio.file.Files.move(staging.toPath,
          new java.io.File(postingsRoot, s"batch_id=$newId").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Dedup.writeBatchManifest(dir, Seq(newId),
          ingestKeys = Dedup.readIngestKeys(dir))
        committed.foreach { id =>
          graft.core.Warehouse.deleteRecursively(
            new java.io.File(postingsRoot, s"batch_id=$id"))
        }
        tombs.foreach { id =>
          graft.core.Warehouse.deleteRecursively(
            new java.io.File(new java.io.File(dir, "tombstones"), s"batch_id=$id"))
        }
      }
    }

  /** Rebuild the postings index from the SURVIVING corpus content — the
    * pHash leg of the shared from-scratch protocol
    * ([[Dedup.minhashIndexRebuild]], the IVF/semdedup rebuilds): the op
    * that pays off after enough appends/tombstones fragment the index,
    * or after a signature-extraction change. Surviving ids come from
    * the committed postings minus the tombstone ledger; their content
    * re-hashes from the corpus; the new single-batch layout stages
    * under [[graft.core.StagedSwap]] and commits atomically (a crash
    * mid-rebuild leaves the old index fully probe-able). Ingest keys
    * survive — a pre-rebuild replay stays a no-op — and the tombstone
    * ledger clears (the rebuild materializes every takedown).
    */
  private[graft] def phashIndexRebuild(spark: SparkSession, dir: String,
      corpus: DataFrame): Unit =
    graft.core.WriterLease.withLease(dir, "phash rebuild") {
      // Heal any crashed PREVIOUS swap before reading manifest/postings —
      // without this, a crash mid-swap (postings moved aside, manifest
      // not yet) would have this rebuild read a half-swapped layout or
      // miss the postings dir entirely. Every sibling op (append/delete/
      // compact) recovers first for the same reason.
      graft.core.StagedSwap.recover(dir, PhashLayoutSubs)
      val committed = Dedup.readBatchManifest(dir)
      val surviving0 = spark.read
        .parquet(new java.io.File(dir, "postings").getPath)
        .where(col("batch_id").isin(committed: _*))
        .select(col("doc_id")).distinct()
      val tombs = Dedup.readTombstoneManifest(dir)
      val surviving =
        if (tombs.isEmpty) surviving0
        else surviving0.join(
          spark.read.parquet(new java.io.File(dir, "tombstones").getPath)
            .where(col("batch_id").isin(tombs: _*)).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      // Snapshot BEFORE the swap below — the rebuild must never lazily
      // read the postings it is about to replace.
      val content = corpus.join(surviving, Seq("doc_id"))
        .select(col("doc_id"), col("text"))
        .localCheckpoint(true)
      graft.core.StagedSwap.swapInPlace(dir, PhashLayoutSubs) { stage =>
        writePhashIndex(spark, stage, content,
          keepIngestKeys = Dedup.readIngestKeys(dir))
      }
      graft.core.Warehouse.deleteRecursively(new java.io.File(dir, "tombstones"))
    }

  /** Probe the committed postings with a (doc_id, ph) signature batch:
    * band the batch, equi-join on (band, bv), Hamming-verify from the
    * postings' own signatures (no doc-store round trip), anti-join the
    * tombstone ledger. The tap carries BOTH sides' distinct signatures
    * (probe + surviving index) so DuckDB recomputes the probe as the
    * full cross Hamming filter — losslessness of the banding included.
    */
  private[graft] def probePhashIndex(spark: SparkSession, dir: String,
      probeSigs: DataFrame, tap: Option[String] = None): DataFrame = {
    val committed = Dedup.readBatchManifest(dir)
    val postings0 = spark.read
      .parquet(new java.io.File(dir, "postings").getPath)
      .where(col("batch_id").isin(committed: _*))
      .select(col("band"), col("bv"), col("doc_id").as("dup_of"), col("ph").as("ph_i"))
    val tombs = Dedup.readTombstoneManifest(dir)
    val postings =
      if (tombs.isEmpty) postings0
      else postings0.join(
        spark.read.parquet(new java.io.File(dir, "tombstones").getPath)
          .where(col("batch_id").isin(tombs: _*))
          .select(col("doc_id").as("dup_of")),
        Seq("dup_of"), "left_anti")
    val tapped = tap.fold(probeSigs) { n =>
      OracleTap(spark, n,
        probeSigs.select(col("doc_id"), col("ph"), lit("probe").as("side"))
          .unionByName(postings.select(col("dup_of").as("doc_id"),
            col("ph_i").as("ph"), lit("index").as("side")).distinct()))
        .filter(col("side") === "probe").select("doc_id", "ph")
    }
    phashPostings(tapped)
      .join(postings, Seq("band", "bv"))
      .select(col("doc_id"), col("dup_of"), col("ph"), col("ph_i"))
      .distinct()
      .select(col("doc_id"), col("dup_of"),
        bit_count(col("ph").bitwiseXOR(col("ph_i"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .orderBy("doc_id", "dup_of")
  }

  /** Rendition-probe modulus: every 25th doc re-encodes, so the probe
    * carries a bounded planted-hit set next to the genuinely-new docs.
    */
  private val PhashProbeMod = 25L

  private def phashIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensurePhashIndex(spark, sfDir)
    val docs = Tables(spark, sfDir, "documents")
    val probe = sigsOf(spark, docs.filter(col("doc_id") >= 400))
      .unionByName(renditionSigsOf(spark, docs.filter(col("doc_id") < 400), PhashProbeMod))
    probePhashIndex(spark, dir, probe, tap = Some("phash_inc"))
  }

  private def phashDelete(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seed = ensurePhashIndex(spark, sfDir)
    val dir = graft.core.Warehouse.scratchFromSeed(seed, "graft_phash_del")
    val docs = Tables(spark, sfDir, "documents")
    val probe = sigsOf(spark, docs.filter(col("doc_id") >= 400))
      .unionByName(renditionSigsOf(spark, docs.filter(col("doc_id") < 400), PhashProbeMod))
      .localCheckpoint(true) // probed twice (victim pick + final)
    val victimRow = probePhashIndex(spark, dir, probe).agg(min(col("dup_of"))).head()
    if (!victimRow.isNullAt(0))
      phashIndexDelete(spark, dir, Seq(victimRow.getLong(0)).toDF("doc_id"))
    probePhashIndex(spark, dir, probe, tap = Some("phash_del"))
  }

  /** The pHash index's compaction lifecycle as an entry: scratch from
    * the seed, append an ingest batch (second batch_id dir), take down
    * the smallest matched index doc (tombstone ledger), COMPACT — the
    * merged single batch materializes the takedown physically and
    * clears the tombstone ledger — and probe. The probe must equal the
    * pre-compact post-delete answer exactly, which the tapped
    * signatures + DuckDB's full cross Hamming recompute certify.
    */
  private def phashCompact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seed = ensurePhashIndex(spark, sfDir)
    val dir = graft.core.Warehouse.scratchFromSeed(seed, "graft_phash_compact")
    val docs = Tables(spark, sfDir, "documents")
    phashIndexAppend(spark, dir,
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 450))
    val probe = sigsOf(spark, docs.filter(col("doc_id") >= 450))
      .unionByName(renditionSigsOf(spark, docs.filter(col("doc_id") < 450), PhashProbeMod))
      .localCheckpoint(true) // probed twice (victim pick + final)
    val victimRow = probePhashIndex(spark, dir, probe).agg(min(col("dup_of"))).head()
    if (!victimRow.isNullAt(0))
      phashIndexDelete(spark, dir, Seq(victimRow.getLong(0)).toDF("doc_id"))
    phashIndexCompact(spark, dir)
    probePhashIndex(spark, dir, probe, tap = Some("phash_compact"))
  }

  /** The pHash index's from-scratch rebuild as an entry — completing
    * the lifecycle matrix (every other index family carries one):
    * scratch from the seed, append an ingest batch, take down the
    * smallest matched index doc, then REBUILD from the surviving corpus
    * content — the new single-batch index must answer the probe
    * exactly like the fragmented post-delete index did, certified by
    * the tapped signatures + DuckDB's full cross Hamming recompute.
    */
  private def phashRebuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seed = ensurePhashIndex(spark, sfDir)
    val dir = graft.core.Warehouse.scratchFromSeed(seed, "graft_phash_rebuild")
    val docs = Tables(spark, sfDir, "documents")
    phashIndexAppend(spark, dir,
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 450))
    val probe = sigsOf(spark, docs.filter(col("doc_id") >= 450))
      .unionByName(renditionSigsOf(spark, docs.filter(col("doc_id") < 450), PhashProbeMod))
      .localCheckpoint(true) // probed twice (victim pick + final)
    val victimRow = probePhashIndex(spark, dir, probe).agg(min(col("dup_of"))).head()
    if (!victimRow.isNullAt(0))
      phashIndexDelete(spark, dir, Seq(victimRow.getLong(0)).toDF("doc_id"))
    phashIndexRebuild(spark, dir, docs)
    probePhashIndex(spark, dir, probe, tap = Some("phash_rebuild"))
  }

  /** Streaming ingest into the persisted pHash index — the multimodal
    * twin of `s_minhash_ingest`/`s_ann_ingest`: media objects arrive as
    * a stream, each micro-batch publishes its postings through
    * [[phashIndexAppend]]'s atomic protocol in foreachBatch keyed on the
    * batchId (at-least-once replays are committed no-ops); the final
    * probe carries re-encodes OF THE STREAMED DOCS, so it must surface
    * near-dups against the committed arrivals.
    */
  private def phashIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val seed = ensurePhashIndex(spark, sfDir)
    val dir = graft.core.Warehouse.scratchFromSeed(seed, "graft_phash_ingest")
    val stream = graft.core.Tables.streamTable(spark, sfDir, "documents")
      .filter(col("doc_id") >= 400 && col("doc_id") < 450)
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (!b.isEmpty) phashIndexAppend(spark, dir, b,
          ingestKey = Some(s"stream-$batchId"))
      }
      .option("checkpointLocation", graft.core.TempDirs.create("graft_phash_ingest_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val docs = Tables(spark, sfDir, "documents")
    val probe = sigsOf(spark, docs.filter(col("doc_id") >= 450))
      .unionByName(renditionSigsOf(spark, docs.filter(col("doc_id") < 450), PhashProbeMod))
    probePhashIndex(spark, dir, probe, tap = Some("s_phash_ingest"))
  }

  /** Shared tap oracle for the index probes: the full probe×index
    * Hamming filter (losslessness of the ≤ bands−1 banding makes it
    * exactly the probe's answer).
    */
  private def phashProbeOracle(tapName: String): String = s"""
      WITH s AS (SELECT doc_id, ph, side
                 FROM read_parquet('/tmp/graft_oracle_aux/$tapName/*.parquet'))
      SELECT p.doc_id, i.doc_id AS dup_of,
             CAST(bit_count(xor(p.ph, i.ph)) AS BIGINT) AS hamming
      FROM s p JOIN s i ON p.side = 'probe' AND i.side = 'index'
      WHERE bit_count(xor(p.ph, i.ph)) <= $PhashMaxHamming
      ORDER BY p.doc_id, dup_of"""

  override val defs: Map[String, QueryDef] = Map(
    "q_phash_incremental" -> QueryDef(phashIncremental, Some(phashProbeOracle("phash_inc"))),
    "q_phash_delete" -> QueryDef(phashDelete, Some(phashProbeOracle("phash_del"))),
    "q_phash_compact" -> QueryDef(phashCompact, Some(phashProbeOracle("phash_compact"))),
    "q_phash_rebuild" -> QueryDef(phashRebuild, Some(phashProbeOracle("phash_rebuild"))),
    "s_phash_ingest" -> QueryDef(phashIngest, Some(phashProbeOracle("s_phash_ingest"))),
    "q_mm_phash_dedup" -> QueryDef(mmPhashDedup, Some(s"""
      WITH s AS (SELECT doc_id, ph
                 FROM read_parquet('/tmp/graft_oracle_aux/mm_phash/*.parquet'))
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ph, b.ph)) <= $PhashMaxHamming
      ORDER BY da, db""")),
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

package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, processed in distributed batches.
  *
  * The Spark-side plumbing is real — binary columns, typed Dataset rows,
  * `mapPartitions` batch processing (the Scala analogue of `mapInPandas`
  * batch UDFs), deterministic partitioning — while the actual codec is
  * STUBBED (no image/audio libraries in this container): `decodeStub`
  * derives width/height/frame_count deterministically from the payload
  * bytes, so the pipeline is end-to-end testable and oracle-verifiable.
  * Swapping in a real decoder changes only the body of `decodeStub`.
  */
object Media {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaMeta(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      checksum: String,
      width: Long,
      height: Long,
      frame_count: Long)

  /** Wrap a text corpus as a binary media table (payload = utf8 bytes) —
    * the test-world stand-in for reading real image/audio blobs. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload")).as[MediaRow]
  }

  /** STUB codec: deterministic pseudo-metadata from payload bytes. A real
    * implementation would hand `rows` (one batch per partition) to an
    * image/audio library; the batch shape, schema and partitioning are
    * what this pipeline exercises. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaMeta] = {
    val md = MessageDigest.getInstance("MD5") // one instance per partition
    rows.map { r =>
      md.reset()
      val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
      val n = r.payload.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        mime = r.mime,
        n_bytes = n,
        checksum = checksum,
        width = n % 640 + 1,
        height = n % 480 + 1,
        frame_count = n % 30 + 1)
    }
  }

  /** Distributed metadata extraction: batch "decode" per partition.
    * This is the template for TRUE codec calls — anything that must hand
    * payload bytes to a native library. Metadata that needs no codec has
    * the column fast path [[metaColumns]]. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(decodeStub)
  }

  /** Column-expression fast path for codec-free metadata: checksum,
    * byte count and the stub dims are `md5`/`length` compositions that
    * stay inside WholeStageCodegen — no DeserializeToObject, no object
    * row materialization (the mapPartitions path pays both). Same
    * output, plan-pinned in MediaSpec; at 100 TB this is the difference
    * between a codegen'd scan and (de)serializing every payload into
    * JVM objects just to hash it. */
  def metaColumns(media: DataFrame): DataFrame = {
    val n = length(col("payload")).cast("long")
    media.select(
      col("doc_id"), col("mime"),
      n.as("n_bytes"),
      md5(col("payload")).as("checksum"),
      (n % 640 + 1).as("width"),
      (n % 480 + 1).as("height"),
      (n % 30 + 1).as("frame_count"))
  }

  case class Frame(
      doc_id: Long,
      frame_idx: Long,
      frame_checksum: String,
      out_width: Long,
      out_height: Long)

  /** Frame sampling + resize plumbing: every `step`-th frame of each media
    * item becomes a row (1, 1+step, ...), carrying a per-frame checksum and
    * half-resolution output dims. The frame "decode" is the deterministic
    * stub (checksum-derived); the fan-out, schema, and partition-local
    * batch shape are the real pipeline. A real codec would replace the
    * frame synthesis inside the flatMap body only. */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int = 7): Dataset[Frame] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.flatMap { m =>
      val md = MessageDigest.getInstance("MD5")
      (1L to m.frame_count by step).map { i =>
        md.reset()
        val fc = md.digest(s"${m.checksum}:$i".getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        Frame(m.doc_id, i, fc, (m.width + 1) / 2, (m.height + 1) / 2)
      }
    }
  }
}

package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deflate-compressibility quality signal (the Gopher-family filter the
  * column-function stack cannot express): boilerplate and repetitive
  * spam compress far below natural prose, near-random gibberish barely
  * compresses at all, so the deflate ratio separates both tails in one
  * number. Like the multimodal codec boundary this is a black-box byte
  * transform, so it runs as a typed `mapPartitions` — ONE Deflater
  * allocated per partition and reset per document, compressed bytes
  * counted and discarded (nothing but the two integers survives the
  * task). Map-only: no shuffle, scales with the scan.
  *
  * Determinism: JDK Deflater at a fixed level is deterministic for
  * given input bytes on a given JRE, so results are stable across
  * partitionings and reruns (pinned in the spec) — but NOT specified
  * to be identical across zlib builds, which is why this operator is
  * test-verified rather than oracle-checked (DuckDB has no deflate).
  *
  * Output: idCol (long), raw_bytes, deflate_bytes, ratio_bp
  * (deflate·10000/raw, floor; empty text reports 10000 — "nothing to
  * compress" must not read as infinitely compressible).
  *
  * Precondition: idCol must be non-null and long-castable (the typed
  * encoder refuses null ids loudly); null TEXT is handled — it scores
  * as empty.
  */
object Compressibility {

  val DeflateLevel = 6 // zlib default — the ratio signal, not max effort

  def compressionStats(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)]
    typed.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(DeflateLevel, true)
      // release the native zlib buffer when the task ends, not when a GC
      // eventually notices (a long scan would pile up native memory)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
      val scratch = new Array[Byte](64 * 1024)
      rows.map { case (id, text) =>
        val raw =
          if (text == null) Array.emptyByteArray
          else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (raw.length == 0) (id, 0L, 0L, 10000L) // even the empty stream's terminator bytes would read as >1.0
        else {
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(scratch)
          (id, raw.length.toLong, compressed, compressed * 10000L / raw.length)
        }
      }
    }.toDF(idCol, "raw_bytes", "deflate_bytes", "ratio_bp")
  }

  /** The ORACLE-CHECKABLE face of the operator for the driver gate
    * (deflate_bytes has no DuckDB twin, but the properties that make it
    * a correct compression do): per document,
    *
    *  - `raw_bytes` — the UTF-8 byte length actually fed to the
    *    deflater, recomputable by a second engine (`strlen`), so the
    *    hash compare genuinely pins the input side cross-engine;
    *  - `ok_roundtrip` — inflate(deflate(text)) reproduces the exact
    *    input bytes (the lossless contract, verified in-task);
    *  - `ok_bounds` — 0 < deflate_bytes ≤ raw + 5·⌈raw/16383⌉ + 8
    *    (deflate's stored-block worst case), and the empty-text
    *    sentinel is exactly (0, 0, 10000).
    *
    * Same codec path and cost shape as [[compressionStats]] (one
    * Deflater + one Inflater per partition, map-only, nothing but
    * scalars survive the task). Null text scores as empty. */
  def compressionCheck(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String)] =
      df.select(col(idCol).cast("long"), col(textCol).cast("string"))
        .as[(Long, String)]
    typed.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(DeflateLevel, true)
      val inflater = new java.util.zip.Inflater(true)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit] { _ =>
          deflater.end(); inflater.end()
        })
      val scratch = new Array[Byte](64 * 1024)
      rows.map { case (id, text) =>
        val raw =
          if (text == null) Array.emptyByteArray
          else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (raw.length == 0) (id, 0L, true, true)
        else {
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
          while (!deflater.finished())
            out.write(scratch, 0, deflater.deflate(scratch))
          val compressed = out.toByteArray
          inflater.reset()
          inflater.setInput(compressed)
          val back = new java.io.ByteArrayOutputStream(raw.length)
          while (!inflater.finished())
            back.write(scratch, 0, inflater.inflate(scratch))
          val okRoundtrip = java.util.Arrays.equals(back.toByteArray, raw)
          val worstCase = raw.length.toLong + 5L * ((raw.length + 16382) / 16383) + 8L
          (id, raw.length.toLong,
            okRoundtrip,
            compressed.length > 0 && compressed.length <= worstCase)
        }
      }
    }.toDF(idCol, "raw_bytes", "ok_roundtrip", "ok_bounds")
  }
}

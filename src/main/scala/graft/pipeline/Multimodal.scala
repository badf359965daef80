package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, and a partition-wise decode/feature-extract stage.
  *
  * The Spark-side plumbing (schema, batching, partitioning, typed
  * signatures) is real; the media decode itself is a clearly-marked
  * deterministic STUB (the container ships no image/audio codecs — the
  * builder prompt's contract). Swap `stubDecode` for a real codec and
  * everything else stands.
  */
object Multimodal {

  case class MediaCell(media_id: Long, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      sha256_hex: String,
      width: Int,        // STUB: derived, not decoded
      height: Int,       // STUB: derived, not decoded
      feature: Array[Float]) // STUB: deterministic fake embedding

  /** Deterministic fake "decode": derives pseudo metadata + a fixed-size
    * feature vector from the bytes. Replaces a real image/audio decoder.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val w = 64 + (n % 577)
    val h = 64 + ((n * 7) % 417)
    val feat = Array.tabulate(8) { i =>
      val b = if (n == 0) 0 else (payload(i % n) & 0xff)
      ((b * 31 + i * 17) % 256) / 256.0f
    }
    (w, h, feat)
  }

  /** Partition-wise decode stage: the idiomatic Spark shape for a
    * per-record codec (mapPartitions => one codec init per partition, not
    * per row — mirrors `mapInPandas` batch semantics from the PySpark
    * world). */
  def decodeFeatures(cells: Dataset[MediaCell]): Dataset[MediaFeatures] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      // per-partition codec init would go here (expensive setup amortized)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { c =>
        val (w, h, feat) = stubDecode(c.payload)
        val sha = digest.digest(c.payload).map("%02x".format(_)).mkString
        digest.reset()
        MediaFeatures(c.media_id, c.payload.length, sha, w, h, feat)
      }
    }
  }

  /** documents.text → opaque binary payload table (the fixtures carry no
    * real media; the bytes are the utf-8 text, treated as a blob). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))

  case class Thumb(media_id: Long, w: Int, h: Int, pixels: Array[Byte])

  /** Resize/thumbnail stage: every payload down to a fixed w x h byte
    * grid by strided sampling — the STUB stand-in for a real scaler
    * (swap the inner loop for an image library and the stage stands).
    * Output size is constant per row regardless of input size, which is
    * the property the downstream feature-extract batch shape relies on.
    */
  def resizeStub(cells: Dataset[MediaCell], w: Int, h: Int): Dataset[Thumb] = {
    require(w > 0 && h > 0, s"bad thumb size: ${w}x$h")
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.map { c =>
        val n = c.payload.length
        val out = new Array[Byte](w * h)
        if (n > 0) {
          var i = 0
          while (i < out.length) {
            out(i) = c.payload((i.toLong * n / out.length).toInt)
            i += 1
          }
        }
        Thumb(c.media_id, w, h, out)
      }
    }
  }

  case class FrameSample(
      media_id: Long,
      frame_idx: Long,       // index in the FULL frame sequence
      n_bytes: Long,         // last frame may be partial
      sha256_hex: String)

  /** Frame sampling: every k-th fixed-size frame of each media payload —
    * the video-pipeline primitive (sample frames, not all of them,
    * before feature extraction). The STUB "frame" is a byte-range chunk
    * (a real demuxer plugs into the same loop); the fan-out is an
    * ITERATOR inside `mapPartitions` — one payload never materializes
    * all its frames at once, so a 4 GB video costs one frame of memory,
    * and the digest/codec initializes once per partition. Deterministic
    * end-to-end, so the driver gate oracle-checks it (q67). */
  def sampleFrames(
      cells: Dataset[MediaCell],
      frameBytes: Int,
      everyK: Int): Dataset[FrameSample] = {
    require(frameBytes > 0 && everyK > 0, s"bad sampling: $frameBytes/$everyK")
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { c =>
        val n = c.payload.length
        val nFrames = (n.toLong + frameBytes - 1) / frameBytes
        (0L until nFrames by everyK.toLong).iterator.map { i =>
          val from = (i * frameBytes).toInt
          val until = math.min(from + frameBytes, n)
          val chunk = java.util.Arrays.copyOfRange(c.payload, from, until)
          val sha = digest.digest(chunk).map("%02x".format(_)).mkString
          digest.reset()
          FrameSample(c.media_id, i, until - from, sha)
        }
      }
    }
  }

  case class FrameFeature(
      media_id: Long,
      frame_idx: Long,
      f0: Long, f1: Long, f2: Long, f3: Long) // STUB: byte-stripe sums

  /** Per-frame feature extraction over the [[sampleFrames]] chunking:
    * the STUB "feature" is the 4-dim byte-stripe sum (dim j sums the
    * bytes at chunk offsets ≡ j mod 4) — a real frame encoder plugs
    * into the same loop and the batch shape stands. Integer features,
    * so the pooled clip vector is oracle-replayable end to end. Same
    * iterator discipline as [[sampleFrames]]: one frame of memory per
    * payload, fan-out never materialized. */
  def frameFeatures(
      cells: Dataset[MediaCell],
      frameBytes: Int,
      everyK: Int): Dataset[FrameFeature] = {
    require(frameBytes > 0 && everyK > 0, s"bad sampling: $frameBytes/$everyK")
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.flatMap { c =>
        val n = c.payload.length
        val nFrames = (n.toLong + frameBytes - 1) / frameBytes
        (0L until nFrames by everyK.toLong).iterator.map { i =>
          val from = (i * frameBytes).toInt
          val until = math.min(from + frameBytes, n)
          val f = new Array[Long](4)
          var p = from
          while (p < until) {
            f((p - from) % 4) += c.payload(p) & 0xff
            p += 1
          }
          FrameFeature(c.media_id, i, f(0), f(1), f(2), f(3))
        }
      }
    }
  }
}

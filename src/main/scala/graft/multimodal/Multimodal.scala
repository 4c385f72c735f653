package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata structs.
  *
  * The Spark-side machinery — schema, batched per-partition decode,
  * partitioning, metadata extraction — is real and tested. The actual
  * codec is a STUB (this container has no image/audio libraries): a
  * deterministic fake header format stands in for JPEG/WAV/MP4, and
  * decode parses that header. Swapping in a real codec changes only
  * [[FakeCodec.decodeMeta]] / [[FakeCodec.decodePixels]].
  *
  * Scale posture: decode runs in `mapPartitions` over batches, so at
  * 100 TB each task amortizes codec init across its batch (the Scala
  * equivalent of `mapInPandas` batch shape); payloads never pass
  * through the driver, and metadata-only queries prune the binary
  * column at the parquet scan.
  */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT"

  sealed abstract class Kind(val code: Byte)
  object Kind {
    case object Image extends Kind(0)
    case object Audio extends Kind(1)
    case object Video extends Kind(2)
    def of(code: Byte): Kind = code match {
      case 0 => Image
      case 1 => Audio
      case _ => Video
    }
  }

  case class MediaMeta(kind: String, width: Int, height: Int, nFrames: Int,
                       payloadBytes: Long)

  /** The stub codec: header = magic(4) kind(1) width(4) height(4) frames(4). */
  object FakeCodec {
    val HeaderLen: Int = 17

    def encode(kind: Kind, width: Int, height: Int, nFrames: Int,
               payload: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(HeaderLen + payload.length).order(ByteOrder.BIG_ENDIAN)
      buf.putInt(Magic).put(kind.code).putInt(width).putInt(height).putInt(nFrames)
      buf.put(payload)
      buf.array()
    }

    def decodeMeta(bytes: Array[Byte]): Option[MediaMeta] = {
      if (bytes == null || bytes.length < HeaderLen) return None
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      if (buf.getInt() != Magic) return None
      val kind = Kind.of(buf.get())
      Some(MediaMeta(kind.getClass.getSimpleName.stripSuffix("$").toLowerCase,
        buf.getInt(), buf.getInt(), buf.getInt(), bytes.length.toLong - HeaderLen))
    }

    /** Pixel decode STUB — a real build would inflate the payload here. */
    def decodePixels(bytes: Array[Byte]): Option[Array[Byte]] =
      decodeMeta(bytes).map(_ => bytes.drop(HeaderLen))
  }

  /** Deterministic synthetic media for tests/fixtures: dimensions and
    * payload derive from the seed alone. */
  def synthesize(seed: Long, kind: Kind = Kind.Image): Array[Byte] = {
    val width = (64 + math.floorMod(seed * 7919L, 1216L)).toInt
    val height = (64 + math.floorMod(seed * 104729L, 656L)).toInt
    val nFrames = if (kind == Kind.Video) (1 + math.floorMod(seed, 120L)).toInt else 1
    val payload = new Array[Byte](16)
    var x = seed
    for (i <- payload.indices) { x = x * 6364136223846793005L + 1442695040888963407L; payload(i) = (x >>> 56).toByte }
    FakeCodec.encode(kind, width, height, nFrames, payload)
  }

  /** Batched metadata extraction: `(id, media)` → `(id, kind, width,
    * height, n_frames, payload_bytes)`. Batch-shaped decode inside
    * mapPartitions — codec state initializes once per batch. */
  def extractMeta(ds: Dataset[(Long, Array[Byte])], batchSize: Int = 256): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would go here (real codecs are stateful)
        batch.iterator.map { case (id, bytes) =>
          val m = FakeCodec.decodeMeta(bytes)
          (id, m.map(_.kind).orNull, m.map(_.width).getOrElse(-1),
            m.map(_.height).getOrElse(-1), m.map(_.nFrames).getOrElse(-1),
            m.map(_.payloadBytes).getOrElse(-1L))
        }
      }
    }.toDF("id", "kind", "width", "height", "n_frames", "payload_bytes")
  }

  /** Resize plumbing: rewrites header dims by `scale`, payload untouched
    * (stub for the real resampling kernel). */
  def resize(ds: Dataset[(Long, Array[Byte])], scale: Double): Dataset[(Long, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.map { case (id, bytes) =>
      FakeCodec.decodeMeta(bytes) match {
        case Some(m) =>
          val payload = bytes.drop(FakeCodec.HeaderLen)
          (id, FakeCodec.encode(Kind.of(bytes(4)),
            math.max(1, (m.width * scale).toInt),
            math.max(1, (m.height * scale).toInt), m.nFrames, payload))
        case None => (id, bytes)
      }
    }
  }

  /** Frame-sample plumbing for video-like media: indices of every k-th
    * frame — `(id, frame_idx)` rows, one per sampled frame. */
  def frameSample(ds: Dataset[(Long, Array[Byte])], everyK: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { case (id, bytes) =>
      FakeCodec.decodeMeta(bytes).toSeq.flatMap(m => 0 until m.nFrames by everyK)
        .map(idx => (id, idx))
    }.toDF("id", "frame_idx")
  }
}

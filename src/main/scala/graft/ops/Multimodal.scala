package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.codecs.{MediaSniff, Png, Wav}

/** Multimodal column plumbing: image/audio payloads ride as opaque
  * `binary` columns with a typed metadata struct next to them, decoded
  * ONCE at ingest by a real byte-level codec ([[graft.ops.codecs]]:
  * full PNG encode/decode incl. zlib + scanline filters, RIFF/WAVE PCM
  * parse, JPEG/GIF/BMP header dims). Nothing here is stubbed.
  *
  * The testdata ships no media files, so [[synthesizePayload]] renders
  * each document into a REAL blob first (PNG for even text lengths,
  * WAV for odd) whose dimensions and content are deterministic in
  * (doc_id, length) — which keeps every downstream decode
  * oracle-checkable in DuckDB by pure arithmetic: if the encoder or
  * the decoder drifted by one byte, the hash compare would fail.
  *
  * Design for 100 TB: payload bytes never leave the executor (no
  * collect); codecs run per-partition via `mapPartitions` so a native
  * library could amortize init across a batch; decode happens once and
  * the resulting metadata struct is columnar, so window planning /
  * filtering / pruning run on metadata alone without re-touching
  * bytes.
  */
object Multimodal {

  /** Metadata schema that rides next to every blob column. Image
    * fields are null for audio and vice versa. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  val SampleRate = 16000

  /** Deterministic content value `v(i)` for document `docId` — the
    * shared generator both the PNG pixel stream and the PCM sample
    * stream draw from (and the DuckDB oracle replicates). */
  @inline private def value(docId: Long, i: Int): Int =
    ((docId * 31 + 7L * i) % 256).toInt

  /** Image dims / sample counts as functions of text length (chars —
    * the corpus is ASCII so char = byte). */
  @inline private def imgWidth(len: Int): Int = len % 64 + 8
  @inline private def imgHeight(len: Int): Int = len % 48 + 8
  @inline private def sampleCount(len: Int): Int = len % 512 + 64

  /** Render a document into a real media blob. Even text length →
    * 8-bit grayscale PNG; odd → 16-bit PCM mono WAV. */
  def synthesizePayload(docId: Long, text: String): Array[Byte] = {
    val len = if (text == null) 0 else text.length
    if (len % 2 == 0) {
      val w = imgWidth(len); val h = imgHeight(len)
      Png.encodeGray(w, h, i => value(docId, i))
    } else {
      val n = sampleCount(len)
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = ((value(docId, i) - 128) * 128).toShort; i += 1 }
      Wav.encodePcm16(SampleRate, samples)
    }
  }

  /** Attach a real payload blob plus its decoded metadata struct.
    * Metadata comes from parsing the bytes just encoded (PNG IHDR walk
    * / WAV fmt+data chunks) — encode and decode cross-check each other
    * row by row. */
  def withBlobAndMeta(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(docs.schema.fields ++ Seq(
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", metaSchema, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val textIdx = docs.schema.fieldIndex(textCol)
    val idIdx = docs.schema.fieldIndex(idCol)
    docs.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getAs[Number](idIdx).longValue()
        val payload = synthesizePayload(docId, r.getAs[String](textIdx))
        Row.fromSeq(r.toSeq ++ Seq(payload, decodeMeta(payload)))
      }
    }(enc)
  }

  /** Header-only decode → metadata row (cheap: no inflate for PNG, no
    * sample materialization for WAV). Total: a malformed payload
    * yields an "unknown" row, never a task-killing exception. */
  def decodeMeta(payload: Array[Byte]): Row = try {
    val nBytes = if (payload == null) 0L else payload.length.toLong
    MediaSniff.sniff(payload) match {
      case f @ ("png" | "jpeg" | "gif" | "bmp") =>
        MediaSniff.imageDims(payload) match {
          case Some((w, h)) => Row(f, w, h, null, null, nBytes)
          case None => Row("unknown", null, null, null, null, nBytes)
        }
      case "wav" => Wav.decodeHeader(payload) match {
        case Right(h) => Row("wav", null, null, h.sampleRate, h.nSamples, nBytes)
        case Left(_) => Row("unknown", null, null, null, null, nBytes)
      }
      case _ => Row("unknown", null, null, null, null, nBytes)
    }
  } catch {
    case _: Exception =>
      Row("unknown", null, null, null, null,
        if (payload == null) 0L else payload.length.toLong)
  }

  /** Full-frame batch decode — inflate + unfilter every PNG, PCM-parse
    * every WAV — emitting the value count and a content checksum
    * (sum of decoded 0..255 values; PCM maps back through the inverse
    * of the synth transform). Runs per partition so a native codec
    * could init once per batch. */
  def decodeBatch(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields ++ Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_values", LongType, nullable = true),
      StructField("decoded_checksum", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val (fmt, n, sum) = decodeValues(bytes) match {
          case Some((f, vals)) =>
            var s = 0L; var i = 0
            while (i < vals.length) { s += vals(i); i += 1 }
            (f, vals.length.toLong, s)
          case None => (MediaSniff.sniff(bytes), null, null)
        }
        Row.fromSeq(r.toSeq ++ Seq(fmt, n, sum))
      }
    }(enc)
  }

  /** Decode a payload to its 0..255 value stream: PNG → pixel bytes,
    * WAV → PCM samples mapped back to the generator domain. */
  private def decodeValues(bytes: Array[Byte]): Option[(String, Array[Int])] =
    try MediaSniff.sniff(bytes) match {
      case "png" => Png.decode(bytes).toOption.map { d =>
        ("png", d.pixels.map(b => b & 0xff))
      }
      case "wav" => Wav.decode(bytes).toOption.map { d =>
        ("wav", d.samples.map(s => s / 128 + 128))
      }
      case _ => None
    } catch { case _: Exception => None }

  /** Nearest-neighbor resample of an 8-bit pixel buffer (any channel
    * count): source index = floor(target * src / dst) per axis — the
    * canonical NN grid, pure integer arithmetic (which is what lets the
    * DuckDB oracle replay the resized checksum without any codec). */
  def resizePixels(px: Array[Byte], w: Int, h: Int, ch: Int,
      ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh * ch)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        val sx = (x.toLong * w / ow).toInt
        var c = 0
        while (c < ch) {
          out((y * ow + x) * ch + c) = px((sy * w + sx) * ch + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Batch image resize — decode PNG payloads, NN-resample to
    * (ow, oh), re-encode, and emit the resized blob + dims + content
    * checksum. Non-image payloads (WAV rows) pass through with nulls.
    * Per-partition kernel like [[decodeBatch]]; payload bytes never
    * leave executors. */
  def resizeBatch(docs: DataFrame, ow: Int, oh: Int): DataFrame = {
    val schema = StructType(docs.schema.fields ++ Seq(
      StructField("resized_w", IntegerType, nullable = true),
      StructField("resized_h", IntegerType, nullable = true),
      StructField("resized_checksum", LongType, nullable = true),
      StructField("resized_png", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val resized: Seq[Any] =
          (try Png.decode(bytes).toOption catch { case _: Exception => None }) match {
            case Some(d) =>
              val out = resizePixels(d.pixels, d.width, d.height,
                d.channelsPerPixel, ow, oh)
              var s = 0L; var i = 0
              while (i < out.length) { s += out(i) & 0xff; i += 1 }
              // re-encode only the grayscale case (the synth corpus);
              // multi-channel resizes still emit dims + checksum
              val png =
                if (d.channelsPerPixel == 1) Png.encodeGray(ow, oh, i2 => out(i2) & 0xff)
                else null
              Seq(ow, oh, s, png)
            case None => Seq(null, null, null, null)
          }
        Row.fromSeq(r.toSeq ++ resized)
      }
    }(enc)
  }

  /** Frame-sample: every `stride`-th decoded value (pixel subsample /
    * PCM decimation) as the feature-extractor input. */
  def frameSample(docs: DataFrame, stride: Int = 256): DataFrame = {
    val schema = StructType(docs.schema.fields :+
      StructField("frames", ArrayType(IntegerType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(schema)
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { rows =>
      rows.map { r =>
        val frames = decodeValues(r.getAs[Array[Byte]](payloadIdx)).map {
          case (_, vals) => (0 until vals.length by stride).map(vals(_)).toArray
        }.orNull
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(enc)
  }

  /** Audio-frame windowing plan: one row per (`win`-sample window
    * every `hop` samples), computed ENTIRELY from the decoded metadata
    * column — payload bytes are not touched, so a 100 TB audio corpus
    * plans its windows from columnar metadata alone. Non-audio rows
    * and blobs shorter than one window emit nothing. */
  def audioWindows(docs: DataFrame, idCol: String,
      win: Int = 64, hop: Int = 32): DataFrame =
    docs
      .filter(col("meta.format") === "wav" && col("meta.n_samples") >= win)
      .select(col(idCol), col("meta.n_samples").as("n_samples"),
        // `div`, not `/`: integral window count (double division would
        // lose exactness past 2^53 samples)
        posexplode(sequence(lit(0L),
          expr(s"(meta.n_samples - ${win}L) div ${hop}L"))))
      .select(col(idCol), col("n_samples"),
        col("pos").cast("int").as("window_idx"),
        (col("col") * hop).as("start_sample"))
}

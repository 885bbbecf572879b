package graft.ops.codecs

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

/** Byte-level media codecs for the multimodal pipeline tier — real
  * encoders/decoders built on the JDK only (`java.util.zip` for PNG's
  * zlib stream). No stubs: PNG is fully encoded (IHDR/IDAT/IEND with
  * CRCs, deflate) and fully decoded (chunk walk, inflate, all five
  * scanline filters including Paeth); WAV is RIFF-parsed to PCM
  * samples; JPEG/GIF/BMP headers are parsed for dimensions so a mixed
  * real-world corpus can be profiled without decoding full frames.
  *
  * Scale posture: these kernels run per partition inside
  * `mapPartitions` (see [[graft.ops.Multimodal]]) — payload bytes
  * never leave the executor, and per-blob work is O(bytes) with no
  * allocation beyond the decoded frame.
  */
object Png {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Channels per pixel for the color types we code for. */
  private def channels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1) // grayscale
    case 2 => Some(3) // RGB
    case 6 => Some(4) // RGBA
    case _ => None
  }

  /** Encode an 8-bit grayscale PNG. `pixel(i)` supplies row-major
    * values (masked to 0..255). A real, standards-conforming file:
    * any PNG reader decodes it. */
  def encodeGray(width: Int, height: Int, pixel: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val raw = new Array[Byte](height * (1 + width))
    var i = 0
    var y = 0
    while (y < height) {
      raw(y * (1 + width)) = 0 // filter type None per scanline
      var x = 0
      while (x < width) {
        raw(y * (1 + width) + 1 + x) = (pixel(i) & 0xff).toByte
        i += 1; x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    writeInt(ihdr, 0, width)
    writeInt(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // compression 0, filter 0, interlace 0 already zeroed
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  final case class Decoded(width: Int, height: Int, bitDepth: Int,
      colorType: Int, channelsPerPixel: Int, pixels: Array[Byte])

  /** Full decode: signature, chunk walk, IDAT inflate, scanline
    * unfilter (None/Sub/Up/Average/Paeth). 8-bit gray/RGB/RGBA. */
  def decode(bytes: Array[Byte]): Either[String, Decoded] = {
    if (bytes == null || bytes.length < 8 + 25) return Left("not a PNG: too short")
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return Left("not a PNG: bad signature"); i += 1 }
    var width, height, bitDepth, colorType = -1
    val idat = new ByteArrayOutputStream()
    var pos = 8
    var sawEnd = false
    while (pos + 8 <= bytes.length && !sawEnd) {
      val len = readInt(bytes, pos)
      // Long arithmetic: a crafted len near Int.MaxValue must not wrap
      // the bound check and escape as an uncaught exception
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return Left("corrupt PNG: bad chunk length")
      val ctype = new String(bytes, pos + 4, 4, StandardCharsets.US_ASCII)
      ctype match {
        case "IHDR" =>
          if (len != 13) return Left("corrupt PNG: IHDR length")
          width = readInt(bytes, pos + 8)
          height = readInt(bytes, pos + 12)
          bitDepth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (width <= 0 || height <= 0) Left("corrupt PNG: no IHDR")
    else if (bitDepth != 8) Left(s"unsupported PNG bit depth $bitDepth")
    else channels(colorType) match {
      case None => Left(s"unsupported PNG color type $colorType")
      case Some(ch) =>
        // Long arithmetic: crafted IHDR dims near Int.MaxValue must not
        // wrap stride/expect to a small value that matches a tiny IDAT
        // and then over-index the unfilter buffer. Reject anything whose
        // raw buffer would not fit in a JVM array.
        val strideL = width.toLong * ch
        val expectL = height.toLong * (1L + strideL)
        if (expectL > Int.MaxValue) return Left("unsupported PNG: dimensions too large")
        val stride = strideL.toInt
        val expect = expectL.toInt
        inflate(idat.toByteArray, expect).flatMap { raw =>
          if (raw.length != expect) Left("corrupt PNG: IDAT size mismatch")
          else Right(Decoded(width, height, bitDepth, colorType, ch,
            unfilter(raw, height, stride, ch)))
        }
    }
  }

  /** Undo per-scanline filtering (PNG spec §9: types 0-4). */
  private def unfilter(raw: Array[Byte], height: Int, stride: Int, bpp: Int): Array[Byte] = {
    val out = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) out(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) out((y - 1) * stride + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out((y - 1) * stride + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case _ => cur // unknown filter: pass through (lenient)
        }
        out(y * stride + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], sizeHint: Int): Either[String, Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new ByteArrayOutputStream(math.max(sizeHint, 64))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // ANY zero-progress state (truncated input, FDICT preset
        // dictionary) is corrupt — looping on finished() alone would
        // spin forever on a crafted zlib header
        if (n == 0 && !inf.finished()) throw new java.util.zip.DataFormatException(
          if (inf.needsDictionary()) "preset dictionary unsupported" else "truncated")
        out.write(buf, 0, n)
      }
      inf.end()
      Right(out.toByteArray)
    } catch { case e: Exception => Left(s"corrupt PNG: inflate failed (${e.getMessage})") }

  private def writeChunk(out: ByteArrayOutputStream, ctype: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    writeInt(len, 0, data.length)
    out.write(len, 0, 4)
    val typeBytes = ctype.getBytes(StandardCharsets.US_ASCII)
    out.write(typeBytes, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typeBytes)
    crc.update(data)
    val c = new Array[Byte](4)
    writeInt(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)
}

/** RIFF/WAVE PCM codec. */
object Wav {

  /** Encode 16-bit little-endian PCM mono. */
  def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(off: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, out, off, b.length)
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    ascii(0, "RIFF"); le32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    ascii(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = samples(i).toByte
      out(44 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  final case class Decoded(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Short])

  final case class Header(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long)

  /** Header-only parse: fmt descriptor + data-chunk LENGTH, no sample
    * materialization — the metadata path must not pay a full PCM
    * decode (and its Array[Short]) per corpus row at ingest. */
  def decodeHeader(bytes: Array[Byte]): Either[String, Header] =
    walkChunks(bytes).map { case (ch, rate, bits, _, dataLen) =>
      Header(ch, rate, bits, dataLen / 2L)
    }

  /** Parse RIFF chunks (tolerating extras like LIST), read the fmt
    * descriptor, and decode the PCM16 payload. */
  def decode(bytes: Array[Byte]): Either[String, Decoded] =
    walkChunks(bytes).map { case (ch, rate, bits, dataOff, dataLen) =>
      val n = dataLen / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((bytes(dataOff + 2 * i) & 0xff) |
          (bytes(dataOff + 2 * i + 1) << 8)).toShort
        i += 1
      }
      Decoded(ch, rate, bits, samples)
    }

  /** Shared RIFF walk → (channels, rate, bits, dataOff, dataLen). */
  private def walkChunks(bytes: Array[Byte])
      : Either[String, (Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 44) return Left("not a WAV: too short")
    def ascii(off: Int, n: Int) = new String(bytes, off, n, StandardCharsets.US_ASCII)
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return Left("not a WAV: bad RIFF header")
    var channelsN, rate, bits = -1
    var dataOff, dataLen = -1
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val cid = ascii(pos, 4)
      val clen = le32(pos + 4)
      // Long arithmetic: crafted ~2GB chunk lengths must not wrap
      if (clen < 0 || pos.toLong + 8L + clen > bytes.length) return Left("corrupt WAV: bad chunk length")
      cid match {
        case "fmt " =>
          if (clen < 16) return Left("corrupt WAV: fmt chunk too short")
          val fmt = le16(pos + 8)
          if (fmt != 1) return Left(s"unsupported WAV format code $fmt (PCM only)")
          channelsN = le16(pos + 10)
          rate = le32(pos + 12)
          bits = le16(pos + 22)
        case "data" => dataOff = pos + 8; dataLen = clen
        case _ => // LIST/fact/etc: skip
      }
      pos += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    if (channelsN <= 0 || rate <= 0) Left("corrupt WAV: no fmt chunk")
    else if (dataOff < 0) Left("corrupt WAV: no data chunk")
    else if (bits != 16) Left(s"unsupported WAV bit depth $bits (PCM16 only)")
    else Right((channelsN, rate, bits, dataOff, dataLen))
  }
}

/** Format sniffing + header-only dimension extraction for formats we
  * do not fully decode (JPEG/GIF/BMP) — enough to profile and filter a
  * mixed corpus by metadata without touching full frames. */
object MediaSniff {

  def sniff(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 12) "unknown"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') "gif"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else "unknown"
  }

  /** (width, height) from headers alone. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = sniff(bytes) match {
    case "png" =>
      if (bytes.length < 24) None
      else Some((be32(bytes, 16), be32(bytes, 20)))
    case "jpeg" => jpegDims(bytes)
    case "gif" =>
      if (bytes.length < 10) None
      else Some((le16(bytes, 6), le16(bytes, 8)))
    case "bmp" =>
      if (bytes.length < 26) None
      else Some((le32(bytes, 18), le32(bytes, 22)))
    case _ => None
  }

  /** Walk JPEG segments to the first SOF marker (SOF0-15 minus
    * DHT/JPG/DAC) and read the frame dimensions. */
  private def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None // lost sync
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone marker, no length
      } else if (marker == 0xda || marker == 0xd9) {
        return None // start-of-scan / end before any SOF
      } else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          val h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
          val w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
          return Some((w, h))
        }
        pos += 2 + len
      }
    }
    None
  }

  private def be32(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)
  private def le16(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)
  private def le32(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
}

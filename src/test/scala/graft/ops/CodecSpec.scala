package graft.ops

import java.io.ByteArrayInputStream

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.codecs.{MediaSniff, Png, Wav}

/** Byte-level codec correctness. PNG and WAV round-trip exactly;
  * cross-checks run against the JDK's independent implementations
  * (ImageIO, AudioSystem) so encoder and decoder cannot share a bug;
  * JPEG/GIF/BMP header parsing is exercised on ImageIO-encoded and
  * hand-built files. */
class CodecSpec extends AnyFunSuite {

  private def checkProp(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("PNG gray round-trip is pixel-exact") {
    val w = 37; val h = 23
    def pix(i: Int): Int = (i * 31 + 7) % 256
    val bytes = Png.encodeGray(w, h, pix)
    val d = Png.decode(bytes).toOption.get
    assert(d.width == w && d.height == h && d.bitDepth == 8 && d.colorType == 0)
    assert(d.pixels.length == w * h)
    assert(d.pixels.zipWithIndex.forall { case (b, i) => (b & 0xff) == pix(i) })
  }

  test("PNG round-trip property: random dims and content") {
    checkProp(Prop.forAll(Gen.choose(1, 80), Gen.choose(1, 60), Gen.choose(0, 255)) {
      (w: Int, h: Int, seed: Int) =>
        def pix(i: Int): Int = (seed + i * 13) % 256
        val d = Png.decode(Png.encodeGray(w, h, pix)).toOption.get
        d.width == w && d.height == h &&
          d.pixels.zipWithIndex.forall { case (b, i) => (b & 0xff) == pix(i) }
    })
  }

  test("our PNG decodes identically under ImageIO (independent reader)") {
    val w = 41; val h = 17
    def pix(i: Int): Int = (i * 7 + 3) % 256
    val bytes = Png.encodeGray(w, h, pix)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img.getWidth == w && img.getHeight == h)
    // raw raster samples (getRGB would apply a gray->sRGB transform)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = pix(y * w + x)
      assert(img.getRaster.getSample(x, y, 0) == expected, s"pixel ($x,$y)")
    }
  }

  test("ImageIO-encoded PNGs (RGB, filtered scanlines) decode correctly") {
    val w = 33; val h = 29
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37) % 256 << 16) | ((y * 91) % 256 << 8) | ((x + y) % 256))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val d = Png.decode(out.toByteArray).toOption.get
    assert(d.width == w && d.height == h && d.channelsPerPixel == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      assert((d.pixels(base) & 0xff) == (x * 37) % 256, s"R ($x,$y)")
      assert((d.pixels(base + 1) & 0xff) == (y * 91) % 256, s"G ($x,$y)")
      assert((d.pixels(base + 2) & 0xff) == (x + y) % 256, s"B ($x,$y)")
    }
  }

  test("property: ImageIO-encoded gray/RGB/RGBA PNGs decode pixel-identically") {
    // ImageIO is the independent oracle (same spirit as DuckDB for SQL):
    // it picks its own scanline filters per image, so random content
    // exercises Sub/Up/Average/Paeth reconstruction against a reader
    // that shares no code with Png.decode.
    import java.awt.image.BufferedImage
    checkProp(Prop.forAll(
      Gen.choose(1, 48), Gen.choose(1, 40), Gen.choose(0, Int.MaxValue - 1),
      Gen.oneOf(0, 1, 2)) { (w: Int, h: Int, seed: Int, mode: Int) =>
      var s = seed.toLong
      def next(): Int = { s = (s * 6364136223846793005L + 1442695040888963407L); ((s >>> 33) & 0xff).toInt }
      val imgType = mode match {
        case 0 => BufferedImage.TYPE_BYTE_GRAY
        case 1 => BufferedImage.TYPE_INT_RGB
        case _ => BufferedImage.TYPE_INT_ARGB
      }
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) mode match {
        case 0 => img.getRaster.setSample(x, y, 0, next())
        case 1 => img.setRGB(x, y, (next() << 16) | (next() << 8) | next())
        case _ => img.setRGB(x, y, (next() << 24) | (next() << 16) | (next() << 8) | next())
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      val d = Png.decode(out.toByteArray).toOption.get
      val chOk = mode match {
        case 0 => d.channelsPerPixel == 1
        case 1 => d.channelsPerPixel == 3
        case _ => d.channelsPerPixel == 4
      }
      chOk && d.width == w && d.height == h && (0 until h).forall { y =>
        (0 until w).forall { x =>
          val base = (y * w + x) * d.channelsPerPixel
          mode match {
            case 0 =>
              (d.pixels(base) & 0xff) == img.getRaster.getSample(x, y, 0)
            case 1 =>
              val rgb = img.getRGB(x, y)
              (d.pixels(base) & 0xff) == ((rgb >> 16) & 0xff) &&
                (d.pixels(base + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
                (d.pixels(base + 2) & 0xff) == (rgb & 0xff)
            case _ =>
              val argb = img.getRGB(x, y)
              (d.pixels(base) & 0xff) == ((argb >> 16) & 0xff) &&
                (d.pixels(base + 1) & 0xff) == ((argb >> 8) & 0xff) &&
                (d.pixels(base + 2) & 0xff) == (argb & 0xff) &&
                (d.pixels(base + 3) & 0xff) == ((argb >>> 24) & 0xff)
          }
        }
      }
    })
  }

  test("nearest-neighbor resize picks the canonical grid and re-encodes") {
    // integer 2× downscale of a 8×6 gray image picks every other pixel
    val w = 8; val h = 6
    val px = Array.tabulate(w * h)(i => ((i * 13 + 5) % 256).toByte)
    val half = Multimodal.resizePixels(px, w, h, 1, 4, 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert(half(y * 4 + x) == px((y * 2) * w + x * 2), s"($x,$y)")
    // upscale: every output pixel maps to floor(target*src/dst)
    val up = Multimodal.resizePixels(px, w, h, 1, 11, 7)
    for (y <- 0 until 7; x <- 0 until 11)
      assert(up(y * 11 + x) == px((y * 6 / 7) * w + (x * 8 / 11)), s"up ($x,$y)")
    // multi-channel: channels move together
    val rgb = Array.tabulate(w * h * 3)(i => (i % 251).toByte)
    val rgbHalf = Multimodal.resizePixels(rgb, w, h, 3, 4, 3)
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      assert(rgbHalf((y * 4 + x) * 3 + c) == rgb(((y * 2) * w + x * 2) * 3 + c))
    // and the re-encoded PNG round-trips the resized pixels exactly
    val png = Png.encodeGray(4, 3, i => half(i) & 0xff)
    assert(Png.decode(png).toOption.get.pixels.sameElements(half))
  }

  test("WAV PCM16 round-trip is sample-exact") {
    val samples = Array.tabulate(333)(i => ((i * 257) % 65536 - 32768).toShort)
    val bytes = Wav.encodePcm16(16000, samples)
    val d = Wav.decode(bytes).toOption.get
    assert(d.channels == 1 && d.sampleRate == 16000 && d.bitsPerSample == 16)
    assert(d.samples.sameElements(samples))
  }

  test("our WAV parses identically under AudioSystem (independent reader)") {
    val samples = Array.tabulate(100)(i => (i * 300 - 15000).toShort)
    val bytes = Wav.encodePcm16(8000, samples)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getChannels == 1 && fmt.getSampleRate == 8000f &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 100L)
    val raw = in.readAllBytes()
    val decoded = Array.tabulate(100)(i =>
      ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort)
    assert(decoded.sameElements(samples))
  }

  test("WAV decoder tolerates extra RIFF chunks") {
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val base = Wav.encodePcm16(16000, samples)
    // splice a LIST chunk between fmt and data
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // fix RIFF size
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >> 8).toByte
    spliced(6) = (total >> 16).toByte; spliced(7) = (total >> 24).toByte
    val d = Wav.decode(spliced).toOption.get
    assert(d.samples.sameElements(samples))
  }

  test("JPEG dimensions parsed from SOF marker (ImageIO-encoded)") {
    val img = new java.awt.image.BufferedImage(57, 43,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val bytes = out.toByteArray
    assert(MediaSniff.sniff(bytes) == "jpeg")
    assert(MediaSniff.imageDims(bytes).contains((57, 43)))
  }

  test("GIF and BMP dimensions parsed from headers (ImageIO-encoded)") {
    for ((fmt, expected) <- Seq("gif" -> ((21, 13)), "bmp" -> ((19, 11)))) {
      val (w, h) = expected
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      assert(MediaSniff.sniff(out.toByteArray) == fmt)
      assert(MediaSniff.imageDims(out.toByteArray).contains((w, h)), fmt)
    }
  }

  test("corrupt and truncated inputs fail gracefully") {
    assert(Png.decode(null).isLeft)
    assert(Png.decode(Array[Byte](1, 2, 3)).isLeft)
    val good = Png.encodeGray(10, 10, _ => 5)
    assert(Png.decode(good.take(30)).isLeft) // truncated mid-chunk
    val flipped = good.clone(); flipped(40) = (flipped(40) ^ 0x55).toByte
    // flipping an IDAT byte corrupts the zlib stream or the pixels —
    // either a Left or a decode that differs; it must not throw
    Png.decode(flipped)
    assert(Wav.decode(Array[Byte](1, 2, 3)).isLeft)
    assert(Wav.decode("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)).isLeft)
    assert(MediaSniff.sniff(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9)) == "unknown")
  }

  test("crafted chunk lengths and zlib headers fail as Left, not exceptions") {
    // RIFF chunk length near Int.MaxValue must not wrap the bound check
    val wav = Wav.encodePcm16(16000, Array.tabulate(10)(_.toShort))
    val hugeLen = wav.clone()
    hugeLen(16) = 0xf0.toByte; hugeLen(17) = 0xff.toByte
    hugeLen(18) = 0xff.toByte; hugeLen(19) = 0x7f.toByte // fmt len = 0x7ffffff0
    assert(Wav.decode(hugeLen) == Left("corrupt WAV: bad chunk length"))
    // PNG chunk length near Int.MaxValue
    val png = Png.encodeGray(4, 4, _ => 1)
    val hugePng = png.clone()
    hugePng(8) = 0x7f.toByte; hugePng(9) = 0xff.toByte
    hugePng(10) = 0xff.toByte; hugePng(11) = 0xf0.toByte // IHDR len huge
    assert(Png.decode(hugePng).isLeft)
    // zlib FDICT bit set: inflate makes no progress — must Left, not hang
    val withDict = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(png, 0, 33) // signature + IHDR
      val idat = Array[Byte](0, 0, 0, 2, 'I', 'D', 'A', 'T', 0x78, 0x20, 0, 0, 0, 0)
      out.write(idat, 0, idat.length)
      out.write(png, png.length - 12, 12) // IEND
      out.toByteArray
    }
    assert(Png.decode(withDict).isLeft)
  }

  test("crafted IHDR dimensions that overflow Int fail as Left, not exceptions") {
    // stride = width*ch and expect = height*(1+stride) must be computed
    // in Long: dims near Int.MaxValue would otherwise wrap to a small
    // positive value, slip past the IDAT size check, and over-index the
    // unfilter buffer. IHDR data starts at offset 16 (8 sig + 4 len + 4 type).
    def withDims(w: Int, h: Int): Array[Byte] = {
      val png = Png.encodeGray(4, 4, _ => 1).clone()
      def put(off: Int, v: Int): Unit = {
        png(off) = (v >>> 24).toByte; png(off + 1) = (v >>> 16).toByte
        png(off + 2) = (v >>> 8).toByte; png(off + 3) = v.toByte
      }
      put(16, w); put(20, h)
      png
    }
    // expect wraps to a tiny value: 65536 * (1 + 65536) mod 2^32 is small
    assert(Png.decode(withDims(0x10000, 0x10000)) ==
      Left("unsupported PNG: dimensions too large"))
    assert(Png.decode(withDims(Int.MaxValue, 2)) ==
      Left("unsupported PNG: dimensions too large"))
    assert(Png.decode(withDims(2, Int.MaxValue)) ==
      Left("unsupported PNG: dimensions too large"))
    // a merely-wrong (but representable) size still fails the IDAT check
    assert(Png.decode(withDims(40, 40)).isLeft)
  }

  test("WAV header-only decode matches the full decode") {
    val samples = Array.tabulate(77)(i => (i * 11).toShort)
    val bytes = Wav.encodePcm16(22050, samples)
    val h = Wav.decodeHeader(bytes).toOption.get
    val d = Wav.decode(bytes).toOption.get
    assert(h.channels == d.channels && h.sampleRate == d.sampleRate &&
      h.bitsPerSample == d.bitsPerSample && h.nSamples == d.samples.length.toLong)
  }

  test("synthesized payloads decode to the oracle arithmetic") {
    // even length -> png with dims (len%64+8, len%48+8)
    val png = Multimodal.synthesizePayload(42L, "x" * 100)
    assert(MediaSniff.sniff(png) == "png")
    assert(MediaSniff.imageDims(png).contains((100 % 64 + 8, 100 % 48 + 8)))
    val d = Png.decode(png).toOption.get
    val expectedSum = (0 until d.pixels.length).map(i => (42L * 31 + 7L * i) % 256).sum
    assert(d.pixels.map(_ & 0xff).map(_.toLong).sum == expectedSum)
    // odd length -> wav with len%512+64 samples at 16 kHz
    val wav = Multimodal.synthesizePayload(7L, "y" * 101)
    assert(MediaSniff.sniff(wav) == "wav")
    val w = Wav.decode(wav).toOption.get
    assert(w.sampleRate == 16000 && w.samples.length == 101 % 512 + 64)
    assert(w.samples.map(s => s / 128 + 128).zipWithIndex.forall {
      case (v, i) => v == ((7L * 31 + 7L * i) % 256).toInt
    })
  }
}

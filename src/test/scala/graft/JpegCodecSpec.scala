package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.JpegCodec
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** The baseline-JPEG decoder, validated three independent ways:
  *  1. fixture round-trip — our DC-only encoder through our decoder is
  *     EXACT (the integer-arithmetic argument in JpegCodec's scaladoc);
  *  2. cross-decoder — our encoder's bytes through the JDK's libjpeg-based
  *     ImageIO reader (an independent implementation of the same public
  *     spec) reproduce the same constants, proving the emitted file is
  *     genuinely standard and not a private dialect;
  *  3. cross-encoder — ImageIO-WRITTEN JPEGs (gray gradients, flat and
  *     gradient RGB, multiple qualities) decoded by our decoder agree with
  *     ImageIO's own decode within IDCT/color-convert rounding tolerance
  *     (our reference double IDCT vs libjpeg's integer islow; JFIF vs
  *     fixed-point YCbCr math).
  * Plus the malformed classes (truncation, progressive SOF2, garbage) and
  * the restart-marker path.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.getRaster.setSample(x, y, 0, v)
    }
    img
  }

  private def rgb(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def writeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  /** ImageIO decode to (channels, interleaved samples). */
  private def refDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to decode")
    val w = img.getWidth; val h = img.getHeight
    val grayType = img.getType == BufferedImage.TYPE_BYTE_GRAY
    if (grayType) {
      val out = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) out(y * w + x) = img.getRaster.getSample(x, y, 0)
      (w, h, 1, out)
    } else {
      val out = new Array[Int](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        out((y * w + x) * 3) = (p >> 16) & 0xff
        out((y * w + x) * 3 + 1) = (p >> 8) & 0xff
        out((y * w + x) * 3 + 2) = p & 0xff
      }
      (w, h, 3, out)
    }
  }

  private def maxAbsDiff(a: Array[Int], b: Array[Byte]): Int =
    a.indices.map(i => math.abs(a(i) - (b(i) & 0xff))).max

  test("fixture round-trip is EXACT: constant blocks, every size, negative and positive t") {
    for ((w, h) <- Seq((8, 8), (16, 8), (24, 16), (32, 32))) {
      val nb = (w / 8) * (h / 8)
      val ts = Array.tabulate(nb)(b => ((b * 37 + w + h) % 128) - 64)
      val bytes = JpegCodec.encodeGrayDcOnly(w, h, ts)
      val got = JpegCodec.decode(bytes)
      assert(got.nonEmpty, s"${w}x$h failed to decode")
      val img = got.get
      assert(img.width == w && img.height == h && img.channels == 1)
      val bx = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bx + (x / 8)
        val want = 128 + 2 * ts(b)
        val gotPx = img.pixels(y * w + x) & 0xff
        assert(gotPx == want, s"(${x},$y) block $b: got $gotPx want $want")
      }
    }
  }

  test("struct-bomb SOF dims refuse BEFORE plane allocation (None, not OOM)") {
    val ok = JpegCodec.encodeGrayDcOnly(16, 16, Array.fill(4)(0))
    var at = -1; var i = 0
    while (at < 0 && i + 1 < ok.length) {
      if ((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0) at = i
      i += 1
    }
    assert(at > 0, "SOF0 marker not found")
    // absolute-envelope arm: 40000x40000 declared (~1.6e9 plane ints if
    // allocated — multi-GB); must refuse as a structural violation, because
    // an OutOfMemoryError would escape the NonFatal backstop
    val bomb = ok.clone()
    bomb(at + 5) = ((40000 >> 8) & 0xff).toByte; bomb(at + 6) = (40000 & 0xff).toByte
    bomb(at + 7) = ((40000 >> 8) & 0xff).toByte; bomb(at + 8) = (40000 & 0xff).toByte
    assert(JpegCodec.decode(bomb).isEmpty, "40000x40000 bomb must return None")
    // information-bound arm: 2048x2048 passes the absolute cap but cannot
    // be backed by a few hundred input bytes (>= 2 entropy bits per block)
    val bomb2 = ok.clone()
    bomb2(at + 5) = 8; bomb2(at + 6) = 0
    bomb2(at + 7) = 8; bomb2(at + 8) = 0
    assert(JpegCodec.decode(bomb2).isEmpty, "2048x2048-from-tiny-file must return None")
  }

  test("decodeDetailed separates oversized-but-valid from malformed (the routing lanes)") {
    import JpegCodec.DecodeResult
    // a VALID 64x64 image (4096 plane ints): under the default cap it
    // decodes; under a 1024-int cap it must surface as Oversized — NOT
    // Invalid — so a curation pipeline can send it to the big-asset lane
    // instead of the corrupt-bytes discard lane
    val ok = JpegCodec.encodeGrayDcOnly(64, 64, Array.fill(64)(0))
    assert(JpegCodec.decodeDetailed(ok).isInstanceOf[DecodeResult.Decoded])
    JpegCodec.decodeDetailed(ok, maxPlaneInts = 1024L) match {
      case DecodeResult.Oversized(declared, cap) =>
        assert(declared == 4096L && cap == 1024L)
      case other => fail(s"expected Oversized, got $other")
    }
    // a struct bomb (tiny file, huge declared frame) fails the INFORMATION
    // bound and must stay Invalid even under an infinite envelope — the
    // bytes present cannot back the declared planes
    var at = -1; var i = 0
    while (at < 0 && i + 1 < ok.length) {
      if ((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0) at = i
      i += 1
    }
    val bomb = ok.clone()
    bomb(at + 5) = ((40000 >> 8) & 0xff).toByte; bomb(at + 6) = (40000 & 0xff).toByte
    bomb(at + 7) = ((40000 >> 8) & 0xff).toByte; bomb(at + 8) = (40000 & 0xff).toByte
    assert(JpegCodec.decodeDetailed(bomb, maxPlaneInts = Long.MaxValue) ==
      DecodeResult.Invalid, "unbackable planes are Invalid, never Oversized")
  }

  test("color 4:2:0 AC fixture decodes to the closed-form integer image") {
    // the encodeColor420Ac exactness contract, checked pixel-by-pixel:
    // plane(x,y) = 128 + 2t + 2a·s(x)s(y) (slot-(4,4) basis = ±1/2), box
    // chroma upsampling at half resolution, RGB = Math.round of the JFIF
    // formulas — any Huffman-run, zigzag, upsampling-index or conversion
    // slip lands on a different integer
    val s = Array(1, -1, -1, 1, 1, -1, -1, 1)
    val id = 12345L
    val tY = Array.tabulate(8)(g => (((id * 7 + 11 * g) % 33) - 16).toInt)
    val aY = Array.tabulate(8)(g => (((id * 5 + 13 * g) % 9) - 4).toInt)
    val tCb = Array.tabulate(2)(m => (((id * 3 + 5 * m) % 21) - 10).toInt)
    val aCb = Array.tabulate(2)(m => (((id + m) % 7) - 3).toInt)
    val tCr = Array.tabulate(2)(m => (((id * 9 + 4 + 3 * m) % 21) - 10).toInt)
    val aCr = Array.tabulate(2)(m => (((id * 11 + 2 + m) % 7) - 3).toInt)
    val bytes = JpegCodec.encodeColor420Ac(32, 16, tY, aY, tCb, aCb, tCr, aCr)
    val img = JpegCodec.decode(bytes).getOrElse(fail("fixture must decode"))
    assert(img.width == 32 && img.height == 16 && img.channels == 3)
    for (y <- 0 until 16; x <- 0 until 32) {
      val g = (y / 8) * 4 + (x / 8)
      val m = x / 16
      val ss = s(x % 8) * s(y % 8)
      val ssc = s((x / 2) % 8) * s(y / 2)
      val yy = (128 + 2 * tY(g) + 2 * aY(g) * ss).toDouble
      val cb = (2 * tCb(m) + 2 * aCb(m) * ssc).toDouble
      val cr = (2 * tCr(m) + 2 * aCr(m) * ssc).toDouble
      val o = (y * 32 + x) * 3
      assert((img.pixels(o) & 0xff) == Math.round(yy + 1.402 * cr).toInt, s"R at ($x,$y)")
      assert((img.pixels(o + 1) & 0xff) == Math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt, s"G at ($x,$y)")
      assert((img.pixels(o + 2) & 0xff) == Math.round(yy + 1.772 * cb).toInt, s"B at ($x,$y)")
    }
  }

  test("color 4:2:0 AC fixture bytes are standard JPEG: the JDK reader agrees within upsampling tolerance") {
    val id = 777L
    val tY = Array.tabulate(8)(g => (((id * 7 + 11 * g) % 33) - 16).toInt)
    val aY = Array.tabulate(8)(g => (((id * 5 + 13 * g) % 9) - 4).toInt)
    val tCb = Array.tabulate(2)(m => (((id * 3 + 5 * m) % 21) - 10).toInt)
    val aCb = Array.tabulate(2)(m => (((id + m) % 7) - 3).toInt)
    val tCr = Array.tabulate(2)(m => (((id * 9 + 4 + 3 * m) % 21) - 10).toInt)
    val aCr = Array.tabulate(2)(m => (((id * 11 + 2 + m) % 7) - 3).toInt)
    val bytes = JpegCodec.encodeColor420Ac(32, 16, tY, aY, tCb, aCb, tCr, aCr)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "the JDK's libjpeg reader must accept the fixture bytes")
    assert(ref.getWidth == 32 && ref.getHeight == 16)
    val ours = JpegCodec.decode(bytes).getOrElse(fail("fixture must decode"))
    // triangle (libjpeg fancy) vs box chroma upsampling differ most where
    // the chroma AC flips sign between neighbors; luma is exact on block
    // interiors — bound the per-channel gap rather than demand equality
    var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 32) {
      val rgb = ref.getRGB(x, y)
      val o = (y * 32 + x) * 3
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs((rgb & 0xff) - (ours.pixels(o + 2) & 0xff)))
    }
    assert(maxDiff <= 32, s"JDK-vs-ours per-channel gap $maxDiff exceeds the upsampling bound")
  }

  test("fixture bytes are standard JPEG: the JDK's independent decoder reads the same constants") {
    val ts = Array(-64, -17, 0, 21, 42, 63)
    val bytes = JpegCodec.encodeGrayDcOnly(24, 16, ts)
    val (w, h, ch, ref) = refDecode(bytes)
    assert(w == 24 && h == 16 && ch == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y / 8) * 3 + (x / 8)
      val want = 128 + 2 * ts(b)
      // libjpeg's integer IDCT of a DC-only block is exact for multiples of
      // the quant step (see JpegCodec scaladoc) — equality, not tolerance
      assert(ref(y * w + x) == want, s"(${x},$y): ImageIO got ${ref(y * w + x)} want $want")
    }
  }

  test("restart markers: RSTn every 2 MCUs decodes identically and resets DC predictors") {
    val ts = Array.tabulate(12)(b => (b * 23 % 128) - 64)
    val plain = JpegCodec.decode(JpegCodec.encodeGrayDcOnly(32, 24, ts)).get
    val rst = JpegCodec.decode(JpegCodec.encodeGrayDcOnly(32, 24, ts, restartEvery = 2)).get
    assert(java.util.Arrays.equals(plain.pixels, rst.pixels))
    // and the restart stream is itself standard
    val (w, h, _, ref) = refDecode(JpegCodec.encodeGrayDcOnly(32, 24, ts, restartEvery = 2))
    assert(w == 32 && h == 24)
    assert(ref.indices.forall(i => ref(i) == (plain.pixels(i) & 0xff)))
  }

  test("ImageIO-written grayscale JPEGs decode within IDCT rounding tolerance") {
    // gradient + texture, non-multiple-of-8 dims (exercises MCU crop)
    for ((w, h, q) <- Seq((24, 17, 0.9f), (40, 33, 0.75f), (8, 8, 1.0f))) {
      val img = gray(w, h)((x, y) => 32 + (x * 160) / math.max(1, w - 1) +
        ((y * 48) / math.max(1, h - 1)))
      val bytes = writeJpeg(img, q)
      val (rw, rh, rch, ref) = refDecode(bytes)
      val got = JpegCodec.decode(bytes)
      assert(got.nonEmpty, s"${w}x$h q=$q failed")
      assert(got.get.width == rw && got.get.height == rh && got.get.channels == rch)
      val d = maxAbsDiff(ref, got.get.pixels)
      assert(d <= 2, s"${w}x$h q=$q: max |our - ImageIO| = $d")
    }
  }

  test("ImageIO-written flat RGB JPEGs decode within color-convert tolerance") {
    for ((r, g, b) <- Seq((200, 30, 60), (15, 180, 90), (128, 128, 128), (250, 250, 10))) {
      val bytes = writeJpeg(rgb(16, 16)((_, _) => (r, g, b)), 0.95f)
      val (rw, rh, rch, ref) = refDecode(bytes)
      assert(rch == 3)
      val got = JpegCodec.decode(bytes)
      assert(got.nonEmpty, s"flat ($r,$g,$b) failed")
      assert(got.get.width == rw && got.get.height == rh && got.get.channels == 3)
      val d = maxAbsDiff(ref, got.get.pixels)
      assert(d <= 2, s"flat ($r,$g,$b): max diff $d")
    }
  }

  test("ImageIO-written gradient RGB (chroma-subsampled) decodes within upsampling tolerance") {
    // the JDK writer subsamples chroma; its reader upsamples with a triangle
    // filter, ours with box — on a gentle gradient the two differ by at most
    // a few counts, and the mean must agree tightly
    val img = rgb(32, 24)((x, y) => (60 + 4 * x, 80 + 3 * y, 120 + 2 * x))
    val bytes = writeJpeg(img, 0.9f)
    val (rw, rh, _, ref) = refDecode(bytes)
    val got = JpegCodec.decode(bytes).get
    assert(got.width == rw && got.height == rh && got.channels == 3)
    val d = maxAbsDiff(ref, got.pixels)
    assert(d <= 12, s"gradient RGB: max diff $d")
    val meanRef = ref.map(_.toLong).sum.toDouble / ref.length
    val meanGot = got.pixels.map(p => (p & 0xff).toLong).sum.toDouble / ref.length
    assert(math.abs(meanRef - meanGot) <= 0.5, s"means: $meanRef vs $meanGot")
  }

  test("fuzz: truncation at every offset and random byte flips never throw") {
    val ok = JpegCodec.encodeGrayDcOnly(16, 16, Array(1, -2, 3, -4))
    // every prefix: decode must return (Some or None), never escape an
    // exception — the decoder consumes untrusted bytes inside executor tasks
    for (n <- 0 until ok.length) JpegCodec.decode(ok.take(n))
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 3000) {
      val b = ok.clone()
      for (_ <- 0 to rnd.nextInt(4)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(b)
    }
  }

  test("malformed inputs return None, never a partial decode or a throw") {
    val ok = JpegCodec.encodeGrayDcOnly(16, 8, Array(10, -20))
    assert(JpegCodec.decode(Array[Byte]()).isEmpty, "empty")
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(JpegCodec.decode(ok.take(20)).isEmpty, "truncated in headers")
    assert(JpegCodec.decode(ok.dropRight(4)).isEmpty, "truncated entropy data / missing blocks")
    // flip SOF0 -> SOF2 (progressive): unsupported mode must refuse cleanly
    val sofAt = {
      var i = 2
      var at = -1
      while (at < 0 && i + 1 < ok.length) {
        if ((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0) at = i + 1 else i += 1
      }
      at
    }
    assert(sofAt > 0)
    val prog = ok.clone(); prog(sofAt) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty, "progressive SOF2")
    // corrupt a Huffman count so the symbol table under-runs
    val dhtAt = {
      var i = 2; var at = -1
      while (at < 0 && i + 1 < ok.length) {
        if ((ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc4) at = i else i += 1
      }
      at
    }
    assert(dhtAt > 0)
    val badDht = ok.clone(); badDht(dhtAt + 5) = 77 // counts no longer match segment length
    assert(JpegCodec.decode(badDht).isEmpty, "inconsistent DHT")
  }
}

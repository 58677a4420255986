package graft.multimodal

/** Pure-JVM baseline JPEG (ITU T.81 / JFIF) — closes the last multimodal
  * stub: PPM/WAV proved the real-bytes contract in round 12; this adds the
  * lossy-format member the reference's binary event payloads motivate
  * (`run.py:133-138` round-trips opaque binary through the consumer), so
  * the family no longer needs a stub codec for still images at all.
  *
  * [[decode]] is a REAL baseline decoder, not a fixture reader: marker
  * segment walk (DQT 8/16-bit, DHT, SOF0, DRI, SOS; APPn/COM skipped),
  * canonical Huffman decode (T.81 F.2.2.3 mincode/maxcode/valptr),
  * byte-stuffing-aware bit reader, restart-marker handling with DC
  * predictor reset, dequantization in zigzag order, double-precision
  * separable IDCT, box (nearest) chroma upsampling for subsampled scans,
  * and JFIF YCbCr→RGB. Grayscale (1 component) and YCbCr (3 components,
  * any sampling factors ≤ 4) are supported; progressive (SOF2),
  * arithmetic coding, 12-bit precision and hierarchical modes return
  * None — as does any structural violation (never a partial decode, the
  * PPM/WAV contract).
  *
  * [[encodeGrayDcOnly]] is the deterministic fixture arm for the DuckDB
  * oracle: constant-valued 8×8 blocks encode as DC-only coefficients whose
  * decode is EXACT integer arithmetic (pixel = 128 + 2t with the DC quant
  * step pinned to 16, so dequant·IDCT lands on an integer and rounding
  * never sees a .5) — a wrong Huffman bit, zigzag slot, quant multiply or
  * IDCT constant breaks the oracle hash. The encoder emits a fully
  * standard file (Annex K.3.1 Huffman tables, JFIF APP0) that independent
  * decoders read — the spec cross-validates it through javax.imageio.
  */
object JpegCodec {

  /** Decoded image: `channels` is 1 (gray) or 3 (RGB), `pixels` interleaved
    * row-major, one unsigned byte per sample.
    */
  final case class Jpeg(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this // control flow, not diagnostics
  }

  /** Thrown (internally) when a structurally VALID image exceeds the
    * decode allocation envelope — distinct from [[Malformed]] so callers
    * can route oversized assets differently from corrupt bytes
    * ([[decodeDetailed]]); a curation pipeline that treats every None as
    * "corrupt, discard" would otherwise silently drop legitimate large
    * assets (e.g. ~8000×8000 color) that merely need a bigger per-task
    * budget.
    */
  private final class Oversize(val declaredPlaneInts: Long) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Default per-task decode allocation ceiling: 2^26 total plane ints
    * (256 MB) — far above any fixture and safely below executor memory at
    * 32 concurrent tasks. Configurable per call site via
    * [[decodeDetailed]] for pipelines whose executors budget differently.
    */
  val DefaultMaxPlaneInts: Long = 1L << 26

  /** Three-way decode outcome — the routing signal a curation pipeline
    * needs: `Decoded` (use the pixels), `Oversized` (VALID structure, just
    * past the allocation envelope — route to a big-asset lane or retry
    * with a larger cap, do NOT discard as corrupt), `Invalid` (structural
    * violation or bytes that cannot back the declared planes — the
    * discard lane).
    */
  sealed trait DecodeResult
  object DecodeResult {
    final case class Decoded(img: Jpeg) extends DecodeResult
    final case class Oversized(declaredPlaneInts: Long, cap: Long) extends DecodeResult
    case object Invalid extends DecodeResult
  }

  /** Natural (row-major) position of the i-th zigzag-order coefficient. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: cos((2x+1)·u·π/16) and the 1/√2 DC normalizer
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cu: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Canonical Huffman table (T.81 C.2 code assignment, F.2.2.3 decode). */
  private final class Huff(counts: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxcode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l <= 16) {
        if (maxcode(l) >= 0 && code <= maxcode(l))
          return vals(valptr(l) + code - mincode(l))
        code = (code << 1) | br.bit()
        l += 1
      }
      throw Malformed
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * de-stuffing; any bare marker inside the bit stream is malformed (the
    * scan loop consumes RSTn markers itself, byte-aligned).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw Malformed
        val v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length || (b(pos) & 0xff) != 0x00) throw Malformed
          pos += 1 // stuffed zero byte
        }
        cur = v; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = nbits = 0
  }

  /** T.81 F.2.2.1 EXTEND: map a magnitude-category bit pattern to its value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int, var td: Int = 0, var ta: Int = 0)

  def decode(bytes: Array[Byte]): Option[Jpeg] =
    decodeDetailed(bytes) match {
      case DecodeResult.Decoded(img) => Some(img)
      case _ => None
    }

  /** [[decode]] with the oversized/invalid distinction surfaced and the
    * allocation envelope configurable. `Oversized` is only reachable when
    * the INFORMATION bound passes (the bytes present could genuinely back
    * the declared planes) but the absolute envelope doesn't — i.e. the
    * asset is plausibly valid and merely large; struct bombs (tiny files
    * declaring huge frames) fail the information bound first and stay
    * `Invalid`.
    */
  def decodeDetailed(
      bytes: Array[Byte],
      maxPlaneInts: Long = DefaultMaxPlaneInts): DecodeResult =
    // Malformed is the expected refusal path; the NonFatal backstop keeps
    // the Invalid-on-any-structural-violation contract airtight for
    // adversarial headers (an index slip on crafted lengths must never
    // escape a decoder of untrusted bytes as a task-killing exception)
    try decodeOrThrow(bytes, maxPlaneInts) match {
      case Some(img) => DecodeResult.Decoded(img)
      case None => DecodeResult.Invalid
    }
    catch {
      case o: Oversize => DecodeResult.Oversized(o.declaredPlaneInts, maxPlaneInts)
      case Malformed => DecodeResult.Invalid
      case scala.util.control.NonFatal(_) => DecodeResult.Invalid
    }

  private def be16(b: Array[Byte], i: Int): Int = {
    if (i + 1 >= b.length) throw Malformed
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  }

  private def decodeOrThrow(bytes: Array[Byte], maxPlaneInts: Long): Option[Jpeg] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None // no SOI
    val qtab = new Array[Array[Int]](4) // zigzag order, as stored
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var restartInterval = 0
    var width = 0; var height = 0
    var comps: Array[Component] = null
    var i = 2
    while (true) {
      // segment marker (skip fill bytes)
      if (i >= bytes.length) throw Malformed
      if ((bytes(i) & 0xff) != 0xff) throw Malformed
      while (i < bytes.length && (bytes(i) & 0xff) == 0xff) i += 1
      if (i >= bytes.length) throw Malformed
      val marker = bytes(i) & 0xff; i += 1
      marker match {
        case 0xd9 => throw Malformed // EOI before any scan completed
        case 0x01 => () // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST, standalone
        case 0xc0 => // SOF0 baseline
          val len = be16(bytes, i)
          if (len < 8 || i + len > bytes.length) throw Malformed
          val precision = bytes(i + 2) & 0xff
          if (precision != 8) throw Malformed
          height = be16(bytes, i + 3)
          width = be16(bytes, i + 5)
          val nf = bytes(i + 7) & 0xff
          if (width <= 0 || height <= 0 || (nf != 1 && nf != 3)) throw Malformed
          if (len < 8 + 3 * nf) throw Malformed
          comps = Array.tabulate(nf) { c =>
            val o = i + 8 + 3 * c
            val hv = bytes(o + 1) & 0xff
            val comp = Component(bytes(o) & 0xff, hv >> 4, hv & 15, bytes(o + 2) & 0xff)
            if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 || comp.tq > 3)
              throw Malformed
            comp
          }
          i += len
        case 0xc4 => // DHT (may carry several tables)
          val len = be16(bytes, i)
          if (i + len > bytes.length) throw Malformed
          var o = i + 2
          while (o < i + len) {
            val tcth = bytes(o) & 0xff
            val tc = tcth >> 4; val th = tcth & 15
            if (tc > 1 || th > 3 || o + 17 > i + len) throw Malformed
            val counts = Array.tabulate(16)(l => bytes(o + 1 + l) & 0xff)
            val n = counts.sum
            if (n > 256 || o + 17 + n > i + len) throw Malformed
            val vals = Array.tabulate(n)(k => bytes(o + 17 + k) & 0xff)
            val h = new Huff(counts, vals)
            if (tc == 0) dcTab(th) = h else acTab(th) = h
            o += 17 + n
          }
          i += len
        case 0xdb => // DQT (may carry several tables; Pq=1 → 16-bit entries)
          val len = be16(bytes, i)
          if (i + len > bytes.length) throw Malformed
          var o = i + 2
          while (o < i + len) {
            val pqtq = bytes(o) & 0xff
            val pq = pqtq >> 4; val tq = pqtq & 15
            if (pq > 1 || tq > 3) throw Malformed
            val step = if (pq == 1) 2 else 1
            if (o + 1 + 64 * step > i + len) throw Malformed
            qtab(tq) = Array.tabulate(64) { k =>
              if (pq == 1) be16(bytes, o + 1 + 2 * k) else bytes(o + 1 + k) & 0xff
            }
            if (qtab(tq).exists(_ <= 0)) throw Malformed
            o += 1 + 64 * step
          }
          i += len
        case 0xdd => // DRI
          val len = be16(bytes, i)
          if (len != 4 || i + len > bytes.length) throw Malformed
          restartInterval = be16(bytes, i + 2)
          i += len
        case 0xda => // SOS — decode the scan and finish
          if (comps == null) throw Malformed
          val len = be16(bytes, i)
          if (len < 3 || i + len > bytes.length) throw Malformed
          val ns = bytes(i + 2) & 0xff
          if (ns != comps.length || len < 6 + 2 * ns) throw Malformed
          var o = i + 3
          var c = 0
          while (c < ns) {
            val cs = bytes(o) & 0xff
            val comp = comps.find(_.id == cs).getOrElse(throw Malformed)
            comp.td = (bytes(o + 1) & 0xff) >> 4
            comp.ta = bytes(o + 1) & 15
            if (comp.td > 3 || comp.ta > 3) throw Malformed
            o += 2; c += 1
          }
          val ss = bytes(o) & 0xff; val se = bytes(o + 1) & 0xff
          if (ss != 0 || se != 63) throw Malformed // sequential full-spectrum scan only
          return Some(decodeScan(bytes, i + len, width, height, comps,
            qtab, dcTab, acTab, restartInterval, maxPlaneInts))
        case m if (m >= 0xc1 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          throw Malformed // progressive/arithmetic/lossless/hierarchical SOF
        case _ => // APPn, COM, and any other length-prefixed segment: skip
          val len = be16(bytes, i)
          if (len < 2 || i + len > bytes.length) throw Malformed
          i += len
      }
    }
    None // unreachable
  }

  /** Entropy-decode every MCU, reconstruct component planes, upsample and
    * color-convert. Planes are stored at sampled resolution; pixel lookups
    * use box (nearest) chroma upsampling.
    */
  private def decodeScan(
      bytes: Array[Byte], scanStart: Int, width: Int, height: Int,
      comps: Array[Component], qtab: Array[Array[Int]],
      dcTab: Array[Huff], acTab: Array[Huff], restartInterval: Int,
      maxPlaneInts: Long): Jpeg = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    // Struct-bomb bound BEFORE any plane allocation (the Mp4Codec
    // discipline): a few-hundred-byte file declaring 40000x40000 in its SOF
    // would otherwise demand multi-GB Int allocations, and OutOfMemoryError
    // is an Error the NonFatal backstop does NOT catch — the None-on-any-
    // structural-violation contract for untrusted bytes would be escaped
    // via memory exhaustion. Two caps, both conservative for real files:
    //  - information bound: every 8x8 block costs >= 2 entropy bits (a
    //    1-bit DC code + a 1-bit EOB is the floor), so a legal scan carries
    //    at most 4 blocks (256 plane ints) per input byte; declared planes
    //    past 256*len (+4 KB slack for tiny fixtures) cannot be backed by
    //    the bytes present and are rejected as Malformed.
    //  - absolute envelope: `maxPlaneInts` total plane ints (default 2^26
    //    = 256 MB) — a per-task decode allocation ceiling, far above any
    //    fixture and safely below executor memory at 32 concurrent tasks.
    //    A VALID image past it throws Oversize, not Malformed, so callers
    //    can route big assets away from the corrupt-bytes lane
    //    (decodeDetailed).
    val totalPlaneInts = comps.indices.map(c => planeW(c).toLong * planeH(c)).sum
    if (totalPlaneInts > 256L * bytes.length + 4096L) throw Malformed
    if (totalPlaneInts > maxPlaneInts) throw new Oversize(totalPlaneInts)
    val planes = comps.indices.map(c => new Array[Int](planeW(c) * planeH(c))).toArray
    comps.foreach { c =>
      if (qtab(c.tq) == null || dcTab(c.td) == null || acTab(c.ta) == null)
        throw Malformed
    }
    val br = new BitReader(bytes, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rstCount = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align and consume the expected RSTn marker; DC predictors reset
        br.align()
        if (br.pos + 1 >= bytes.length || (bytes(br.pos) & 0xff) != 0xff) throw Malformed
        val m = bytes(br.pos + 1) & 0xff
        if (m != 0xd0 + (rstCount % 8)) throw Malformed
        br.pos += 2
        rstCount += 1
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val q = qtab(comp.tq)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // --- one 8x8 block: Huffman + dequant (T.81 F.2.2) ---
            java.util.Arrays.fill(coef, 0)
            val t = dcTab(comp.td).decode(br)
            if (t > 11) throw Malformed
            pred(c) += extend(br.bits(t), t)
            coef(0) = pred(c) * q(0)
            var k = 1
            while (k < 64) {
              val rs = acTab(comp.ta).decode(br)
              val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) throw Malformed
                coef(ZigZag(k)) = extend(br.bits(s), s) * q(k)
                k += 1
              }
            }
            idct(coef, tmp, block)
            // place into the component plane
            val ox = (mx * comp.h + bx) * 8
            val oy = (my * comp.v + by) * 8
            val pw = planeW(c)
            var y = 0
            while (y < 8) {
              var x = 0
              val row = (oy + y) * pw + ox
              while (x < 8) { planes(c)(row + x) = block(y * 8 + x); x += 1 }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    // ---- upsample + color convert ----
    val channels = comps.length
    val out = new Array[Byte](width * height * channels)
    if (channels == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out(y * width + x) = planes(0)(y * pw + x).toByte; x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(c: Int): Int =
            planes(c)((y * comps(c).v / maxV) * planeW(c) + (x * comps(c).h / maxH))
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp255(Math.round(yy + 1.402 * cr).toInt).toByte
          out(o + 1) = clamp255(Math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
          out(o + 2) = clamp255(Math.round(yy + 1.772 * cb).toInt).toByte
          x += 1
        }
        y += 1
      }
    }
    Jpeg(width, height, channels, out)
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Separable double-precision IDCT with final level shift (+128) and
    * clamp — T.81 A.3.3 stated directly: rows first (per vertical frequency
    * v, inverse-transform the horizontal spectrum), then columns.
    */
  private def idct(coef: Array[Int], tmp: Array[Double], out: Array[Int]): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cu(u) * coef(v * 8 + u) * Cos(x)(u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += Cu(vv) * tmp(vv * 8 + x) * Cos(y)(vv); vv += 1 }
        out(y * 8 + x) = clamp255(Math.round(0.25 * s).toInt + 128)
        x += 1
      }
      y += 1
    }
  }

  // ======================= fixture encoder =======================

  /** Annex K.3.1 luminance DC Huffman spec: counts per code length 1–16. */
  private val StdDcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 luminance AC Huffman spec. */
  private val StdAcCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical (code, length) for every symbol of a counts/vals spec. */
  private def canonicalCodes(counts: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      var c = 0
      while (c < counts(l - 1)) { out += vals(k) -> (code, l); code += 1; k += 1; c += 1 }
      code <<= 1
    }
    out.result()
  }
  private lazy val DcCodes = canonicalCodes(StdDcCounts, StdDcVals)
  private lazy val AcCodes = canonicalCodes(StdAcCounts, StdAcVals)

  /** The DC quantization step the fixture pins (exactness argument in the
    * object scaladoc: pixel = 128 + 2t ⇒ DC coefficient 16t ⇒ quantized
    * index t, and dequant·IDCT reproduces 2t with no fractional part).
    */
  val FixtureDcQuant = 16

  private final class BitWriter(buf: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var l = len - 1
      while (l >= 0) {
        cur = (cur << 1) | ((code >> l) & 1)
        nbits += 1
        if (nbits == 8) {
          buf.write(cur)
          if (cur == 0xff) buf.write(0x00) // byte stuffing
          cur = 0; nbits = 0
        }
        l -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) { put((1 << (8 - nbits)) - 1, 8 - nbits) }
  }

  /** Encode a grayscale baseline JPEG of constant-valued 8×8 blocks: block
    * b (raster order over a (width/8)×(height/8) grid) is filled with the
    * even pixel value 128 + 2·blockT(b), blockT ∈ [-64, 63]. Emits a fully
    * standard file: SOI, JFIF APP0, DQT (DC step [[FixtureDcQuant]]), SOF0,
    * DHT (Annex K luminance pair), optional DRI, SOS, DC-only entropy data
    * (each block: DC diff + EOB), EOI. `restartEvery` > 0 inserts RSTn
    * markers every that-many MCUs (exercises the decoder's restart path).
    */
  /** Encode a COLOR 4:2:0 baseline JPEG whose decode is exact integer
    * arithmetic while exercising the general paths the DC-only arm cannot:
    * AC coefficients (zigzag slot 39 = natural (4,4), whose 2-D basis
    * cos((2x+1)π/4)·cos((2y+1)π/4) = ±1/2 exactly, so dequant·IDCT lands on
    * 128 + 2t + 2a·s(x)s(y) with the sign pattern s = [+,−,−,+,+,−,−,+]
    * and quant step 16 — float error ~1e-12 never moves the round), real
    * AC Huffman run coding (ZRL×2 + run-6 to reach slot 39), chroma planes
    * at half resolution through the box-upsampling path, and YCbCr→RGB
    * (whose Math.round(x) = floor(x+0.5) an oracle mirrors bit-for-bit as
    * FLOOR(x+0.5) over the identical IEEE products). Y DC/AC indices
    * raster over the (width/8)×(height/8) block grid; chroma DC/AC raster
    * over the (width/16)×(height/16) MCU grid. All components share quant
    * table 0 and the Annex-K luminance Huffman pair (both legal). Index
    * ranges keep every channel inside [0,255], so the clamp is never the
    * thing being tested.
    */
  def encodeColor420Ac(width: Int, height: Int,
      tY: Array[Int], aY: Array[Int],
      tCb: Array[Int], aCb: Array[Int],
      tCr: Array[Int], aCr: Array[Int]): Array[Byte] = {
    require(width > 0 && width % 16 == 0 && height > 0 && height % 16 == 0,
      s"fixture encoder writes whole 4:2:0 MCUs: ${width}x$height")
    val ybw = width / 8; val ybh = height / 8
    val mw = width / 16; val mh = height / 16
    require(tY.length == ybw * ybh && aY.length == ybw * ybh,
      s"need ${ybw * ybh} Y block values")
    require(tCb.length == mw * mh && aCb.length == mw * mh &&
      tCr.length == mw * mh && aCr.length == mw * mh, s"need ${mw * mh} chroma values")
    require((tY.iterator ++ tCb.iterator ++ tCr.iterator).forall(t => t >= -16 && t <= 16),
      "DC index out of [-16, 16]")
    require((aY.iterator ++ aCb.iterator ++ aCr.iterator).forall(a => a >= -4 && a <= 4),
      "AC index out of [-4, 4]")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // APP0 JFIF
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0)
    out.write(1); out.write(1)
    out.write(0)
    be16(1); be16(1)
    out.write(0); out.write(0)
    marker(0xdb); be16(67) // DQT table 0: step 16 in EVERY slot
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(16); k += 1 }
    marker(0xc0); be16(17) // SOF0: 3 components
    out.write(8)
    be16(height); be16(width)
    out.write(3)
    out.write(1); out.write(0x22); out.write(0) // Y: 2x2 sampling
    out.write(2); out.write(0x11); out.write(0) // Cb: 1x1
    out.write(3); out.write(0x11); out.write(0) // Cr: 1x1
    marker(0xc4)
    be16(2 + (17 + StdDcVals.length) + (17 + StdAcVals.length))
    out.write(0x00); StdDcCounts.foreach(out.write); StdDcVals.foreach(out.write)
    out.write(0x10); StdAcCounts.foreach(out.write); StdAcVals.foreach(out.write)
    marker(0xda); be16(12) // SOS: 3 components
    out.write(3)
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    // one 8x8 block: DC diff, then (if a != 0) 38 zeros (ZRL + ZRL + run 6)
    // and the slot-39 coefficient, then EOB; returns the new DC predictor
    def block(dcIdx: Int, acIdx: Int, pred: Int): Int = {
      val diff = dcIdx - pred
      val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = DcCodes(cat)
      bw.put(code, len)
      if (cat > 0) bw.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      if (acIdx != 0) {
        val (zrl, zrlLen) = AcCodes(0xf0)
        bw.put(zrl, zrlLen); bw.put(zrl, zrlLen) // 32 zeros: k 1 → 33
        val acat = 32 - Integer.numberOfLeadingZeros(math.abs(acIdx))
        val (c6, l6) = AcCodes((6 << 4) | acat) // 6 more zeros → k = 39
        bw.put(c6, l6)
        bw.put(if (acIdx >= 0) acIdx else acIdx + (1 << acat) - 1, acat)
      }
      val (eob, eobLen) = AcCodes(0x00)
      bw.put(eob, eobLen)
      dcIdx
    }
    var predY = 0; var predCb = 0; var predCr = 0
    var m = 0
    while (m < mw * mh) {
      val mx = m % mw; val my = m / mw
      var by = 0
      while (by < 2) {
        var bx = 0
        while (bx < 2) {
          val g = (my * 2 + by) * ybw + (mx * 2 + bx)
          predY = block(tY(g), aY(g), predY)
          bx += 1
        }
        by += 1
      }
      predCb = block(tCb(m), aCb(m), predCb)
      predCr = block(tCr(m), aCr(m), predCr)
      m += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  def encodeGrayDcOnly(width: Int, height: Int, blockT: Array[Int],
      restartEvery: Int = 0): Array[Byte] = {
    require(width > 0 && width % 8 == 0 && height > 0 && height % 8 == 0,
      s"fixture encoder writes whole blocks: ${width}x$height")
    val bx = width / 8; val by = height / 8
    require(blockT.length == bx * by, s"need ${bx * by} block values, got ${blockT.length}")
    require(blockT.forall(t => t >= -64 && t <= 63), "block t out of [-64, 63]")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // APP0 JFIF
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0) // NUL
    out.write(1); out.write(1) // version 1.1
    out.write(0) // density units: none
    be16(1); be16(1) // aspect 1:1
    out.write(0); out.write(0) // no thumbnail
    marker(0xdb); be16(67) // DQT, 8-bit, table 0
    out.write(0x00)
    out.write(FixtureDcQuant) // zigzag slot 0 = DC
    var k = 1
    while (k < 64) { out.write(16); k += 1 } // AC steps unused (all ACs zero)
    marker(0xc0); be16(11) // SOF0: 1 component
    out.write(8) // precision
    be16(height); be16(width)
    out.write(1) // Nf
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1, q-table 0
    marker(0xc4) // DHT: DC table 0 + AC table 0 in one segment
    be16(2 + (17 + StdDcVals.length) + (17 + StdAcVals.length))
    out.write(0x00); StdDcCounts.foreach(out.write); StdDcVals.foreach(out.write)
    out.write(0x10); StdAcCounts.foreach(out.write); StdAcVals.foreach(out.write)
    if (restartEvery > 0) { marker(0xdd); be16(4); be16(restartEvery) }
    marker(0xda); be16(8) // SOS
    out.write(1) // Ns
    out.write(1); out.write(0x00) // component 1, DC/AC table 0
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    var bw = new BitWriter(out)
    var pred = 0
    var b = 0
    var rst = 0
    while (b < blockT.length) {
      if (restartEvery > 0 && b > 0 && b % restartEvery == 0) {
        bw.flush()
        marker(0xd0 + (rst % 8)); rst += 1
        pred = 0
        bw = new BitWriter(out)
      }
      val dc = blockT(b) // quantized DC index: dequant 16t, IDCT → 2t
      val diff = dc - pred; pred = dc
      val mag = math.abs(diff)
      val cat = 32 - Integer.numberOfLeadingZeros(mag) // bits needed; 0 for diff=0
      val (code, len) = DcCodes(cat)
      bw.put(code, len)
      if (cat > 0) bw.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      val (eob, eobLen) = AcCodes(0x00)
      bw.put(eob, eobLen)
      b += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}

package graft.multimodal

/** Pure-JVM ISO Base Media File Format (MP4, ISO/IEC 14496-12) container
  * codec — the video member of the real-codec family. What a training-data
  * pipeline does with video at 100 TB is CONTAINER work: parse track
  * metadata (duration, handler, codec fourcc), walk the sample tables
  * (stsc/stsz/stco) to locate frame payloads for sharding/striping
  * decisions, and stream sample bytes out — all fully specified public
  * structure, implemented here as a real parser. Codec-PAYLOAD decode
  * (H.264/H.265 entropy + transform) is the one layer that stays out of
  * scope (a full video decoder is not feasible in this environment); the
  * sample BYTES are still read and verified via the chunk-offset tables,
  * so a wrong stsc walk, stco offset or stsz size breaks the oracle.
  *
  * [[decode]] handles: nested box walk with 32-bit and 64-bit (largesize)
  * boxes, ftyp major brand, mvhd versions 0/1, the first video/sound trak's
  * mdhd (v0/v1) + hdlr + stsd entry fourcc, full stsc chunk-run expansion,
  * uniform and per-sample stsz, stco/co64 chunk offsets, and sample-byte
  * extraction from mdat via the expanded chunk map. Any structural
  * violation (box overflow, missing required box, offsets outside the
  * file) returns None — never a partial parse (the family contract).
  *
  * [[encode]] is the deterministic muxer fixture arm: a minimal valid
  * single-track file (ftyp + mdat + moov with the full stbl chain) whose
  * samples split across TWO chunks so the stsc walk is genuinely
  * exercised; byte layout is pinned by Mp4CodecSpec.
  */
object Mp4Codec {

  /** Parsed container: `sampleSizes(i)` and `samples(i)` align; `samples`
    * holds the actual payload bytes read via the chunk tables.
    */
  final case class Mp4(
      brand: String, timescale: Long, duration: Long,
      handler: String, codec: String,
      sampleSizes: Array[Long], samples: Array[Array[Byte]])

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private def u32(b: Array[Byte], i: Long): Long = {
    if (i < 0 || i + 4 > b.length) throw Malformed
    val j = i.toInt
    ((b(j) & 0xffL) << 24) | ((b(j + 1) & 0xffL) << 16) |
      ((b(j + 2) & 0xffL) << 8) | (b(j + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], i: Long): Long = {
    val hi = u32(b, i); val lo = u32(b, i + 4)
    val v = (hi << 32) | lo
    if (v < 0) throw Malformed // payloads beyond 2^63 can't index a JVM array anyway
    v
  }
  private def fourcc(b: Array[Byte], i: Long): String = {
    if (i < 0 || i + 4 > b.length) throw Malformed
    new String(b, i.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** One box header: (type, payloadStart, payloadEnd). Sizes are computed
    * in Long; size==1 reads the 64-bit largesize, size==0 extends to the
    * enclosing end (top-level only, per spec — accepted anywhere here,
    * bounded by `end`).
    */
  private def box(b: Array[Byte], at: Long, end: Long): (String, Long, Long) = {
    if (at + 8 > end) throw Malformed
    val size32 = u32(b, at)
    val typ = fourcc(b, at + 4)
    val (payload, boxEnd) =
      if (size32 == 1L) { if (at + 16 > end) throw Malformed; (at + 16, at + u64(b, at + 8)) }
      else if (size32 == 0L) (at + 8, end)
      else (at + 8, at + size32)
    if (boxEnd < payload || boxEnd > end) throw Malformed
    (typ, payload, boxEnd)
  }

  /** Find the FIRST child box of `typ` in [from, end); None if absent. */
  private def child(b: Array[Byte], from: Long, end: Long, typ: String): Option[(Long, Long)] = {
    var i = from
    while (i < end) {
      val (t, p, e) = box(b, i, end)
      if (t == typ) return Some((p, e))
      i = e
    }
    None
  }

  def decode(bytes: Array[Byte]): Option[Mp4] =
    try Some(decodeOrThrow(bytes))
    catch {
      case Malformed => None
      case scala.util.control.NonFatal(_) => None // untrusted-bytes backstop
    }

  private def decodeOrThrow(b: Array[Byte]): Mp4 = {
    val end = b.length.toLong
    val ftyp = child(b, 0, end, "ftyp").getOrElse(throw Malformed)
    val brand = fourcc(b, ftyp._1)
    val moov = child(b, 0, end, "moov").getOrElse(throw Malformed)
    // mvhd: movie timescale/duration (v0: u32s after version/flags+2
    // timestamps; v1: u64 timestamps, u32 timescale, u64 duration)
    val mvhd = child(b, moov._1, moov._2, "mvhd").getOrElse(throw Malformed)
    val mvhdVer = (u32(b, mvhd._1) >> 24).toInt
    val (timescale, duration) = mvhdVer match {
      case 0 => (u32(b, mvhd._1 + 12), u32(b, mvhd._1 + 16))
      case 1 => (u32(b, mvhd._1 + 20), u64(b, mvhd._1 + 24))
      case _ => throw Malformed
    }
    val trak = child(b, moov._1, moov._2, "trak").getOrElse(throw Malformed)
    val mdia = child(b, trak._1, trak._2, "mdia").getOrElse(throw Malformed)
    val hdlr = child(b, mdia._1, mdia._2, "hdlr").getOrElse(throw Malformed)
    val handler = fourcc(b, hdlr._1 + 8) // version/flags(4) + pre_defined(4)
    val minf = child(b, mdia._1, mdia._2, "minf").getOrElse(throw Malformed)
    val stbl = child(b, minf._1, minf._2, "stbl").getOrElse(throw Malformed)
    val stsd = child(b, stbl._1, stbl._2, "stsd").getOrElse(throw Malformed)
    if (u32(b, stsd._1 + 4) < 1) throw Malformed // entry_count
    val codec = fourcc(b, stsd._1 + 12) // first sample-entry's type fourcc
    // stsz: uniform sample_size or a per-sample table
    val stsz = child(b, stbl._1, stbl._2, "stsz").getOrElse(throw Malformed)
    val uniform = u32(b, stsz._1 + 4)
    val nSamples = u32(b, stsz._1 + 8)
    if (nSamples > (1L << 22)) throw Malformed // struct-bomb bound: 4M samples/file
    val sizes = Array.tabulate(nSamples.toInt) { i =>
      val sz = if (uniform != 0) uniform else u32(b, stsz._1 + 12 + 4L * i)
      if (sz > (1L << 26)) throw Malformed // 64 MB/sample bound
      sz
    }
    // chunk offsets: stco (u32) or co64 (u64)
    val offsets: Array[Long] = child(b, stbl._1, stbl._2, "stco") match {
      case Some((p, _)) =>
        val n = u32(b, p + 4)
        if (n > (1L << 22)) throw Malformed
        Array.tabulate(n.toInt)(i => u32(b, p + 8 + 4L * i))
      case None =>
        val (p, _) = child(b, stbl._1, stbl._2, "co64").getOrElse(throw Malformed)
        val n = u32(b, p + 4)
        if (n > (1L << 22)) throw Malformed
        Array.tabulate(n.toInt)(i => u64(b, p + 8 + 8L * i))
    }
    // stsc: (first_chunk, samples_per_chunk, desc) runs; expand to a
    // per-chunk sample count over the stco chunk list
    val stsc = child(b, stbl._1, stbl._2, "stsc").getOrElse(throw Malformed)
    val nRuns = u32(b, stsc._1 + 4)
    if (nRuns > (1L << 20)) throw Malformed
    val runs = Array.tabulate(nRuns.toInt) { i =>
      (u32(b, stsc._1 + 8 + 12L * i), u32(b, stsc._1 + 12 + 12L * i))
    }
    if (runs.isEmpty || runs.head._1 != 1L) throw Malformed // first run must start at chunk 1
    // walk chunks in order, reading each sample's bytes at its offset
    val samples = new Array[Array[Byte]](nSamples.toInt)
    var si = 0
    var run = 0
    var chunk = 1L
    // Cumulative allocation bound: the per-item caps (4M samples, 64 MB
    // each) do not bound the PRODUCT — crafted stco offsets can all point
    // at the same region, so each per-chunk off+sz<=length check passes
    // while total copyOfRange allocation reaches nChunks*fileSize (a ~16 MB
    // file demanding terabytes, ending in an uncatchable OutOfMemoryError
    // instead of None). A legitimate file's samples are disjoint mdat
    // regions, so their total bytes can never exceed the file length —
    // exceeding it is a structural violation, rejected before allocating.
    var cumBytes = 0L
    while (si < nSamples.toInt) {
      if (chunk > offsets.length) throw Malformed // more samples than chunk space
      while (run + 1 < runs.length && runs(run + 1)._1 <= chunk) run += 1
      val perChunk = runs(run)._2
      if (perChunk <= 0) throw Malformed
      var off = offsets((chunk - 1).toInt)
      var k = 0L
      while (k < perChunk && si < nSamples.toInt) {
        val sz = sizes(si)
        if (off < 0 || off + sz > b.length) throw Malformed
        cumBytes += sz
        if (cumBytes > b.length) throw Malformed // overlapping-sample bomb
        samples(si) = java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt)
        off += sz
        si += 1; k += 1
      }
      chunk += 1
    }
    Mp4(brand, timescale, duration, handler, codec, sizes, samples)
  }

  // ======================= fixture muxer =======================

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def cc(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    /** A box assembled from a payload-writing closure (size computed). */
    def boxed(typ: String)(body: Buf => Unit): Unit = {
      val inner = new Buf; body(inner)
      u32(8L + inner.out.size()); cc(typ); bytes(inner.out.toByteArray)
    }
  }

  /** Minimal valid single-video-track MP4: ftyp('isom') + mdat (samples in
    * TWO chunks: first ceil(n/2), then the rest — forcing a 2-run stsc
    * walk when both chunks are non-empty) + moov(mvhd v0, trak(tkhd-less
    * mdia(mdhd v0, hdlr 'vide', minf(stbl(stsd 'mp4v', stts, stsc, stsz
    * per-sample, stco))))). stco offsets are absolute file offsets, so the
    * mdat is written FIRST and moov trails (the streaming-unfriendly but
    * simplest legal layout).
    */
  def encode(timescale: Long, duration: Long, samples: Array[Array[Byte]]): Array[Byte] = {
    require(samples.nonEmpty && timescale > 0 && duration >= 0)
    val n = samples.length
    val c1 = (n + 1) / 2 // chunk 1 sample count
    val ftypLen = 20L // size+type+major+minor+1 compatible brand
    val chunk1Off = ftypLen + 8 // after mdat header
    val chunk2Off = chunk1Off + samples.take(c1).map(_.length.toLong).sum
    val f = new Buf
    // ftyp
    f.u32(ftypLen); f.cc("ftyp"); f.cc("isom"); f.u32(0); f.cc("isom")
    // mdat
    val payload = samples.flatten.toArray // chunk split is contiguous, so flat order == chunk order
    f.u32(8L + payload.length); f.cc("mdat"); f.bytes(payload)
    // moov
    f.boxed("moov") { moov =>
      moov.boxed("mvhd") { m =>
        m.u32(0) // version 0 + flags
        m.u32(0); m.u32(0) // creation/modification time
        m.u32(timescale); m.u32(duration)
        m.u32(0x00010000); m.u32(0x01000000L) // rate 1.0; volume 1.0 (u16) + reserved u16
        m.u32(0); m.u32(0) // reserved
        Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(m.u32)
        (0 until 6).foreach(_ => m.u32(0)) // pre_defined
        m.u32(2) // next_track_ID
      }
      moov.boxed("trak") { trak =>
        trak.boxed("mdia") { mdia =>
          mdia.boxed("mdhd") { m =>
            m.u32(0); m.u32(0); m.u32(0)
            m.u32(timescale); m.u32(duration)
            m.u32(0x55c40000L) // language 'und' + pre_defined
          }
          mdia.boxed("hdlr") { m =>
            m.u32(0); m.u32(0) // version/flags, pre_defined
            m.cc("vide")
            m.u32(0); m.u32(0); m.u32(0) // reserved
            m.out.write(0) // empty name (NUL)
          }
          mdia.boxed("minf") { minf =>
            minf.boxed("stbl") { stbl =>
              stbl.boxed("stsd") { m =>
                m.u32(0); m.u32(1) // version/flags, entry_count
                m.boxed("mp4v") { e => // minimal sample entry: 6 reserved bytes + u16 data_ref_index
                  e.u32(0); e.out.write(0); e.out.write(0) // reserved[6]
                  e.out.write(0); e.out.write(1) // data_reference_index = 1
                }
              }
              stbl.boxed("stts") { m =>
                m.u32(0); m.u32(1); m.u32(n); m.u32(1) // n samples, delta 1
              }
              stbl.boxed("stsc") { m =>
                m.u32(0)
                if (n > c1) { // two chunk runs
                  m.u32(2)
                  m.u32(1); m.u32(c1); m.u32(1)
                  m.u32(2); m.u32(n - c1); m.u32(1)
                } else { m.u32(1); m.u32(1); m.u32(c1); m.u32(1) }
              }
              stbl.boxed("stsz") { m =>
                m.u32(0); m.u32(0); m.u32(n) // per-sample table
                samples.foreach(s => m.u32(s.length))
              }
              stbl.boxed("stco") { m =>
                m.u32(0)
                if (n > c1) { m.u32(2); m.u32(chunk1Off); m.u32(chunk2Off) }
                else { m.u32(1); m.u32(chunk1Off) }
              }
            }
          }
        }
      }
    }
    f.out.toByteArray
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp4Codec

/** The ISO-BMFF container codec: round-trip (muxer → parser, byte-exact
  * sample payloads through the two-chunk stsc walk), pinned byte layout
  * (the muxer's output is hand-checked against ISO/IEC 14496-12 box
  * structure, not just self-consistent), structural-violation refusal, and
  * the no-throw fuzz contract over truncations and byte flips.
  */
class Mp4CodecSpec extends AnyFunSuite {

  private def mk(n: Int, seed: Int): Array[Array[Byte]] =
    Array.tabulate(n)(k => Array.tabulate(8 + (seed + k) % 9)(j => ((seed * 31 + k * 17 + j * 7) % 256).toByte))

  test("round-trip: metadata and byte-exact sample payloads through the 2-chunk stsc walk") {
    for (n <- Seq(1, 2, 3, 7, 12)) {
      val samples = mk(n, n * 100 + 3)
      val bytes = Mp4Codec.encode(timescale = 90000, duration = 3003L * n, samples)
      val got = Mp4Codec.decode(bytes)
      assert(got.nonEmpty, s"n=$n failed")
      val m = got.get
      assert(m.brand == "isom" && m.timescale == 90000 && m.duration == 3003L * n)
      assert(m.handler == "vide" && m.codec == "mp4v")
      assert(m.sampleSizes.toSeq == samples.map(_.length.toLong).toSeq)
      for (k <- 0 until n)
        assert(java.util.Arrays.equals(m.samples(k), samples(k)), s"n=$n sample $k bytes differ")
    }
  }

  test("box layout is genuinely ISO-BMFF: hand-walked structure of the emitted bytes") {
    val b = Mp4Codec.encode(1000, 42, mk(2, 5))
    def u32(i: Int): Long = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def cc(i: Int): String = new String(b, i, 4, "US-ASCII")
    // ftyp at 0: size 20, major brand isom
    assert(u32(0) == 20 && cc(4) == "ftyp" && cc(8) == "isom")
    // mdat immediately after
    assert(cc(24) == "mdat")
    val mdatEnd = 20 + u32(20)
    // moov trails and closes the file exactly
    assert(cc(mdatEnd.toInt + 4) == "moov")
    assert(mdatEnd + u32(mdatEnd.toInt) == b.length)
    // first child of moov is mvhd with version 0
    assert(cc(mdatEnd.toInt + 12) == "mvhd" && u32(mdatEnd.toInt + 16) == 0)
  }

  test("structural violations refuse: missing boxes, bad offsets, truncation") {
    val ok = Mp4Codec.encode(600, 600, mk(3, 9))
    assert(Mp4Codec.decode(Array[Byte]()).isEmpty)
    assert(Mp4Codec.decode(ok.take(40)).isEmpty, "no moov")
    // corrupt the stco chunk offset to point past EOF: the sample read must refuse
    val stcoAt = {
      var i = 0; var at = -1
      while (at < 0 && i + 4 <= ok.length) {
        if (new String(ok, i, math.min(4, ok.length - i), "US-ASCII") == "stco") at = i
        i += 1
      }
      at
    }
    assert(stcoAt > 0)
    val bad = ok.clone()
    // first offset lives at stco payload + 8 (version/flags + count)
    bad(stcoAt + 4 + 8) = 0x7f // huge offset
    assert(Mp4Codec.decode(bad).isEmpty, "offset past EOF must refuse")
    // a box whose declared size overruns the file must refuse
    val overrun = ok.clone()
    overrun(0) = 0x7f
    assert(Mp4Codec.decode(overrun).isEmpty)
  }

  test("overlapping-sample bomb: cumulative sample bytes past the file length refuse") {
    // Per-item bounds don't bound the PRODUCT: stco offsets all pointing at
    // the same region pass every off+sz<=length check while total
    // copyOfRange allocation reaches nChunks*fileSize. A legitimate file's
    // samples are disjoint mdat regions (total <= file length), so the
    // cumulative bound rejects this as Malformed -> None, not OOM.
    val ok = Mp4Codec.encode(1000, 100, mk(2, 3))
    def find(tag: String): Int = {
      var i = 0; var at = -1
      while (at < 0 && i + 4 <= ok.length) {
        if (new String(ok, i, 4, "US-ASCII") == tag) at = i
        i += 1
      }
      assert(at > 0, s"$tag not found"); at
    }
    def putU32(b: Array[Byte], at: Int, v: Long): Unit = {
      b(at) = ((v >> 24) & 0xff).toByte; b(at + 1) = ((v >> 16) & 0xff).toByte
      b(at + 2) = ((v >> 8) & 0xff).toByte; b(at + 3) = (v & 0xff).toByte
    }
    val bomb = ok.clone()
    // stsz payload: version/flags, uniform, count — claim each of the 2
    // samples spans most of the file
    putU32(bomb, find("stsz") + 8, (ok.length - 40).toLong)
    // stco: both chunk offsets -> 0, so each per-sample bounds check passes
    val stco = find("stco")
    putU32(bomb, stco + 12, 0L); putU32(bomb, stco + 16, 0L)
    assert(Mp4Codec.decode(bomb).isEmpty, "overlapping-sample bomb must return None")
  }

  test("fuzz: every truncation offset and 3000 random mutations never throw") {
    val ok = Mp4Codec.encode(24000, 1001, mk(5, 21))
    for (n <- 0 until ok.length) Mp4Codec.decode(ok.take(n))
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3000) {
      val b = ok.clone()
      for (_ <- 0 to rnd.nextInt(4)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Mp4Codec.decode(b)
    }
  }
}

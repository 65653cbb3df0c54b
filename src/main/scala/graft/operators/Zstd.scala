package graft.operators

/** Zstandard frame decoder — written from scratch against RFC 8878
  * (the public Zstandard format spec), in the GIF-LZW/inflate
  * tradition: modern corpus releases ship `.jsonl.zst` members the
  * JDK has no decoder for, so the archive tier needs its own.
  *
  * HONEST SCOPE (documented; everything else rejects whole-input):
  *   - no dictionaries (any nonzero Dictionary_ID rejects);
  *   - window size capped at 1 GiB, output capped by `maxOut`;
  *   - standard + skippable frames, concatenated;
  *   - full compressed-block support: Huffman literals (direct and
  *     FSE-compressed weight descriptions, 1- and 4-stream, treeless
  *     repeat), sequences in all four symbol modes (predefined, RLE,
  *     FSE-compressed, repeat), the three rolling repeat offsets with
  *     the literals_length==0 quirk;
  *   - content checksums VERIFIED (xxhash64 implemented below).
  *
  * Every loop is input-bounded and every table read is range-checked:
  * the never-hang/never-throw ingest contract (FuzzTotalitySpec).
  * ZstdSpec pins reference vectors produced by the real `zstd` CLI
  * (v1.5.7) from documented inputs, so the FSE/Huffman paths are
  * checked against the canonical implementation's output bytes.
  */
object Zstd {

  private final class Bad extends RuntimeException("bad zstd")
  private def bad(): Nothing = throw new Bad

  // Evaluated once: the synchronized Properties lookup must not sit in
  // the per-sequence decode loop (it serializes all decoding threads).
  private val ZDebug = System.getProperty("zstd.debug") != null

  private val MagicFrame = 0xFD2FB528
  private val MaxWindow = 1L << 30 // memory is governed by maxOut, not the window

  /** Growable output with direct back-reference reads (match copies
    * must see bytes written moments ago — overlap is the normal case).
    */
  private final class OutBuf(cap: Int) {
    private var buf = new Array[Byte](math.min(cap, 1 << 16))
    var len = 0
    private def ensure(n: Int): Unit = {
      if (len + n > cap) bad()
      if (len + n > buf.length) {
        var nl = buf.length
        while (nl < len + n) nl = math.min(cap, math.max(nl * 2, len + n))
        buf = java.util.Arrays.copyOf(buf, nl)
      }
    }
    def writeByte(v: Byte, times: Int): Unit = {
      ensure(times)
      java.util.Arrays.fill(buf, len, len + times, v)
      len += times
    }
    def write(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n)
      System.arraycopy(src, off, buf, len, n)
      len += n
    }
    def copyMatch(offset: Int, n: Int): Unit = {
      ensure(n)
      var j = 0
      val src = len - offset
      while (j < n) { buf(len + j) = buf(src + j); j += 1 }
      len += n
    }
    def byteAt(i: Int): Byte = buf(i)
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def slice(from: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, from, len)
  }

  // -------------------------------------------------------------------
  // Bit streams
  // -------------------------------------------------------------------

  /** Forward bitstream: bits read LSB-first within bytes, bytes in
    * order (FSE table descriptions).
    */
  private final class FwdBits(b: Array[Byte], val lo: Int, val hi: Int) {
    private var bitPos = 0L
    def consumedBytes: Int = ((bitPos + 7) / 8).toInt
    def read(n: Int): Int = {
      var v = 0L
      var i = 0
      while (i < n) {
        val bit = bitPos + i
        val byteAt = lo + (bit >> 3)
        if (byteAt >= hi) bad()
        v |= (((b(byteAt.toInt) >> (bit & 7).toInt) & 1).toLong << i)
        i += 1
      }
      bitPos += n
      v.toInt
    }
  }

  /** Backward bitstream (FSE/Huffman payloads): the LAST byte's
    * highest set bit is the padding sentinel; reading proceeds from
    * just below it toward the first byte, MSB-of-stream first.
    * Over-reads return zero bits and set the overflow flag — the FSE
    * termination convention.
    */
  private final class BackBits(b: Array[Byte], lo: Int, hi: Int) {
    if (hi <= lo) bad()
    private val lastByte = b(hi - 1) & 0xff
    if (lastByte == 0) bad() // missing padding bit
    // total bits available below the sentinel
    private var avail: Long =
      (hi - lo - 1).toLong * 8 + (31 - Integer.numberOfLeadingZeros(lastByte))
    var overflowed = false
    def bitsLeft: Long = avail
    def read(n: Int): Int = {
      if (n == 0) return 0
      var v = 0
      var i = n - 1
      while (i >= 0) {
        avail -= 1
        if (avail < 0) { overflowed = true }
        else {
          val byteAt = lo + (avail >> 3)
          val bit = (avail & 7).toInt
          v |= (((b(byteAt.toInt) >> bit) & 1) << i)
        }
        i -= 1
      }
      v
    }
    /** Huffman peek-with-zero-padding: read n bits, allowing the tail
      * to run past the start (padded with zeros), without flagging.
      */
    def readPadded(n: Int): Int = {
      var v = 0
      var i = n - 1
      while (i >= 0) {
        avail -= 1
        if (avail >= 0) {
          val byteAt = lo + (avail >> 3)
          val bit = (avail & 7).toInt
          v |= (((b(byteAt.toInt) >> bit) & 1) << i)
        }
        i -= 1
      }
      v
    }
    def unread(n: Int): Unit = { avail += n }
  }

  // -------------------------------------------------------------------
  // FSE
  // -------------------------------------------------------------------

  private final class FseTable(val accLog: Int, val symbol: Array[Int],
      val nbBits: Array[Int], val baseline: Array[Int])

  /** Build a decode table from normalized counts (-1 = low-prob). */
  private def fseBuild(accLog: Int, probs: Array[Int]): FseTable = {
    val size = 1 << accLog
    val symbol = new Array[Int](size)
    var highThreshold = size - 1
    // low-prob symbols at the top
    var s = 0
    while (s < probs.length) {
      if (probs(s) == -1) {
        if (highThreshold < 0) bad()
        symbol(highThreshold) = s
        highThreshold -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < probs.length) {
      var i = 0
      while (i < probs(s)) {
        symbol(pos) = s
        do { pos = (pos + step) & mask } while (pos > highThreshold)
        i += 1
      }
      s += 1
    }
    if (pos != 0) bad() // the spread must close the cycle
    // per-cell nbBits + baseline: the i-th cell of symbol s (in table
    // order) carries counter prob(s)+i
    val counters = new Array[Int](probs.length)
    s = 0
    while (s < probs.length) {
      counters(s) = math.abs(probs(s)) // -1 -> 1 slot
      s += 1
    }
    val nbBits = new Array[Int](size)
    val baseline = new Array[Int](size)
    var c = 0
    while (c < size) {
      val sym = symbol(c)
      val x = counters(sym)
      counters(sym) += 1
      val hb = 31 - Integer.numberOfLeadingZeros(x)
      nbBits(c) = accLog - hb
      baseline(c) = (x << nbBits(c)) - size
      c += 1
    }
    new FseTable(accLog, symbol, nbBits, baseline)
  }

  /** Parse an FSE table description (forward bitstream). Returns the
    * table and the number of HEADER bytes consumed.
    */
  private def fseParse(b: Array[Byte], lo: Int, hi: Int, maxAcc: Int,
      maxSymbol: Int): (FseTable, Int) = {
    val fb = new FwdBits(b, lo, hi)
    val accLog = fb.read(4) + 5
    if (accLog > maxAcc) bad()
    var remaining = (1 << accLog) + 1
    var threshold = 1 << accLog
    var nbBits = accLog + 1
    val probs = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        var rep = fb.read(2)
        charnum += rep
        while (rep == 3) {
          rep = fb.read(2)
          charnum += rep
        }
        if (charnum > maxSymbol) bad()
        previous0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val low = fb.read(nbBits - 1)
        var count =
          if (low < max) low
          else {
            val full = low | (fb.read(1) << (nbBits - 1))
            if (full >= threshold) full - max else full
          }
        count -= 1 // -1 is the low-prob marker
        remaining -= math.abs(count)
        if (remaining < 1) bad()
        probs(charnum) = count
        charnum += 1
        previous0 = count == 0
        while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
      }
    }
    if (remaining != 1) bad()
    (fseBuild(accLog, java.util.Arrays.copyOf(probs, charnum)),
      fb.consumedBytes)
  }

  // -------------------------------------------------------------------
  // Huffman
  // -------------------------------------------------------------------

  private final class HufTable(val maxBits: Int, val symbol: Array[Int],
      val length: Array[Int])

  /** Build the canonical table from per-symbol weights (0 = absent;
    * the LAST weight is implied by the power-of-two completion).
    */
  private def hufFromWeights(weights: Array[Int]): HufTable = {
    // max 255 explicit weights: the implied last symbol completes 256;
    // more would emit literal symbols > 255 (truncated by the byte sink)
    if (weights.length > 255) bad()
    var sum = 0L
    weights.foreach { w =>
      if (w < 0 || w > 11) bad()
      if (w > 0) sum += 1L << (w - 1)
    }
    if (sum == 0) bad()
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(sum)
    if (maxBits > 11) bad()
    val left = (1L << maxBits) - sum
    // the implied last weight must be a power of two
    if (left <= 0 || java.lang.Long.bitCount(left) != 1) bad()
    val lastW = java.lang.Long.numberOfTrailingZeros(left).toInt + 1
    val all = weights :+ lastW
    val nSym = all.length
    val bits = new Array[Int](nSym)
    var i = 0
    while (i < nSym) {
      bits(i) = if (all(i) > 0) maxBits.toInt + 1 - all(i) else 0
      i += 1
    }
    val size = 1 << maxBits.toInt
    val symbol = new Array[Int](size)
    val length = new Array[Int](size)
    // longer codes occupy lower indices; natural order within a length
    val rankCount = new Array[Int](maxBits.toInt + 2)
    bits.foreach(nb => if (nb > 0) rankCount(nb) += 1)
    val rankIdx = new Array[Int](maxBits.toInt + 2)
    var r = maxBits.toInt
    rankIdx(maxBits.toInt) = 0
    while (r >= 1) {
      rankIdx(r - 1) = rankIdx(r) + rankCount(r) * (1 << (maxBits.toInt - r))
      r -= 1
    }
    if (rankIdx(0) != size) bad()
    i = 0
    while (i < nSym) {
      if (bits(i) > 0) {
        val start = rankIdx(bits(i))
        val len = 1 << (maxBits.toInt - bits(i))
        var j = 0
        while (j < len) {
          symbol(start + j) = i
          length(start + j) = bits(i)
          j += 1
        }
        rankIdx(bits(i)) += len
      }
      i += 1
    }
    new HufTable(maxBits.toInt, symbol, length)
  }

  /** Parse a Huffman tree description at b[lo..]: direct 4-bit
    * weights or an FSE-compressed weight stream. Returns (table,
    * bytes consumed).
    */
  private def hufParse(b: Array[Byte], lo: Int, hi: Int): (HufTable, Int) = {
    if (lo >= hi) bad()
    val h = b(lo) & 0xff
    if (h >= 128) {
      val n = h - 127
      val nBytes = (n + 1) / 2
      if (lo + 1 + nBytes > hi) bad()
      val weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val by = b(lo + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) by >> 4 else by & 0xf
        i += 1
      }
      (hufFromWeights(weights), 1 + nBytes)
    } else {
      // FSE-compressed weights: h bytes of (table description +
      // backward 2-state interleaved stream)
      if (lo + 1 + h > hi) bad()
      val (ft, hdrBytes) = fseParse(b, lo + 1, lo + 1 + h, 6, 255)
      val streamLo = lo + 1 + hdrBytes
      val streamHi = lo + 1 + h
      val bb = new BackBits(b, streamLo, streamHi)
      var s1 = bb.read(ft.accLog)
      var s2 = bb.read(ft.accLog)
      if (bb.overflowed) bad()
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var done = false
      while (!done) {
        if (out.length > 254) bad()
        out += ft.symbol(s1)
        s1 = ft.baseline(s1) + bb.read(ft.nbBits(s1))
        if (bb.overflowed) {
          if (out.length > 254) bad() // forced append must stay <= 255 weights
          out += ft.symbol(s2); done = true
        }
        else {
          if (out.length > 254) bad()
          out += ft.symbol(s2)
          s2 = ft.baseline(s2) + bb.read(ft.nbBits(s2))
          if (bb.overflowed) {
            if (out.length > 254) bad()
            out += ft.symbol(s1); done = true
          }
        }
      }
      (hufFromWeights(out.toArray), 1 + h)
    }
  }

  /** Decode `count` literals from one backward Huffman stream. */
  private def hufDecodeStream(t: HufTable, b: Array[Byte], lo: Int, hi: Int,
      count: Int, out: java.io.ByteArrayOutputStream): Unit = {
    val bb = new BackBits(b, lo, hi)
    var i = 0
    while (i < count) {
      val idx = bb.readPadded(t.maxBits)
      val len = t.length(idx)
      if (len == 0) bad()
      out.write(t.symbol(idx))
      bb.unread(t.maxBits - len)
      i += 1
    }
    if (bb.bitsLeft != 0) bad() // a valid stream is consumed exactly
  }

  // -------------------------------------------------------------------
  // Sequence code tables (RFC 8878 §3.1.1.3.2.1)
  // -------------------------------------------------------------------

  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val LlDefault = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1)
  private val MlDefault = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1)
  private val OfDefault = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlPredef = fseBuild(6, LlDefault)
  private lazy val MlPredef = fseBuild(6, MlDefault)
  private lazy val OfPredef = fseBuild(5, OfDefault)

  private def rleTable(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  // -------------------------------------------------------------------
  // xxhash64 (XXH64, seed 0) — content-checksum verification
  // -------------------------------------------------------------------

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  def xxh64(b: Array[Byte], seed: Long = 0L): Long = {
    def rotl(x: Long, r: Int) = java.lang.Long.rotateLeft(x, r)
    def le64(o: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
      v
    }
    def le32(o: Int): Long = {
      var v = 0L
      var i = 3
      while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
      v
    }
    val n = b.length
    var p = 0
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (p + 32 <= n) {
          v1 = rotl(v1 + le64(p) * P2, 31) * P1
          v2 = rotl(v2 + le64(p + 8) * P2, 31) * P1
          v3 = rotl(v3 + le64(p + 16) * P2, 31) * P1
          v4 = rotl(v4 + le64(p + 24) * P2, 31) * P1
          p += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        def merge(acc0: Long, v: Long): Long =
          (acc0 ^ (rotl(v * P2, 31) * P1)) * P1 + P4
        acc = merge(acc, v1); acc = merge(acc, v2)
        acc = merge(acc, v3); acc = merge(acc, v4)
        acc
      } else seed + P5
    h += n
    while (p + 8 <= n) {
      h = rotl(h ^ (rotl(le64(p) * P2, 31) * P1), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= n) {
      h = rotl(h ^ (le32(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < n) {
      h = rotl(h ^ ((b(p) & 0xffL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  // -------------------------------------------------------------------
  // Frame decoding
  // -------------------------------------------------------------------

  /** Per-frame mutable decoder context: repeat tables + huffman. */
  private final class Ctx {
    var huf: HufTable = null
    var llTable: FseTable = null
    var mlTable: FseTable = null
    var ofTable: FseTable = null
  }

  private def le32(b: Array[Byte], o: Int): Long = {
    if (o + 4 > b.length) bad()
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** Decompress every frame in `b`. Returns (nFrames, nSkippable,
    * content) or None on anything outside the documented scope or any
    * corruption (including a failed content checksum).
    */
  // -------------------------------------------------------------------
  // Fixture-side frame builders (the trivial block types only — the
  // compressed paths are pinned against real-compressor vectors in
  // ZstdVectors)
  // -------------------------------------------------------------------

  /** Single-segment frame of raw blocks, 4-byte FCS, with checksum. */
  def rawFrame(content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    le(MagicFrame & 0xFFFFFFFFL, 4)
    out.write(0xA4) // fcsFlag=2 (4B), single_segment=1, checksum=1
    le(content.length.toLong, 4)
    var off = 0
    val maxBlock = 1 << 16
    do {
      val n = math.min(maxBlock, content.length - off)
      val last = if (off + n >= content.length) 1 else 0
      le((last | (0 << 1) | (n << 3)).toLong, 3)
      out.write(content, off, n)
      off += n
    } while (off < content.length)
    le(xxh64(content) & 0xFFFFFFFFL, 4)
    out.toByteArray
  }

  /** Single-segment frame with one RLE block, with checksum. */
  def rleFrame(v: Byte, count: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(x: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((x >> (8 * i)) & 0xff).toInt))
    le(MagicFrame & 0xFFFFFFFFL, 4)
    out.write(0xA4)
    le(count.toLong, 4)
    le((1L | (1 << 1) | (count.toLong << 3)), 3)
    out.write(v)
    val content = Array.fill(count)(v)
    le(xxh64(content) & 0xFFFFFFFFL, 4)
    out.toByteArray
  }

  /** Skippable frame wrapping an opaque payload. */
  def skippableFrame(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(x: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((x >> (8 * i)) & 0xff).toInt))
    le(0x184D2A50L, 4)
    le(payload.length.toLong, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Dev-only twin that lets the failure throw (line-numbered). */
  private[graft] def decompressOrThrow(
      b: Array[Byte], maxOut: Int = 64 << 20): (Long, Long, Array[Byte]) = {
    val out = new OutBuf(maxOut)
    var p = 0
    var frames = 0L
    var skippables = 0L
    while (p < b.length) {
      val magic = le32(b, p)
      if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
        val sz = le32(b, p + 4)
        if (p + 8 + sz > b.length) bad()
        p = p + 8 + sz.toInt
        skippables += 1
      } else if (magic == (MagicFrame & 0xFFFFFFFFL)) {
        p = decodeFrame(b, p + 4, out, maxOut)
        frames += 1
      } else bad()
    }
    (frames, skippables, out.toArray)
  }

  def decompress(b: Array[Byte],
      maxOut: Int = 64 << 20): Option[(Long, Long, Array[Byte])] =
    try {
      val out = new OutBuf(maxOut)
      var p = 0
      var frames = 0L
      var skippables = 0L
      while (p < b.length) {
        val magic = le32(b, p)
        if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) {
          // skippable frame: 4-byte size + payload
          val sz = le32(b, p + 4)
          if (p + 8 + sz > b.length) bad()
          p = p + 8 + sz.toInt
          skippables += 1
        } else if (magic == (MagicFrame & 0xFFFFFFFFL)) {
          p = decodeFrame(b, p + 4, out, maxOut)
          frames += 1
        } else bad()
      }
      if (frames == 0 && skippables == 0) bad()
      Some((frames, skippables, out.toArray))
    } catch {
      case _: Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Decode one frame starting AFTER the magic; returns the position
    * after the frame.
    */
  private def decodeFrame(b: Array[Byte], start: Int,
      out: OutBuf, maxOut: Int): Int = {
    var p = start
    if (p >= b.length) bad()
    val fhd = b(p) & 0xff
    p += 1
    val fcsFlag = fhd >> 6
    val singleSegment = (fhd >> 5) & 1
    if ((fhd & 0x08) != 0) bad() // reserved bit
    val checksum = (fhd >> 2) & 1
    val didFlag = fhd & 3
    var windowSize = 0L
    if (singleSegment == 0) {
      if (p >= b.length) bad()
      val wd = b(p) & 0xff
      p += 1
      val base = 1L << (10 + (wd >> 3))
      windowSize = base + (base / 8) * (wd & 7)
    }
    val didBytes = didFlag match {
      case 0 => 0
      case 1 => 1
      case 2 => 2
      case _ => 4
    }
    var did = 0L
    var i = 0
    while (i < didBytes) { did |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
    p += didBytes
    if (did != 0L) bad() // dictionaries out of scope
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSegment == 1) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    var fcs = -1L
    if (fcsBytes > 0) {
      fcs = 0L
      i = 0
      while (i < fcsBytes) {
        if (p + i >= b.length) bad()
        fcs |= (b(p + i) & 0xffL) << (8 * i)
        i += 1
      }
      if (fcsBytes == 2) fcs += 256
      p += fcsBytes
    }
    if (singleSegment == 1) windowSize = fcs
    if (windowSize > MaxWindow) bad()
    val frameStart = out.len
    if (fcs >= 0 && frameStart + fcs > maxOut) bad()
    val ctx = new Ctx
    val rep = Array(1L, 4L, 8L) // the rolling repeat offsets
    var last = false
    while (!last) {
      if (p + 3 > b.length) bad()
      val h = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
      p += 3
      last = (h & 1) == 1
      val btype = (h >> 1) & 3
      val bsize = h >> 3
      btype match {
        case 0 => // raw
          if (p + bsize > b.length) bad()
          out.write(b, p, bsize)
          p += bsize
        case 1 => // RLE
          if (p >= b.length) bad()
          val v = b(p)
          p += 1
          out.writeByte(v, bsize)
        case 2 =>
          if (p + bsize > b.length) bad()
          decodeCompressedBlock(b, p, p + bsize, out, maxOut, ctx, rep,
            frameStart)
          p += bsize
        case _ => bad() // reserved
      }
    }
    val produced = out.len - frameStart
    if (fcs >= 0 && produced != fcs) bad()
    if (checksum == 1) {
      if (p + 4 > b.length) bad()
      val want = le32(b, p)
      p += 4
      val got = xxh64(out.slice(frameStart)) & 0xFFFFFFFFL
      if (got != want) bad()
    }
    p
  }

  private def decodeCompressedBlock(b: Array[Byte], lo: Int, hi: Int,
      out: OutBuf, maxOut: Int, ctx: Ctx,
      rep: Array[Long], frameStart: Int): Unit = {
    var p = lo
    // ---- literals section
    if (p >= hi) bad()
    val b0 = b(p) & 0xff
    val litType = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    var regenSize = 0
    var compSize = 0
    var fourStreams = false
    litType match {
      case 0 | 1 => // Raw | RLE
        sizeFormat match {
          case 0 | 2 =>
            regenSize = b0 >> 3
            p += 1
          case 1 =>
            if (p + 2 > hi) bad()
            regenSize = (b0 >> 4) | ((b(p + 1) & 0xff) << 4)
            p += 2
          case _ =>
            if (p + 3 > hi) bad()
            regenSize = (b0 >> 4) | ((b(p + 1) & 0xff) << 4) |
              ((b(p + 2) & 0xff) << 12)
            p += 3
        }
      case _ => // Compressed | Treeless
        sizeFormat match {
          case 0 | 1 =>
            if (p + 3 > hi) bad()
            regenSize = (b0 >> 4) | ((b(p + 1) & 0x3f) << 4)
            compSize = ((b(p + 1) & 0xff) >> 6) | ((b(p + 2) & 0xff) << 2)
            fourStreams = sizeFormat == 1
            p += 3
          case 2 =>
            if (p + 4 > hi) bad()
            regenSize = (b0 >> 4) | ((b(p + 1) & 0xff) << 4) |
              ((b(p + 2) & 0x03) << 12)
            compSize = ((b(p + 2) & 0xff) >> 2) | ((b(p + 3) & 0xff) << 6)
            fourStreams = true
            p += 4
          case _ =>
            if (p + 5 > hi) bad()
            regenSize = (b0 >> 4) | ((b(p + 1) & 0xff) << 4) |
              ((b(p + 2) & 0x3f) << 12)
            compSize = ((b(p + 2) & 0xff) >> 6) | ((b(p + 3) & 0xff) << 2) |
              ((b(p + 4) & 0xff) << 10)
            fourStreams = true
            p += 5
        }
    }
    if (regenSize > (1 << 20)) bad() // block literals bound (128 KB spec; lax)
    val literals = new java.io.ByteArrayOutputStream(regenSize)
    litType match {
      case 0 =>
        if (p + regenSize > hi) bad()
        literals.write(b, p, regenSize)
        p += regenSize
      case 1 =>
        if (p >= hi) bad()
        val v = b(p)
        p += 1
        var j = 0
        while (j < regenSize) { literals.write(v); j += 1 }
      case t =>
        val litEnd = p + compSize
        if (litEnd > hi) bad()
        val table =
          if (t == 2) {
            val (ht, consumed) = hufParse(b, p, litEnd)
            ctx.huf = ht
            p += consumed
            ht
          } else {
            if (ctx.huf == null) bad() // treeless without a prior tree
            ctx.huf
          }
        if (fourStreams) {
          if (p + 6 > litEnd) bad()
          val s1 = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
          val s2 = (b(p + 2) & 0xff) | ((b(p + 3) & 0xff) << 8)
          val s3 = (b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8)
          p += 6
          val per = (regenSize + 3) / 4
          val lastN = regenSize - 3 * per
          if (lastN < 0) bad()
          val o1 = p
          val o2 = o1 + s1
          val o3 = o2 + s2
          val o4 = o3 + s3
          if (o4 > litEnd) bad()
          hufDecodeStream(table, b, o1, o2, per, literals)
          hufDecodeStream(table, b, o2, o3, per, literals)
          hufDecodeStream(table, b, o3, o4, per, literals)
          hufDecodeStream(table, b, o4, litEnd, lastN, literals)
        } else {
          hufDecodeStream(table, b, p, litEnd, regenSize, literals)
        }
        p = litEnd
    }
    val lit = literals.toByteArray
    // ---- sequences section
    if (p >= hi) bad()
    val s0 = b(p) & 0xff
    var nSeq = 0
    if (s0 < 128) { nSeq = s0; p += 1 }
    else if (s0 < 255) {
      if (p + 2 > hi) bad()
      nSeq = ((s0 - 128) << 8) | (b(p + 1) & 0xff)
      p += 2
    } else {
      if (p + 3 > hi) bad()
      nSeq = (b(p + 1) & 0xff) + (((b(p + 2) & 0xff)) << 8) + 0x7F00
      p += 3
    }
    if (nSeq == 0) {
      out.write(lit, 0, lit.length)
      if (p != hi) bad()
      return
    }
    if (p >= hi) bad()
    val modes = b(p) & 0xff
    if ((modes & 3) != 0) bad() // reserved bits
    p += 1
    if (ZDebug)
      println(s"[zdbg] litType=$litType sf=$sizeFormat regen=$regenSize " +
        s"comp=$compSize four=$fourStreams nSeq=$nSeq modes=ll${(modes >> 6) & 3}" +
        s"/of${(modes >> 4) & 3}/ml${(modes >> 2) & 3} litLen=${lit.length}")
    def getTable(mode: Int, predef: FseTable, maxAcc: Int, maxSym: Int,
        prev: FseTable, set: FseTable => Unit): FseTable = mode match {
      case 0 => predef
      case 1 =>
        if (p >= hi) bad()
        val sym = b(p) & 0xff
        p += 1
        if (sym > maxSym) bad()
        val t = rleTable(sym)
        set(t); t
      case 2 =>
        val (t, consumed) = fseParse(b, p, hi, maxAcc, maxSym)
        p += consumed
        set(t); t
      case _ =>
        if (prev == null) bad()
        prev
    }
    val llT = getTable((modes >> 6) & 3, LlPredef, 9, 35, ctx.llTable,
      ctx.llTable = _)
    val ofT = getTable((modes >> 4) & 3, OfPredef, 8, 31, ctx.ofTable,
      ctx.ofTable = _)
    val mlT = getTable((modes >> 2) & 3, MlPredef, 9, 52, ctx.mlTable,
      ctx.mlTable = _)
    // ---- sequence bitstream (backward)
    val bb = new BackBits(b, p, hi)
    var llState = bb.read(llT.accLog)
    var ofState = bb.read(ofT.accLog)
    var mlState = bb.read(mlT.accLog)
    if (bb.overflowed) bad()
    var litPos = 0
    var seq = 0
    while (seq < nSeq) {
      if (ZDebug && seq < 8)
        println(s"[zst8] seq=$seq states ll=$llState of=$ofState ml=$mlState bitsLeft=${bb.bitsLeft}")
      val ofCode = ofT.symbol(ofState)
      if (ofCode > 31) bad()
      val llCode = llT.symbol(llState)
      val mlCode = mlT.symbol(mlState)
      if (llCode > 35 || mlCode > 52) bad()
      val ofValue = (1L << ofCode) + (bb.read(ofCode).toLong &
        ((1L << ofCode) - 1)) // ofCode==0 -> Offset_Value 1, zero bits
      val ml = MlBase(mlCode) + bb.read(MlBits(mlCode))
      val ll = LlBase(llCode) + bb.read(LlBits(llCode))
      if (bb.overflowed) bad()
      // resolve the offset against the repeat set
      val offset: Long =
        if (ofValue > 3) {
          val o = ofValue - 3
          rep(2) = rep(1); rep(1) = rep(0); rep(0) = o
          o
        } else {
          val idx0 = if (ll == 0) ofValue.toInt else ofValue.toInt - 1
          if (idx0 == 0 && ll != 0) rep(0) // no rotation
          else {
            val o =
              if (idx0 == 3) rep(0) - 1 // ll==0, value 3
              else rep(idx0)
            if (o <= 0) bad()
            if (idx0 >= 2) rep(2) = rep(1)
            rep(1) = rep(0)
            rep(0) = o
            o
          }
        }
      if (ZDebug && seq < 8)
        println(s"[zdbg] seq=$seq llCode=$llCode mlCode=$mlCode ofCode=$ofCode " +
          s"ll=$ll ml=$ml ofValue=$ofValue offset=$offset outLen=${out.len}")
      // execute: ll literals + ml match bytes (overlap-safe)
      if (litPos + ll > lit.length) bad()
      out.write(lit, litPos, ll)
      litPos += ll
      if (offset > out.len - frameStart) bad() // reaches before the frame
      out.copyMatch(offset.toInt, ml)
      seq += 1
      if (seq < nSeq) {
        llState = llT.baseline(llState) + bb.read(llT.nbBits(llState))
        mlState = mlT.baseline(mlState) + bb.read(mlT.nbBits(mlState))
        ofState = ofT.baseline(ofState) + bb.read(ofT.nbBits(ofState))
        if (bb.overflowed) bad()
      }
    }
    if (bb.bitsLeft != 0) bad()
    // trailing literals
    out.write(lit, litPos, lit.length - litPos)
  }
}

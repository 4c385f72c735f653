package graft.sources.v2

import java.util.zip.Inflater

import org.apache.hadoop.fs.FSDataInputStream

/** Metadata-only ZIP central-directory reader (APPNOTE.TXT layout,
  * including ZIP64), plus the matching seek-and-inflate entry reader.
  *
  * This is what makes entry-granular split planning possible without
  * touching compressed data: the central directory at the archive tail
  * records every entry's name, sizes, and local-header offset. The
  * reference instead decompressed the whole archive on the driver to
  * discover entries (`NYUZInputFormat.java:24-52`).
  */
object ZipCentral {

  /** One file entry as recorded in the central directory.
    * `offset` is the LOCAL header offset; data starts after the local
    * header's own (possibly different) name/extra fields. */
  case class Entry(name: String, offset: Long, csize: Long, usize: Long,
                   method: Int) extends Serializable

  /** A parsed central directory: the entries plus the directory's own
    * start offset. Every local header + payload (+ data descriptor)
    * precedes `cdOffset`, so it is the exact upper bound for the LAST
    * pack's coalesced content read — bounding at the archive tail
    * instead would systematically over-read the whole directory
    * (~46+ B/entry; multi-MB on large ZIP64 archives) and can push the
    * range past the coalesce cap, silently losing coalescing
    * (ADVICE r12). */
  case class Directory(entries: Array[Entry], cdOffset: Long)
      extends Serializable

  private val EocdSig = 0x06054b50
  private val Eocd64LocatorSig = 0x07064b50
  private val Eocd64Sig = 0x06064b50
  private val CentralSig = 0x02014b50
  private val LocalSig = 0x04034b50
  // EOCD fixed part (22) + max comment (65535) + ZIP64 locator (20)
  private val MaxEocdScan = 22 + 65535 + 20
  // refuse to buffer an absurd central directory (≈ >1M entries);
  // callers fall back to single-partition streaming
  private val MaxCdBytes = 256L * 1024 * 1024

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) | ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
  private def u64(b: Array[Byte], p: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xFFL); i -= 1 }
    v
  }

  /** Parse the central directory of a seekable archive. Returns None
    * when no EOCD record is found or the directory is implausibly large
    * — the caller should fall back to streaming the archive whole.
    * Directory entries (trailing '/') are skipped. Encrypted or
    * non-deflate/store entries fail fast here, at planning time. */
  def list(in: FSDataInputStream, fileLen: Long): Option[Directory] = {
    if (fileLen < 22) return None
    val tailLen = math.min(fileLen, MaxEocdScan.toLong).toInt
    val tailStart = fileLen - tailLen
    val tail = new Array[Byte](tailLen)
    in.readFully(tailStart, tail)

    // scan backward for the EOCD signature
    var p = tailLen - 22
    while (p >= 0 && u32(tail, p) != (EocdSig & 0xFFFFFFFFL)) p -= 1
    if (p < 0) return None

    var entriesTotal: Long = u16(tail, p + 10).toLong
    var cdSize: Long = u32(tail, p + 12)
    var cdOffset: Long = u32(tail, p + 16)

    if (entriesTotal == 0xFFFF || cdSize == 0xFFFFFFFFL || cdOffset == 0xFFFFFFFFL) {
      // ZIP64: locator sits immediately before the EOCD
      val locPos = p - 20
      if (locPos < 0 || u32(tail, locPos) != (Eocd64LocatorSig & 0xFFFFFFFFL)) return None
      val eocd64Off = u64(tail, locPos + 8)
      val rec = new Array[Byte](56)
      in.readFully(eocd64Off, rec)
      if (u32(rec, 0) != (Eocd64Sig & 0xFFFFFFFFL)) return None
      entriesTotal = u64(rec, 32)
      cdSize = u64(rec, 40)
      cdOffset = u64(rec, 48)
    }
    if (cdSize <= 0 || cdSize > MaxCdBytes || cdOffset + cdSize > fileLen) return None

    val cd = new Array[Byte](cdSize.toInt)
    in.readFully(cdOffset, cd)

    val out = Array.newBuilder[Entry]
    var q = 0
    var n = 0L
    while (n < entriesTotal && q + 46 <= cd.length) {
      if (u32(cd, q) != (CentralSig & 0xFFFFFFFFL)) return None
      val flags = u16(cd, q + 8)
      val method = u16(cd, q + 10)
      var csize = u32(cd, q + 20)
      var usize = u32(cd, q + 24)
      val nameLen = u16(cd, q + 28)
      val extraLen = u16(cd, q + 30)
      val commentLen = u16(cd, q + 32)
      var lhOff = u32(cd, q + 42)
      val name = new String(cd, q + 46, nameLen, java.nio.charset.StandardCharsets.UTF_8)

      // ZIP64 extended-information extra field (id 0x0001): 64-bit
      // values present only for fields saturated in the fixed record
      var ep = q + 46 + nameLen
      val eEnd = ep + extraLen
      while (ep + 4 <= eEnd) {
        val id = u16(cd, ep); val sz = u16(cd, ep + 2)
        if (id == 0x0001) {
          var vp = ep + 4
          if (usize == 0xFFFFFFFFL) { usize = u64(cd, vp); vp += 8 }
          if (csize == 0xFFFFFFFFL) { csize = u64(cd, vp); vp += 8 }
          if (lhOff == 0xFFFFFFFFL) { lhOff = u64(cd, vp); vp += 8 }
        }
        ep += 4 + sz
      }

      if (!name.endsWith("/")) {
        require((flags & 0x1) == 0, s"zip-entries: encrypted entry '$name' is unsupported")
        require(method == 0 || method == 8,
          s"zip-entries: entry '$name' uses unsupported compression method $method")
        require(usize <= Int.MaxValue && csize <= Int.MaxValue,
          s"zip-entries: entry '$name' exceeds the 2 GB per-entry cap")
        out += Entry(name, lhOff, csize, usize, method)
      }
      q += 46 + nameLen + extraLen + commentLen
      n += 1
    }
    if (n < entriesTotal) None else Some(Directory(out.result(), cdOffset))
  }

  /** Read one entry's bytes: seek to the local header, skip its
    * name/extra fields, read `csize` compressed bytes (positioned read —
    * safe under concurrent use of the same stream), inflate if deflated.
    * TWO ranged reads per entry — on an object store that is two RTTs;
    * [[readEntryFrom]] over a coalesced split buffer is the scale
    * path. */
  def readEntry(in: FSDataInputStream, e: Entry): Array[Byte] = {
    val hdr = new Array[Byte](30)
    in.readFully(e.offset, hdr)
    require(u32(hdr, 0) == (LocalSig & 0xFFFFFFFFL),
      s"zip-entries: bad local header for '${e.name}' at ${e.offset}")
    val nameLen = u16(hdr, 26)
    val extraLen = u16(hdr, 28)
    val comp = new Array[Byte](e.csize.toInt)
    in.readFully(e.offset + 30 + nameLen + extraLen, comp)
    if (e.method == 0) comp else decode(comp, 0, e.csize.toInt, e)
  }

  /** Read one entry out of an already-fetched buffer covering archive
    * bytes `[base, base + buf.length)` — the zero-extra-RTT path a
    * coalesced split read enables. Returns None when the entry's local
    * header or payload falls outside the buffer (non-monotonic offset
    * layout, or a range the planner couldn't bound); the caller then
    * falls back to positioned reads. */
  def readEntryFrom(buf: Array[Byte], base: Long, e: Entry): Option[Array[Byte]] = {
    val off = e.offset - base
    if (off < 0 || off + 30 > buf.length) return None
    val p = off.toInt
    require(u32(buf, p) == (LocalSig & 0xFFFFFFFFL),
      s"zip-entries: bad local header for '${e.name}' at ${e.offset}")
    val dataOff = p + 30 + u16(buf, p + 26) + u16(buf, p + 28)
    if (dataOff.toLong + e.csize > buf.length) return None
    Some(decode(buf, dataOff, e.csize.toInt, e))
  }

  /** Decode `len` payload bytes at `buf(pos)`: stored entries copy,
    * deflated entries inflate (raw deflate — ZIP entries carry no
    * zlib header). */
  private def decode(buf: Array[Byte], pos: Int, len: Int, e: Entry): Array[Byte] = {
    if (e.method == 0)
      return java.util.Arrays.copyOfRange(buf, pos, pos + len)
    val inf = new Inflater(true)
    try {
      inf.setInput(buf, pos, len)
      val out = new Array[Byte](e.usize.toInt)
      var written = 0
      while (written < out.length && !inf.finished()) {
        val k = inf.inflate(out, written, out.length - written)
        if (k == 0 && inf.needsInput())
          throw new java.io.IOException(s"zip-entries: truncated deflate stream in '${e.name}'")
        written += k
      }
      require(written == out.length,
        s"zip-entries: '${e.name}' inflated to $written of ${out.length} bytes")
      out
    } finally inf.end()
  }
}

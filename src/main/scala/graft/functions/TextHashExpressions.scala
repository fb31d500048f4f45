package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the portable polynomial hash family
  * (h = (h*31 + codepoint) mod 1e15 — see TextOps scaladoc for the
  * DuckDB-parity contract).
  *
  * Why expressions and not higher-order functions: the HOF forms
  * (`transform(split(w, ""), ascii)` + `aggregate`) are interpreted
  * per-element with boxed lambda binding — profiling at sf0.1 showed
  * ~10 ms/document for word hashing alone (53 s for a 5000-doc scan),
  * and CollapseProject re-inlines the expression into every consumer,
  * multiplying that cost. These operators evaluate one tight JVM loop
  * per row (eval and codegen paths), restoring scan-speed hashing; at
  * 100 TB that is the difference between a narrow map stage and a
  * cluster-wide stall. Values are IDENTICAL to the HOF forms (verified
  * in PropertySpec against an independent fold model).
  *
  * Iteration is by Unicode code point, matching DuckDB's
  * string_split('')+ascii() exactly (and the HOF form on all BMP text).
  */
object TextHashExpressions {
  val Mod = 1000000000000000L

  /** Full-string rolling hash (static: called from generated code). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Per-word rolling hashes, splitting on single spaces, empties
    * skipped — one pass, no intermediate word strings. */
  def wordPolyHashes(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var h = 0L
    var inWord = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        if (inWord) { out += h; h = 0L; inWord = false }
      } else {
        h = (h * 31 + cp) % Mod
        inWord = true
      }
      i += Character.charCount(cp)
    }
    if (inWord) out += h
    new GenericArrayData(out.result())
  }

  /** Hashed trigram shingles from a word-hash array:
    * ((w1*31 + w2) mod M * 31 + w3) mod M per consecutive triple. */
  def shingle3Hashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = ((arr.getLong(i) * 31 + arr.getLong(i + 1)) % Mod * 31 +
        arr.getLong(i + 2)) % Mod
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed k-gram shingles from a word-hash array — the generalized
    * [[shingle3Hashes]]: seed with the window's first hash, fold the
    * rest as h = (h*31 + w) mod M (identical to DuckDB's seedless
    * list_reduce over the same slice). */
  def shingleKHashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (k <= 0 || n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = arr.getLong(i)
      var j = 1
      while (j < k) { h = (h * 31 + arr.getLong(i + j)) % Mod; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined-chunking boundary positions: 1-based code-point
    * positions p ≥ 8 where the polynomial hash of the trailing 8-char
    * window (== poly_hash(substr(text, p-7, 8))) is ≡ 0 mod 64. One
    * O(n) ROLLING pass — h advances by subtracting the outgoing char's
    * 31⁷ term and appending the incoming one — instead of recomputing
    * an 8-char fold per position through per-window substring
    * allocations (the HOF spelling was the slowest query of the r8
    * bench at 5.5 s/sf0.1; this is the same boundary set at scan
    * speed). Window values are IDENTICAL to the per-window form:
    * the rolling update is algebraically the same mod-M polynomial. */
  def cdcBoundaries(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < 8) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var i = 0; var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    // 31^7 mod M (M = 1e15 > 31^7, so the literal IS the mod)
    val P7 = 27512614111L
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var h = 0L
    var j = 0
    while (j < 8) { h = (h * 31 + cps(j)) % Mod; j += 1 }
    var p = 8 // 1-based window-end position
    while (true) {
      if (h % 64 == 0) out += p.toLong
      if (p == n) return new GenericArrayData(out.result())
      // roll: drop cps(p-8) (0-based index of the outgoing char), add cps(p)
      h = (((h - cps(p - 8) * P7 % Mod + Mod) % Mod) * 31 + cps(p)) % Mod
      p += 1
    }
    new GenericArrayData(out.result()) // unreachable
  }

  /** Count of common elements of two SORTED distinct long arrays — one
    * merge scan, no per-call hash set (array_intersect allocates an
    * OpenHashSet per invocation, which dominates pair-verify joins). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Sequential dot product of two double arrays — identical fold order
    * and operations to the HOF `aggregate(zip_with(...))` form and to
    * DuckDB's seeded list_reduce, so results stay bitwise-equal; just
    * one tight loop instead of interpreted per-element lambdas. */
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Random-hyperplane LSH bucket for one hash table: bit b of the
    * result is the sign of <arr, w_p> for global plane p = table*bits+b,
    * with the integer-lattice weight family
    * w_p[j] = ((1 + p*73 + j*179) * 2654435761 mod 1024) - 512.
    * Exact-double fold in index order — identical operations to the HOF
    * form and the DuckDB list_reduce oracle, so buckets are bitwise
    * equal (PropertySpec pins it); one tight loop instead of bits×dim
    * interpreted lambdas. */
  def hyperplaneBucket(arr: ArrayData, table: Int, bits: Int): Long = {
    val n = arr.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      val p = (table * bits + b).toLong
      var dot = 0.0
      var j = 0
      while (j < n) {
        val w = ((1L + p * 73L + j.toLong * 179L) * 2654435761L % 1024L - 512L).toDouble
        dot += arr.getDouble(j) * w
        j += 1
      }
      if (dot >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** 56-bit perceptual difference-hash (static: called from generated
    * code). See DHash56Expr for the contract. */
  def dhash56(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length.toLong
    if (n == 0L) return 0L
    val px = new Array[Int](64)
    var k = 0
    while (k < 64) {
      px(k) = str.charAt((((2L * k + 1L) * n) / 128L).toInt).toInt
      k += 1
    }
    dhashBits(px)
  }

  /** [[dhash56]]'s comparison stage over a precomputed 64-sample
    * grid: 56 horizontal neighbor bits (7 per row × 8 rows). */
  private def dhashBits(px: Array[Int]): Long = {
    var h = 0L
    var b = 0
    while (b < 56) {
      val base = (b / 7) * 8 + (b % 7)
      if (px(base + 1) > px(base)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** BYTE-domain twin of [[dhash56]] (same 64 proportional probes, same
    * 56 comparison bits, over raw payload bytes instead of chars) —
    * the [[pngDhash56]] fallback for payloads that do not decode as
    * PNG. Identical to dhash56 on ASCII payloads (byte == char). */
  def dhash56Bytes(b: Array[Byte]): Long = {
    val n = b.length.toLong
    if (n == 0L) return 0L
    val px = new Array[Int](64)
    var k = 0
    while (k < 64) {
      px(k) = b((((2L * k + 1L) * n) / 128L).toInt) & 0xFF
      k += 1
    }
    dhashBits(px)
  }

  /** wav_fp56(binary) — the AUDIO twin of [[pngDhash56]] (static:
    * called from generated code): a 56-bit energy-contour fingerprint
    * from a REAL container decode. Parse the canonical RIFF/WAVE
    * layout (signature + "data" at byte 36, the fixed 44-byte header
    * MultimodalOps.wavTable writes) and the little-endian PCM geometry
    * (channels at 22, bit depth at 34); slice the first channel's
    * sample stream into 57 proportional windows (window w anchors at
    * frame (2w+1)·nS DIV 114 — the same center-sampling rule as the
    * dhash grid); each window's energy is the Σ of 4 consecutive
    * sample magnitudes (8-bit PCM: |s−128|; 16-bit: |int16 LE|); the
    * 56 bits are the neighbor comparisons e(w+1) > e(w) — the
    * coarse shape of the loudness contour, the property an audio
    * near-dup shares across container-level byte differences. PCM
    * widths beyond {8,16} bits or channel counts beyond {1,2} take
    * the byte-sampler fallback (16-bit mono/stereo is the canonical
    * interchange; the spec pins the 8-bit arm on a hand-built
    * payload), as do non-WAV payloads. Integer div/mod only, so the
    * oracle replays the decode from the blob hex. */
  def wavFp56(b: Array[Byte]): Long = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xFF
    val decodable = n > 44 &&
      u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
      u(8) == 'W' && u(9) == 'A' && u(10) == 'V' && u(11) == 'E' &&
      u(36) == 'd' && u(37) == 'a' && u(38) == 't' && u(39) == 'a'
    if (!decodable) return dhash56Bytes(b)
    val channels = u(22) | (u(23) << 8)
    val bits = u(34) | (u(35) << 8)
    if ((channels != 1 && channels != 2) || (bits != 8 && bits != 16))
      return dhash56Bytes(b)
    val ba = channels * (bits / 8) // block align: bytes per sample frame
    val nS = ((n - 44) / ba).toLong
    if (nS <= 0L) return dhash56Bytes(b)
    def amp(k: Long): Long = {
      val off = 44 + (k * ba).toInt // first channel of frame k
      if (bits == 8) math.abs(u(off) - 128).toLong
      else {
        val v = u(off) | (u(off + 1) << 8)
        math.abs(if (v >= 32768) v - 65536 else v).toLong
      }
    }
    var h = 0L
    var prev = 0L
    var w = 0
    while (w <= 56) {
      val base = (2L * w + 1L) * nS / 114L
      var e = 0L
      var i = 0
      while (i < 4) { e += amp((base + i) % nS); i += 1 }
      if (w > 0 && e > prev) h |= 1L << (w - 1)
      prev = e
      w += 1
    }
    h
  }

  /** STORED-DEFLATE integer walker behind [[pngDhash56]] and the fast
    * path of [[pngDhashFull]] — returns the perceptual difference-hash
    * from a REAL codec-level container decode, or -1 when the payload
    * is outside the integer-replayable subset (the caller picks the
    * degradation: byte sampler for png_dhash56, real inflation for
    * png_dhash56_full). Parse the PNG signature + IHDR geometry, WALK THE CHUNK
    * STREAM to the first IDAT (skipping ancillary chunks by their
    * length fields), validate the zlib header (deflate method, no
    * preset dictionary), walk the DEFLATE BLOCK FRAMING — stored
    * (BTYPE 00) blocks only, the uncompressed subset of deflate:
    * 1-byte header + LEN/NLEN (ones'-complement checked) + raw bytes —
    * and address an 8×8 grid of pixel CENTERS in 2-D raster
    * coordinates through the reassembled uncompressed scanline stream
    * (py·(1+w·bpp) + 1 + px·bpp — the +1 skips each scanline's filter
    * byte). Integer BT.601 luma ((299R + 587G + 114B) DIV 1000) on
    * multi-channel color types, the raw sample byte otherwise, then
    * the standard 56 horizontal neighbor comparisons.
    *
    * Sentinel (-1) contract: bad signature / missing IHDR; hostile geometry (w or h
    * beyond 2²⁴, or a raster that doesn't fit an int — the r12-advice
    * overflow guard: unsigned-be32 dimensions must degrade, not crash
    * the task); malformed chunk framing; no IDAT; a non-deflate or
    * preset-dict zlib header; any NON-STORED deflate block (Huffman
    * payloads are outside this expression's decodable subset — real
    * compressed PNGs degrade to the byte tier rather than decode
    * wrong); LEN/NLEN mismatch; a stored stream shorter than the
    * declared raster; a non-zero IHDR compression/filter METHOD or
    * interlace flag (an Adam7 image's scanlines are pass-reordered —
    * sequential addressing would be wrong, not slow); or a probed
    * scanline whose per-row filter TYPE isn't 0/None (filtered rows
    * are delta-coded; unfiltering needs the full prior row). All
    * arithmetic is integer division/modulo, so the DuckDB oracle
    * replays the same decode bit-for-bit from the blob's hex. */
  def pngDhashStored(b: Array[Byte]): Long = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xFF
    val decodable = n > 33 &&
      u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4E && u(3) == 0x47 &&
      u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A &&
      u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
    if (!decodable) return -1L
    def be32(i: Int): Long =
      (u(i).toLong << 24) | (u(i + 1).toLong << 16) |
        (u(i + 2).toLong << 8) | u(i + 3).toLong
    val w = be32(16); val h = be32(20)
    val depth = u(24); val color = u(25)
    if (w <= 0L || h <= 0L || w > (1L << 24) || h > (1L << 24))
      return -1L
    // IHDR method bytes: only compression 0 (zlib/deflate), filter
    // method 0, and NO interlacing are in the decodable subset — an
    // Adam7 image's scanlines are pass-reordered, so addressing them
    // sequentially would decode WRONG pixels rather than fail
    if (u(26) != 0 || u(27) != 0 || u(28) != 0) return -1L
    val channels = color match {
      case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1
    }
    val db = math.max(1, depth / 8)  // bytes per channel sample
    val bpp = channels.toLong * db   // bytes per pixel
    val stride = 1L + w * bpp        // filter byte + one scanline
    val total = h * stride           // uncompressed stream length
    if (total > Int.MaxValue.toLong) return -1L
    // chunk walk: first IDAT, skipping ancillary chunks by length
    var p = 8
    var idat = -1
    var idatLen = 0
    while (p + 8 <= n && idat < 0) {
      val len = be32(p)
      if (len > n.toLong || p + 12L + len > n.toLong) return -1L
      val t = p + 4
      if (u(t) == 'I' && u(t + 1) == 'D' && u(t + 2) == 'A' && u(t + 3) == 'T') {
        idat = p + 8; idatLen = len.toInt
      } else if (u(t) == 'I' && u(t + 1) == 'E' && u(t + 2) == 'N' && u(t + 3) == 'D') {
        return -1L // IEND before any IDAT
      } else p += 12 + len.toInt
    }
    if (idat < 0 || idatLen < 7) return -1L
    // zlib header: CM = 8 (deflate), FDICT clear
    if ((u(idat) & 0x0F) != 8 || (u(idat + 1) & 0x20) != 0)
      return -1L
    // deflate stored-block walk: (uncompressed start, physical data
    // offset, length) per block, until BFINAL or the raster is covered
    val end = idat + idatLen
    var q = idat + 2
    var uLen = 0L
    var nb = 0
    var starts = new Array[Long](8)
    var phys = new Array[Int](8)
    var fin = false
    while (!fin && uLen < total) {
      if (q + 5 > end) return -1L
      val hdr = u(q)
      if (((hdr >> 1) & 3) != 0) return -1L // Huffman block
      val len = u(q + 1) | (u(q + 2) << 8)
      val nlen = u(q + 3) | (u(q + 4) << 8)
      if ((len ^ 0xFFFF) != nlen || q + 5 + len > end) return -1L
      if (nb == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nb * 2)
        phys = java.util.Arrays.copyOf(phys, nb * 2)
      }
      starts(nb) = uLen
      phys(nb) = q + 5
      nb += 1
      uLen += len
      q += 5 + len
      fin = (hdr & 1) == 1
    }
    if (uLen < total) return -1L // raster truncated
    // one byte of the uncompressed stream, through the block map
    // (starts ascending; callers only probe off < total <= uLen)
    def ub(off: Long): Int = {
      var i = nb - 1
      while (starts(i) > off) i -= 1
      u(phys(i) + (off - starts(i)).toInt)
    }
    val px = new Array[Int](64)
    var g = 0
    while (g < 64) {
      val py = (2L * (g / 8) + 1L) * h / 16L
      val gx = (2L * (g % 8) + 1L) * w / 16L
      // a probed scanline whose filter TYPE isn't 0 (None) carries
      // delta-coded bytes — unfiltering needs the whole prior row, so
      // filtered rows are outside the integer-replayable subset:
      // fall back rather than hash filtered-domain values as pixels
      if (ub(py * stride) != 0) return -1L
      val base = py * stride + 1L + gx * bpp // +1 skips the filter byte
      px(g) =
        if (channels >= 3)
          (299 * ub(base) + 587 * ub(base + db) +
            114 * ub(base + 2L * db)) / 1000
        else ub(base)
      g += 1
    }
    dhashBits(px)
  }

  /** png_dhash56(binary) — [[pngDhashStored]] with the BYTE-SAMPLER
    * fallback applied: payloads outside the stored-deflate decodable
    * subset hash via [[dhash56Bytes]] (static: called from generated
    * code). The committed px-tier oracle replays exactly this pair. */
  def pngDhash56(b: Array[Byte]): Long = {
    val r = pngDhashStored(b)
    if (r >= 0L) r else dhash56Bytes(b)
  }

  /** png_stored(binary) — build a COMPLETE, VALID PNG container from a
    * content byte stream (static: called from generated code): the
    * multimodal dedup corpus generator, codec-real. Geometry derives
    * from the content LENGTH (w = 8 + n mod 9, h = 8 + 7n mod 9, RGB
    * 8-bit — color type 2, depth 8), so an exact copy (same bytes,
    * different doc id) produces a byte-identical container at every
    * scale. The raster is the content cycled to fill w·h·3 pixel
    * bytes; each scanline is filter-type-0 prefixed and carried in its
    * OWN deflate STORED block (RFC 1951 §3.2.4: 00-header + LEN +
    * ones'-complement NLEN + raw bytes) inside a real zlib stream
    * (RFC 1950: 0x78 0x01 header, adler32 trailer over the
    * uncompressed data). Chunk CRC32s are real (java.util.zip.CRC32
    * over type+data), so the output inflates with java.util.zip
    * .Inflater and decodes with javax.imageio — both spec-pinned.
    * Stored-block deflate is the layout a pipeline chooses when blobs
    * must stay random-access-decodable by integer arithmetic (the
    * DuckDB oracle replays pixel addressing from the blob hex);
    * png_dhash56 walks the same framing generally. Empty content
    * cycles a single zero byte (total function; unreachable on the
    * seeded corpus). */
  def pngStored(content: Array[Byte]): Array[Byte] = {
    val src = if (content.length == 0) Array[Byte](0) else content
    val n = src.length
    val w = 8 + n % 9
    val h = 8 + (n.toLong * 7L % 9L).toInt
    val rowPx = 3 * w            // pixel bytes per scanline
    val lenB = 1 + rowPx         // stored-block payload: filter + pixels
    val zLen = 2 + h * (5 + lenB) + 4 // zlib hdr + blocks + adler32
    val buf = new java.io.ByteArrayOutputStream(8 + 25 + 12 + zLen + 12)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      buf.write(be32(data.length.toLong), 0, 4)
      val tb = tag.getBytes("US-ASCII")
      buf.write(tb, 0, 4)
      buf.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      buf.write(be32(crc.getValue), 0, 4)
    }
    buf.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    System.arraycopy(be32(w.toLong), 0, ihdr, 0, 4)
    System.arraycopy(be32(h.toLong), 0, ihdr, 4, 4)
    ihdr(8) = 8; ihdr(9) = 2 // depth 8, color type 2 (truecolor RGB)
    chunk("IHDR", ihdr)
    val z = new Array[Byte](zLen)
    z(0) = 0x78; z(1) = 0x01 // CM 8 / CINFO 7, no dict, fastest flevel
    val adler = new java.util.zip.Adler32()
    var zp = 2
    var y = 0
    while (y < h) {
      z(zp) = if (y == h - 1) 1 else 0 // BFINAL on the last scanline
      z(zp + 1) = (lenB & 0xFF).toByte
      z(zp + 2) = ((lenB >> 8) & 0xFF).toByte
      z(zp + 3) = (~lenB & 0xFF).toByte
      z(zp + 4) = ((~lenB >> 8) & 0xFF).toByte
      z(zp + 5) = 0 // filter type 0 (None)
      var x = 0
      while (x < rowPx) {
        z(zp + 6 + x) = src((y * rowPx + x) % n)
        x += 1
      }
      adler.update(z, zp + 5, lenB)
      zp += 5 + lenB
      y += 1
    }
    System.arraycopy(be32(adler.getValue), 0, z, zp, 4)
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    buf.toByteArray
  }

  /** png_deflate(binary) — the REAL-WORLD twin of [[pngStored]]: same
    * content-derived geometry (w = 8 + n mod 9, h = 8 + 7n mod 9, RGB
    * 8-bit) and the same cycled raster, but each scanline is FILTERED
    * (filter type y mod 5 — None/Sub/Up/Average/Paeth, so every
    * unfilter arm of the decoder is exercised) and the stream is
    * Huffman-compressed by java.util.zip.Deflater — the IDAT layout of
    * approximately every PNG found in the wild, which
    * [[pngDhashStored]]'s integer walk correctly refuses. Decoding it
    * back requires real inflation + per-row unfiltering
    * ([[pngDhashInflate]]). Same content ⇒ same geometry ⇒ same
    * DECODED raster as the stored container — the cross-container
    * near-dup property the inflate tier's oracle pins (an exact copy
    * stored under a different encoder still lands at hamming 0).
    * ImageIO accepts the output (spec-pinned); chunk CRC32s and the
    * zlib framing come from the real java.util.zip codecs. */
  def pngDeflate(content: Array[Byte]): Array[Byte] = {
    val src = if (content.length == 0) Array[Byte](0) else content
    val n = src.length
    val w = 8 + n % 9
    val h = 8 + (n.toLong * 7L % 9L).toInt
    val rowPx = 3 * w
    def ras(i: Int): Int = src(i % n) & 0xFF
    val filtered = new Array[Byte]((1 + rowPx) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      val fo = y * (1 + rowPx)
      filtered(fo) = ft.toByte
      var x = 0
      while (x < rowPx) {
        val raw = ras(y * rowPx + x)
        val rl = if (x >= 3) ras(y * rowPx + x - 3) else 0
        val up = if (y > 0) ras((y - 1) * rowPx + x) else 0
        val ul = if (y > 0 && x >= 3) ras((y - 1) * rowPx + x - 3) else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw - rl
          case 2 => raw - up
          case 3 => raw - (rl + up) / 2
          case _ =>
            val p = rl + up - ul
            val pa = math.abs(p - rl)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw - (if (pa <= pb && pa <= pc) rl else if (pb <= pc) up else ul)
        }
        filtered(fo + 1 + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    // real zlib stream (RFC 1950 wrapper + Huffman-coded deflate);
    // end() frees the native state NOW — at 100x corpus volume a
    // GC-deferred release accumulates native memory across the scan
    val dfl = new java.util.zip.Deflater()
    val z = try {
      dfl.setInput(filtered)
      dfl.finish()
      val out = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!dfl.finished()) out.write(tmp, 0, dfl.deflate(tmp))
      out.toByteArray
    } finally dfl.end()
    val buf = new java.io.ByteArrayOutputStream(8 + 25 + 12 + z.length + 12)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
      ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      buf.write(be32(data.length.toLong), 0, 4)
      val tb = tag.getBytes("US-ASCII")
      buf.write(tb, 0, 4)
      buf.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      buf.write(be32(crc.getValue), 0, 4)
    }
    buf.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    System.arraycopy(be32(w.toLong), 0, ihdr, 0, 4)
    System.arraycopy(be32(h.toLong), 0, ihdr, 4, 4)
    ihdr(8) = 8; ihdr(9) = 2
    chunk("IHDR", ihdr)
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    buf.toByteArray
  }

  /** FULL-CODEC decode tier behind png_dhash56_full: real inflation
    * (java.util.zip.Inflater over the concatenation of ALL IDAT chunks
    * — real encoders split the zlib stream) followed by the per-row
    * PNG unfilter (None/Sub/Up/Average/Paeth — the sequential
    * imperative reconstruction that needs each row's fully-decoded
    * prior row), then the same 8×8 luma-grid resample and 56
    * neighbor-comparison bits as [[pngDhashStored]]. Returns -1 when
    * the payload is outside even THIS tier's subset: non-PNG, hostile
    * geometry, interlaced (Adam7 pass-reordering is not sequential),
    * non-zlib compression, a truncated or corrupt stream, or an
    * undefined filter type. Unlike the stored walker this is not
    * integer-replayable in SQL — the oracle pins the DECODED raster
    * domain instead, and the spec pins this decode against ImageIO
    * bit-for-bit. All work is row-local; nothing crosses an exchange. */
  def pngDhashInflate(b: Array[Byte]): Long = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xFF
    val parseable = n > 33 &&
      u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4E && u(3) == 0x47 &&
      u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A &&
      u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
    if (!parseable) return -1L
    def be32(i: Int): Long =
      (u(i).toLong << 24) | (u(i + 1).toLong << 16) |
        (u(i + 2).toLong << 8) | u(i + 3).toLong
    val w = be32(16); val h = be32(20)
    val depth = u(24); val color = u(25)
    if (w <= 0L || h <= 0L || w > (1L << 24) || h > (1L << 24)) return -1L
    if (u(26) != 0 || u(27) != 0 || u(28) != 0) return -1L
    val channels = color match {
      case 2 => 3; case 4 => 2; case 6 => 4; case _ => 1
    }
    val db = math.max(1, depth / 8)
    val bpp = (channels * db).toInt
    val stride = 1L + w * bpp
    val total = h * stride
    if (total > Int.MaxValue.toLong) return -1L
    var p = 8
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (p + 8 <= n && !sawEnd) {
      val len = be32(p)
      if (len > n.toLong || p + 12L + len > n.toLong) return -1L
      val t = p + 4
      if (u(t) == 'I' && u(t + 1) == 'D' && u(t + 2) == 'A' && u(t + 3) == 'T')
        idat.write(b, p + 8, len.toInt)
      else if (u(t) == 'I' && u(t + 1) == 'E' && u(t + 2) == 'N' && u(t + 3) == 'D')
        sawEnd = true
      p += 12 + len.toInt
    }
    val zs = idat.toByteArray
    if (zs.length < 7) return -1L
    val data = new Array[Byte](total.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(zs)
      var got = 0
      while (got < total.toInt && !inf.finished()) {
        val r = inf.inflate(data, got, total.toInt - got)
        if (r == 0 && (inf.needsInput() || inf.needsDictionary())) return -1L
        got += r
      }
      if (got < total.toInt) return -1L
    } catch {
      case _: java.util.zip.DataFormatException => return -1L
    } finally inf.end()
    val wI = w.toInt; val hI = h.toInt
    val rowPx = wI * bpp
    val strideI = stride.toInt
    val ras = new Array[Byte](hI * rowPx)
    var y = 0
    while (y < hI) {
      val ft = data(y * strideI) & 0xFF
      if (ft > 4) return -1L
      val ro = y * rowPx
      val so = y * strideI + 1
      var x = 0
      while (x < rowPx) {
        val raw = data(so + x) & 0xFF
        val rl = if (x >= bpp) ras(ro + x - bpp) & 0xFF else 0
        val up = if (y > 0) ras(ro - rowPx + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) ras(ro - rowPx + x - bpp) & 0xFF else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + rl
          case 2 => raw + up
          case 3 => raw + (rl + up) / 2
          case _ =>
            val pr = rl + up - ul
            val pa = math.abs(pr - rl)
            val pb = math.abs(pr - up)
            val pc = math.abs(pr - ul)
            raw + (if (pa <= pb && pa <= pc) rl else if (pb <= pc) up else ul)
        }
        ras(ro + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val px = new Array[Int](64)
    var g = 0
    while (g < 64) {
      val py = ((2 * (g / 8) + 1) * hI) / 16
      val gx = ((2 * (g % 8) + 1) * wI) / 16
      val base = py * rowPx + gx * bpp
      px(g) =
        if (channels >= 3)
          (299 * (ras(base) & 0xFF) + 587 * (ras(base + db) & 0xFF) +
            114 * (ras(base + 2 * db) & 0xFF)) / 1000
        else ras(base) & 0xFF
      g += 1
    }
    dhashBits(px)
  }

  /** png_dhash56_full(binary) — the ROUTED perceptual hash (static:
    * called from generated code), the r13 verdict's routing matrix as
    * one total function:
    *   1. stored-deflate subset → [[pngDhashStored]]'s integer walk
    *      (zero-copy, no Inflater, the fast path — a pipeline that
    *      wrote its own blobs stays on it);
    *   2. real compressed PNGs → [[pngDhashInflate]] (Inflater +
    *      unfilter — the tier that decodes the wild);
    *   3. undecodable (non-PNG, interlaced, corrupt) →
    *      [[dhash56Bytes]], degrade-never-wrong.
    * Tiers 1 and 2 agree bit-for-bit wherever both decode (same
    * raster, same grid — spec-pinned), so routing never changes a
    * decodable payload's hash. */
  def pngDhashFull(b: Array[Byte]): Long = {
    val s = pngDhashStored(b)
    if (s >= 0L) return s
    val i = pngDhashInflate(b)
    if (i >= 0L) i else dhash56Bytes(b)
  }

  /** 48-bit SimHash over a word-hash array: bit j set iff at least half
    * the hashes have bit j set. */
  def simHash48(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](48)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 48) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 48) {
      if (2 * counts(j) >= n) sim |= (1L << j)
      j += 1
    }
    sim
  }
}

/** poly_hash(str) — full-string rolling hash as LongType. */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** cdc_boundaries(str) — rolling-hash chunk boundary positions. */
case class CdcBoundariesExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.cdcBoundaries(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.cdcBoundaries($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcBoundariesExpr =
    copy(child = newChild)
}

/** word_poly_hashes(str) — per-word rolling hashes as ArrayType(Long). */
case class WordPolyHashesExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_poly_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.wordPolyHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.wordPolyHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): WordPolyHashesExpr =
    copy(child = newChild)
}

/** shingle3_hashes(array<long>) — hashed trigram shingles. */
case class Shingle3HashesExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle3_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.shingle3Hashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.shingle3Hashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Shingle3HashesExpr =
    copy(child = newChild)
}

/** shinglek_hashes(array<long>, k) — hashed k-gram shingles. */
case class ShingleKHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shinglek_hashes"
  override protected def nullSafeEval(arr: Any, k: Any): Any =
    TextHashExpressions.shingleKHashes(
      arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, k) =>
      s"graft.functions.TextHashExpressions.shingleKHashes($a, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleKHashesExpr =
    copy(left = newLeft, right = newRight)
}

/** sorted_intersect_count(array<long>, array<long>) — merge-scan count
  * of common elements; both inputs must be sorted distinct. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashExpressions.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashExpressions.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** dot_double(array<double>, array<double>) — sequential dot product. */
case class DotDoubleExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashExpressions.dotDouble(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashExpressions.dotDouble($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDoubleExpr =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_bucket(array<double>, table, bits) — one LSH hash-table
  * bucket id as LongType (see TextHashExpressions.hyperplaneBucket). */
case class HyperplaneBucketExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"
  override protected def nullSafeEval(arr: Any, table: Any, bits: Any): Any =
    TextHashExpressions.hyperplaneBucket(arr.asInstanceOf[ArrayData],
      table.asInstanceOf[Int], bits.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, t, b) =>
      s"graft.functions.TextHashExpressions.hyperplaneBucket($a, $t, $b)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HyperplaneBucketExpr =
    copy(first = f, second = s, third = t)
}

/** dhash56(string) — the perceptual difference-hash signature of
  * MultimodalOps.dhashPairs as one tight JVM loop: 64 length-
  * proportional character probes (px_k = charAt((2k+1)·n DIV 128),
  * the 1-based substring/ascii arithmetic of the DuckDB oracle made
  * 0-based), 56 horizontal neighbor-comparison bits. The HOF spelling
  * (transform of 64 substr+ascii, 56-step aggregate fold) measured
  * ~0.65 ms/row interpreted — 42 s per self-join side at 60 k docs;
  * this loop restores scan speed and stays bitwise-identical (spec
  * pins equality against the HOF model). Character-based like both
  * engines' substring/ascii; identical on BMP text (the corpus is
  * ASCII). Empty input returns 0 (never reached: the corpus has no
  * empty payloads; both engines' ascii('') is 0 anyway). */
case class DHash56Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash56"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.dhash56(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.dhash56($c)")
  override protected def withNewChildInternal(newChild: Expression): DHash56Expr =
    copy(child = newChild)
}

/** png_dhash56(binary) — perceptual difference-hash from a REAL
  * codec-level PNG decode: signature + IHDR parse gives (width,
  * height, bit depth, color type); the chunk walk finds IDAT; the
  * deflate stored-block walk reassembles the uncompressed scanline
  * stream (filter byte + pixels per row); the 8×8 luma grid samples
  * pixel CENTERS in 2-D raster coordinates (py = (2r+1)·h DIV 16,
  * px = (2c+1)·w DIV 16) with integer BT.601 luma across channels;
  * then the standard 56 horizontal neighbor bits. Payloads outside
  * the decodable subset (bad signature / hostile geometry / Huffman
  * IDAT / malformed framing) take the 1-D proportional BYTE sampler,
  * so a mixed corpus still hashes every row. Integer-exact: the
  * oracle rebuilds the blob and replays the same parse + block-framing
  * + sample arithmetic in hex space. See
  * [[TextHashExpressions.pngDhash56]] for the full fallback table. */
/** wav_fp56(binary) — 56-bit audio energy-contour fingerprint from a
  * real RIFF/WAVE decode; see [[TextHashExpressions.wavFp56]] for the
  * window/energy/comparison contract and the fallback rules. The
  * audio member of the perceptual-dedup family (images: png_dhash56);
  * shares the 4×14-bit banding machinery downstream. */
case class WavFp56Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "wav_fp56"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.wavFp56(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.wavFp56($c)")
  override protected def withNewChildInternal(newChild: Expression): WavFp56Expr =
    copy(child = newChild)
}

/** png_stored(binary) — complete valid PNG container (stored-deflate
  * IDAT, real CRC32/adler32) from a content byte stream; see
  * [[TextHashExpressions.pngStored]] for the layout contract. The
  * multimodal dedup corpus generator — row-local, codegen'd. */
case class PngStoredExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_stored"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.pngStored(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.pngStored($c)")
  override protected def withNewChildInternal(newChild: Expression): PngStoredExpr =
    copy(child = newChild)
}

case class PngDhash56Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "png_dhash56"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.pngDhash56(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.pngDhash56($c)")
  override protected def withNewChildInternal(newChild: Expression): PngDhash56Expr =
    copy(child = newChild)
}

/** png_deflate(binary) — complete valid PNG container (filtered
  * scanlines, real Huffman-coded zlib IDAT via java.util.zip.Deflater);
  * see [[TextHashExpressions.pngDeflate]] for the layout contract. The
  * real-world-container twin of png_stored — row-local, codegen'd. */
case class PngDeflateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_deflate"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.pngDeflate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.pngDeflate($c)")
  override protected def withNewChildInternal(newChild: Expression): PngDeflateExpr =
    copy(child = newChild)
}

/** png_dhash56_full(binary) — perceptual hash with the full decode
  * routing (stored walk → Inflater+unfilter → byte sampler); see
  * [[TextHashExpressions.pngDhashFull]]. */
case class PngDhashFullExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "png_dhash56_full"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.pngDhashFull(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.pngDhashFull($c)")
  override protected def withNewChildInternal(newChild: Expression): PngDhashFullExpr =
    copy(child = newChild)
}

/** simhash48(array<long>) — 48-bit majority-bit SimHash as LongType. */
case class SimHash48Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"
  override protected def nullSafeEval(input: Any): Any =
    TextHashExpressions.simHash48(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashExpressions.simHash48($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash48Expr =
    copy(child = newChild)
}

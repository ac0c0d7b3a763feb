package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Tabix (.tbi) generic indexes over BGZF-compressed, coordinate-sorted
  * text — the public format from the tabix/SAM spec, used by the
  * reference's input ecosystem (bgzipped VCFs,
  * `/root/reference/clinpy/utils/snp_functions.py`).
  *
  * An index maps (sequence, coordinate range) → "chunks": virtual-offset
  * intervals (`coffset << 16 | uoffset`) into the BGZF file where
  * overlapping records live, via the standard 5-level R-tree binning of
  * [0, 2^29) plus a 16 KiB-window linear index. The VCF source uses it to
  * plan ONLY the compressed byte ranges that can contain a pushed
  * chrom/pos region — on a 100 GB cohort VCF a single-gene query reads a
  * few MBs instead of the whole file.
  *
  * [[TabixIndex.regionRanges]] returns a SUPERSET of the matching bytes;
  * exact record filtering stays with the reader's pushed-predicate
  * evaluation, so index granularity affects only efficiency, never
  * results (a stale index for a rewritten file is, as everywhere, the
  * caller's contract violation).
  *
  * [[Tabix.buildForVcf]] constructs the index for a `.vcf.bgz` by one
  * sequential block scan — the utility side of the source (and the test
  * fixture writer).
  */
object Tabix {

  /** VCF preset header values (format=2, seq/beg columns 1/2, '#' meta). */
  private val FormatVcf = 2
  private val WindowShift = 14

  // ---- R-tree binning (tabix spec pseudo-code) ----

  /** Finest bin fully containing [beg, end) (0-based, half-open). */
  def reg2bin(beg: Long, end0: Long): Int = {
    val end = end0 - 1
    if (beg >> 14 == end >> 14) (((1 << 15) - 1) / 7 + (beg >> 14)).toInt
    else if (beg >> 17 == end >> 17) (((1 << 12) - 1) / 7 + (beg >> 17)).toInt
    else if (beg >> 20 == end >> 20) (((1 << 9) - 1) / 7 + (beg >> 20)).toInt
    else if (beg >> 23 == end >> 23) (((1 << 6) - 1) / 7 + (beg >> 23)).toInt
    else if (beg >> 26 == end >> 26) (((1 << 3) - 1) / 7 + (beg >> 26)).toInt
    else 0
  }

  /** All bins intersecting [beg, end) — the query-side set. */
  def reg2bins(beg: Long, end0: Long): Seq[Int] = {
    val end = end0 - 1
    val out = Seq.newBuilder[Int]
    out += 0
    var k = 1 + (beg >> 26); while (k <= 1 + (end >> 26)) { out += k.toInt; k += 1 }
    k = 9 + (beg >> 23); while (k <= 9 + (end >> 23)) { out += k.toInt; k += 1 }
    k = 73 + (beg >> 20); while (k <= 73 + (end >> 20)) { out += k.toInt; k += 1 }
    k = 585 + (beg >> 17); while (k <= 585 + (end >> 17)) { out += k.toInt; k += 1 }
    k = 4681 + (beg >> 14); while (k <= 4681 + (end >> 14)) { out += k.toInt; k += 1 }
    out.result()
  }

  // ---- reading ----

  /** Driver-side LRU of parsed indexes, keyed by (path, mtime, length).
    * Parsing a .tbi costs a full read + BGZF inflate of the index file;
    * a cohort query touches every file's index at PLANNING time, and a
    * session typically re-plans the same files across many region
    * queries — so the parse must amortize. Keying on (mtime, length)
    * makes a rewritten file a natural miss, upgrading the "stale index
    * is the caller's problem" contract to automatic within one driver.
    * Access-ordered with a 256-entry cap: a parsed index is a few KB–MB
    * (driver-sized by construction), so the cap bounds worst-case
    * memory at cohort scale without evicting under normal use. */
  private val MaxCached = 256
  private val cache =
    new java.util.LinkedHashMap[(String, Long, Long), TabixIndex](
        32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), TabixIndex]): Boolean =
        size() > MaxCached
    }
  private val loads = new java.util.concurrent.atomic.AtomicLong
  /** Number of cold .tbi parses since JVM start (cache-hit observability;
    * specs assert one load per distinct file version). */
  def indexLoads: Long = loads.get

  // per-key parse latches: concurrent planners of the SAME cold file
  // wait for one parse (keeping the one-load-per-version contract the
  // spec asserts) without serializing behind other files' inflates
  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Object]

  /** [[read]] through the driver-side cache; cold parses are
    * single-flight per file version. */
  def readCached(path: Path, conf: Configuration): TabixIndex = {
    val st = path.getFileSystem(conf).getFileStatus(path)
    val key = (path.toString, st.getModificationTime, st.getLen)
    val hit = cache.synchronized(Option(cache.get(key)))
    hit.getOrElse {
      val latch = inflight.computeIfAbsent(key, _ => new Object)
      try latch.synchronized {
        cache.synchronized(Option(cache.get(key))).getOrElse {
          val idx = read(path, conf)
          loads.incrementAndGet()
          cache.synchronized(cache.put(key, idx))
          idx
        }
      } finally inflight.remove(key, latch) // conditional: a stale
      // waiter must not delete a newer parser's latch (eviction race)
    }
  }

  /** Parse `path` (BGZF-compressed binary index). */
  def read(path: Path, conf: Configuration): TabixIndex = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    val raw = try {
      val bos = new ByteArrayOutputStream()
      var off = 0L
      while (off < len) {
        val (data, bs) = Bgzf.readBlock(in, off, len)
        bos.write(data)
        off += bs
      }
      bos.toByteArray
    } finally in.close()

    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); b.get(magic)
    require(new String(magic, 0, 3, StandardCharsets.US_ASCII) == "TBI",
      s"$path is not a tabix index")
    val nRef = b.getInt
    b.getInt // format
    b.getInt; b.getInt; b.getInt // col_seq, col_beg, col_end
    b.getInt; b.getInt // meta, skip
    val lNm = b.getInt
    val nm = new Array[Byte](lNm); b.get(nm)
    val names = new String(nm, StandardCharsets.US_ASCII)
      .split('\u0000').toSeq.filter(_.nonEmpty)
    // per ref: n_bin, bins (bin, n_chunk, chunks), n_intv, ioff
    val perRef = (0 until nRef).map { _ =>
      val nBin = b.getInt
      val bins = (0 until nBin).map { _ =>
        val bin = b.getInt
        val nChunk = b.getInt
        bin -> (0 until nChunk).map(_ => (b.getLong, b.getLong))
      }.toMap
      val nIntv = b.getInt
      (bins, Array.fill(nIntv)(b.getLong))
    }
    TabixIndex(names, perRef.map(_._1), perRef.map(_._2))
  }

  // ---- building ----

  private case class Rec(ref: Int, beg: Long, end: Long, voffBeg: Long,
      voffEnd: Long)

  /** Build `<path>.tbi` for a coordinate-sorted `.vcf.bgz`: one
    * sequential block scan recording each record's (chrom, POS,
    * POS+len(REF)) and its virtual-offset extent. Returns the index
    * path. */
  def buildForVcf(path: Path, conf: Configuration): Path = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    val names = mutable.LinkedHashMap.empty[String, Int]
    val recs = mutable.ArrayBuffer.empty[Rec]
    try {
      val line = new ByteArrayOutputStream(256)
      var lineVoff = -1L
      var off = 0L
      while (off < len) {
        val (data, bs) = Bgzf.readBlock(in, off, len)
        var i = 0
        while (i < data.length) {
          if (lineVoff < 0) lineVoff = (off << 16) | i
          val j = data.indexOf('\n'.toByte, i)
          val stop = if (j < 0) data.length else j
          line.write(data, i, stop - i)
          if (j >= 0) {
            val voffEnd = (off << 16) | (j + 1)
            val s = new String(line.toByteArray, StandardCharsets.UTF_8)
            if (s.nonEmpty && s.charAt(0) != '#') {
              val f = s.split("\t", 5)
              val ref = names.getOrElseUpdate(f(0), names.size)
              val beg0 = java.lang.Long.parseLong(f(1)) - 1
              val end0 = beg0 + math.max(1, f(3).length)
              // the binning scheme covers [0, 2^29); indexing a bigger
              // contig would silently drop its tail from every query
              require(beg0 >= 0 && end0 <= (1L << 29),
                s"record at ${f(0)}:${f(1)} outside the tabix" +
                  " coordinate space [1, 2^29]")
              recs += Rec(ref, beg0, end0, lineVoff, voffEnd)
            }
            line.reset()
            lineVoff = -1L
          }
          i = stop + (if (j >= 0) 1 else 0)
        }
        off += bs
      }
    } finally in.close()

    // per-ref bin→chunks (merged when contiguous) and linear index
    val nRef = names.size
    val bins = Array.fill(nRef)(
      mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[(Long, Long)]])
    val linear = Array.fill(nRef)(mutable.ArrayBuffer.empty[Long])
    recs.foreach { r =>
      val chunks = bins(r.ref).getOrElseUpdate(reg2bin(r.beg, r.end),
        mutable.ArrayBuffer.empty)
      if (chunks.nonEmpty && chunks.last._2 == r.voffBeg)
        chunks(chunks.length - 1) = (chunks.last._1, r.voffEnd)
      else chunks += ((r.voffBeg, r.voffEnd))
      val lin = linear(r.ref)
      var w = (r.beg >> WindowShift).toInt
      val wEnd = ((r.end - 1) >> WindowShift).toInt
      while (lin.length <= wEnd) lin += 0L
      while (w <= wEnd) {
        if (lin(w) == 0L || r.voffBeg < lin(w)) lin(w) = r.voffBeg
        w += 1
      }
    }
    // spec: empty windows inherit the previous window's offset
    linear.foreach { lin =>
      var prev = 0L
      var w = 0
      while (w < lin.length) {
        if (lin(w) == 0L) lin(w) = prev else prev = lin(w)
        w += 1
      }
    }

    val payload = new ByteArrayOutputStream()
    val b = ByteBuffer.allocate(4 + 8 * 4 +
      names.keysIterator.map(_.length + 1).sum).order(ByteOrder.LITTLE_ENDIAN)
    b.put("TBI\u0001".getBytes(StandardCharsets.US_ASCII))
    b.putInt(nRef).putInt(FormatVcf).putInt(1).putInt(2).putInt(0)
    b.putInt('#').putInt(0)
    b.putInt(names.keysIterator.map(_.length + 1).sum)
    names.keysIterator.foreach { n =>
      b.put(n.getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
    }
    payload.write(b.array(), 0, b.position())
    (0 until nRef).foreach { r =>
      val bb = ByteBuffer.allocate(4 +
        bins(r).map { case (_, cs) => 8 + 16 * cs.length }.sum +
        4 + 8 * linear(r).length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(bins(r).size)
      bins(r).foreach { case (bin, cs) =>
        bb.putInt(bin).putInt(cs.length)
        cs.foreach { case (s, e) => bb.putLong(s).putLong(e) }
      }
      bb.putInt(linear(r).length)
      linear(r).foreach(bb.putLong)
      payload.write(bb.array(), 0, bb.position())
    }

    val tbi = path.suffix(".tbi")
    val out = fs.create(tbi, true)
    try Bgzf.write(out, payload.toByteArray, 32768) finally out.close()
    tbi
  }
}

/** Parsed index: `names` in file order; per ref, bin → chunk list and the
  * 16 KiB-window linear index. */
case class TabixIndex(names: Seq[String],
    bins: Seq[Map[Int, Seq[(Long, Long)]]], linear: Seq[Array[Long]]) {

  /** Merged COMPRESSED byte ranges possibly containing records of
    * `chrom` overlapping [beg, end) in 0-based half-open coordinates;
    * empty when the index proves no record matches. Range ends are
    * rounded up one max block so a record spilling past its chunk-end
    * block is never cut off. */
  def regionRanges(chrom: String, beg: Long, end: Long): Seq[(Long, Long)] = {
    val r = names.indexOf(chrom)
    if (r < 0) return Nil
    val hi = math.max(beg + 1, end)
    val lin = linear(r)
    val minIoff =
      if (lin.isEmpty) 0L
      else lin(math.min(beg >> 14, (lin.length - 1).toLong).toInt)
    val chunks = Tabix.reg2bins(beg, hi)
      .flatMap(bins(r).get).flatten
      .filter(_._2 > minIoff)
    if (chunks.isEmpty) return Nil
    val ranges = chunks
      .map { case (b, e) => (b >>> 16, (e >>> 16) + Bgzf.MaxBlockSize) }
      .sortBy(_._1)
    val merged = mutable.ArrayBuffer[(Long, Long)](ranges.head)
    ranges.tail.foreach { case (s, e) =>
      if (s <= merged.last._2)
        merged(merged.length - 1) = (merged.last._1, math.max(e, merged.last._2))
      else merged += ((s, e))
    }
    merged.toSeq
  }
}

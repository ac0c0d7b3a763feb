package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, DeflaterOutputStream, GZIPInputStream}

import org.apache.hadoop.fs.FSDataInputStream

/** BGZF — blocked gzip as specified publicly in the SAM format spec §4.1
  * (the framing behind `.vcf.bgz` / tabix-compressed files, e.g. the
  * inputs of `/root/reference/clinpy/utils/snp_functions.py`): a series
  * of ≤64 KiB gzip members, each carrying its own total compressed size
  * in a `BC` extra subfield, terminated by a fixed 28-byte empty member.
  *
  * Because every block is a self-contained gzip member whose size is
  * recoverable from its header, a reader can start at ANY byte offset,
  * scan forward <64 KiB to the next validated block header, and
  * decompress independently of the rest of the file. That is what makes
  * a 100 GB `.vcf.bgz` readable by hundreds of tasks in parallel, where
  * plain `.gz` forces a single sequential stream.
  *
  * All file access here uses positioned reads (`readFully(pos, ...)`) on
  * a Hadoop `FSDataInputStream`, so any scheme (file:/, hdfs:/, s3a:/)
  * works and a stream can be shared without seek-pointer races.
  */
object Bgzf {

  /** BSIZE is a stored u16 + 1, so a block never exceeds 64 KiB. */
  val MaxBlockSize: Int = 65536

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Total compressed size (BSIZE) of the block whose header starts at
    * `b(off)`, or -1 if the bytes there are not a valid BGZF header.
    * `avail` = readable bytes at `off`. Validates gzip magic, CM, the
    * FEXTRA flag, and the BC subfield, and bounds BSIZE by the fixed
    * overhead — cheap enough to call at every candidate offset while
    * scanning for a boundary. */
  def blockSize(b: Array[Byte], off: Int, avail: Int): Int = {
    if (avail < 18) return -1
    if (b(off) != 0x1f.toByte || b(off + 1) != 0x8b.toByte ||
        b(off + 2) != 8.toByte || (b(off + 3) & 0x04) == 0) return -1
    val xlen = u16(b, off + 10)
    if (xlen < 6 || 12 + xlen > avail) return -1
    var i = off + 12
    val stop = off + 12 + xlen
    while (i + 4 <= stop) {
      val slen = u16(b, i + 2)
      if (b(i) == 66.toByte && b(i + 1) == 67.toByte && slen == 2) {
        if (i + 6 > stop) return -1
        val bsize = u16(b, i + 4) + 1
        // header + minimal deflate payload (2) + CRC32/ISIZE trailer (8)
        return if (bsize >= 12 + xlen + 10 && bsize <= MaxBlockSize) bsize
               else -1
      }
      i += 4 + slen
    }
    -1
  }

  /** True if the file begins with a valid BGZF block (content-based — a
    * plain `.gz` has no FEXTRA/BC and fails this). */
  def isBgzf(in: FSDataInputStream, fileLen: Long): Boolean = {
    val n = math.min(fileLen, 4096L).toInt
    if (n < 18) return false
    val buf = new Array[Byte](n)
    in.readFully(0L, buf, 0, n)
    blockSize(buf, 0, n) > 0
  }

  /** Smallest validated block boundary ≥ `from` (or `fileLen` if none).
    * A candidate is accepted only if its BSIZE points at EOF or at
    * another valid header — the chain check rejects spurious magic
    * bytes inside compressed payloads. */
  def nextBoundary(in: FSDataInputStream, from: Long, fileLen: Long): Long = {
    if (from >= fileLen) return fileLen
    val winLen = math.min(fileLen - from, (MaxBlockSize + 4096).toLong).toInt
    val buf = new Array[Byte](winLen)
    in.readFully(from, buf, 0, winLen)
    var i = 0
    while (i < winLen) {
      val bs = blockSize(buf, i, winLen - i)
      if (bs > 0) {
        val nxt = from + i + bs
        if (nxt == fileLen) return from + i
        if (nxt < fileLen && blockSizeAt(in, nxt, fileLen) > 0) return from + i
      }
      i += 1
    }
    fileLen
  }

  /** BSIZE of the block at absolute offset `off` (positioned read). */
  def blockSizeAt(in: FSDataInputStream, off: Long, fileLen: Long): Int = {
    val n = math.min(fileLen - off, 256L).toInt
    if (n < 18) return -1
    val b = new Array[Byte](n)
    in.readFully(off, b, 0, n)
    blockSize(b, 0, n)
  }

  /** Decompressed payload of the block at `off`, plus its BSIZE. The
    * gzip CRC is verified by the decoder, so a false boundary that
    * survived the chain check still fails loudly here. */
  def readBlock(in: FSDataInputStream, off: Long, fileLen: Long): (Array[Byte], Int) = {
    val bs = blockSizeAt(in, off, fileLen)
    require(bs > 0, s"not a BGZF block at offset $off")
    val comp = new Array[Byte](bs)
    in.readFully(off, comp, 0, bs)
    val isize = (comp(bs - 4) & 0xff) | ((comp(bs - 3) & 0xff) << 8) |
      ((comp(bs - 2) & 0xff) << 16) | ((comp(bs - 1) & 0xff) << 24)
    val out = new Array[Byte](isize)
    val g = new GZIPInputStream(new ByteArrayInputStream(comp))
    try {
      var read = 0
      while (read < isize) {
        val k = g.read(out, read, isize - read)
        require(k > 0, s"truncated BGZF block at offset $off")
        read += k
      }
    } finally g.close()
    (out, bs)
  }

  /** The canonical 28-byte empty terminator block. */
  val EofBlock: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
    0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /** Writes one BGZF block holding `raw(off until off+len)`. The RAW
    * payload must fit one block too (spec ISIZE ≤ 64 KiB): intra-block
    * offsets feed 16-bit virtual-offset uoffsets (Tabix), which a larger
    * payload would silently corrupt. */
  def writeBlock(out: OutputStream, raw: Array[Byte], off: Int, len: Int): Int = {
    require(len <= MaxBlockSize,
      s"raw payload of $len bytes exceeds the 64 KiB BGZF block limit")
    val bos = new ByteArrayOutputStream(len / 2 + 32)
    val dos = new DeflaterOutputStream(bos,
      new Deflater(Deflater.DEFAULT_COMPRESSION, true))
    dos.write(raw, off, len)
    dos.close()
    val comp = bos.toByteArray
    val bsize = 12 + 6 + comp.length + 8
    require(bsize <= MaxBlockSize, s"chunk of $len bytes too large for one BGZF block")
    val crc = new CRC32()
    crc.update(raw, off, len)
    val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0,
      0xff.toByte, 6, 0, 66, 67, 2, 0,
      ((bsize - 1) & 0xff).toByte, (((bsize - 1) >> 8) & 0xff).toByte)
    out.write(header)
    out.write(comp)
    val crcV = crc.getValue
    out.write(Array[Byte]((crcV & 0xff).toByte, ((crcV >> 8) & 0xff).toByte,
      ((crcV >> 16) & 0xff).toByte, ((crcV >> 24) & 0xff).toByte))
    out.write(Array[Byte]((len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      ((len >> 16) & 0xff).toByte, ((len >> 24) & 0xff).toByte))
    bsize
  }

  /** BGZF-compresses `data` in blocks of `rawPerBlock` source bytes and
    * appends the EOF terminator; returns each block's start offset (for
    * tests asserting boundary discovery). */
  def write(out: OutputStream, data: Array[Byte], rawPerBlock: Int): Seq[Long] = {
    val offsets = Seq.newBuilder[Long]
    var pos = 0L
    var i = 0
    while (i < data.length) {
      val n = math.min(rawPerBlock, data.length - i)
      offsets += pos
      pos += writeBlock(out, data, i, n)
      i += n
    }
    offsets += pos
    out.write(EofBlock)
    offsets.result()
  }
}

/** Line iterator over a BGZF byte-range split `[start, end)`.
  *
  * Ownership contract (the block-compressed analogue of Hadoop's text
  * split rule): a line belongs to the split whose range contains the
  * compressed offset of the block holding the line's FIRST byte. A
  * reader starting mid-file decompresses the preceding block to learn
  * whether its first visible line is a partial tail (the previous split
  * finishes that line by decompressing past its own `end`) or a fresh
  * line starting exactly on the block boundary. Every line is therefore
  * produced by exactly one split, for any split size.
  */
final class BgzfLines(in: FSDataInputStream, fileLen: Long, start: Long,
    end: Long) extends Iterator[String] {

  private var discardFirst = false
  private var nextBlock: Long = if (start == 0L) 0L else locateStart()

  /** First block boundary ≥ `start`; also decides `discardFirst` from
    * the trailing byte of the closest preceding non-empty block. */
  private def locateStart(): Long = {
    // the block containing byte start-1 begins within MaxBlockSize of it
    val winStart = math.max(0L, start - Bgzf.MaxBlockSize)
    var b = if (winStart == 0L) 0L else Bgzf.nextBoundary(in, winStart, fileLen)
    val chain = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (b < start && b < fileLen) {
      chain += b
      val bs = Bgzf.blockSizeAt(in, b, fileLen)
      require(bs > 0, s"BGZF chain broken at offset $b")
      b += bs
    }
    var idx = chain.length - 1
    var decided = false
    while (idx >= 0 && !decided) {
      val (data, _) = Bgzf.readBlock(in, chain(idx), fileLen)
      if (data.nonEmpty) {
        discardFirst = data(data.length - 1) != '\n'
        decided = true
      }
      idx -= 1
    }
    if (!decided)
      // every block in the look-back window was empty: if the chain
      // reaches offset 0 the stream produced no bytes yet (true line
      // start); otherwise (>64 KiB of empty blocks — never emitted by
      // real writers) assume mid-line like plain-text splitting does
      discardFirst = chain.headOption.exists(_ > 0)
    b
  }

  private var buf: Array[Byte] = Array.emptyByteArray
  private var bufPos = 0
  private var bufBlock = 0L
  private val lineBuf = new ByteArrayOutputStream(256)
  private var pending: String = null
  private var done = false

  if (nextBlock >= fileLen || nextBlock >= end) done = true // no block starts here
  else {
    if (discardFirst) readLine()
    advance()
  }

  /** Loads the next non-empty block's payload; false at EOF. */
  private def fill(): Boolean = {
    while (nextBlock < fileLen) {
      val off = nextBlock
      val (data, bs) = Bgzf.readBlock(in, off, fileLen)
      nextBlock = off + bs
      if (data.nonEmpty) { buf = data; bufPos = 0; bufBlock = off; return true }
    }
    false
  }

  private def finishLine(): String = {
    val bytes = lineBuf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  /** Next line plus the compressed offset of the block holding its first
    * byte; null at EOF. Decompresses across block boundaries as needed
    * (a line's tail may live many blocks past its start). */
  private def readLine(): (String, Long) = {
    lineBuf.reset()
    var startBlk = -1L
    while (true) {
      if (bufPos >= buf.length && !fill())
        return if (lineBuf.size() == 0) null else (finishLine(), startBlk)
      if (startBlk < 0) startBlk = bufBlock
      var i = bufPos
      while (i < buf.length && buf(i) != '\n') i += 1
      if (i < buf.length) {
        lineBuf.write(buf, bufPos, i - bufPos)
        bufPos = i + 1
        return (finishLine(), startBlk)
      }
      lineBuf.write(buf, bufPos, buf.length - bufPos)
      bufPos = buf.length
    }
    null // unreachable
  }

  private def advance(): Unit = {
    pending = null
    if (done) return
    val r = readLine()
    if (r == null || r._2 >= end) { done = true; return } // EOF / next split's
    pending = r._1
  }

  override def hasNext: Boolean = pending != null

  override def next(): String = {
    val v = pending
    advance()
    v
  }
}

package graft.model

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path}

/** samtools-faidx-style index entry: where `name`'s sequence lives in the
  * FASTA file. `lineBases` bases per line, `lineBytes` bytes per line
  * (bases + terminator); all sequence lines except the last must share
  * one length — the standard faidx indexability requirement. */
case class FaiEntry(name: String, length: Long, offset: Long,
    lineBases: Int, lineBytes: Int) {
  /** byte offset of 1-based base position `p`. */
  def byteOffset(p: Long): Long =
    offset + (p - 1) / lineBases * lineBytes + (p - 1) % lineBases
}

/** Indexed FASTA access: broadcast the ~KB index, leave the multi-GB
  * sequence on shared storage, and let every executor do positioned
  * range reads for exactly the bases it needs. This is how sequence
  * extraction scales past what a broadcast whole-genome map allows
  * (reference genomes are 3 GB+; the index is 25 lines).
  *
  * Reference surface: `Genome.get_sequence`
  * (`/root/reference/clinpy/assays/junction.py:351-374`) — the reference
  * fetches per-interval sequences through pytxdb/pysam; here the same
  * contract is a distributed column transform (`Genome.withSequencesIndexed`).
  */
object FastaIndex {

  /** Parse a `.fai` sidecar (5-column TSV: name, length, offset,
    * line-bases, line-bytes). */
  def parseFai(lines: Iterator[String]): Map[String, FaiEntry] =
    lines.filter(_.nonEmpty).map { l =>
      val f = l.split("\t")
      FaiEntry(f(0), f(1).toLong, f(2).toLong, f(3).toInt, f(4).toInt)
    }.map(e => e.name -> e).toMap

  /** Index a FASTA: use the `.fai` sidecar when present, else one linear
    * driver-side scan (sequence bytes are never retained). */
  def forFasta(conf: Configuration, fastaPath: String): Map[String, FaiEntry] = {
    val fai = new Path(fastaPath + ".fai")
    val fs = fai.getFileSystem(conf)
    if (fs.exists(fai)) {
      val in = fs.open(fai)
      try parseFai(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
      finally in.close()
    } else build(conf, fastaPath)
  }

  /** One linear pass over the FASTA, recording per-contig byte layout. */
  def build(conf: Configuration, fastaPath: String): Map[String, FaiEntry] = {
    val hp = new Path(fastaPath)
    val in = hp.getFileSystem(conf).open(hp)
    val reader = new org.apache.hadoop.util.LineReader(in)
    val text = new org.apache.hadoop.io.Text
    val entries = Seq.newBuilder[FaiEntry]
    var pos = 0L
    var name: String = null
    var seqStart = 0L; var length = 0L; var lineBases = 0; var lineBytes = 0
    def flush(): Unit = if (name != null)
      entries += FaiEntry(name, length, seqStart, lineBases.max(1),
        lineBytes.max(2))
    try {
      var n = reader.readLine(text)
      while (n > 0) {
        val line = text.toString
        if (line.startsWith(">")) {
          flush()
          name = line.drop(1).split("\\s+").head
          seqStart = pos + n; length = 0L; lineBases = 0; lineBytes = 0
        } else if (line.nonEmpty && name != null) {
          if (lineBases == 0) { lineBases = line.length; lineBytes = n }
          length += line.length
        }
        pos += n
        n = reader.readLine(text)
      }
      flush()
    } finally reader.close()
    entries.result().map(e => e.name -> e).toMap
  }

  /** Read bases [start, end] (1-based closed) of `entry` with ONE
    * positioned read spanning the line terminators, then strip them.
    * `readFully(pos, ...)` is Hadoop's `PositionedReadable` contract —
    * it does not move the stream cursor and is safe under concurrent
    * tasks sharing one cached stream. */
  def readRange(in: FSDataInputStream, entry: FaiEntry, start: Long,
      end: Long): String = {
    val from = entry.byteOffset(start)
    val to = entry.byteOffset(end) // offset of the LAST base, inclusive
    val buf = new Array[Byte]((to - from + 1).toInt)
    in.readFully(from, buf)
    val out = new java.lang.StringBuilder(buf.length)
    buf.foreach(b => if (b != '\n' && b != '\r') out.append(b.toChar))
    out.toString
  }

  // Executor-local stream cache: one open handle per FASTA path per JVM,
  // shared by all tasks (positioned reads are concurrency-safe). Never
  // closed — handles die with the executor, like Spark's own file
  // readers' pooled connections.
  private val streams = new ConcurrentHashMap[String, FSDataInputStream]

  def stream(conf: Configuration, path: String): FSDataInputStream =
    streams.computeIfAbsent(path, { p =>
      val hp = new Path(p)
      hp.getFileSystem(conf).open(hp)
    })
}

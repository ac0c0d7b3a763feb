package graft

import org.apache.hadoop.conf.Configuration
import graft.model.{FaiEntry, FastaIndex}

/** FastaIndex unit coverage: byte math, index build vs .fai sidecar,
  * positioned range reads across line boundaries. The distributed form
  * (Genome.withSequencesIndexed) is covered in DomainE2ESpec against the
  * broadcast-map implementation. */
class FastaIndexSpec extends SparkSpecBase {

  private val conf = new Configuration()

  test("byteOffset spans line terminators correctly") {
    // 60 bases + \n per line, sequence starts at byte 6 (">chr1\n")
    val e = FaiEntry("chr1", 120, 6, 60, 61)
    assert(e.byteOffset(1) == 6)
    assert(e.byteOffset(60) == 6 + 59)      // last base of line 1
    assert(e.byteOffset(61) == 6 + 61)      // first base of line 2
    assert(e.byteOffset(120) == 6 + 61 + 59)
  }

  test("build matches the fixture layout; .fai sidecar parses the same") {
    val idx = FastaIndex.build(conf, fixture("genome.fa"))
    assert(idx.keySet == Set("chr1", "chr2"))
    assert(idx("chr1") == FaiEntry("chr1", 120, 6, 60, 61))
    assert(idx("chr2").length == 120 && idx("chr2").lineBases == 60)
    val fai = idx.values.toSeq.sortBy(_.offset).map(e =>
      s"${e.name}\t${e.length}\t${e.offset}\t${e.lineBases}\t${e.lineBytes}")
    assert(FastaIndex.parseFai(fai.iterator) == idx)
  }

  test("readRange: within-line, cross-line, whole-contig reads") {
    val idx = FastaIndex.build(conf, fixture("genome.fa"))
    val in = FastaIndex.stream(conf, fixture("genome.fa"))
    val chr1 = "ACGT" * 30
    assert(FastaIndex.readRange(in, idx("chr1"), 1, 4) == "ACGT")
    assert(FastaIndex.readRange(in, idx("chr1"), 58, 63) ==
      chr1.substring(57, 63)) // straddles the line-1/line-2 boundary
    assert(FastaIndex.readRange(in, idx("chr1"), 1, 120) == chr1)
    assert(FastaIndex.readRange(in, idx("chr2"), 116, 120) ==
      ("GGCCA" * 24).substring(115, 120)) // tail of the file
  }
}

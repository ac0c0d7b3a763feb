package graft

import org.apache.spark.sql.functions._
import graft.core.{FilterSpec, TableCatalog}
import graft.ingest.{Normalize, Readers, VcfReader}
import graft.model.{Genome, Junction, Variant}
import graft.query.{Expression, Junctions, Project, Variants}

/** The reference's flagship path end to end (SURVEY §7.2): ingest →
  * normalize → query APIs → entity queries → genome adapter. */
class DomainE2ESpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val cat: TableCatalog = {
    val c = new TableCatalog(spark, tmpDir("proj"))
    // samples
    c.write(Readers.sampleMeta(spark, fixture("sample_meta.tsv"),
      keep = Seq("sex", "age", "sample_meta")), "samples")
    // junctions (unfiltered family)
    val staged = Readers.sjOutAll(spark, Seq(
      "s1" -> fixture("s1.SJ.out.tab"), "s2" -> fixture("s2.SJ.out.tab"),
      "s3" -> fixture("s3.SJ.out.tab")), minReads = 10)
    Normalize.normalizeJunctions(c, staged, filtered = false)
    // expression
    val ge = Readers.rsemGenes(spark, fixture("s1.genes.results"), "s1")
      .unionByName(Readers.rsemGenes(spark, fixture("s2.genes.results"), "s2"))
    c.write(ge, "gene_expression")
    c.write(Readers.rsemIsoforms(spark, fixture("s1.isoforms.results"), "s1"),
      "transcript_expression")
    // variants (dna, unfiltered)
    val vcf = VcfReader.readAll(spark,
      Seq("s1" -> fixture("s1.vcf"), "s2" -> fixture("s2.vcf")),
      Map("consequence" -> "str", "impact" -> "str", "gene" -> "str",
        "af" -> "float", "canonical" -> "bool"),
      policy = "union", formatKeys = Seq("GT", "DP"))
    Normalize.normalizeVariants(c, vcf,
      impactCols = Seq("consequence", "impact", "gene", "af", "canonical"),
      formatCols = Seq("gt", "gt_raw", "dp"), rna = false, filtered = false)
    // genome annotation: g1 on chr1(+): t1 exons (1,30),(61,100);
    // gm on chr2(-): tm exons (1,30),(61,100)
    c.write(Seq(
      ("g1", "chr1", 1L, 100L, "+", "GENE1", "test gene", "protein_coding"),
      ("gm", "chr2", 1L, 100L, "-", "GENE2", "minus gene", "protein_coding"))
      .toDF("id", "chrom", "start", "end", "strand", "name", "description", "biotype"),
      "genes")
    c.write(Seq(
      ("t1", "g1", "chr1", 1L, 100L, "+", "protein_coding"),
      ("tm", "gm", "chr2", 1L, 100L, "-", "protein_coding"))
      .toDF("id", "gene", "chrom", "start", "end", "strand", "biotype"),
      "transcripts")
    c.write(Seq(
      ("t1", 1, "chr1", 1L, 30L, "+"), ("t1", 2, "chr1", 61L, 100L, "+"),
      ("tm", 1, "chr2", 1L, 30L, "-"), ("tm", 2, "chr2", 61L, 100L, "-"))
      .toDF("transcript", "rank", "chrom", "start", "end", "strand"),
      "exons")
    c
  }

  private lazy val project = new Project(cat)
  private lazy val junctions = new Junctions(cat, project)
  private lazy val genome = new Genome(cat, Some(fixture("genome.fa")))

  test("Project: cohort filter + JSON meta flatten + annotation update") {
    val s = project.samples(Seq("a"))
    assert(s.count() == 2)
    assert(s.columns.contains("site") && s.columns.contains("batch"))
    assert(s.filter($"sample_id" === "s1").select("site").head().getString(0) == "tor")
    assert(project.cohortCounts.collect().map(r =>
      r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 2L, "b" -> 1L))
    project.addAnnotation("s2", """{"review":"ok"}""")
    val annot = project.samplesTable.filter($"sample_id" === "s2")
      .select("user_annot").head().getString(0)
    assert(annot == """{"review":"ok"}""")
    assert(project.samplesTable.filter($"user_annot".isNotNull).count() == 1)
  }

  test("Junctions.select: cohort semi-join chain with read support") {
    val got = junctions.select(cohorts = Seq("a"), filtered = false)
    assert(got.count() == 4) // s1:{j1,j3} s2:{j1,j2}
    val uniq = junctions.select(cohorts = Seq("a"), uniq = true, filtered = false)
    assert(uniq.count() == 3) // j1, j2, j3
    assert(junctions.select(filtered = false).count() == 5)
  }

  test("typed Dataset views of the fixed cores") {
    val d = junctions.dimTyped(filtered = false)
    assert(d.filter(_.chrom == "chr1").count() == 3)
    val b = junctions.bridgeTyped(filtered = false)
    assert(b.filter(_.samplename == "s1").map(_.uniq_map).collect().sum == 40)
  }

  test("Junctions.toEntities reifies distinct junction rows") {
    val es = junctions.toEntities(junctions.select(cohorts = Seq("a"),
      filtered = false))
    assert(es.size == 3 && es.contains(Junction("chr1", 31, 60, "+")))
  }

  test("Variants.summaryString formats the A2 summary") {
    val s = new Variants(cat).summaryString
    assert(s.contains("3 variants") && s.contains("2 samples") &&
      s.contains("family=variants"))
  }

  test("Junctions.search: region + strand") {
    assert(junctions.search("chr1", 1, 40, filtered = false, uniq = true).count() == 3)
    assert(junctions.search("chr2", 550, 560, filtered = false, uniq = true).count() == 1)
    assert(junctions.search("chr2", 550, 560, strand = Some("+"),
      filtered = false, uniq = true).count() == 0)
  }

  test("Junctions.searchRegions: bulk region query via the binned join") {
    val regions = Seq(("r1", "chr1", 1L, 40L), ("r2", "chr2", 550L, 560L),
      ("r3", "chr2", 1L, 10L))
      .toDF("region_id", "chrom", "start", "end")
    val hits = junctions.searchRegions(regions, filtered = false)
      .select("region_id", "id")
    val byRegion = hits.collect().groupBy(_.getString(0)).view
      .mapValues(_.length).toMap
    assert(byRegion("r1") == 3)          // j1, j2, j3 overlap [1,40]
    assert(byRegion("r2") == 1)          // j4
    assert(!byRegion.contains("r3"))
  }

  test("Expression.genesTyped typed view") {
    val expr = new Expression(cat, project)
    assert(expr.genesTyped.filter(_.gene == "g1").count() == 2)
  }

  test("Junctions.classifyEndpoints: corpus-wide J9 in one binned join") {
    val cls = junctions.classifyEndpoints(genome, filtered = false)
      .collect()
      .map(r => (r.getLong(0), r.getString(3), r.getString(6)))
    val byJunction = cls.groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).toSet).toMap
    val idOf = junctions.dimTyped(filtered = false).collect()
      .map(j => (j.chrom, j.start) -> j.id).toMap
    // j1 (31,60): both endpoints intronic; j3 (25,65): both exonic
    assert(byJunction(idOf(("chr1", 31L))) ==
      Set(("start", "intron"), ("end", "intron")))
    assert(byJunction(idOf(("chr1", 25L))) ==
      Set(("start", "exon"), ("end", "exon")))
    // j4 (chr2 500-600, minus strand) lies beyond tm's span: no rows
    assert(!byJunction.contains(idOf(("chr2", 500L))))
  }

  test("Junctions.filterJunctions (E10): user df→df filter creates filtered pair") {
    junctions.filterJunctions(df => df.filter(col("uniq_map") >= 20),
      overwrite = true)
    // kept: j1 (25,40 reads), j4 (33) — j2 (12), j3 (15) dropped
    assert(junctions.dim(filtered = true).count() == 2)
    assert(junctions.select(filtered = true).count() == 3) // j1×2 samples + j4
  }

  test("Expression: long and wide (pivot with nulls)") {
    val expr = new Expression(cat, project)
    assert(expr.expression(features = Seq("g1")).count() == 2)
    assert(expr.expression(cohorts = Seq("a")).count() == 5)
    val w = expr.wide(what = "tpm", samples = Seq("s1", "s2"))
    assert(w.columns.toSeq == Seq("gene", "s1", "s2"))
    val byGene = w.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byGene("g1") == (Some(10.5), Some(9.0)))
    assert(byGene("g4") == (None, Some(3.3)))     // sample-unique gene → null
    assert(byGene("g2") == (Some(5.0), None))
  }

  test("Variants: denormalized join, spec filter, region search, summary") {
    val v = new Variants(cat)
    assert(v.dim.count() == 3) // chr1:100, chr1:200, chr2:300
    // rsID rides along on the dim (carry column)
    assert(v.dim.filter($"pos" === 100).select("id").head().getString(0) == "rs1")
    assert(v.dim.filter($"pos" === 200).select("id").head() == org.apache.spark.sql.Row(null))
    // shared variant appears once in dim, twice in bridge
    assert(v.sampleVariants.count() == 4)
    val hits = v.filter(impactSpecs = Seq(FilterSpec("impact", "in",
      Seq("MODERATE", "HIGH"))))
    assert(hits.select("pos").distinct().collect().map(_.getLong(0)).toSet ==
      Set(100L, 200L))
    assert(v.searchRegion("chr1", 1, 150).count() == 2) // chr1:100 × s1,s2
    val s = v.summary.head()
    assert(s.getLong(0) == 2 && s.getLong(1) == 3 && s.getLong(2) == 4)
  }

  test("Variant entity: genotype literal filters") {
    val v = new Variants(cat)
    val shared = Variant("chr1", 100, "A", "T")
    assert(shared.samples(v).count() == 2)
    assert(shared.samples(v, Some("het")).count() == 2) // both 0/1
    assert(shared.samples(v, Some("hom")).count() == 0)
    assert(Variant("chr1", 200, "G", "C").samples(v, Some("hom")).count() == 1)
    // impacts are per-variant (representative sample s1): 2 CSQ rows
    assert(shared.impacts(v, Seq("consequence", "af")).count() == 2)
  }

  test("Junction entity: exact / tolerance / overlap / reciprocal sample match") {
    val j1 = Junction("chr1", 31, 60, "+")
    assert(j1.samples(junctions, filtered = false).count() == 2) // s1, s2
    // tolerance ±5 picks up j2 (33,58) too → 3 bridge rows
    assert(j1.samples(junctions, tolerance5 = 5, tolerance3 = 5,
      filtered = false).count() == 3)
    // overlap >= 0.8 of j1: j1 (1.0), j2 (26/30=.87), j3 (30/30=1.0) → 4 rows
    assert(j1.samples(junctions, overlap = Some(0.8),
      filtered = false).count() == 4)
    // reciprocal: j3 covers j1 fully but j3 is len 41 → 30/41=0.73 < 0.8 → drops j3
    assert(j1.samples(junctions, overlap = Some(0.8), reciprocal = true,
      filtered = false).count() == 3)
  }

  test("Junction entity: genes/transcripts/features against the genome") {
    val j1 = Junction("chr1", 31, 60, "+")
    assert(j1.genes(genome).select("id").head().getString(0) == "g1")
    assert(j1.transcripts(genome).select("id").head().getString(0) == "t1")
    val f = j1.features(genome).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    // both endpoints of j1 fall in t1's intron (31..60)
    assert(f == Set(("start", "intron"), ("end", "intron")))
    val j3 = Junction("chr1", 25, 65, "+")
    val f3 = j3.features(genome).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(f3 == Set(("start", "exon"), ("end", "exon")))
  }

  test("Genome: introns derived from exon gaps; sequence + translation") {
    val in = genome.introns.collect()
    assert(in.length == 2) // one gap per transcript (t1, tm)
    assert(in.forall(r => r.getAs[Long]("start") == 31 &&
      r.getAs[Long]("end") == 60))
    // chr1 = "ACGT"*30 → 1-based [1,4] = ACGT; minus strand = revcomp
    assert(genome.getSequence("chr1", 1, 4) == "ACGT")
    assert(genome.getSequence("chr1", 1, 4, "-") == "ACGT") // revcomp of ACGT
    assert(genome.getSequence("chr2", 1, 5) == "GGCCA")
    assert(genome.translate("ATGGCCTAA") == "MA*")
  }

  test("Genome.introns: abutting/overlapping exons leave no gap row") {
    val c2 = new TableCatalog(spark, tmpDir("gaps"))
    c2.write(Seq(
      ("tx", 1, "chr1", 1L, 30L, "+"),    // abuts next (starts 31)
      ("tx", 2, "chr1", 31L, 60L, "+"),   // overlaps next (starts 50)
      ("tx", 3, "chr1", 50L, 80L, "+"),   // real gap to next
      ("tx", 4, "chr1", 101L, 120L, "+"))
      .toDF("transcript", "rank", "chrom", "start", "end", "strand"), "exons")
    val in = new Genome(c2).introns.collect()
    assert(in.length == 1) // abutting/overlapping pairs emit nothing
    assert(in.head.getAs[Long]("start") == 81L &&
      in.head.getAs[Long]("end") == 100L)
    assert(in.head.getAs[Int]("rank") == 1)
  }

  test("Genome.introns: contained exons don't fake a gap (running max)") {
    val c3 = new TableCatalog(spark, tmpDir("contained"))
    c3.write(Seq(
      ("tx", 1, "chr1", 1L, 100L, "+"),   // spans past the next exon
      ("tx", 2, "chr1", 10L, 20L, "+"),   // fully contained in exon 1
      ("tx", 3, "chr1", 150L, 200L, "+")) // real gap starts after 100
      .toDF("transcript", "rank", "chrom", "start", "end", "strand"), "exons")
    val in = new Genome(c3).introns.collect()
    // pairwise lead(end) would emit [21,149] — exonic bases 21..100
    assert(in.length == 1)
    assert(in.head.getAs[Long]("start") == 101L &&
      in.head.getAs[Long]("end") == 149L)
  }

  test("Junction.newTranscript: flanking-exon truncation + stitch (W3)") {
    val j1 = Junction("chr1", 31, 60, "+")
    val (nuc, aa) = j1.newTranscript(genome, "t1")
    // exons (1,30) + (61,100) survive whole: 30 + 40 = 70 bases
    val chr1 = "ACGT" * 30
    assert(nuc == chr1.substring(0, 30) + chr1.substring(60, 100))
    assert(nuc.length == 70)
    assert(aa == genome.translate(nuc))
    // junction (25,65): left exon truncated at 25, right at 65
    val j3 = Junction("chr1", 25, 65, "+")
    val (nuc3, _) = j3.newTranscript(genome, "t1")
    assert(nuc3 == chr1.substring(0, 25) + chr1.substring(64, 100))
  }

  test("Genome.withSequences: broadcast bulk extraction, strand-aware") {
    val seqs = genome.withSequences(genome.exons)
      .select("transcript", "rank", "seq").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    val chr1 = "ACGT" * 30; val chr2 = "GGCCA" * 24
    assert(seqs(("t1", 1)) == chr1.substring(0, 30))
    assert(seqs(("t1", 2)) == chr1.substring(60, 100))
    assert(seqs(("tm", 1)) == genome.reverseComplement(chr2.substring(0, 30)))
    // out-of-range interval yields null, not an exception
    val bad = genome.withSequences(
      Seq(("chrX", 1L, 5L, "+")).toDF("chrom", "start", "end", "strand"))
    assert(bad.select("seq").head().isNullAt(0))
  }

  test("Genome.withSequencesIndexed == withSequences (index range reads)") {
    val cols = Seq("transcript", "rank", "seq")
    val viaMap = genome.withSequences(genome.exons)
      .select(cols.head, cols.tail: _*).orderBy("transcript", "rank")
      .collect().toSeq
    val viaIndex = genome.withSequencesIndexed(genome.exons)
      .select(cols.head, cols.tail: _*).orderBy("transcript", "rank")
      .collect().toSeq
    assert(viaIndex == viaMap && viaIndex.nonEmpty)
    // unknown chrom / out-of-range yield null, matching the map form
    val bad = genome.withSequencesIndexed(
      Seq(("chrX", 1L, 5L, "+"), ("chr1", 100L, 500L, "+"))
        .toDF("chrom", "start", "end", "strand"))
    assert(bad.select("seq").collect().forall(_.isNullAt(0)))
  }

  test("Junctions.newTranscripts: batch == entity on every fixture pair") {
    val js = Seq(
      ("chr1", 31L, 60L, "+"), ("chr1", 25L, 65L, "+"),
      ("chr2", 31L, 60L, "-"),
      ("chr1", 1L, 100L, "+")) // splices out every exon piece it covers
      .toDF("chrom", "start", "end", "strand")
    val got = junctions.newTranscripts(genome, js)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4)) -> (r.getString(5), r.getString(6))).toMap
    // entity pairing: every junction overlaps exactly its chrom's one
    // transcript; batch must find the same pairs
    assert(got.keySet == Set(
      ("chr1", 31L, 60L, "+", "t1"), ("chr1", 25L, 65L, "+", "t1"),
      ("chr2", 31L, 60L, "-", "tm"), ("chr1", 1L, 100L, "+", "t1")))
    for (((chrom, s, e, strand, txId), batchOut) <- got
         if !(s == 1L && e == 100L)) {
      val entity = Junction(chrom, s, e, strand).newTranscript(genome, txId)
      assert(batchOut == entity, s"pair ($chrom,$s,$e,$strand,$txId)")
    }
    // the all-covering junction splices out every exon: entity returns
    // ("", ""), batch's left join must preserve the pair, not drop it
    val entityWide = Junction("chr1", 1L, 100L, "+").newTranscript(genome, "t1")
    assert(got(("chr1", 1L, 100L, "+", "t1")) == entityWide)
  }

  test("Junction.newTranscript on the minus strand: stitch then revcomp") {
    val jm = Junction("chr2", 31, 60, "-")
    assert(jm.genes(genome).select("id").head().getString(0) == "gm")
    val fm = jm.features(genome).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(fm == Set(("start", "intron"), ("end", "intron")))
    val (nuc, aa) = jm.newTranscript(genome, "tm")
    val chr2 = "GGCCA" * 24
    val plus = chr2.substring(0, 30) + chr2.substring(60, 100)
    assert(nuc == genome.reverseComplement(plus))
    assert(aa == genome.translate(nuc))
  }
}

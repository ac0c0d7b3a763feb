package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.TableCatalog
import graft.query.Junctions
import graft.ranges.Intervals

/** One junction reified as an entity whose methods are parameterized
  * lazy queries (`/root/reference/clinpy/assays/junction.py:133-385`).
  * Where the reference collects candidates and loops in Python
  * (overlap mode, `junction.py:294-318`), every mode here stays a
  * distributed plan.
  */
final case class Junction(chrom: String, start: Long, end: Long,
    strand: String) {

  /** Samples carrying this junction (`junction.py:265-338`).
    *
    * Modes (mutually exclusive, reference semantics):
    *  - exact (default): coordinates equal
    *  - tolerance: start within -tol5, end within +tol3
    *  - overlap(f): overlap fraction >= f; reciprocal requires both
    *    directions
    * Returns matching junction rows joined to their per-sample support.
    */
  def samples(junctions: Junctions, tolerance5: Int = 0, tolerance3: Int = 0,
      overlap: Option[Double] = None, reciprocal: Boolean = false,
      filtered: Boolean = true): DataFrame = {
    val base = junctions.dim(filtered)
      .filter(col("chrom") === chrom && col("strand") === strand)
    val cand = overlap match {
      case Some(f) =>
        val frac12 = Intervals.overlapFraction(lit(start), lit(end),
          col("start"), col("end"))
        val frac21 = Intervals.overlapFraction(col("start"), col("end"),
          lit(start), lit(end))
        val cond = if (reciprocal) frac12 >= f && frac21 >= f else frac12 >= f
        base.filter(Intervals.overlaps(col("start"), col("end"),
          lit(start), lit(end)) && cond)
      case None if tolerance5 > 0 || tolerance3 > 0 =>
        base.filter(Intervals.withinTolerance(col("start"), col("end"),
          lit(start), lit(end), tolerance5, tolerance3))
      case None =>
        base.filter(col("start") === start && col("end") === end)
    }
    cand.join(junctions.bridge(filtered),
      cand("id") === col("junction"), "inner").drop("junction")
  }

  /** Genes whose span contains either endpoint of this junction, same
    * chrom+strand (J6, `junction.py:152-170`). */
  def genes(genome: Genome): DataFrame =
    genome.genes.filter(col("chrom") === chrom && col("strand") === strand &&
      (Intervals.contains(col("start"), col("end"), lit(start)) ||
        Intervals.contains(col("start"), col("end"), lit(end))))

  /** Transcripts overlapping this junction, via their gene
    * (`junction.py:172-227`). */
  def transcripts(genome: Genome): DataFrame =
    genome.transcripts
      .join(genes(genome).select(col("id").as("gene")), Seq("gene"), "left_semi")
      .filter(Intervals.overlaps(col("start"), col("end"), lit(start), lit(end)))

  /** Classify each endpoint of this junction as falling in an exon or an
    * intron of each overlapping transcript (J9, `junction.py:229-263`,
    * with each endpoint classified independently — the reference's
    * `continue` bug fixed per SURVEY §2.10). */
  def features(genome: Genome): DataFrame = {
    val tx = transcripts(genome).select(col("id").as("transcript"))
    val feats = genome.exons
      .select(col("transcript"), col("start"), col("end"),
        lit("exon").as("feature"))
      .unionByName(genome.introns
        .select(col("transcript"), col("start"), col("end"),
          lit("intron").as("feature")))
      .join(tx, Seq("transcript"), "left_semi")
    val classify = (point: Long, label: String) => feats
      .filter(Intervals.contains(col("start"), col("end"), lit(point)))
      .select(col("transcript"), lit(label).as("end_type"),
        col("feature"), col("start"), col("end"))
    classify(start, "start").unionByName(classify(end, "end"))
  }

  /** Hypothetical spliced transcript induced by this junction
    * (`junction.py:342-376`): exons of `transcriptId` with the
    * junction-flanking exons truncated at the junction coordinates
    * (W3 sentinel rewrite), stitched and returned as (nuc, aa).
    * Exon trimming is a tiny per-transcript frame — computed via a plan,
    * sequences stitched on the driver. */
  def newTranscript(genome: Genome, transcriptId: String): (String, String) = {
    val ex = genome.exons.filter(col("transcript") === transcriptId)
      .select("chrom", "strand", "start", "end")
      .orderBy("start").collect()
    require(ex.nonEmpty, s"transcript $transcriptId has no exons")
    val kept = ex.flatMap { r =>
      val (s, e) = (r.getLong(2), r.getLong(3))
      if (e < s) None
      // exon entirely inside the junction's intron: spliced out
      else if (s >= start && e <= end) None
      // left-flank exon truncated at junction start
      else if (s < start && e >= start) Some((s, start))
      // right-flank exon truncated at junction end
      else if (s <= end && e > end) Some((end, e))
      else Some((s, e))
    }
    val chromName = ex.head.getString(0)
    val str = ex.head.getString(1)
    val nuc0 = kept.map { case (s, e) =>
      genome.getSequence(chromName, s, e, "+") }.mkString
    val nuc = if (str == "-") genome.reverseComplement(nuc0) else nuc0
    (nuc, genome.translate(nuc))
  }
}

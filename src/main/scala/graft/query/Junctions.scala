package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.TableCatalog
import graft.ranges.Intervals

/** Table-level junction queries
  * (`/root/reference/clinpy/assays/junction.py:14-130`).
  *
  * Every method returns an unexecuted DataFrame (the reference's lazy
  * SQLAlchemy Select, kept lazy all the way to the caller's action).
  */
final class Junctions(catalog: TableCatalog, project: Project) {

  def dim(filtered: Boolean = true): DataFrame =
    catalog.read(catalog.junctionTable(filtered))

  def bridge(filtered: Boolean = true): DataFrame =
    catalog.read(catalog.junctionBridge(filtered))

  /** Typed views of the fixed-schema cores (SURVEY §1.5). */
  def dimTyped(filtered: Boolean = true): org.apache.spark.sql.Dataset[graft.model.Rows.JunctionRow] = {
    val spark = catalog.spark
    import spark.implicits._
    dim(filtered).select("id", "chrom", "start", "end", "strand")
      .as[graft.model.Rows.JunctionRow]
  }

  def bridgeTyped(filtered: Boolean = true): org.apache.spark.sql.Dataset[graft.model.Rows.JunctionSupport] = {
    val spark = catalog.spark
    import spark.implicits._
    bridge(filtered)
      .select("samplename", "junction", "uniq_map", "multi_map")
      .as[graft.model.Rows.JunctionSupport]
  }

  /** `Junctions.select` (`junction.py:14-72`): junction coordinates,
    * optionally with per-sample read support, restricted by cohort and/or
    * sample list via chained semi-joins (J1/J10). */
  def select(cohorts: Seq[String] = Nil, samples: Seq[String] = Nil,
      uniq: Boolean = false, filtered: Boolean = true): DataFrame = {
    val j = dim(filtered)
    if (uniq) {
      // junctions only — membership via semi-joins on the bridge
      var ids = bridge(filtered)
      if (samples.nonEmpty)
        ids = ids.filter(col("samplename").isin(samples: _*))
      if (cohorts.nonEmpty) {
        val coh = project.samples(cohorts, expandMeta = false)
          .select(col("sample_id").as("samplename"))
        ids = ids.join(broadcast(coh), Seq("samplename"), "left_semi")
      }
      if (samples.isEmpty && cohorts.isEmpty) j
      else j.join(ids.select(col("junction").as("id")), Seq("id"), "left_semi")
    } else {
      var b = bridge(filtered)
      if (samples.nonEmpty)
        b = b.filter(col("samplename").isin(samples: _*))
      if (cohorts.nonEmpty) {
        val coh = project.samples(cohorts, expandMeta = false)
          .select(col("sample_id").as("samplename"))
        b = b.join(broadcast(coh), Seq("samplename"), "left_semi")
      }
      j.join(b, j("id") === b("junction"), "inner").drop("junction")
    }
  }

  /** Region search (`junction.py:74-111`): junctions overlapping
    * [start, end] on chrom (+strand), optionally with read support.
    * chrom partition pruning + min/max stats make this a localized scan. */
  def search(chrom: String, start: Long, end: Long,
      strand: Option[String] = None, uniq: Boolean = false,
      filtered: Boolean = true): DataFrame = {
    var j = dim(filtered).filter(col("chrom") === chrom &&
      Intervals.overlaps(col("start"), col("end"), lit(start), lit(end)))
    strand.foreach(s => j = j.filter(col("strand") === s))
    if (uniq) j
    else j.join(bridge(filtered),
      j("id") === col("junction"), "inner").drop("junction")
  }

  /** Bulk region search: join the junction dim against a whole frame of
    * (chrom, start, end) query regions at once via the binned range join
    * — the scale path when there are thousands of regions (a per-region
    * loop over [[search]] would launch one job each). Output: region
    * columns + matching junction rows. */
  def searchRegions(regions: DataFrame, filtered: Boolean = true): DataFrame = {
    val j = dim(filtered).withColumnRenamed("start", "j_start")
      .withColumnRenamed("end", "j_end")
    val clash = regions.columns.toSet.intersect(j.columns.toSet) - "chrom"
    require(clash.isEmpty,
      s"searchRegions: region columns collide with junction columns " +
        s"(${clash.mkString(", ")}) — rename them first")
    graft.ranges.RangeJoin.overlapJoin(
      regions, j, keys = Seq("chrom"),
      "start", "end", "j_start", "j_end")
  }

  /** Bulk endpoint classification (J9 at corpus scale): every junction's
    * start/end tested for exon/intron membership across ALL transcripts
    * in one binned containment join — the whole-corpus form of
    * `Junction.features`, which classifies one entity. Output:
    * (id, chrom, strand, end_type, p, transcript, feature). */
  def classifyEndpoints(genome: graft.model.Genome,
      filtered: Boolean = true): DataFrame = {
    val endpoints = dim(filtered).select(col("id"), col("chrom"),
        col("strand"),
        explode(array(
          struct(lit("start").as("end_type"), col("start").as("p")),
          struct(lit("end").as("end_type"), col("end").as("p")))).as("e"))
      .select(col("id"), col("chrom"), col("strand"),
        col("e.end_type"), col("e.p"))
    val feats = genome.exons
      .select(col("transcript"), col("chrom"), col("strand"),
        col("start").as("f_start"), col("end").as("f_end"),
        lit("exon").as("feature"))
      .unionByName(genome.introns
        .select(col("transcript"), col("chrom"), col("strand"),
          col("start").as("f_start"), col("end").as("f_end"),
          lit("intron").as("feature")))
    graft.ranges.RangeJoin.containmentJoin(endpoints, feats,
      Seq("chrom", "strand"), "p", "f_start", "f_end")
      .select("id", "chrom", "strand", "end_type", "p", "transcript",
        "feature")
  }

  /** Corpus-scale form of [[graft.model.Junction.newTranscript]]
    * (`junction.py:342-376`): for EVERY (junction, overlapping
    * transcript) pair in one plan, the hypothetical spliced transcript
    * the junction induces — exons fully inside the junction spliced
    * out, flanking exons truncated at the junction coordinates, pieces
    * stitched in exon order, minus strand reverse-complemented, then
    * translated. The entity method stays for the one-junction case;
    * this is what a cohort-wide novel-splice screen runs.
    *
    * `junctions` needs (chrom, start, end, strand). Pairing matches the
    * entity chain exactly: genes whose span contains either junction
    * endpoint (same chrom+strand, binned containment join), their
    * transcripts overlapping the junction. Sequence extraction is the
    * broadcast-FASTA executor path ([[graft.model.Genome.withSequences]];
    * intervals outside the FASTA contribute nothing, where the
    * fail-fast entity throws); stitching is one groupBy over the
    * trimmed exon pieces. Output: (chrom, start, end, strand,
    * transcript, nuc, aa) — one row per pair, `nuc = ""` when every
    * exon is spliced out. */
  def newTranscripts(genome: graft.model.Genome,
      junctions: DataFrame): DataFrame = {
    val j = junctions.select(col("chrom"), col("strand"),
      col("start").as("j_start"), col("end").as("j_end")).distinct()
    val endpoints = j.select(col("chrom"), col("strand"), col("j_start"),
      col("j_end"), explode(array(col("j_start"), col("j_end"))).as("p"))
    val genes = genome.genes.select(col("id").as("gene"), col("chrom"),
      col("strand"), col("start").as("g_start"), col("end").as("g_end"))
    val jGenes = graft.ranges.RangeJoin.containmentJoin(endpoints, genes,
        Seq("chrom", "strand"), "p", "g_start", "g_end")
      .select("chrom", "strand", "j_start", "j_end", "gene").distinct()
    val tx = genome.transcripts.select(col("id").as("transcript"),
      col("gene"), col("start").as("t_start"), col("end").as("t_end"))
    val pairs = jGenes.join(tx, Seq("gene"))
      .filter(Intervals.overlaps(col("t_start"), col("t_end"),
        col("j_start"), col("j_end")))
      .select("chrom", "strand", "j_start", "j_end", "transcript").distinct()

    // entity trim rules, same branch order (Junction.newTranscript)
    val ex = genome.exons.select(col("transcript"),
      col("start").as("e_start"), col("end").as("e_end"))
    val leftFlank =
      col("e_start") < col("j_start") && col("e_end") >= col("j_start")
    val rightFlank =
      col("e_start") <= col("j_end") && col("e_end") > col("j_end")
    val trimmed = pairs.join(ex, Seq("transcript"))
      .filter(col("e_end") >= col("e_start"))
      .filter(!(col("e_start") >= col("j_start") &&
        col("e_end") <= col("j_end"))) // spliced out
      .withColumn("k_start",
        when(leftFlank, col("e_start"))
          .when(rightFlank, col("j_end")).otherwise(col("e_start")))
      .withColumn("k_end",
        when(leftFlank, col("j_start"))
          .when(rightFlank, col("e_end")).otherwise(col("e_end")))
    val withSeq = genome.withSequences(
      trimmed.withColumn("__plus", lit("+")),
      chromCol = "chrom", startCol = "k_start", endCol = "k_end",
      strandCol = "__plus", out = "__seq")
    val stitched = withSeq
      .groupBy("chrom", "strand", "j_start", "j_end", "transcript")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("e_start"), col("__seq")))),
        x => x.getField("__seq")), "").as("__nuc0"))
    val finish = udf { (nuc0: String, strand: String) =>
      val nuc = if (strand == "-")
        graft.model.Genome.reverseComplement(nuc0) else nuc0
      val aa = nuc.toUpperCase.grouped(3).takeWhile(_.length == 3)
        .map(c => graft.model.Genome.CodonTable.getOrElse(c, 'X')).mkString
      (nuc, aa)
    }
    pairs
      .join(stitched,
        Seq("chrom", "strand", "j_start", "j_end", "transcript"), "left")
      .withColumn("__r", finish(coalesce(col("__nuc0"), lit("")), col("strand")))
      .select(col("chrom"), col("j_start").as("start"),
        col("j_end").as("end"), col("strand"), col("transcript"),
        col("__r._1").as("nuc"), col("__r._2").as("aa"))
  }

  /** Reify query results as entity objects (the reference's
    * `df=False` mode, `junction.py:63-72` — returning the full list, not
    * just the first row as the buggy original did). Driver-side by
    * nature; intended for small result sets. */
  def toEntities(df: org.apache.spark.sql.DataFrame): Seq[graft.model.Junction] =
    df.select("chrom", "start", "end", "strand").distinct()
      .collect().toSeq.map(r => graft.model.Junction(
        r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))

  /** E10: per-sample user-defined junction filter — the reference's
    * planned `filter_junctions` surface (`junction.py:113-130`,
    * readme:109-111). Applies `f` to the (dim ⋈ bridge) rows of each
    * sample and writes the kept junction ids as the filtered pair of
    * tables. `f` is an ordinary DataFrame transform. */
  def filterJunctions(f: DataFrame => DataFrame, overwrite: Boolean): Unit = {
    val all = select(filtered = false)
    val kept = f(all)
    val keptDim = dim(filtered = false)
      .join(kept.select(col("id")).distinct(), Seq("id"), "left_semi")
    // per-sample semantics: only the (junction, sample) pairs that passed
    val keptBridge = bridge(filtered = false)
      .join(kept.select(col("id").as("junction"), col("samplename")).distinct(),
        Seq("junction", "samplename"), "left_semi")
    val mode = if (overwrite) org.apache.spark.sql.SaveMode.Overwrite
      else org.apache.spark.sql.SaveMode.ErrorIfExists
    catalog.write(keptDim, catalog.junctionTable(true), Seq("chrom"), mode)
    catalog.write(keptBridge, catalog.junctionBridge(true), Nil, mode)
  }
}

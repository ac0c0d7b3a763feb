package graft.model

/** Case-class row models for the fixed-schema cores (SURVEY §1.5: typed
  * `Dataset[T]` where the schema is stable, `DataFrame` where it is
  * config-driven). The dynamic tables (samples, variant impacts,
  * sample_variants FORMAT columns) intentionally stay DataFrames. */
object Rows {

  final case class JunctionRow(id: Long, chrom: String, start: Long,
      end: Long, strand: String)

  final case class JunctionSupport(samplename: String, junction: Long,
      uniq_map: Long, multi_map: Long)

  final case class GeneExpressionRow(gene: String, samplename: String,
      expected_count: Double, tpm: Double, fpkm: Double)

  final case class TranscriptExpressionRow(transcript: String,
      samplename: String, expected_count: Double, tpm: Double,
      fpkm: Double, isopct: Double)

  final case class VariantRow(variant_id: Long, chrom: String, pos: Long,
      id: Option[String], ref: String, alt: String)
}

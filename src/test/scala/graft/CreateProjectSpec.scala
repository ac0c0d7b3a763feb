package graft

import graft.core.{ProjectConfig, TableCatalog}
import graft.query.{Junctions, Project, Variants}
import graft.tools.CreateProject

/** The reference's ingestion entry point end to end from a YAML config. */
class CreateProjectSpec extends SparkSpecBase {

  private def writeConfig(warehouse: String): String = {
    val f = (n: String) => fixture(n)
    val yaml =
      s"""project:
         |  name: fixture-project
         |  db: $warehouse
         |sample_meta:
         |  file: ${f("sample_meta.tsv")}
         |  columns: [sex, age, sample_meta]
         |modalities:
         |  rna:
         |    junctions:
         |      min_junction_reads: 10
         |      filtered: false
         |      manifest:
         |        s1: ${f("s1.SJ.out.tab")}
         |        s2: ${f("s2.SJ.out.tab")}
         |        s3: ${f("s3.SJ.out.tab")}
         |    expression:
         |      genes:
         |        s1: ${f("s1.genes.results")}
         |        s2: ${f("s2.genes.results")}
         |      isoforms:
         |        s1: ${f("s1.isoforms.results")}
         |  snps:
         |    vcf:
         |      policy: union
         |      format_keys: [GT, DP]
         |      fields:
         |        consequence: str
         |        impact: str
         |        gene: str
         |        af: float
         |        canonical: bool
         |      manifest:
         |        s1: ${f("s1.vcf")}
         |        s2: ${f("s2.vcf")}
         |  rna_snps:
         |    vcf:
         |      policy: intersection
         |      format_keys: [GT]
         |      fields:
         |        consequence: str
         |        af: float
         |      manifest:
         |        s1: ${f("s1.vcf")}
         |""".stripMargin
    val p = java.nio.file.Files.createTempFile("graft-cfg", ".yaml")
    java.nio.file.Files.writeString(p, yaml)
    p.toString
  }

  test("CreateProject builds the full warehouse from YAML, idempotently") {
    val warehouse = tmpDir("cp")
    val cfgPath = writeConfig(warehouse)
    val cfg = ProjectConfig.load(cfgPath)
    assert(cfg.string("project", "name").contains("fixture-project"))
    assert(cfg.int("modalities", "rna", "junctions", "min_junction_reads")
      .contains(10))

    CreateProject.run(spark, cfg)
    val cat = new TableCatalog(spark, warehouse)
    val project = new Project(cat)
    val junctions = new Junctions(cat, project)
    val variants = new Variants(cat)

    assert(project.samplesTable.count() == 3)
    assert(junctions.dim(filtered = false).count() == 4)
    assert(junctions.bridge(filtered = false).count() == 5)
    assert(cat.read("gene_expression").count() == 5)
    assert(cat.read("transcript_expression").count() == 2)
    assert(variants.dim.count() == 3)
    assert(variants.sampleVariants.count() == 4)

    // rna family lives under the prefix matrix, independent of dna
    val rnaVariants = new Variants(cat, rna = true)
    assert(cat.exists("rna_variants"))
    assert(rnaVariants.dim.count() == 2)          // s1's two variants
    assert(rnaVariants.sampleVariants.count() == 2)
    assert(rnaVariants.impacts.columns.contains("consequence"))

    // re-run: everything idempotent, nothing duplicated
    CreateProject.run(spark, cfg)
    assert(junctions.dim(filtered = false).count() == 4)
    assert(junctions.bridge(filtered = false).count() == 5)
    assert(variants.dim.count() == 3)
    assert(variants.sampleVariants.count() == 4)
  }
}

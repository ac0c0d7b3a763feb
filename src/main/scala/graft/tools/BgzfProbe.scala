package graft.tools

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.sources.{Bgzf, Tabix}

/** Compressed-VCF scale probe: generates one synthetic coordinate-sorted
  * VCF, writes it as plain gzip AND as BGZF (+tabix index), then times
  * the three read paths the source plans — single-stream gzip, parallel
  * BGZF splits, and index-pruned region queries. `runMain
  * graft.tools.BgzfProbe [rows]` (default 2M rows ≈ 150 MB raw). */
object BgzfProbe {

  private def time[T](name: String)(f: => T): Unit = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    // fail BEFORE minutes of generation: positions are i*50 per chrom and
    // must stay inside the tabix coordinate space
    require(rows / 25 * 50 <= (1L << 29),
      s"$rows rows would exceed the tabix 2^29 coordinate ceiling")
    val spark = GraftSession.local()

    val dir = java.nio.file.Files.createTempDirectory("graft_bgzfprobe")
    val bgzPath = s"$dir/probe.vcf.bgz"
    val gzPath = s"$dir/probe.vcf.gz"
    val chroms = 25
    val perChrom = (rows / chroms).toInt

    val t0 = System.nanoTime()
    val bgzOut = new FileOutputStream(bgzPath)
    val gzOut = new GZIPOutputStream(new FileOutputStream(gzPath), 1 << 16)
    val block = new java.io.ByteArrayOutputStream(1 << 16)
    def flushBlock(): Unit =
      if (block.size() > 0) {
        val b = block.toByteArray
        Bgzf.writeBlock(bgzOut, b, 0, b.length)
        block.reset()
      }
    def line(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (block.size() + b.length > 60000) flushBlock()
      block.write(b)
      gzOut.write(b)
    }
    line("##fileformat=VCFv4.2\n")
    line("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    for (c <- 1 to chroms; i <- 1 to perChrom) {
      val pad = "ANN=csq" + ("x" * (i % 40))
      line(s"chr$c\t${i * 50}\trs${c}_$i\tACGT\tA\t50\tPASS\t$pad\tGT\t0/1\n")
    }
    flushBlock()
    bgzOut.write(Bgzf.EofBlock)
    bgzOut.close()
    gzOut.close()
    Tabix.buildForVcf(new org.apache.hadoop.fs.Path(bgzPath),
      spark.sessionState.newHadoopConf())
    val bgzLen = new java.io.File(bgzPath).length()
    println(f"[probe] generated ${chroms * perChrom} records, bgzf " +
      f"${bgzLen / 1e6}%.1f MB, gen ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // synthetic text compresses ~12:1, so size splits to the FILE (≈2
    // per core) — the default 128 MiB split is tuned for cohort-scale
    // files, not a probe fixture
    spark.conf.set("spark.graft.vcf.splitbytes",
      math.max(65536L, bgzLen / 64).toString)
    def vcf(p: String) = spark.read.format("vcf").load(p)
    println(s"[probe] gzip partitions=${vcf(gzPath).rdd.getNumPartitions} " +
      s"bgzf partitions=${vcf(bgzPath).rdd.getNumPartitions}")

    time("gzip_single_stream")(vcf(gzPath).count())
    time("bgzf_split_read")(vcf(bgzPath).count())
    time("bgzf_split_agg")(vcf(bgzPath)
      .groupBy("chrom").agg(max("pos")).count())
    val mid = perChrom / 2 * 50L
    val region = vcf(bgzPath).filter(col("chrom") === "chr13" &&
      col("pos") >= mid && col("pos") <= mid + 50000L)
    time("tabix_region_query")(region.count())
    println(s"[probe] region partitions=${region.rdd.getNumPartitions}")

    spark.stop()
  }
}

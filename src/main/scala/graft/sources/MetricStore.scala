package graft.sources

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.ReTag

/** The reference's storage container: a zip of parquet files (one per
  * metric, optionally under directory prefixes) plus a YAML re-tag mapping
  * (`MetricStore` + `process_file`, metricstore.rs:29-102,548-568).
  *
  * Spark-first shape: the zip is unpacked once (driver-side, IO-bound — at
  * real scale the store would be a parquet *directory tree*, which
  * [[TsIngest]] reads directly; the zip path exists for drop-in parity with
  * the reference's artifacts), then every member is classified by TsIngest
  * and the per-metric long DataFrames are unioned lazily — Catalyst sees one
  * plan over all members, so selector pushdown still prunes per-file.
  *
  * Mapping semantics (metricstore.rs:74-102, 648-659): a member
  * `dir/metric.parquet` has prefix `dir` (or `__root__` at the top level);
  * members whose prefix has no mapping entry are skipped; the mapping's tags
  * become fixed labels; the metric base name is the legalized file stem.
  */
object MetricStore {

  final case class Member(prefix: String, metricName: String, file: File)

  /** Unpack the archive to a temp dir and classify member names. */
  def unpack(zipPath: String): Seq[Member] = {
    val outDir = Files.createTempDirectory("graft_metricstore").toFile
    val zis = new ZipInputStream(new FileInputStream(zipPath))
    val members = Iterator.continually(zis.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .map { entry =>
        val target = new File(outDir, entry.getName.replace('/', '_'))
        val os = new FileOutputStream(target)
        zis.transferTo(os)
        os.close()
        val (prefix, stem) = splitAndClean(entry.getName)
        Member(prefix, stem, target)
      }.toList
    zis.close()
    members
  }

  /** `split_and_clean` (metricstore.rs:648-659). */
  def splitAndClean(name: String): (String, String) = {
    val idx = name.lastIndexOf('/')
    val (prefix, suffix) = if (idx < 0) ("__root__", name) else (name.substring(0, idx), name.substring(idx + 1))
    (prefix, TsIngest.cleanMetricName(suffix))
  }

  /** `process_file` (metricstore.rs:548-568): zip + YAML mapping → one long
    * collection DataFrame. Members without a mapping entry are skipped, and
    * members that fail classification are skipped with a warning, like the
    * reference's per-metric error handling (metricstore.rs:556-565).
    *
    * `dedup = false` skips the per-(series, ts) averaging groupBy — the ONE
    * shuffle in the ingest path. Use it for stores whose members are already
    * one row per (series, ts) (e.g. produced by [[TsSink]] or any curated
    * archive): at 100 TB that shuffle re-partitions the whole store on every
    * open for no effect. The default stays defensive (raw exports carry
    * duplicate samples; non-monotonic series break range semantics). */
  def processFile(spark: SparkSession, zipPath: String, yamlPath: String,
                  dedup: Boolean = true): DataFrame =
    processFileWithMapping(spark, zipPath,
      ReTag.parse(Files.readString(new File(yamlPath).toPath)).mapping, dedup)

  def processFileWithMapping(spark: SparkSession, zipPath: String,
                             mapping: Map[String, Map[String, String]],
                             dedup: Boolean = true): DataFrame = {
    val frames = unpack(zipPath).flatMap { m =>
      mapping.get(m.prefix) match {
        case None =>
          System.err.println(s"Skipping ${m.file.getName}, no match")
          None
        case Some(tags) =>
          try Some(TsIngest.read(spark, m.file.getAbsolutePath,
            TsIngest.IngestOptions(metricName = Some(m.metricName), fixedLabels = tags,
              dedup = dedup)))
          catch {
            case e: Exception =>
              System.err.println(s"Failed to process ${m.file.getName}: ${e.getMessage}")
              None
          }
      }
    }
    require(frames.nonEmpty, "no ingestable members in archive")
    frames.reduce(_ unionByName _)
  }

  /** Engine facade over an archive, ready for PromQL. */
  def open(spark: SparkSession, zipPath: String, yamlPath: String,
           dedup: Boolean = true): graft.PromEngine =
    new graft.PromEngine(processFile(spark, zipPath, yamlPath, dedup))
}

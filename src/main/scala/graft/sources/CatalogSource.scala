package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The catalog-ingest seam (SURVEY.md §2.1): the reference reads
  * survey catalogs through pluggable dataset wrappers (heinlein /
  * opencosmo HDF5, /root/reference/src/cosmap/dataset/opencosmo.py);
  * here any columnar format that can yield a DataFrame plugs in by
  * implementing this trait and registering.
  *
  * Parquet is the production path (the test corpus's format). HDF5
  * registers as an explicit unsupported stub: Spark ships no HDF5
  * DataSource and this environment has no HDF5 libs — the documented
  * route is a one-time conversion to Parquet, or dropping a
  * DataSourceV2 implementation in here.
  */
trait CatalogSource {
  def format: String
  def load(spark: SparkSession, path: String, columns: Seq[String] = Nil): DataFrame
}

object ParquetCatalogSource extends CatalogSource {
  val format = "parquet"
  def load(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    // dataset_columns projection (opencosmo.py:22-24): applied at the
    // source so Catalyst prunes the scan's ReadSchema
    if (columns.isEmpty) df else df.select(columns.map(org.apache.spark.sql.functions.col): _*)
  }
}

object Hdf5CatalogSource extends CatalogSource {
  val format = "hdf5"

  /** Where `tools/hdf5_to_parquet.py <path> <here>` conventionally
    * lands: `catalog.hdf5` → `catalog.parquet` beside it (file or
    * multi-part directory), or `shards/` → `shards.parquet`. */
  private[sources] def convertedSibling(path: String): Option[java.nio.file.Path] = {
    val raw = path.stripSuffix("/")
    val base = if (raw.endsWith(".hdf5")) raw.dropRight(5) else raw
    Seq(base + ".parquet", raw + ".parquet")
      .map(java.nio.file.Paths.get(_)).distinct
      .find(java.nio.file.Files.exists(_))
  }

  /** A reference user pointing at `.hdf5` data gets a WORKING load if
    * the one-time conversion has been run with the conventional
    * output location — the seam resolves the converted sibling
    * transparently (and logs that it did). Only when no conversion
    * exists does it raise the actionable error. */
  def load(spark: SparkSession, path: String, columns: Seq[String]): DataFrame =
    convertedSibling(path) match {
      case Some(pq) =>
        Console.err.println(
          s"[graft.sources] hdf5 source: resolving converted dataset $pq for $path")
        ParquetCatalogSource.load(spark, pq.toString, columns)
      case None => throw new UnsupportedOperationException(
      "HDF5 ingest is not available in this build: convert to Parquet " +
        "once with `python3 tools/hdf5_to_parquet.py <in.hdf5> <out.parquet> " +
        "[--group /catalog]` (each 1-D dataset under the group becomes a " +
        "column; attributes land in parquet metadata) — a DIRECTORY of " +
        ".hdf5 shards converts the same way (`... <dir_in>/ <dir_out>/`, " +
        "mirroring the reference's identify_opencosmo_files glob) into one " +
        "multi-part parquet dataset — then load the result with the parquet " +
        "source (this seam auto-resolves a converted sibling named " +
        "<path-minus-.hdf5>.parquet), or register a DataSourceV2 " +
        "implementation here. The engine's query surface is " +
        "format-agnostic beyond this seam.")
    }
}

/** Text/columnar formats Spark reads natively, registered behind the
  * same seam so the ingest surface matches the sink registry
  * (Sinks.write: csv/parquet/json/orc). CSV/JSON load with
  * header/schema inference — fine for catalog ingest; production
  * callers pass an explicit schema via the parquet conversion path. */
final class SparkFormatCatalogSource(val format: String) extends CatalogSource {
  def load(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val reader = spark.read
    val df = format match {
      case "csv" => reader.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" => reader.json(path)
      case "orc" => reader.orc(path)
      case other => throw new IllegalArgumentException(s"unsupported format $other")
    }
    if (columns.isEmpty) df else df.select(columns.map(org.apache.spark.sql.functions.col): _*)
  }
}

object CatalogSources {
  private val registry: Map[String, CatalogSource] =
    (Seq(ParquetCatalogSource, Hdf5CatalogSource) ++
      Seq("csv", "json", "orc").map(new SparkFormatCatalogSource(_)))
      .map(s => s.format -> s).toMap

  def apply(format: String): CatalogSource =
    registry.getOrElse(format, throw new IllegalArgumentException(
      s"unknown catalog format '$format' (known: ${registry.keys.mkString(", ")})"))
}

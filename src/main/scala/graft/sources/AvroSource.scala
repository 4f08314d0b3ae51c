package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Avro read/write — the remaining common interchange format in ingest
  * fleets next to parquet/ORC/CSV/JSONL (Kafka pipelines and schema-
  * registry shops hand batches over as Avro container files). Spark 4
  * ships the Avro connector in spark-sql itself (`format("avro")`).
  *
  * Scan contracts differ from the columnar sources by FORMAT nature, not
  * by wiring: Avro is row-major, so there is no row-group statistics
  * pushdown — but schema pruning still applies (the reader deserializes
  * only requiredSchema fields, skipping the rest of each record), which
  * is the part that matters for wide-table ingest: a 3-column projection
  * over a 200-column Avro feed decodes 3 fields per record, not 200.
  * AvroSourceSpec audits ReadSchema pruning and operator parity the same
  * way OrcSourceSpec does for ORC.
  */
object AvroSource {

  /** The distribution on this machine ships the Avro classes inside
    * spark-sql but without the DataSourceRegister service entry, so the
    * short name "avro" doesn't resolve — the fully-qualified FileFormat
    * class is the stable spelling either way.
    */
  private val Fmt = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(Fmt).save(path)

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(Fmt).load(path)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Delimited/JSON-lines at-rest formats (SURVEY.md §2.1 S11 extension) —
  * the interchange formats a landing pipeline meets besides parquet.
  *
  * Scale rules encoded here:
  *   - ALWAYS pass an explicit schema on read. Schema inference is a
  *     full extra pass over the data (and for JSON a type-union merge)
  *     before the real job starts — a 2× read at 100 TB.
  *   - CSV/JSON are row formats with no column pruning or predicate
  *     pushdown (multiline CSV is not even splittable) — land them into
  *     parquet once ([[ParquetSink]]) and query the parquet; these
  *     readers are for the ingest hop only.
  *   - `columnNameOfCorruptRecord` + PERMISSIVE routes malformed rows to
  *     a column instead of failing the job (the D7 batch-side analogue).
  */
object TextFormats {

  /** Schema'd CSV read; malformed rows land in `_corrupt_record`. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Schema'd JSON-lines read; malformed rows land in `_corrupt_record`. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

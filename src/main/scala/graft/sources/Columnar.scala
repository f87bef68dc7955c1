package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** ORC and typed-CSV source adapters — the remaining interchange
  * formats a corpus pipeline meets in the wild (warehouse exports,
  * labeling-vendor deliveries). Parquet/Arrow IPC stay the engine-
  * native layouts (SURVEY §2 S2-S4); these adapters carry the same
  * contracts onto the other formats:
  *
  *   - reads take an EXPLICIT schema (the Jsonl rule: at 100 TB,
  *     inference is an extra full pass and can widen types on skew);
  *   - CSV is TEXT — binary, array, map, and struct columns do not
  *     survive it, so [[writeCsv]] REFUSES them loudly instead of
  *     silently stringifying (the reference's serializer raises on
  *     unsupported object columns the same way, io.pyx ObjectDType);
  *   - CSV null vs empty-string is pinned: `nullValue = "\\u0000"`-free
  *     explicit marker `__NULL__` on both sides, so "" round-trips as
  *     the empty string and NULL as NULL (the default CSV conflation
  *     is a classic silent corruption);
  *   - ORC round-trips every Spark type natively; it gets the same
  *     explicit-schema read for partition-spanning consistency.
  *
  * Scale shape: both writers stream per task (no driver funnel); ORC
  * carries predicate pushdown (SourcesSpec pins the pushed filter),
  * CSV does not — the spec documents that asymmetry deliberately.
  */
object Columnar {

  private val NullMarker = "__NULL__"

  private def csvUnsupported(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => true
    case _ => false
  }

  /** Write `df` as ORC under `outDir` (overwrite). */
  def writeOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").orc(outDir)

  /** Read ORC with an explicit schema. */
  def readOrc(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  /** Write `df` as headered CSV under `outDir` (overwrite). Refuses
    * nested/binary columns — CSV cannot represent them losslessly. */
  def writeCsv(df: DataFrame, outDir: String): Unit = {
    val bad = df.schema.fields.filter(f => csvUnsupported(f.dataType))
    require(bad.isEmpty,
      s"CSV cannot carry ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}")
        .mkString(", ")} losslessly; export these columns via parquet/" +
        s"ORC/JSONL or drop them first")
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", NullMarker)
      .csv(outDir)
  }

  /** Read headered CSV with an explicit schema and the pinned null
    * marker — "" comes back as the empty string, NULL as NULL. */
  def readCsv(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", NullMarker)
      .csv(dir)
}

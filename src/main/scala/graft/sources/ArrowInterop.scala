package graft.sources

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC interop (reference S4: to_arrow/from_arrow,
  * medvedi/dataframe.py:1050-1066). The reference converts one in-memory
  * frame; the Spark-native equivalent is a *distributed* Arrow dataset:
  * each partition writes/reads its own IPC file, so a 1000-executor
  * cluster moves data to an Arrow consumer (ML featurizers, Polars/pandas
  * shards, C++ readers) with zero driver involvement. Single-file frames
  * are just the 1-partition case.
  *
  * Covers the reference's column dtype surface (SURVEY.md §1.3): ints,
  * floats, bool, string, binary, microsecond UTC timestamps. Nulls
  * round-trip through Arrow validity bitmaps.
  */
object ArrowInterop {

  private val TsUtc = new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")

  def toArrowType(dt: DataType): ArrowType = dt match {
    case LongType      => new ArrowType.Int(64, true)
    case IntegerType   => new ArrowType.Int(32, true)
    case ShortType     => new ArrowType.Int(16, true)
    case ByteType      => new ArrowType.Int(8, true)
    case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case StringType    => ArrowType.Utf8.INSTANCE
    case BinaryType    => ArrowType.Binary.INSTANCE
    case BooleanType   => ArrowType.Bool.INSTANCE
    case TimestampType => TsUtc
    case _: DayTimeIntervalType => new ArrowType.Duration(TimeUnit.MICROSECOND)
    case other => throw new IllegalArgumentException(s"unsupported Arrow dtype $other")
  }

  def fromArrowType(t: ArrowType): DataType = t match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case i: ArrowType.Int if i.getBitWidth == 16 => ShortType
    case i: ArrowType.Int if i.getBitWidth == 8  => ByteType
    case f: ArrowType.FloatingPoint if f.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case f: ArrowType.FloatingPoint if f.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8   => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Bool   => BooleanType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Duration  => DayTimeIntervalType()
    case other => throw new IllegalArgumentException(s"unsupported Arrow type $other")
  }

  def toArrowSchema(schema: StructType): Schema =
    new Schema(schema.fields.map { f =>
      new Field(f.name, new FieldType(f.nullable, toArrowType(f.dataType), null),
        Collections.emptyList[Field]())
    }.toList.asJava)

  def toSparkSchema(schema: Schema): StructType =
    StructType(schema.getFields.asScala.map { f =>
      StructField(f.getName, fromArrowType(f.getType), f.isNullable)
    }.toArray)

  private def setCell(v: FieldVector, i: Int, value: Any): Unit = value match {
    case null => v match {
      case x: BaseFixedWidthVector    => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
      case other => throw new IllegalArgumentException(s"null into ${other.getClass}")
    }
    case x: Long    => v.asInstanceOf[BigIntVector].setSafe(i, x)
    case x: Int     => v.asInstanceOf[IntVector].setSafe(i, x)
    case x: Short   => v.asInstanceOf[SmallIntVector].setSafe(i, x)
    case x: Byte    => v.asInstanceOf[TinyIntVector].setSafe(i, x)
    case x: Double  => v.asInstanceOf[Float8Vector].setSafe(i, x)
    case x: Float   => v.asInstanceOf[Float4Vector].setSafe(i, x)
    case x: String  => v.asInstanceOf[VarCharVector].setSafe(i, x.getBytes("UTF-8"))
    case x: Array[Byte] => v.asInstanceOf[VarBinaryVector].setSafe(i, x)
    case x: Boolean => v.asInstanceOf[BitVector].setSafe(i, if (x) 1 else 0)
    case x: java.sql.Timestamp =>
      val micros = x.getTime * 1000L + (x.getNanos % 1000000) / 1000L
      v.asInstanceOf[TimeStampMicroTZVector].setSafe(i, micros)
    case x: java.time.Duration =>
      v.asInstanceOf[DurationVector]
        .setSafe(i, x.getSeconds * 1000000L + x.getNano / 1000L)
    case other => throw new IllegalArgumentException(s"cell $other")
  }

  private def getCell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector   => x.get(i)
      case x: IntVector      => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: TinyIntVector  => x.get(i)
      case x: Float8Vector   => x.get(i)
      case x: Float4Vector   => x.get(i)
      case x: VarCharVector  => new String(x.get(i), "UTF-8")
      case x: VarBinaryVector => x.get(i)
      case x: BitVector      => x.get(i) == 1
      case x: TimeStampMicroTZVector =>
        val micros = x.get(i)
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case x: DurationVector => x.getObject(i) // java.time.Duration
      case other => throw new IllegalArgumentException(s"vector ${other.getClass}")
    }

  /** Write one Arrow IPC file per partition under `dir` — the distributed
    * sink. `batchRows` bounds the per-record-batch memory. */
  def writeIpc(df: DataFrame, dir: String, batchRows: Int = 4096): Unit = {
    new File(dir).mkdirs()
    val sparkSchema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      if (rows.hasNext) {
        val allocator = new RootAllocator()
        val root = VectorSchemaRoot.create(toArrowSchema(sparkSchema), allocator)
        val out = new FileOutputStream(s"$dir/part-$pid.arrow")
        val writer = new ArrowFileWriter(root, null, out.getChannel)
        try {
          writer.start()
          val vs = root.getFieldVectors.asScala.toArray
          rows.grouped(batchRows).foreach { chunk =>
            root.allocateNew()
            var i = 0
            chunk.foreach { r =>
              var c = 0
              while (c < vs.length) { setCell(vs(c), i, r.get(c)); c += 1 }
              i += 1
            }
            root.setRowCount(i)
            writer.writeBatch()
          }
          writer.end()
        } finally { writer.close(); out.close(); root.close(); allocator.close() }
      }
    }
  }

  /** Read a directory of Arrow IPC files back into a DataFrame — one input
    * file per Spark partition (the distributed source). */
  def readIpc(spark: SparkSession, dir: String): DataFrame = {
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".arrow"))
      .map(_.getAbsolutePath).sorted.toSeq
    require(files.nonEmpty, s"no .arrow files under $dir")
    // schema from the first file's Arrow metadata
    val sparkSchema = {
      val in = new FileInputStream(files.head)
      val alloc = new RootAllocator()
      val reader = new ArrowFileReader(in.getChannel, alloc)
      try toSparkSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); alloc.close(); in.close() }
    }
    val rdd = spark.sparkContext.parallelize(files, files.size).flatMap { path =>
      val in = new FileInputStream(path)
      val alloc = new RootAllocator()
      val reader = new ArrowFileReader(in.getChannel, alloc)
      val root = reader.getVectorSchemaRoot
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        while (reader.loadNextBatch()) {
          val vs = root.getFieldVectors.asScala.toArray
          var i = 0
          while (i < root.getRowCount) {
            out += Row.fromSeq(vs.toIndexedSeq.map(v => getCell(v, i)))
            i += 1
          }
        }
      } finally { reader.close(); alloc.close(); in.close() }
      out
    }
    spark.createDataFrame(rdd, sparkSchema)
  }
}

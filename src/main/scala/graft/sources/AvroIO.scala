package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.{BufferedInputStream, ByteArrayInputStream, File}
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro container IO on the Avro library Spark already ships (no
  * spark-avro datasource in this distribution — the format layer is
  * hand-rolled like [[FeatherV1]]/[[Xlsx]], the third such exchange
  * format).
  *
  * Role split mirrors Feather: the WRITER is a guarded driver-side
  * single-file exchange path (Avro's natural unit is one container
  * file; production columnar data stays Parquet), while the READER is
  * DISTRIBUTED — one task per container file via binaryFiles, so a
  * directory of Avro part files (the Kafka-connect / log-shipping
  * layout) scans in parallel. Avro's row-major layout cannot prune
  * columns at the storage level, which is exactly why it is an INGEST
  * format here: read once, convert to Parquet, query that.
  *
  * Types: long/int/double/float/boolean/string/binary/timestamp-µs/date
  * both ways; nullable fields travel as union(null, T) — the standard
  * Avro convention.
  */
object AvroIO {

  val DefaultMaxRows: Long = 5L * 1000 * 1000

  private def avroType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType | TimestampNTZType =>
      val s = Schema.create(Schema.Type.LONG)
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
    case DateType =>
      val s = Schema.create(Schema.Type.INT)
      org.apache.avro.LogicalTypes.date().addToSchema(s)
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported Spark type $other (exchange path covers scalar types)")
  }

  private def avroSchema(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord("row", null, "graft", false, fields.toList.asJava)
  }

  /** Strip the nullable union down to its value branch. */
  private def valueBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def sparkType(s: Schema): DataType = {
    val v = valueBranch(s)
    val logical = Option(v.getLogicalType).map(_.getName).getOrElse("")
    v.getType match {
      case Schema.Type.LONG =>
        if (logical == "timestamp-micros" || logical == "timestamp-millis") TimestampType
        else LongType
      case Schema.Type.INT => if (logical == "date") DateType else IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported Avro type $other")
    }
  }

  private def sparkSchema(record: Schema): StructType = StructType(
    record.getFields.asScala.map { f =>
      StructField(f.name, sparkType(f.schema),
        nullable = f.schema.getType == Schema.Type.UNION)
    }.toSeq)

  /** Driver-side guarded writer — one Avro container file (deflate).
    * Same contract as FeatherV1.write: refuses above `maxRows` (the
    * exchange path collects; production data stays Parquet). */
  def write(df: DataFrame, path: String, maxRows: Long = DefaultMaxRows): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"AvroIO.write: $n rows exceeds the $maxRows-row exchange-path guard " +
        "(write Parquet for production data)")
    val schema = df.schema
    val avro = avroSchema(schema)
    val rows = df.collect()
    val out = new File(path)
    Option(out.getParentFile).foreach(_.mkdirs())
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
    writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(avro, out)
    try rows.foreach { r =>
      val rec = new GenericData.Record(avro)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val v: AnyRef =
          if (r.isNullAt(i)) null
          else f.dataType match {
            case TimestampType => java.lang.Long.valueOf(
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .fromJavaTimestamp(r.getTimestamp(i)))
            case TimestampNTZType => java.lang.Long.valueOf(
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .localDateTimeToMicros(r.getAs[java.time.LocalDateTime](i)))
            case DateType => java.lang.Integer.valueOf(
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .fromJavaDate(r.getDate(i)))
            case BinaryType => ByteBuffer.wrap(r.getAs[Array[Byte]](i))
            case _ => r.get(i).asInstanceOf[AnyRef]
          }
        rec.put(f.name, v)
      }
      writer.append(rec)
    } finally writer.close()
  }

  /** Distributed reader over a file or a directory of container files:
    * files spread across tasks via binaryFiles' CombineFileInputFormat —
    * small part files COMBINE into one task (the small-files cure built
    * in) and a container is never split mid-file, so parallelism scales
    * with data volume, not file count. Schema comes from the first
    * file's header, read driver-side without touching data blocks. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = new File(path)
    val first =
      if (f.isDirectory)
        f.listFiles().filter(p => p.isFile && !p.getName.startsWith(".") &&
          !p.getName.startsWith("_")).sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"AvroIO.read: no files in $path"))
      else f
    val headerReader = new DataFileReader[GenericRecord](
      first, new GenericDatumReader[GenericRecord]())
    val (schema, logicals) = try {
      val rec = headerReader.getSchema
      (sparkSchema(rec), rec.getFields.asScala.map(f =>
        Option(valueBranch(f.schema).getLogicalType).map(_.getName).getOrElse("")).toArray)
    } finally headerReader.close()
    val fields = schema.fields
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) =>
        val in = new DataFileStream[GenericRecord](
          new BufferedInputStream(new ByteArrayInputStream(stream.toArray())),
          new GenericDatumReader[GenericRecord]())
        // DataFileStream is an iterator of records; decode to Row lazily
        new Iterator[Row] {
          def hasNext: Boolean = { val h = in.hasNext; if (!h) in.close(); h }
          def next(): Row = {
            val rec = in.next()
            Row.fromSeq(fields.zipWithIndex.map { case (sf, fi) =>
              val v = rec.get(sf.name)
              if (v == null) null
              else sf.dataType match {
                case StringType => v.toString
                case BinaryType =>
                  val bb = v.asInstanceOf[ByteBuffer]
                  val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                case TimestampType =>
                  val micros = // foreign files may carry timestamp-millis
                    if (logicals(fi) == "timestamp-millis") v.asInstanceOf[Long] * 1000L
                    else v.asInstanceOf[Long]
                  org.apache.spark.sql.catalyst.util.DateTimeUtils
                    .toJavaTimestamp(micros)
                case DateType =>
                  org.apache.spark.sql.catalyst.util.DateTimeUtils
                    .toJavaDate(v.asInstanceOf[Integer].intValue())
                case _ => v
              }
            }.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}

package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.JavaConverters._

/** Avro Object Container File source/sink built directly on the Avro
  * core jars (the `spark-avro` DataSource module is not on this
  * classpath; the codec layer is, so this is a from-scratch mapping —
  * the AvroIo sibling of the hand-written XlsIo/EdnIo/ArrowIo codecs).
  *
  * Write is DISTRIBUTED: each partition writes its own
  * `part-NNNNN.avro` container through the Hadoop FileSystem API
  * (local paths and cluster filesystems alike), deflate-compressed —
  * the natural parallel shape for a splittable container format, unlike
  * the inherently single-file xlsx path. Read parallelizes over the
  * part files. Supported Spark types: long/int/double/float/string/
  * boolean/binary, timestamp (micros logical type), date (days logical
  * type); everything nullable via union(null, T).
  */
object AvroIo {

  private def fieldSchema(dt: DataType): Schema = {
    def prim(t: Schema.Type) = Schema.create(t)
    val base = dt match {
      case LongType => prim(Schema.Type.LONG)
      case IntegerType | ShortType | ByteType => prim(Schema.Type.INT)
      case DoubleType => prim(Schema.Type.DOUBLE)
      case FloatType => prim(Schema.Type.FLOAT)
      case StringType => prim(Schema.Type.STRING)
      case BooleanType => prim(Schema.Type.BOOLEAN)
      case BinaryType => prim(Schema.Type.BYTES)
      case TimestampType =>
        val s = prim(Schema.Type.LONG)
        org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
      case TimestampNTZType =>
        val s = prim(Schema.Type.LONG)
        org.apache.avro.LogicalTypes.localTimestampMicros().addToSchema(s)
      case DateType =>
        val s = prim(Schema.Type.INT)
        org.apache.avro.LogicalTypes.date().addToSchema(s)
      case other =>
        throw new IllegalArgumentException(s"AvroIo: unsupported type $other")
    }
    Schema.createUnion(java.util.Arrays.asList(
      Schema.create(Schema.Type.NULL), base))
  }

  private[sources] def avroSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType), null, null)
    }
    val rec = Schema.createRecord("row", null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private def toAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
    case ldt: java.time.LocalDateTime =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case s: String => s
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case sh: Short => sh.toInt
    case by: Byte => by.toInt
    case other => other
  }

  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val fields = df.schema.fields
    val dir = new Path(path)
    val fs = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val p = new Path(f"$path/part-$pid%05d.avro")
        val pfs = p.getFileSystem(new Configuration())
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, pfs.create(p, true))
        var n = 0L
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fields.length) {
            rec.put(i, toAvro(row.get(i), fields(i).dataType))
            i += 1
          }
          w.append(rec)
          n += 1
        }
        w.close()
        Iterator.single(n)
      }
    }.count() // materialize the write
  }

  private def sparkType(s: Schema): DataType = {
    val base =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    base.getType match {
      case Schema.Type.LONG =>
        if (base.getLogicalType != null &&
          base.getLogicalType.getName == "timestamp-micros") TimestampType
        else if (base.getLogicalType != null &&
          base.getLogicalType.getName == "local-timestamp-micros")
          TimestampNTZType
        else LongType
      case Schema.Type.INT =>
        if (base.getLogicalType != null &&
          base.getLogicalType.getName == "date") DateType
        else IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.STRING => StringType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case other =>
        throw new IllegalArgumentException(s"AvroIo: unsupported avro $other")
    }
  }

  private def fromAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case l: java.lang.Long if dt == TimestampNTZType =>
      val micros = l.longValue()
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case l: java.lang.Long if dt == TimestampType =>
      val micros = l.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case i: java.lang.Integer if dt == DateType =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case bb: java.nio.ByteBuffer =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case other => other
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(new Path(s"$path/part-*.avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"AvroIo.read: no part-*.avro under $path")
    // schema from the first container's header (driver-side, O(1))
    val headReader = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), spark.sparkContext.hadoopConfiguration),
      new GenericDatumReader[GenericRecord]())
    val avSchema = headReader.getSchema
    headReader.close()
    val st = StructType(avSchema.getFields.asScala.map { f =>
      StructField(f.name(), sparkType(f.schema()), nullable = true)
    }.toSeq)
    val schemaJson = avSchema.toString
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { file =>
        val schema = new Schema.Parser().parse(schemaJson)
        val types = schema.getFields.asScala.map(f => sparkType(f.schema())).toArray
        val r = new DataFileReader[GenericRecord](
          new FsInput(new Path(file), new Configuration()),
          new GenericDatumReader[GenericRecord](schema))
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (r.hasNext) {
          val rec = r.next()
          out += Row.fromSeq(types.indices.map(i => fromAvro(rec.get(i), types(i))))
        }
        r.close()
        out
      }
    spark.createDataFrame(rows, st)
  }
}

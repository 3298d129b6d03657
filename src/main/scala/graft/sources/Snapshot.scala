package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Whole-dataset PURE-DATA snapshot — the Spark-first analog of the
  * reference's `dataset->data` / `data->dataset` pair
  * (/root/reference/src/tech/v3/dataset/base.clj:992-1088): a
  * self-describing columnar EDN document
  *
  * {{{
  * {:metadata {:name "orders"}
  *  :version 1
  *  :columns
  *  [{:name "o_orderkey" :datatype :int64 :missing [3 7]
  *    :data [1 2 3 nil ...]}
  *   ...]}
  * }}}
  *
  * holding the column metadata (name, dtype keyword, missing-index vector,
  * and any Spark StructField metadata as `:spark-meta` JSON — so e.g. a
  * `set-inference-target` annotation survives the round-trip) alongside the
  * values. The reference serializes this structure with nippy; under
  * zero-egress constraints the EDN text form plays that role while staying
  * pure data (readable by any EDN reader, no JVM serialization).
  *
  * SCALE POSTURE: a pure-data snapshot is by definition a full driver-side
  * materialization — same as the reference, which is single-node. It exists
  * for model/config/summary-sized frames; `maxRows` (default 1M) fails fast
  * with a pointer at parquet, the distributed snapshot format, instead of
  * OOMing the driver on a 100 TB frame.
  */
object Snapshot {

  private val Version = 1L

  /** Reference-style dtype keyword per Spark type (base.clj datatype
    * metadata; packed date/instant names from dtype-next). */
  private def dtypeOf(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case StringType => "string"
    case TimestampType => "instant"
    case DateType => "local-date"
    case ArrayType(et, _) => "array-" + dtypeOf(et)
    case other =>
      throw new IllegalArgumentException(
        s"snapshot: unsupported column type $other (decimal/struct/map " +
          "columns belong in parquet, the distributed snapshot format)")
  }

  private def typeOfDtype(kw: String): DataType = kw match {
    case "boolean" => BooleanType
    case "int8" => ByteType
    case "int16" => ShortType
    case "int32" => IntegerType
    case "int64" => LongType
    case "float32" => FloatType
    case "float64" => DoubleType
    case "string" => StringType
    case "instant" => TimestampType
    case "local-date" => DateType
    case arr if arr.startsWith("array-") =>
      ArrayType(typeOfDtype(arr.stripPrefix("array-")))
    case other =>
      throw new IllegalArgumentException(s"snapshot: unknown :datatype $other")
  }

  // ---------------------------------------------------------------- write

  /** One EDN literal for a cell. Dates are written as plain ISO strings
    * (the :datatype keyword disambiguates on read — no timezone round-trip
    * risk); everything else reuses EdnIo's literal forms, whose Double
    * rendering (shortest round-trip repr) re-parses bit-exactly. */
  private def cell(v: Any): String = v match {
    case null => "nil"
    case d: java.sql.Date => "\"" + d.toLocalDate.toString + "\""
    case s: scala.collection.Seq[_] =>
      s.map(cell).mkString("[", " ", "]")
    case other => EdnIo.ednLiteralForTest(other)
  }

  /** Render a dataset to the pure-data EDN document. */
  def datasetToData(df: DataFrame, name: String = "dataset",
                    maxRows: Long = 1000000L): String = {
    val n = df.count()
    require(n <= maxRows,
      s"snapshot: $n rows exceeds maxRows=$maxRows - a pure-data snapshot " +
        "is a driver-side materialization; use parquet for frames this size")
    val fields = df.schema.fields
    val cols = Array.fill(fields.length)(Vector.newBuilder[Any])
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      var i = 0
      while (i < fields.length) { cols(i) += row.get(i); i += 1 }
    }
    val sb = new java.lang.StringBuilder()
    sb.append("{:metadata {:name ").append(EdnIo.ednLiteralForTest(name))
      .append("}\n :version ").append(Version)
      .append("\n :columns\n [")
    fields.zipWithIndex.foreach { case (f, i) =>
      if (i > 0) sb.append("\n  ")
      val vals = cols(i).result()
      val missing = vals.zipWithIndex.collect { case (null, ix) => ix }
      sb.append("{:name ").append(EdnIo.ednLiteralForTest(f.name))
        .append(" :datatype :").append(dtypeOf(f.dataType))
      if (f.metadata != Metadata.empty)
        sb.append(" :spark-meta ")
          .append(EdnIo.ednLiteralForTest(f.metadata.json))
      sb.append("\n   :missing ").append(missing.mkString("[", " ", "]"))
        .append("\n   :data [")
      vals.zipWithIndex.foreach { case (v, ix) =>
        if (ix > 0) sb.append(' ')
        sb.append(cell(v))
      }
      sb.append("]}")
    }
    sb.append("]}\n")
    sb.toString
  }

  /** Write the snapshot document to a (Hadoop-resolvable) path; `.gz`
    * compresses like EdnIo. */
  def write(df: DataFrame, path: String, name: String = "dataset",
            maxRows: Long = 1000000L): Unit = {
    val text = datasetToData(df, name, maxRows)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val raw = fs.create(p, true)
    val out: java.io.OutputStream =
      if (path.endsWith(".gz")) new java.util.zip.GZIPOutputStream(raw, 1 << 16)
      else raw
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  // ----------------------------------------------------------------- read

  private def str(m: Map[Any, Any], k: String): Option[String] =
    m.get(k).map(_.toString)

  /** Rebuild the DataFrame from a pure-data document. The declared
    * :datatype drives value conversion (ints narrow, dates parse from ISO
    * strings); :missing indices null out their slots; :spark-meta restores
    * StructField metadata. */
  def dataToDataset(spark: SparkSession, text: String): DataFrame = {
    val doc = EdnIo.parseAll(text) match {
      case Vector(m: Map[_, _]) => m.asInstanceOf[Map[Any, Any]]
      case other =>
        throw new IllegalArgumentException(
          s"snapshot: expected one top-level map, got ${other.length} forms")
    }
    val version = doc.getOrElse("version", 1L)
    require(version == Version, s"snapshot: unsupported :version $version")
    val colDefs = doc.get("columns") match {
      case Some(v: Vector[_]) => v.map(_.asInstanceOf[Map[Any, Any]])
      case _ =>
        throw new IllegalArgumentException("snapshot: missing :columns vector")
    }
    if (colDefs.isEmpty) return spark.emptyDataFrame
    def conv(v: Any, t: DataType): Any = (v, t) match {
      case (null, _) => null
      case (l: Long, ByteType) => l.toByte
      case (l: Long, ShortType) => l.toShort
      case (l: Long, IntegerType) => l.toInt
      case (l: Long, LongType) => l
      case (l: Long, FloatType) => l.toFloat
      case (l: Long, DoubleType) => l.toDouble
      case (d: Double, FloatType) => d.toFloat
      case (d: Double, DoubleType) => d
      case (s: String, DateType) => java.sql.Date.valueOf(s)
      case (ts: java.sql.Timestamp, TimestampType) => ts
      case (s: String, StringType) => s
      case (b: Boolean, BooleanType) => b
      case (xs: Vector[_], ArrayType(et, _)) => xs.map(x => conv(x, et))
      case (other, tt) =>
        throw new IllegalArgumentException(
          s"snapshot: cannot read $other as $tt")
    }
    val parsed = colDefs.map { cd =>
      val name = str(cd, "name").getOrElse(
        throw new IllegalArgumentException("snapshot: column without :name"))
      val dt = typeOfDtype(str(cd, "datatype").getOrElse(
        throw new IllegalArgumentException(s"snapshot: $name lacks :datatype")))
      val meta = str(cd, "spark-meta")
        .map(Metadata.fromJson).getOrElse(Metadata.empty)
      val missing: Set[Int] = cd.get("missing") match {
        case Some(v: Vector[_]) => v.map(_.asInstanceOf[Long].toInt).toSet
        case _ => Set.empty
      }
      val data = cd.get("data") match {
        case Some(v: Vector[_]) => v
        case _ =>
          throw new IllegalArgumentException(s"snapshot: $name lacks :data")
      }
      val vals = data.zipWithIndex.map { case (v, ix) =>
        if (missing.contains(ix)) null else conv(v, dt)
      }
      (StructField(name, dt, nullable = true, meta), vals)
    }
    val nRows = parsed.headOption.map(_._2.length).getOrElse(0)
    parsed.foreach { case (f, vals) =>
      require(vals.length == nRows,
        s"snapshot: ragged columns (${f.name} has ${vals.length}, " +
          s"first column has $nRows)")
    }
    val schema = StructType(parsed.map(_._1))
    val rows = new java.util.ArrayList[Row](nRows)
    var r = 0
    while (r < nRows) {
      rows.add(Row.fromSeq(parsed.map(_._2(r))))
      r += 1
    }
    spark.createDataFrame(rows, schema)
  }

  /** Read a snapshot document from a path (`.gz` transparent). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw: java.io.InputStream = fs.open(p)
    val in =
      if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw
    val text =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    dataToDataset(spark, text)
  }

  /** The dataset name stored in a snapshot document's :metadata. */
  def datasetName(text: String): Option[String] =
    EdnIo.parseAll(text) match {
      case Vector(m: Map[_, _]) =>
        m.asInstanceOf[Map[Any, Any]].get("metadata") match {
          case Some(mm: Map[_, _]) =>
            mm.asInstanceOf[Map[Any, Any]].get("name").map(_.toString)
          case _ => None
        }
      case _ => None
    }
}

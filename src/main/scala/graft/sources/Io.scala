package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._
import graft.ops.Bounded._

/** IO breadth (reference SURVEY §2.1): csv/tsv/json/parquet read-write with
  * the reference's ingest options mapped onto DataFrameReader options.
  *
  * The reference's universal `->dataset` (reference src/tech/v3/dataset/
  * io.clj:123-263) dispatches on file type and honors: `:header-row?`,
  * `:separator`, `:num-rows`, `:column-allowlist/blocklist`, `:parser-fn`
  * (per-column type overrides), gzip autodetect. Spark equivalents below;
  * gzip is transparent in Spark's file sources.
  */
object Io {

  /** Exact-name column reference: backquoted with embedded backticks
    * doubled, so dotted headers (ref double_parse_test fixture) don't parse
    * as struct paths and backticked headers don't break the quoting. */
  private def qcol(n: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col("`" + n.replace("`", "``") + "`")

  case class ReadOptions(
      headerRow: Boolean = true,
      separator: String = ",",
      numRows: Option[Int] = None,
      columnAllowlist: Seq[String] = Seq.empty,
      columnBlocklist: Seq[String] = Seq.empty,
      /** `:parser-fn`-style explicit schema; None → inference (Spark's
        * two-pass, vs the reference's promotional single-pass — SURVEY §7.4
        * documents accepting this difference). */
      schema: Option[StructType] = None,
      comment: Option[Char] = None,
      /** `:n-initial-skip-rows`: physical lines dropped before the header. */
      skipRows: Int = 0,
      /** Promotional reads: decompress unsplittable (.gz) inputs to a
        * splittable staged copy first ([[Io.stageSplittableCopy]]) so both
        * the probe pass and the returned frame parse at full parallelism
        * instead of one core per .gz part. */
      stageCompressed: Boolean = true,
      /** Where the staged copy lands; None = driver-local temp (local
        * mode). On a cluster, point at shared storage. */
      stageDir: Option[String] = None)

  def readCsv(spark: SparkSession, path: String,
              opts: ReadOptions = ReadOptions()): DataFrame = {
    var r = spark.read
      .option("header", opts.headerRow)
      .option("sep", opts.separator)
    r = opts.schema match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", true)
    }
    opts.comment.foreach(c => r = r.option("comment", c.toString))
    var df =
      if (opts.skipRows == 0) r.csv(path)
      else r.csv(skippedLines(spark, path, opts.skipRows))
    if (opts.columnAllowlist.nonEmpty)
      df = df.select(opts.columnAllowlist.map(qcol): _*)
    if (opts.columnBlocklist.nonEmpty)
      df = df.drop(opts.columnBlocklist: _*)
    opts.numRows.foreach(n => df = df.limit(n))
    df
  }

  /** Physical lines of `path` minus the first `skip` (the reference's
    * `:n-initial-skip-rows`; line splitting is Hadoop's, so \n, \r\n, and
    * bare-\r files all work). Driver reads nothing — the drop is a
    * zipWithIndex filter. */
  private def skippedLines(spark: SparkSession, path: String,
                           skip: Int): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 >= skip).map(_._1).toDS()
  }

  /** Stage unsplittably-compressed text inputs as uncompressed copies so
    * the scan parallelizes. A `.gz` (or `.deflate`) part file caps Hadoop
    * at ONE core for the whole file — a 4-part gzipped corpus uses 4 of 32
    * cores for every parse pass, twice (probe + returned frame). Plain
    * text is line-splittable: after staging, Spark's file index carves the
    * uncompressed bytes into `totalBytes / defaultParallelism` splits and
    * every core parses.
    *
    * Shape: one Spark task per input file (the decompress itself is
    * sequential per file — that's inherent to gzip), a raw stream copy
    * (no line decoding), output beside-named in `stageDir`. `.bz2` inputs
    * are NOT staged (Hadoop's BZip2Codec is block-splittable already);
    * uncompressed inputs return None (read in place).
    *
    * Returns the staged directory, or None when staging doesn't apply.
    * Cleanup: a default (temp-dir) stage registers a JVM shutdown hook;
    * pass `stageDir` to manage lifetime yourself. CLUSTER NOTE: the
    * driver-local java.io.tmpdir default is only correct in local mode
    * (executors on other hosts would write to THEIR tmpdirs and the
    * driver-side read would see an empty directory), so when no
    * `stageDir` is given and the master is not local, staging is SKIPPED
    * (read in place, one core per .gz part — slow but correct); on a
    * real cluster pass `stageDir` on shared storage (an HDFS/object-store
    * temp prefix) — each task writes its file through the Hadoop
    * FileSystem for exactly this reason. Executor tasks rebuild their
    * Hadoop Configuration from a broadcast of the driver's, so
    * programmatic `spark.hadoop.*` settings (object-store credentials,
    * endpoints) propagate instead of being dropped by a bare
    * `new Configuration()`. */
  private[graft] def stageSplittableCopy(
      spark: SparkSession, path: String,
      stageDir: Option[String] = None): Option[String] = {
    import org.apache.hadoop.fs.{FileStatus, Path => HPath}
    import org.apache.hadoop.io.compress.{CompressionCodecFactory, SplittableCompressionCodec}
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = p.getFileSystem(hconf)
    val statuses: Array[FileStatus] =
      if (path.exists(c => c == '*' || c == '?' || c == '['))
        Option(fs.globStatus(p)).getOrElse(Array.empty)
      else if (fs.exists(p) && fs.getFileStatus(p).isDirectory) fs.listStatus(p)
      else if (fs.exists(p)) Array(fs.getFileStatus(p))
      else Array.empty
    val files = statuses.filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath)
    if (files.isEmpty) return None
    val factory = new CompressionCodecFactory(hconf)
    val allUnsplittable = files.forall { f =>
      val c = factory.getCodec(f)
      c != null && !c.isInstanceOf[SplittableCompressionCodec]
    }
    if (!allUnsplittable) return None
    // No shared stageDir on a non-local master: the tmpdir fallback would
    // scatter staged files across executor-local disks — skip staging.
    if (stageDir.isEmpty && !spark.sparkContext.isLocal) return None
    val dir = stageDir.getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft_stage")
      val dirFile = d.toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dirFile)
      }))
      "file:" + d.toString
    }
    val names = files.map(_.toString).toSeq
    // Hadoop Configuration is not serializable directly; broadcast the
    // driver's via SerializableConfiguration so spark.hadoop.* overrides
    // (credentials, endpoints) reach the executor-side copy tasks.
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    spark.sparkContext.parallelize(names, names.length).foreach { f =>
      val conf = bcConf.value.value
      val fac = new CompressionCodecFactory(conf)
      val src = new HPath(f)
      val sfs = src.getFileSystem(conf)
      val codec = fac.getCodec(src)
      val base = CompressionCodecFactory.removeSuffix(
        src.getName, codec.getDefaultExtension)
      val out = new HPath(dir, base)
      val ofs = out.getFileSystem(conf)
      val in = codec.createInputStream(sfs.open(src))
      val os = ofs.create(out, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) os.write(buf, 0, n); n = in.read(buf) }
      } finally { in.close(); os.close() }
    }
    Some(dir)
  }

  /** Quote-aware CSV field count: separators inside a double-quoted field
    * do not delimit, and `""` inside quotes is an escaped quote (exit +
    * literal re-entry char, net in-field). A quote only OPENS a quoted
    * field at field start (position 0 or immediately after a separator) —
    * univocity's semantics, which Spark's reader uses — so a stray
    * mid-field `"` (`5" nail,a,b`) is a literal character, not a quote
    * toggle that would swallow real separators and under-count the width.
    * Gives the TRUE width of a line, so a genuinely present trailing
    * column whose cells are all empty survives as all-missing instead of
    * being mistaken for a phantom. */
  private[graft] def fieldCount(line: String, sep: String): Int = {
    var i = 0; var n = 1; var inQ = false; var atFieldStart = true
    val sl = sep.length
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          // `""` is an escaped quote — consume both, stay in-field
          if (i + 1 < line.length && line.charAt(i + 1) == '"') i += 2
          else { inQ = false; i += 1 }
        } else i += 1
      }
      else if (c == '"' && atFieldStart) { inQ = true; atFieldStart = false; i += 1 }
      else if (line.startsWith(sep, i)) { n += 1; i += sl; atFieldStart = true }
      else { atFieldStart = false; i += 1 }
    }
    n
  }

  /** Ragged CSV (reference parses rows of unequal field counts, widening to
    * the longest row — parse_test.clj's ragged.csv): Spark's native reader
    * truncates to the FIRST row's width instead, so this takes one
    * distributed width pass first. The width pass is quote-aware
    * ([[fieldCount]]) and skips comment lines, so the schema width is
    * exact — an all-empty trailing column present in the data is kept as
    * all-missing (reference semantics) rather than dropped as a phantom.
    * Columns are named column-0..column-{w-1} (or from the header row),
    * every cell a string; feed [[inferPromotional]] for typing. */
  def readCsvRagged(spark: SparkSession, path: String,
                    opts: ReadOptions = ReadOptions()): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lines = if (opts.skipRows == 0) spark.read.textFile(path)
                else skippedLines(spark, path, opts.skipRows)
    val sepStr = opts.separator
    val commentPrefix = opts.comment.map(_.toString)
    val widthLines = commentPrefix match {
      case Some(c) => lines.filter(l => !l.startsWith(c))
      case None    => lines
    }
    val width = widthLines.map(l => fieldCount(l, sepStr))
      .agg(max(col("value"))).as[Int]
      .collectBounded(1, "O(1) ragged-width readout").head
    val headerNames: Seq[String] =
      if (!opts.headerRow) Seq.empty
      else {
        // parse the header LINE as a data row (header=false default) and
        // take its VALUES; honors the comment option, degrades to column-i
        // names when the first line is blank/comment-only; empty cells
        // fall back to column-i
        var hr = spark.read.option("sep", opts.separator)
        opts.comment.foreach(c => hr = hr.option("comment", c.toString))
        hr.csv(Seq(lines.first()).toDS()).collectBounded(2, "one header line").headOption match {
          case None => Seq.empty
          case Some(hdr) =>
            (0 until hdr.length).map { i =>
              val v = if (hdr.isNullAt(i)) null else hdr.get(i).toString
              if (v == null || v.isEmpty) s"column-$i" else v
            }
        }
      }
    val names0 = (0 until width).map(i =>
      if (i < headerNames.length) headerNames(i) else s"column-$i")
    // Spark rejects duplicate names in a user schema — suffix every
    // duplicated occurrence with its index (same policy as XlsxIo)
    val names: Seq[String] = {
      var ns = names0
      var rounds = 0
      while (ns.distinct.length != ns.length && rounds < 8) {
        val c = ns.groupBy(identity).map { case (k, v) => k -> v.size }
        ns = ns.zipWithIndex.map { case (n, i) =>
          if (c(n) > 1) s"$n-$i" else n
        }
        rounds += 1
      }
      ns
    }
    val schema = StructType(names.map(StructField(_, StringType, true)))
    var r = spark.read.option("header", opts.headerRow)
      .option("sep", opts.separator).schema(schema)
    opts.comment.foreach(c => r = r.option("comment", c.toString))
    r.csv(lines)
  }

  def readTsv(spark: SparkSession, path: String,
              opts: ReadOptions = ReadOptions()): DataFrame =
    readCsv(spark, path, opts.copy(separator = "\t"))

  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.json(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** zip-of-csv ingest (reference src/tech/v3/dataset/zip.clj:46-100
    * `zipfile->dataset-seq`). Spark reads .gz transparently but not .zip:
    * decode zip entries per-FILE via binaryFiles (zip's central directory
    * makes entries non-splittable — same constraint as gzip), flatten all
    * entries' lines, then hand the line Dataset to the csv reader so schema
    * inference/options work exactly as for loose files. Parallelism = one
    * task per archive; for 100 TB you'd repack to parquet on first touch
    * (which is the reference's `dataset-seq` guidance too). */
  def readCsvZip(spark: SparkSession, path: String,
                 opts: ReadOptions = ReadOptions()): DataFrame = {
    import spark.implicits._
    // each entry carries its own header; the column names come from the
    // FIRST entry (read driver-side, a few bytes), and every entry's header
    // line is dropped executor-side — so multi-entry archives flatten
    // without header lines leaking into the data
    val header: Option[String] =
      if (!opts.headerRow) None
      else {
        val p = new org.apache.hadoop.fs.Path(
          if (path.contains("*")) path.substring(0, path.indexOf('*')) else path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val first =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).filter(_.getPath.getName.endsWith(".zip"))
              .minBy(_.getPath.getName).getPath
          else p
        val zin = new java.util.zip.ZipInputStream(fs.open(first))
        try {
          var e = zin.getNextEntry
          while (e != null && e.isDirectory) e = zin.getNextEntry
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(zin, "UTF-8"))
          Option(br.readLine())
        } finally zin.close()
      }
    val dropHeader = opts.headerRow
    val lines = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val zin = new java.util.zip.ZipInputStream(pds.open())
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .filterNot(_.isDirectory)
        .flatMap { _ =>
          // materialize the CURRENT entry before the next getNextEntry call
          val src = scala.io.Source.fromInputStream(
            new java.io.FilterInputStream(zin) { override def close(): Unit = () },
            "UTF-8")
          val all = src.getLines().toList
          if (dropHeader) all.drop(1) else all
        }
    }.toDS()
    var r = spark.read
      .option("header", false)
      .option("sep", opts.separator)
    r = opts.schema match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", true)
    }
    opts.comment.foreach(c => r = r.option("comment", c.toString))
    var df = r.csv(lines)
    header.foreach { h =>
      val names = h.split(java.util.regex.Pattern.quote(opts.separator), -1)
      df = df.toDF(names.toIndexedSeq: _*)
    }
    if (opts.columnAllowlist.nonEmpty)
      df = df.select(opts.columnAllowlist.map(qcol): _*)
    if (opts.columnBlocklist.nonEmpty)
      df = df.drop(opts.columnBlocklist: _*)
    opts.numRows.foreach(n => df = df.limit(n))
    df
  }

  /** Promotional type-inference shim (reference io/column_parsers.clj:310-345
    * promotion chain `[:bool :int16 :int32 :int64 :float64 ... :string]`).
    *
    * Spark's CSV inference never narrows below int/long; the reference infers
    * the NARROWEST type that holds every value (datatype_parser.csv pins
    * id 1..10 → int16 — FIXTURES.md §A). This shim reproduces that: read all
    * columns as string, compute per-column parse-success counts and value
    * ranges in ONE aggregation pass, then cast to the narrowest winner.
    * Boolean uses the reference's relaxed coercion table only when every
    * value is in it (column_parsers.clj:56-80).
    */
  /** Flexible LOCAL-DATE parse of a string column, mirroring the
    * reference's multi-pattern formatter
    * (io/datetime.clj:14-47 local-date-parser-patterns): separators
    * `[/,-. ]+` normalize to one space, then the pattern ladder tries
    * year-first, month-first, day-first and named-month forms in the
    * reference's order; unparseable → null (relaxed semantics). Pure
    * codegen `try_to_date` chain — no UDF. */
  def parseLocalDateFlex(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlInternal.column(
      graft.functions.CsvProbe.FlexLocalDate(
        org.apache.spark.sql.GraftSqlInternal.expression(c)))

  /** The original composed form of [[parseLocalDateFlex]] — 1 regex
    * rewrite + 7 gated try_to_date patterns. Superseded in every code
    * path by the fused [[graft.functions.CsvProbe.FlexLocalDate]] kernel
    * (~8× cheaper per value, measured on the promotional probe); kept as
    * the independent semantic spec the kernel is fuzz-pinned against
    * (IoSpec date-kernel equivalence). */
  private[graft] def parseLocalDateFlexLadder(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val prep = regexp_replace(c, "[/,\\-. ]+", " ")
    // Every try_to_date that FAILS costs a thrown-and-caught
    // DateTimeParseException inside Spark — microseconds per attempt, ×7
    // patterns × every non-date string value (the promotional probe over a
    // 2.77M-row table measured 22 k rows/s, exception-bound). Each pattern
    // therefore sits behind a SUPERSET shape regex (~100 ns rlike): a
    // value that can't possibly parse never reaches the parser, and a
    // value that passes its gate almost always parses without throwing.
    def gated(shape: String, fmt: String) =
      when(prep.rlike(shape), try_to_date(prep, fmt))
    coalesce(
      gated("^\\d{1,4} \\d{1,2} \\d{1,2}$", "yyyy M d"),
      gated("^\\d{8}$", "yyyyMMdd"),
      gated("^\\d{1,2} \\d{1,2} \\d{3,4}$", "M d yyyy"),
      gated("^\\d{1,2} [A-Za-z]{3} \\d{1,4}$", "d MMM yyyy"),
      gated("^\\d{1,2} \\d{1,2} \\d{1,2}$", "M d yy"),
      gated("^[A-Za-z]{3} \\d{1,2} \\d{3,4}$", "MMM d yyyy"),
      gated("^[A-Za-z]{3} \\d{1,2} \\d{1,2}$", "MMM d yy"))
    // NB deliberately NO bare try_to_date(c) fallback: Spark's string→date
    // cast accepts year-only strings ("1212" → 1212-01-01) where the
    // reference's ISO_LOCAL_DATE rejects them; ISO dates are covered by
    // "yyyy M d" after separator normalization.
  }

  def inferPromotional(df: DataFrame, naAsMissing: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.isEmpty) return df
    // the reference treats "" and case-insensitive "NA" as missing for
    // EVERY column (column_parsers.clj:177-191 missing-value?, default
    // disable-na-as-missing? = false) — nullify before inference so an
    // int column with NA holes still narrows (ames LotFrontage → int16)
    val base = if (!naAsMissing) df
      else strCols.foldLeft(df)((d, c0) =>
        d.withColumn(c0,
          when(lower(qcol(c0)) === "na", lit(null)).otherwise(qcol(c0))))
    val cols = strCols
    // gzip (and small files) cap the scan's parallelism — 4 .gz part
    // files = 4 cores doing ALL the probe parsing. The probe pass is
    // CPU-bound per value, so spread it across the session first (one
    // string-row shuffle, only when the scan under-partitions); the
    // RETURNED frame keeps the streaming scan — only the one-pass probe
    // needs the spread.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val spread = if (base.rdd.getNumPartitions < par)
      base.repartition(par) else base
    // Probe in TWO STAGES — a projection computing per-column probe values
    // (the long/double/timestamp casts and the multi-pattern date parse,
    // each bound ONCE as a named column), then a count aggregation over
    // them. Inlining every probe into 8·k aggregate expressions made the
    // generated aggregate method blow Janino's size limits on wide tables
    // and fall back to interpreted evaluation — the 12-column baseline
    // table probed at 22 k rows/s; the staged form keeps each expression
    // small and codegen'd, and the date ladder's regexp_replace runs once
    // per value instead of once per pattern.
    // All gate verdicts come from ONE fused byte-scan kernel per value
    // ([[graft.functions.CsvProbe]] — bit-identical to the rlike gates it
    // replaced, which probed this same table at ~1/8 the throughput). The
    // mask binds as its own named column in a first projection so the
    // kernel runs ONCE per value (sibling aliases can't be referenced
    // within one select, and relying on codegen CSE across five uses is
    // fragile); the probe parses in the second projection then only fire
    // where their gate bit is set — EVERY failing try_cast/try_to_date
    // throws-and-caught inside Spark (ANSI parse paths), so the gates are
    // what keep the probe off the exception path.
    graft.functions.CsvProbe.register(df.sparkSession)
    import graft.functions.CsvProbe.{LONG, DOUBLE, TS, DATE, BOOL}
    val masked = spread.select(cols.flatMap { c0 =>
      Seq(qcol(c0).as(s"${c0}__v"),
        call_function("graft_csv_shape", qcol(c0)).as(s"${c0}__m"))
    }: _*)
    val probed = masked.select(cols.flatMap { c0 =>
      val c = col("`" + s"${c0}__v".replace("`", "``") + "`")
      val m = col("`" + s"${c0}__m".replace("`", "``") + "`")
      def bit(b: Int) = m.bitwiseAND(lit(b)) =!= 0
      val longV = when(bit(LONG), c.try_cast("long"))
      val dblV = when(bit(DOUBLE), c.try_cast("double"))
      val tsV = when(bit(TS), c.try_cast("timestamp"))
      Seq(
        c.as(s"${c0}__v"),
        longV.as(s"${c0}__long"),
        dblV.as(s"${c0}__dbl"),
        tsV.as(s"${c0}__ts"),
        // the reference tries :packed-local-date before :string — the
        // flexible multi-pattern date parse (io/datetime.clj) covers
        // "Jan 1 2000"-style columns. The 7-pattern ladder is the
        // priciest probe, so it only runs where the double cast failed
        // AND the token-shape gate passes (the gate accepts a superset
        // of every ladder pattern, so the parse count is unchanged) —
        // all-numeric columns take the numeric branch before the date
        // decision anyway, so the gates cannot change any classification
        when(dblV.isNull && bit(DATE), parseLocalDateFlex(c))
          .as(s"${c0}__date"),
        // midnight flag disambiguates "yyyy-MM-dd HH:mm" columns
        // (date-castable by prefix) from genuine date columns
        (tsV === date_trunc("day", tsV)).as(s"${c0}__midf"),
        // STRICT bool, exact-case "true"/"false" only — the reference's
        // default promotional sequence uses :bool (column_parsers.clj:54,
        // default-parser-datatype-sequence:310); the relaxed t/y/yes
        // :boolean table applies only when a caller asks for :boolean,
        // which keeps Y/N flag columns (ames CentralAir) as strings
        bit(BOOL).as(s"${c0}__boolf"))
    }: _*)
    val aggs = cols.flatMap { c0 =>
      Seq(
        count(col(s"`${c0}__v`")).as(s"${c0}__n"),
        count(col(s"`${c0}__long`")).as(s"${c0}__nlong"),
        count(col(s"`${c0}__dbl`")).as(s"${c0}__ndbl"),
        count(col(s"`${c0}__ts`")).as(s"${c0}__nts"),
        count(col(s"`${c0}__date`")).as(s"${c0}__ndate"),
        count(when(col(s"`${c0}__midf`"), 1)).as(s"${c0}__nmid"),
        min(col(s"`${c0}__long`")).as(s"${c0}__min"),
        max(col(s"`${c0}__long`")).as(s"${c0}__max"),
        count(when(col(s"`${c0}__boolf`"), 1)).as(s"${c0}__nbool"))
    }
    // 9 aggregates × k columns exceeds spark.sql.codegen.maxFields (100)
    // on tables wider than ~11 columns, silently dropping the whole probe
    // out of whole-stage codegen (measured ~4 s of the 12-col baseline
    // table's probe). Raise it for THIS job only and restore after —
    // each aggregate expression is small, so the generated code splits
    // cleanly into helper methods well under Janino's limits.
    val sess = probed.sparkSession
    val maxFieldsKey = "spark.sql.codegen.maxFields"
    val prevMaxFields = sess.conf.getOption(maxFieldsKey)
    val r =
      try {
        sess.conf.set(maxFieldsKey, math.max(200, aggs.size * 2))
        probed.agg(aggs.head, aggs.tail: _*)
          .collectBounded(1, "one-row probe agg")(0)
      } finally {
        prevMaxFields match {
          case Some(v) => sess.conf.set(maxFieldsKey, v)
          case None => sess.conf.unset(maxFieldsKey)
        }
      }
    cols.foldLeft(base) { (d, c0) =>
      def g(s: String): Long = {
        val v = r.get(r.fieldIndex(s"${c0}__$s")); if (v == null) 0L else v.asInstanceOf[Long]
      }
      val n = g("n")
      val target: Option[DataType] =
        if (n == 0) None
        else if (g("nbool") == n) Some(BooleanType)
        else if (g("nlong") == n) {
          val (lo, hi) = (g("min"), g("max"))
          if (lo >= Short.MinValue && hi <= Short.MaxValue) Some(ShortType)
          else if (lo >= Int.MinValue && hi <= Int.MaxValue) Some(IntegerType)
          else Some(LongType)
        }
        else if (g("ndbl") == n) Some(DoubleType)
        else if (g("ndate") == n && (g("nts") != n || g("nmid") == n))
          Some(DateType)
        else if (g("nts") == n) Some(TimestampType)
        else None
      target match {
        case Some(BooleanType) => d.withColumn(c0, qcol(c0) === "true")
        case Some(DateType) =>
          d.withColumn(c0, parseLocalDateFlex(qcol(c0)))
        case Some(t) => d.withColumn(c0, qcol(c0).cast(t))
        case None => d
      }
    }
  }

  /** CSV read with promotional inference (the reference's default path):
    * all columns land as string (no Spark inference pass), then the shim
    * narrows each to the tightest type. */
  def readCsvPromotional(spark: SparkSession, path: String,
                         opts: ReadOptions = ReadOptions()): DataFrame = {
    // gzip parts cap the scan at one core per file, and the promotional
    // path scans TWICE (probe + returned frame) — stage a splittable
    // uncompressed copy once, then both passes parse at full parallelism
    val effPath =
      if (opts.stageCompressed)
        stageSplittableCopy(spark, path, opts.stageDir).getOrElse(path)
      else path
    var r = spark.read
      .option("header", opts.headerRow)
      .option("sep", opts.separator)
    opts.comment.foreach(c => r = r.option("comment", c.toString))
    var df = r.csv(effPath)
    if (opts.columnAllowlist.nonEmpty)
      df = df.select(opts.columnAllowlist.map(qcol): _*)
    if (opts.columnBlocklist.nonEmpty) df = df.drop(opts.columnBlocklist: _*)
    opts.numRows.foreach(n => df = df.limit(n))
    inferPromotional(df)
  }

  /** Bucketed write: pre-shuffles storage on the join/agg key so subsequent
    * equi-joins and aggregations on `keys` between co-bucketed tables plan
    * with NO Exchange — the 100 TB pattern for repeated big-big joins
    * (SCALE.md §Joins; IoSpec proves the shuffle-free plan). Requires a
    * table catalog (saveAsTable), not a bare path — bucketing metadata lives
    * in the catalog. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** svm-format read (reference src/tech/v3/libs/svm.clj): Spark's native
    * libsvm source (splittable text, distributed parse). Returns
    * (label double, features array<double>) — arrays, not ml vectors, so
    * the result composes with the engine's column functions. `numFeatures`
    * skips the extra max-index discovery pass — pass it at scale. */
  def readLibsvm(spark: SparkSession, path: String,
                 numFeatures: Option[Int] = None): DataFrame = {
    var r = spark.read.format("libsvm")
    numFeatures.foreach(n => r = r.option("numFeatures", n.toString))
    import org.apache.spark.ml.functions.vector_to_array
    r.load(path).select(
      org.apache.spark.sql.functions.col("label"),
      vector_to_array(org.apache.spark.sql.functions.col("features"))
        .as("features"))
  }

  /** svm-format write: expects a double label column and an array<double>
    * features column; one part file per partition (native source). */
  def writeLibsvm(df: DataFrame, path: String, labelCol: String = "label",
                  featuresCol: String = "features"): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.functions.col
    df.select(col(labelCol).cast(org.apache.spark.sql.types.DoubleType).as("label"),
        array_to_vector(col(featuresCol)).as("features"))
      .write.mode(SaveMode.Overwrite).format("libsvm").save(path)
  }

  /** write! dispatch (reference io.clj:274-301). Parquet is the engine's
    * binary snapshot format (replacing the reference's nippy). */
  def write(df: DataFrame, path: String, format: String = "parquet",
            mode: SaveMode = SaveMode.Overwrite,
            partitionBy: Seq[String] = Seq.empty,
            /** text-format codec: "gzip" | "bzip2" | "lz4" | "zstd" | …
              * (the reference's bzip2.clj path — Hadoop ships BZip2Codec,
              * so .csv.bz2 reads transparently and writes via this). */
            compression: Option[String] = None): Unit = {
    var w = df.write.mode(mode).format(format)
    if (format == "csv") w = w.option("header", true)
    compression.foreach(c => w = w.option("compression", c))
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }
}

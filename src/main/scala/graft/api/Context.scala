package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Entry point of the graft pipeline API: wraps a SparkSession the way the
  * reference's `Context` wraps its runtime (`python/tuplex/context.py:50`),
  * exposing sources (`parallelize`, `csv`, `text`, `orc`, + parquet as a
  * superset) and VFS utilities (`ls`/`cp`/`rm`, `context.py:437-477`).
  *
  * Options mirror the `tuplex.*` config surface where meaningful on Spark
  * (e.g. `csv.maxDetectionRows` for schema-inference sampling); everything
  * execution-related (memory, partitions, spill) is deliberately left to
  * Spark's own configuration — Tungsten already owns those concerns.
  */
final class Context(val spark: SparkSession, val options: Map[String, String] = Map.empty) {

  private def opt(key: String, default: String): String = options.getOrElse(key, default)

  /** Local/in-memory rows → DataSet (`context.py:246-286`). Column names
    * default to _1.._n like the reference's auto-generated tuple columns. */
  def parallelize[T: Encoder](values: Seq[T], columns: Seq[String] = Nil): DataSet = {
    var df = spark.createDataset(values).toDF()
    if (columns.nonEmpty) df = df.toDF(columns: _*)
    DataSet.fromDataFrame(this, df)
  }

  def fromDataFrame(df: DataFrame): DataSet = DataSet.fromDataFrame(this, df)

  /** Heterogeneous rows — the reference's mixed-type `parallelize`
    * (`context.py:251-261`) with type unification (`TypeSystem.h:417`,
    * `unifyTypes`/`combineToNullableType`): per column, Int/Long widen to
    * Long, any numeric mix widens to Double (the autoUpcast rule), nulls
    * make the column nullable (`[1, None, 4]` ⇒ nullable long). A column
    * mixing incompatible kinds (string + number, bool + number) is
    * rejected up front — the reference's PYOBJECT fallback is a CPython
    * escape hatch with no JVM analogue worth faking. */
  def parallelizeAny(values: Seq[Seq[Any]], columns: Seq[String] = Nil): DataSet = {
    require(values.nonEmpty, "parallelizeAny needs at least one row")
    val n = values.head.length
    require(values.forall(_.length == n), "rows must have equal arity")
    val names =
      if (columns.nonEmpty) { require(columns.length == n, "column count"); columns }
      else (1 to n).map("_" + _)
    val colTypes = (0 until n).map { i =>
      val vs = values.map(_(i)).filter(_ != null)
      val nullable = vs.length != values.length
      val t = vs.foldLeft(NullType: DataType) { (acc, v) =>
        val vt: DataType = v match {
          case _: Int | _: Long => LongType
          case _: Float | _: Double => DoubleType
          case _: Boolean => BooleanType
          case _: String => StringType
          case other => throw new IllegalArgumentException(
            s"column ${names(i)}: unsupported value ${other.getClass.getName}")
        }
        (acc, vt) match {
          case (NullType, x) => x
          case (x, y) if x == y => x
          case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType // autoUpcast
          case (x, y) => throw new IllegalArgumentException(
            s"column ${names(i)}: cannot unify $x with $y")
        }
      }
      StructField(names(i), if (t == NullType) StringType else t, nullable || t == NullType)
    }
    val schema = StructType(colTypes)
    val rows = values.map { vs =>
      org.apache.spark.sql.Row.fromSeq(vs.zipWithIndex.map {
        case (null, _) => null
        case (v: Int, i) if colTypes(i).dataType == LongType => v.toLong
        case (v: Int, i) if colTypes(i).dataType == DoubleType => v.toDouble
        case (v: Long, i) if colTypes(i).dataType == DoubleType => v.toDouble
        case (v: Float, _) => v.toDouble
        case (v, _) => v
      })
    }
    DataSet.fromDataFrame(this,
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
  }

  /** Dict auto-unpack (`parallelize(..., auto_unpack=True)`,
    * `context.py:251-261`): maps become columns keyed by first-seen key
    * order; missing keys are null. Values unify per [[parallelizeAny]]. */
  def parallelizeMaps(values: Seq[Map[String, Any]]): DataSet = {
    require(values.nonEmpty, "parallelizeMaps needs at least one row")
    val keys = values.foldLeft(Vector.empty[String]) { (acc, m) =>
      acc ++ m.keys.filterNot(acc.contains)
    }
    parallelizeAny(values.map(m => keys.map(k => m.getOrElse(k, null))), keys)
  }

  /** CSV source with sample-based inference (`FileInputOperator.cc:47-98`):
    * header + per-column types via Spark's sampler over a bounded line
    * sample (`csv.maxDetectionRows`), delimiter via our own small
    * driver-side sniffer (Spark has no delimiter inference), explicit
    * `typeHints`/`typeHintsAt` overriding inferred column types
    * (`python/tuplex/context.py:321,344-346`), multiple null-value strings.
    * Rows that don't parse against the inferred schema divert to the
    * dual-mode error channel (`exceptionCounts`/`ignore`/`resolve`), and
    * repaired rows merge back at their original input positions (both
    * channels split one scan and share a row-id space). Line-based:
    * quoted fields with embedded newlines are not supported. */
  def csv(
      pattern: String,
      columns: Seq[String] = Nil,
      header: Option[Boolean] = None,
      delimiter: Option[String] = None,
      quotechar: String = "\"",
      nullValues: Seq[String] = Seq(""),
      typeHints: Map[String, DataType] = Map.empty,
      typeHintsAt: Map[Int, DataType] = Map.empty): DataSet = {
    // reference parity: a pattern matching nothing yields an empty dataset
    // (ErrorDataSet semantics — actions succeed with no rows), not a crash
    if (ls(pattern).isEmpty) {
      System.err.println(s"[graft] csv: no input matches $pattern")
      return DataSet.fromDataFrame(this, spark.emptyDataFrame)
    }
    val delim = delimiter.getOrElse(CsvSniffer.sniffDelimiter(spark, pattern))
    val hasHeader = header.getOrElse(CsvSniffer.sniffHeader(spark, pattern, delim))
    // schema inference from a BOUNDED sample (`csv.maxDetectionRows`,
    // mirroring `FileInputOperator.cc:47-98`): Spark's inferSchema=true
    // would parse every byte of the input twice — untenable when the glob
    // is 100 TB. `limit` on the line stream stops the sample scan early.
    // The sample holds DATA lines only (per-file header stripping by byte
    // offset): letting other files' header lines into the sample would
    // silently widen every column to string in a multi-file glob. Column
    // names come from the sniffed header text instead.
    val detectionRows = opt("csv.maxDetectionRows", "10000").toInt
    val sample = dataLines(pattern, hasHeader).limit(detectionRows)
    val inferred = {
      val anon = spark.read.option("inferSchema", "true")
        .option("samplingRatio", opt("csv.samplingRatio", "1.0"))
        .option("mode", "PERMISSIVE")
        .option("header", "false").option("sep", delim)
        .option("quote", quotechar)
        .option("nullValue", nullValues.headOption.orNull)
        .csv(sample).schema
      if (!hasHeader) anon
      else {
        val names = CsvSniffer.headerFields(spark, pattern, delim, quotechar)
        StructType(anon.fields.zipWithIndex.map { case (f, i) =>
          if (i < names.length) f.copy(name = names(i)) else f
        })
      }
    }
    // `columns` renames FIRST (the reference's order: columns= names are
    // what the user knows), then type hints override the sampled types IN
    // THE PARSE SCHEMA (not as post-read casts): a value that is valid
    // under the hinted type must parse, not fall into the error channel
    // because the sample guessed a narrower type. Baking the final names
    // into the read schema keeps the good frame, the error channel, and
    // resolver reapplies on one consistent naming (csv schema matching is
    // positional under enforceSchema, so names never affect parsing).
    val hinted = {
      val named =
        if (columns.nonEmpty) {
          require(columns.length == inferred.length,
            s"columns has ${columns.length} names for ${inferred.length} csv fields")
          inferred.fields.zip(columns).map { case (f, n) => f.copy(name = n) }
        } else inferred.fields
      val byName = named.map(f =>
        typeHints.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f))
      for ((idx, tpe) <- typeHintsAt) {
        val i = if (idx < 0) byName.length + idx else idx
        if (i >= 0 && i < byName.length) byName(i) = byName(i).copy(dataType = tpe)
      }
      StructType(byName)
    }
    // Rows that don't parse against the (hinted) schema — malformed line,
    // or a type the bounded sample never saw — are INPUT EXCEPTIONS, not
    // silent nulls, mirroring the reference's parse-errors-as-exceptions
    // path (`PhysicalPlan.cc:202-208`). The main read DROPs malformed
    // rows; the error channel re-derives them from the raw lines with a
    // `from_csv` expression (Spark forbids corrupt-record-only scans, and
    // this keeps the extra text read lazy — it only runs if the error
    // channel is actually consumed via ignore/exceptionCounts).
    // SINGLE-SCAN dual channel: every data line is parsed once under the
    // hinted schema with a corrupt-record column; the good and error
    // channels are two filters over the SAME plan, so the row ids assigned
    // before the split are one consistent space — resolve()'d parse
    // repairs merge back at their true input positions (two independent
    // scans would number good and bad rows separately and interleave them
    // arbitrarily on collect()). Known cost of this ordered-merge design:
    // from_csv parses EVERY cell of every line (OptimizeCsvJsonExprs only
    // prunes option-free from_csv calls), where the native csv source
    // converted only required columns — on very wide CSVs where order and
    // the error channel don't matter, read through spark.read.csv/parquet
    // instead. Limitation (line-based): quoted fields with EMBEDDED
    // NEWLINES are not supported (the reference's parser is line-based too).
    val corruptCol = "_g_corrupt"
    val parseOpts = Map(
      "sep" -> delim, "quote" -> quotechar,
      "nullValue" -> nullValues.headOption.getOrElse(""),
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)
    val parseSchema = StructType(hinted.fields :+
      StructField(corruptCol, StringType, nullable = true))
    val parsed = dataLines(pattern, hasHeader).toDF("value")
      .select(col("value").as(DataSet.RawLine),
        from_csv(col("value"), parseSchema, parseOpts).as("_p"))
      .withColumn(DataSet.RowId, monotonically_increasing_id())
    var df = parsed.filter(col(s"_p.$corruptCol").isNull)
      .select(col("_p.*") +: Seq(col(DataSet.RowId)): _*)
      .drop(corruptCol)
    val failed = parsed.filter(col(s"_p.$corruptCol").isNotNull)
      .select(col("_p.*") +: Seq(col(DataSet.RawLine), col(DataSet.RowId)): _*)
    // extra null-value strings beyond the first (Spark parses only one
    // natively): honored as post-read substitution — full-fidelity for
    // string columns; for typed columns a row whose cell holds a secondary
    // null token cannot parse and diverts to the error channel instead
    for (nv <- nullValues.drop(1); c <- hinted.fieldNames)
      df = df.withColumn(c, when(col(c) === nv, lit(null)).otherwise(col(c)))
    DataSet.fromDataFrameWithParseErrors(this, df, failed, hinted, parseOpts)
  }

  /** Non-blank DATA lines of a csv glob: with a header, the first line of
    * EVERY file is dropped — exactly the csv reader's line discipline.
    * TextInputFormat keys each line with its byte offset in its file, so
    * "first line" is simply offset == 0: per file, distributed, and free
    * of header-text comparison (a data line byte-identical to the header
    * stays, and multi-file globs with divergent header text are handled). */
  private def dataLines(pattern: String, hasHeader: Boolean): org.apache.spark.sql.Dataset[String] = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.TextInputFormat
    val raw = spark.sparkContext
      .hadoopFile[LongWritable, Text, TextInputFormat](
        pattern, spark.sparkContext.defaultMinPartitions)
    val kept = (if (hasHeader) raw.filter(_._1.get != 0L) else raw)
      .map(_._2.toString) // copy out: TextInputFormat reuses Writables
    spark.createDataset(kept)(org.apache.spark.sql.Encoders.STRING)
      .filter(length(col("value")) > 0)
  }

  /** Text source: one string column per line (`context.py:367-387`). */
  def text(pattern: String, nullValues: Seq[String] = Nil): DataSet = {
    if (ls(pattern).isEmpty) {
      System.err.println(s"[graft] text: no input matches $pattern")
      return DataSet.fromDataFrame(this, spark.emptyDataFrame)
    }
    var df = spark.read.text(pattern)
    for (nv <- nullValues)
      df = df.withColumn("value", when(col("value") === nv, lit(null)).otherwise(col("value")))
    DataSet.fromDataFrame(this, df)
  }

  /** ORC source (`context.py:389-405`). */
  def orc(pattern: String, columns: Seq[String] = Nil): DataSet = {
    var df = spark.read.orc(pattern)
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    DataSet.fromDataFrame(this, df)
  }

  /** Parquet source — capability superset (reference has no parquet). */
  def parquet(pattern: String, columns: Seq[String] = Nil): DataSet = {
    var df = spark.read.parquet(pattern)
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    DataSet.fromDataFrame(this, df)
  }

  /** JSON-lines source — capability superset (the reference compiles no
    * JSON at all, SURVEY §2.8 "JSON functions: none"). Schema is inferred
    * from the data unless given; pass `schema` in production so the scan
    * skips the inference pass over the input. */
  def json(pattern: String, columns: Seq[String] = Nil,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataSet = {
    val reader = spark.read
    schema.foreach(reader.schema)
    var df = reader.json(pattern)
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    DataSet.fromDataFrame(this, df)
  }

  // ---- VFS utilities (context.py:437-477) — Hadoop FS covers file://, s3a://, hdfs:// .

  private def fs(p: Path): FileSystem = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def ls(pattern: String): Seq[String] = {
    val p = new Path(pattern)
    Option(fs(p).globStatus(p)).map(_.toSeq.map(_.getPath.toString)).getOrElse(Nil)
  }

  def cp(src: String, dst: String): Unit = {
    val s = new Path(src); val d = new Path(dst)
    org.apache.hadoop.fs.FileUtil.copy(fs(s), s, fs(d), d, false, spark.sparkContext.hadoopConfiguration)
  }

  def rm(pattern: String): Unit =
    ls(pattern).foreach { f => val p = new Path(f); fs(p).delete(p, true) }
}

/** Driver-side CSV dialect sniffing — the capability analogue of the
  * reference's `CSVStatistic` sampling (`utils/include/CSVStatistic.h:37-88`):
  * reads a small head sample of the first matching file and picks the
  * delimiter whose per-line count is most consistent, then decides header
  * presence by comparing first-line vs body numeric-ness. */
object CsvSniffer {
  private val Candidates = Seq(',', ';', '\t', '|')

  private def sampleLines(spark: SparkSession, pattern: String, n: Int = 64): Seq[String] = {
    // Driver-side head sample, like the reference's maxDetectionMemory
    // read — but accumulated ACROSS glob files until `n` lines: at scale
    // an empty shuffle partition routinely writes a header-only (or fully
    // empty) part file, and a glob whose FIRST file is one of those must
    // not blind the sniffer to the real data behind it (found live: the
    // sf1-staged 311 fixture wrote part-00000 as a lone header line, the
    // single-file sampler returned 1 line, header detection bailed to
    // false, and every column came back _c0/_c1/_c2). The file probe is
    // capped: each open is a driver round-trip, and a glob with thousands
    // of empty parts should degrade to "no sample", not a driver stall.
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus already returns each file's length — skip zero-byte parts
    // for free so the capped opens below are spent only on files that can
    // contain lines (a glob whose first 64 parts are empty must still
    // reach the data behind them)
    val files = Option(fs.globStatus(p)).map(_.toSeq) match {
      case Some(Nil) | None => Seq(p) // no glob expansion — try the literal
      case Some(matched) => matched.filter(_.getLen > 0).map(_.getPath)
    }
    val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[String]
    var got = 0
    for (f <- files.take(64) if got < n) {
      val raw = fs.open(f)
      // compressed inputs (.gz/.bz2/…) must sniff DECOMPRESSED text — the
      // same codec resolution Spark's own line reader applies per file
      val codec = codecs.getCodec(f)
      val in: java.io.InputStream =
        if (codec == null) raw
        else try codec.createInputStream(raw) catch {
          case e: Throwable => raw.close(); throw e // don't leak the handle
        }
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        src.getLines().take(n - got).foreach { l => out += l; got += 1 }
      } finally in.close()
    }
    out.result()
  }

  /** Column names from the header line of the first NON-EMPTY file
    * (driver-side read): quote-aware split — a quoted header field may
    * contain the delimiter, and `""` inside quotes is an escaped quote.
    * Empty input → empty. */
  def headerFields(spark: SparkSession, pattern: String, delim: String,
      quote: String): Array[String] =
    sampleLines(spark, pattern, n = 1).headOption match {
      case None => Array.empty
      case Some(h) => splitQuoted(h, delim, quote.headOption.getOrElse('"'))
    }

  private[api] def splitQuoted(line: String, delim: String, q: Char): Array[String] = {
    val out = Array.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuotes = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == q && i + 1 < line.length && line.charAt(i + 1) == q) {
          cur += q; i += 1 // escaped quote
        } else if (c == q) inQuotes = false
        else cur += c
      } else if (c == q && cur.toString.trim.isEmpty) {
        cur.clear() // quote after only leading whitespace opens the field
        inQuotes = true
      } else if (line.startsWith(delim, i)) {
        out += cur.result(); cur.clear(); i += delim.length - 1
      } else cur += c
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim)
  }

  def sniffDelimiter(spark: SparkSession, pattern: String): String = {
    val lines = sampleLines(spark, pattern).filter(_.nonEmpty)
    if (lines.isEmpty) return ","
    val best = Candidates.maxBy { d =>
      val counts = lines.map(_.count(_ == d))
      if (counts.head == 0) -1.0
      else counts.head.toDouble - counts.map(c => math.abs(c - counts.head)).sum
    }
    best.toString
  }

  def sniffHeader(spark: SparkSession, pattern: String, delim: String): Boolean = {
    val lines = sampleLines(spark, pattern).filter(_.nonEmpty)
    if (lines.size < 2) return false
    def numericCells(l: String) =
      l.split(java.util.regex.Pattern.quote(delim), -1)
        .count(c => scala.util.Try(c.trim.toDouble).isSuccess)
    // header ⇔ first line has no numeric cells while the body does
    numericCells(lines.head) == 0 && lines.tail.exists(numericCells(_) > 0)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension-dispatched file loading — the analogue of the reference's
  * `FileFormat.get_reader` registry / `Table.from_file`
  * (Orange/data/io_base.py:28-60, io.py:65-120, table.py:1076).
  *
  * parquet stays the engine's scale format (columnar scan, pushdown);
  * the text/spreadsheet formats are Orange's interchange formats and
  * parse through the shared .tab header pipeline.
  */
object Sources {

  /** Transparent-compression suffixes (reference `_compressed_open`,
    * Orange/data/io.py:126 — .gz/.bz2/.xz/.zip). Only the TEXT formats
    * decompress (.parquet.gz etc. fall through to the unsupported-
    * extension error rather than a confusing codec failure downstream).
    * .gz/.bz2 stream through Hadoop codecs in both the header sniff and
    * the distributed body read; .xz (commons-compress) and .zip (first
    * archive member, JDK zip) have no Hadoop codec, so they decompress
    * driver-side to a temp file — these are Orange's small-data
    * interchange formats, parquet stays the scale path. */
  private val CompressedExts = Seq(".gz", ".bz2", ".xz", ".zip")
  private val CompressibleExts = Seq(".tab", ".tsv", ".csv", ".basket")
  private def stripCompressed(lower: String): String =
    CompressedExts.find(lower.endsWith)
      .map(e => lower.dropRight(e.length))
      .filter(inner => CompressibleExts.exists(inner.endsWith))
      .getOrElse(lower)

  /** Driver-side decompression for codecs Hadoop lacks: copy the
    * decompressed stream to a local temp file carrying the inner
    * extension, then re-dispatch on it. */
  private def inflateToTemp(spark: SparkSession, path: String,
                            ce: String, innerExt: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = fs.open(p)
    val in: java.io.InputStream = ce match {
      case ".xz" =>
        new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(raw)
      case ".zip" =>
        val z = new java.util.zip.ZipInputStream(raw)
        val e = z.getNextEntry
        require(e != null, s"empty zip archive: $path")
        z
      case other => throw new IllegalArgumentException(s"no inflater for $other")
    }
    val tmp = java.io.File.createTempFile("graft_inflate_", innerExt)
    tmp.deleteOnExit()
    try java.nio.file.Files.copy(in, tmp.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.getAbsolutePath
  }

  /** Load a table by file extension: .parquet / .tab|.tsv / .csv /
    * .basket / .xlsx — text formats also in .gz/.bz2/.xz/.zip. */
  def fromFile(spark: SparkSession, path: String): DataFrame = {
    val lowerAll = path.toLowerCase
    CompressedExts.find(e => lowerAll.endsWith(e) && e != ".gz" && e != ".bz2")
      .foreach { ce =>
        val inner = lowerAll.dropRight(ce.length)
        CompressibleExts.find(inner.endsWith).foreach { innerExt =>
          return fromFile(spark, inflateToTemp(spark, path, ce, innerExt))
        }
      }
    val lower = stripCompressed(lowerAll)
    if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".tab") || lower.endsWith(".tsv"))
      TabReader.read(spark, path)
    else if (lower.endsWith(".csv"))
      TabReader.read(spark, path, delimiter = ",")
    else if (lower.endsWith(".txt")) // ambiguous-dialect text: sniff it
      fromDelimited(spark, path)
    else if (lower.endsWith(".basket")) BasketReader.read(spark, path)
    else if (lower.endsWith(".xlsx")) ExcelReader.read(spark, path)
    else if (lower.endsWith(".xls")) XlsReader.read(spark, path)
    else if (lower.endsWith(".dst")) DistMatrixIO.readDst(spark, path)
    else throw new IllegalArgumentException(
      s"unsupported extension: $path (expected .parquet/.tab/.tsv/.csv/.basket/.xlsx/.xls/.dst)")
  }

  /** Read a delimited text file with a SNIFFED dialect — the engine
    * half of the reference's CSV import flow (owcsvimport.py:590-615
    * default_options_for_mime_type → sniff_csv_with_path): a bounded
    * driver-side sample guesses delimiter/quote ([[DialectSniffer]]),
    * then the distributed [[TabReader.read]] runs with that explicit
    * dialect — the cluster-side plan is identical to a user-specified
    * one. Per-column overrides ride through unchanged (the widget's
    * column-type matrix, [[TabReader.ColType]]). */
  def fromDelimited(spark: SparkSession, path: String,
                    localeTimes: Boolean = false,
                    overrides: Map[String, TabReader.ColType] = Map.empty)
      : DataFrame = {
    val d = DialectSniffer.sniffFile(spark, path)
    TabReader.read(spark, path, delimiter = d.delimiter.toString,
      localeTimes = localeTimes, overrides = overrides, quote = d.quote,
      hasHeader = d.hasHeader)
  }

  /** Write a table by file extension — the reverse dispatch
    * (io_base.py:596-700 writers; io.py ExcelReader.write). .parquet is
    * the distributed scale path; .tab/.csv/.xlsx are Orange's
    * interchange formats. */
  def toFile(df: DataFrame, path: String): Unit = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) df.write.mode("overwrite").parquet(path)
    else if (lower.endsWith(".tab") || lower.endsWith(".tsv"))
      TabReader.write(df, path)
    else if (lower.endsWith(".csv")) TabReader.writeCsv(df, path)
    else if (lower.endsWith(".xlsx")) ExcelWriter.write(df, path)
    else throw new IllegalArgumentException(
      s"unsupported extension: $path (expected .parquet/.tab/.tsv/.csv/.xlsx)")
  }

  /** UrlReader (io.py:409-460): fetch a remote table to a local temp
    * file, then dispatch on its extension. `file:` URLs read directly —
    * remote schemes require egress, which the reference also just
    * delegates to the network stack. */
  def fromUrl(spark: SparkSession, url: String): DataFrame = {
    val u = java.net.URI.create(url).toURL
    if (u.getProtocol == "file")
      return fromFile(spark, java.nio.file.Paths.get(u.toURI).toString)
    val name = u.getPath.split("/").last
    val ext = if (name.contains(".")) name.substring(name.lastIndexOf('.'))
              else ".tab"
    val tmp = java.io.File.createTempFile("graft_url_", ext)
    tmp.deleteOnExit()
    val in = u.openStream()
    try java.nio.file.Files.copy(in, tmp.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    fromFile(spark, tmp.getAbsolutePath)
  }

  /** Bucketed sink: write `df` hash-bucketed (and bucket-sorted) on
    * `bucketCols` as catalog table `name` with data at `path`. Two
    * tables bucketed the same way join WITHOUT any shuffle — both sides
    * scan pre-partitioned buckets and sort-merge in place. This is the
    * co-located-join strategy for 100 TB fact tables: pay one shuffle at
    * WRITE time, never again per query (Spark has no Hive dependency
    * here — bucket metadata lives in the in-memory/derby catalog;
    * BucketingSpec asserts the no-Exchange plan). */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    bucketCols: Seq[String], buckets: Int): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path)
    w.saveAsTable(name)
  }

  /** Hive-layout partitioned sink: directory-per-value on the partition
    * columns. A filter on the partition column prunes at PLANNING time —
    * unmatched date/type directories are never listed, let alone read.
    * This is the other half of the 100 TB layout story next to
    * [[writeBucketed]]: partition by the coarse always-filtered axis
    * (ingest date, source), bucket by the join key. PartitioningSpec
    * asserts the pruned scan (PartitionFilters + partition count). Keep
    * partition cardinality bounded (≤ thousands): each value is a
    * directory, and millions of tiny partitions thrash the driver's
    * file index instead of helping. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** SqlTable source (Orange/data/sql/table.py:27-95): the reference
    * materializes a DB table/query lazily; the Spark-native equivalent
    * is the JDBC source with predicate pushdown. `partitionColumn` /
    * bounds enable parallel reads (numPartitions splits of the key
    * range) — the 100 TB ingestion shape. */
  def sqlTable(spark: SparkSession, jdbcUrl: String, table: String,
               properties: java.util.Properties = new java.util.Properties(),
               partitionColumn: Option[String] = None,
               lowerBound: Long = 0L, upperBound: Long = 0L,
               numPartitions: Int = 1): DataFrame =
    partitionColumn match {
      case Some(pc) => spark.read.jdbc(jdbcUrl, table, pc, lowerBound,
        upperBound, numPartitions, properties)
      case None => spark.read.jdbc(jdbcUrl, table, properties)
    }
}

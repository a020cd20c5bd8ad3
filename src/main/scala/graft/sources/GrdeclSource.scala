package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pumle.IncReader

/** DataSource V2 for Eclipse GRDECL/INC property decks (OP-S10 as a
  * first-class Spark format):
  *
  * {{{
  *   spark.read.format("grdecl").load("/decks")              // all keywords
  *   spark.read.format("grdecl").option("keyword", "PORO")
  *     .load("/decks/PETRO_0.INC")
  * }}}
  *
  * Schema: (file string, keyword string, cell_idx bigint, value double),
  * cell_idx in deck (F-) order. Grammar per
  * /root/reference/benchmark/unisim-1-d/PETRO_0.INC:1 — `KEYWORD`,
  * whitespace-separated values with `N*v` run-length tokens, `--`
  * comments, `/` terminator (parsing shared with [[IncReader]], the
  * RDD-path reader this format supersedes).
  *
  * Scale shape: one InputPartition per FILE — decks are ~1 MB and RLE
  * counts cross line boundaries, so the file is the natural split unit
  * (same conclusion as IncReader's wholeTextFiles); a 100 TB deck
  * corpus is millions of files, so file-granular partitions saturate
  * any executor count. Column pruning is pushed into the reader
  * (SupportsPushDownRequiredColumns): a `value`-only projection never
  * allocates the file/keyword strings per row.
  */
class GrdeclSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "grdecl"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GrdeclSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GrdeclTable(new CaseInsensitiveStringMap(properties))
}

object GrdeclSource {
  val schema: StructType = new StructType()
    .add("file", StringType)
    .add("keyword", StringType)
    .add("cell_idx", LongType)
    .add("value", DoubleType)

  /** Expand `path` (file, directory, or glob) to its file list. */
  private[sources] def listFiles(path: String): Seq[String] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched: Seq[FileStatus] =
      Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    require(matched.nonEmpty, s"grdecl: no files match $path")
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }.map(_.getPath.toString).sorted
  }
}

private class GrdeclTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"grdecl(${options.get("path")})"
  override def schema(): StructType = GrdeclSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table-level options (load-time) with scan options
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new GrdeclScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class GrdeclScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GrdeclSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GrdeclScan(
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("grdecl: path required")),
    Option(options.get("keyword")), required)
}

private class GrdeclScan(path: String, keyword: Option[String],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    GrdeclSource.listFiles(path)
      .map(f => GrdeclPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GrdeclReaderFactory(keyword, required.fieldNames)
}

private case class GrdeclPartition(file: String) extends InputPartition

private class GrdeclReaderFactory(keyword: Option[String],
    fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GrdeclReader(p.asInstanceOf[GrdeclPartition].file, keyword, fields)
}

private class GrdeclReader(file: String, keywordOpt: Option[String],
    fields: Array[String]) extends PartitionReader[InternalRow] {
  // whole-file parse at open: decks are ~1 MB (grammar needs the full
  // keyword block anyway — RLE tokens cross line boundaries)
  private val rows: Iterator[InternalRow] = {
    val p = new Path(file)
    val fs = p.getFileSystem(new Configuration())
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val parsed = IncReader.parseText(text)
    val wanted = keywordOpt.fold(parsed)(k => parsed.filter(_._1 == k))
    val fileU = UTF8String.fromString(file)
    wanted.iterator.flatMap { case (kw, values) =>
      val kwU = UTF8String.fromString(kw)
      values.iterator.zipWithIndex.map { case (v, i) =>
        // project exactly the pruned columns, in the pruned order
        InternalRow.fromSeq(fields.map {
          case "file"     => fileU
          case "keyword"  => kwU
          case "cell_idx" => i.toLong
          case "value"    => v
        }.toSeq)
      }
    }
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

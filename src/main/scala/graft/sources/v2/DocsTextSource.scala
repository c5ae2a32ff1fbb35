package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's native input format —
  * one document per line, `<doc_id>\t<escaped text>` (the text scan
  * + record-id operator O1, `Shingling.java:30-36` semantics,
  * re-expressed through Spark's connector API instead of a
  * line-RDD):
  *
  *  - **Byte-range splits, newline-aligned**: each file is cut into
  *    `splitBytes` ranges; a reader seeks to its start, always skips
  *    its first line when start > 0, and reads lines whose starting
  *    offset is <= its end (the Hadoop LineRecordReader contract) —
  *    every line, including one starting exactly on a boundary, is
  *    read exactly once whatever the split size (specs prove result
  *    ≡ unsplit, including boundary-aligned and CRLF lines). At
  *    100 TB this is what makes a 10 GB landing file parallel
  *    instead of one task.
  *  - **Column pruning**: `pruneColumns` reaches the reader — a
  *    doc_id-only projection never materializes text bytes as rows
  *    (the dominant cost for document corpora).
  *  - **Filter pushdown**: doc_id comparisons evaluate inside the
  *    reader BEFORE row construction; pushed filters surface in the
  *    scan description for plan audits.
  *
  * Escaping: `\` → `\\`, TAB → `\t`, LF → `\n` (writer:
  * [[graft.sources.Sinks.writeDocLines]]) so any text round-trips a
  * line format. Line parsing splits on the FIRST unescaped tab.
  */
class DocsTextSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocsTextSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocsTextTable(properties.get("path"),
      Option(properties.get("splitBytes")).map(_.toLong)
        .getOrElse(DocsTextSource.DefaultSplitBytes))
}

object DocsTextSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Scala mirror of the writer's SQL replace chain
    * ([[graft.sources.Sinks.writeDocLines]]) — property-tested as an
    * exact inverse of [[unescape]] for arbitrary text. */
  private[graft] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")

  private[graft] def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case '\\' => b.append('\\'); i += 2
          case other => b.append(c); b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}

class DocsTextTable(path: String, splitBytes: Long)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft_docs_text($path)"
  override def schema(): StructType = DocsTextSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocsTextScanBuilder(path, splitBytes)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new DocsTextWriteBuilder(path, info)
}

class DocsTextScanBuilder(path: String, splitBytes: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = DocsTextSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  /** Partition-LOCAL limit (the pushdown contract — Spark applies
    * the global limit above the scan): each reader stops after n
    * surviving rows instead of scanning its whole byte range. */
  override def pushLimit(n: Int): Boolean = { limit = n; true }

  /** doc_id bound comparisons are applied EXACTLY in the reader, so
    * they are consumed here (no residual re-evaluation); anything
    * else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Long) => true
      case GreaterThan("doc_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long) => true
      case _ => false
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new DocsTextScan(path, splitBytes, required, pushed, limit)
}

class DocsTextScan(path: String, splitBytes: Long, required: StructType,
                   pushed: Array[Filter], limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"DocsTextScan path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = FileSystem.get(new HPath(path).toUri, new Configuration())
    val files = fs.listStatus(new HPath(path)).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
      .sortBy(_.getPath.toString)
    files.flatMap { f =>
      val len = f.getLen
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i => DocsTextPartition(f.getPath.toString,
        i * splitBytes, math.min((i + 1) * splitBytes, len), len))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocsTextReaderFactory(required, pushed, limit)
}

case class DocsTextPartition(file: String, start: Long, end: Long,
                             fileLen: Long) extends InputPartition

class DocsTextReaderFactory(required: StructType, pushed: Array[Filter],
                            limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocsTextPartition]
    new DocsTextReader(p, required, pushed, limit)
  }
}

/** Reads lines by the Hadoop LineRecordReader contract: seek to
  * start, ALWAYS discard the first line when start > 0 (it belongs to
  * the split on the left, whether it started before the boundary or
  * exactly on it), then read full lines while their starting offset
  * is <= end. The line starting exactly at `end` is read by THIS
  * split and discarded as the head of the next — so boundary-aligned
  * lines are read exactly once, with no coordination. (Stopping at
  * a strict `< end` instead would read a boundary-aligned line in
  * NEITHER split: the left stops short and the right skips it.)
  *
  * Lines are framed on the RAW byte stream — terminators LF, CRLF,
  * or lone CR, counting the actual terminator bytes — because the
  * split arithmetic above is byte-offset arithmetic: a char-level
  * readLine that silently eats 1 or 2 terminator bytes drifts `pos`
  * on externally-produced CRLF files and corrupts boundary handling. */
class DocsTextReader(p: DocsTextPartition, required: StructType,
                     pushed: Array[Filter], limit: Int)
    extends PartitionReader[InternalRow] {
  private val fs = FileSystem.get(new HPath(p.file).toUri, new Configuration())
  private val in = fs.open(new HPath(p.file))
  private val bin = {
    in.seek(p.start)
    new java.io.BufferedInputStream(in, 64 * 1024)
  }
  // byte offset of the next line start (exact — includes terminator bytes)
  private var pos: Long = p.start

  /** One line off the raw stream; advances `pos` by the exact bytes
    * consumed (content + terminator). Null at EOF, nothing consumed. */
  private def readLineExact(): String = {
    var b = bin.read()
    if (b == -1) return null
    val buf = new java.io.ByteArrayOutputStream(128)
    while (b != -1 && b != '\n' && b != '\r') {
      buf.write(b); pos += 1
      b = bin.read()
    }
    if (b == '\n') pos += 1
    else if (b == '\r') {
      pos += 1
      bin.mark(1)
      val nb = bin.read()
      if (nb == '\n') pos += 1 else if (nb != -1) bin.reset()
    } // b == -1: final line ends at EOF with no terminator bytes
    new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  if (p.start > 0) readLineExact() // left split's line (partial or boundary-aligned)
  private var row: InternalRow = _

  private def keep(id: Long): Boolean = pushed.forall {
    case EqualTo("doc_id", v: java.lang.Long) => id == v
    case GreaterThan("doc_id", v: java.lang.Long) => id > v
    case GreaterThanOrEqual("doc_id", v: java.lang.Long) => id >= v
    case LessThan("doc_id", v: java.lang.Long) => id < v
    case LessThanOrEqual("doc_id", v: java.lang.Long) => id <= v
    case _ => true
  }

  private var emitted = 0

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (pos <= p.end) {
      val line = readLineExact()
      if (line == null) return false
      val tab = line.indexOf('\t') // escaped tabs are "\\t", never raw
      // a non-empty line without an id field is store corruption —
      // surface it loudly (the ingest-loop posture), never drop data
      // silently; fully blank lines (trailing-edit artifacts) are
      // tolerated as no-ops
      if (tab <= 0 && line.nonEmpty)
        throw new IllegalArgumentException(
          s"malformed doc line (no id\\tfield) in ${p.file} near byte $pos: " +
            line.take(80))
      if (tab > 0) {
        val id = java.lang.Long.parseLong(line.substring(0, tab))
        if (keep(id)) {
          val vals = required.fieldNames.map {
            case "doc_id" => java.lang.Long.valueOf(id)
            case "text" =>
              UTF8String.fromString(DocsTextSource.unescape(line.substring(tab + 1)))
          }
          row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
          emitted += 1
          return true
        }
      }
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = bin.close()
}

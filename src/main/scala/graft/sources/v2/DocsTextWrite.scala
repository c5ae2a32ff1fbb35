package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._

/** V2 WRITE path for the line format — the task-commit protocol that
  * makes a distributed write safe under retries and speculation:
  *
  *  1. every task attempt writes to a UNIQUE temp file
  *     (`_temporary_<job>/attempt-<partition>-<task>`) — two attempts
  *     of the same partition never collide;
  *  2. a task's `commit()` only NAMES its file in the commit message
  *     (the commit coordinator guarantees one committed attempt per
  *     partition); `abort()` deletes the attempt's file;
  *  3. the driver's job `commit(messages)` renames exactly the named
  *     files into place and drops the temp dir — a reader never sees
  *     a half-written or duplicated partition, because visibility IS
  *     the rename;
  *  4. job `abort()` removes the temp dir wholesale — a failed write
  *     leaves the destination untouched (DocsTextWriteSpec proves it).
  *
  * This is the same two-phase shape the parquet committer and the
  * streaming sink's _spark_metadata log implement; here it is spelled
  * out in ~100 lines over the reference's own line format. */
class DocsTextWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new DocsTextBatchWrite(path, info.schema().fieldNames.toSeq, doTruncate)
  }
}

case class DocsTextCommitMessage(tempFile: String, partition: Int)
  extends WriterCommitMessage

class DocsTextBatchWrite(path: String, fields: Seq[String], truncate: Boolean)
    extends BatchWrite {
  // one token names BOTH the temp dir and the final files: append-mode
  // jobs into a populated directory ACCUMULATE (a prior job's
  // part-00000-<otherJob>.txt can never collide with this job's), the
  // same contract as Spark's file committers
  private val jobToken = UUID.randomUUID().toString.take(8)
  private val jobTemp = s"$path/_temporary_$jobToken"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DocsTextWriterFactory(jobTemp, fields)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new HPath(path).toUri, new Configuration())
    val dest = new HPath(path)
    fs.mkdirs(dest)
    if (truncate) fs.listStatus(dest).foreach { f =>
      if (f.isFile && !f.getPath.getName.startsWith("_")) fs.delete(f.getPath, false)
    }
    messages.foreach { case DocsTextCommitMessage(tmp, partition) =>
      val target = new HPath(dest, f"part-$partition%05d-$jobToken.txt")
      // visibility IS the rename — a silent rename failure would drop
      // a committed partition, so it must fail the job commit (and
      // job-unique names mean an existing target is never deleted)
      if (!fs.rename(new HPath(tmp), target))
        throw new java.io.IOException(
          s"commit rename failed: $tmp -> $target")
    }
    fs.delete(new HPath(jobTemp), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new HPath(path).toUri, new Configuration())
    fs.delete(new HPath(jobTemp), true)
  }
}

class DocsTextWriterFactory(jobTemp: String, fields: Seq[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DocsTextDataWriter(jobTemp, fields, partitionId, taskId)
}

class DocsTextDataWriter(jobTemp: String, fields: Seq[String],
                         partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tempFile = new HPath(s"$jobTemp/attempt-$partitionId-$taskId")
  private val fs = FileSystem.get(tempFile.toUri, new Configuration())
  private val out = fs.create(tempFile, true)
  private val idIdx = fields.indexOf("doc_id")
  private val textIdx = fields.indexOf("text")
  require(idIdx >= 0 && textIdx >= 0,
    s"doc-lines writer needs doc_id and text, got ${fields.mkString(",")}")

  override def write(record: InternalRow): Unit = {
    val text = if (record.isNullAt(textIdx)) "" else record.getUTF8String(textIdx).toString
    val line = record.getLong(idIdx).toString + "\t" +
      DocsTextSource.escape(text) + "\n"
    out.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    DocsTextCommitMessage(tempFile.toString, partitionId)
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(tempFile, false)
  }
  override def close(): Unit = ()
}

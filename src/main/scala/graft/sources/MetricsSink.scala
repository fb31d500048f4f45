package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.collection.concurrent.TrieMap

/** DataSource V2 WRITE path: a metrics-only sink
  * (`df.write.format("graftmetrics").option("name", …).mode("append")`)
  * that materializes NOTHING — each executor-side [[DataWriter]] folds
  * its partition to (rows, bytes) counts, ships them back as its
  * [[WriterCommitMessage]], and the driver-side commit aggregates the
  * messages into [[MetricsSinkRegistry]]. The write-side twin of the
  * `synthdocs` read connector: together they cover both halves of the
  * DSv2 surface.
  *
  * Why it matters at 100 TB: this is the commit-protocol discipline
  * every distributed sink must follow — per-task state rides the
  * commit MESSAGE (bytes per task, not data), the job-level total
  * exists only at commit, and an aborted task's partial counts are
  * simply never committed (abort drops the writer, exactly-once at
  * the job level for free). It is also the cheapest possible
  * "how big is this DataFrame really" probe — a dry-run sink for
  * sizing a pipeline stage before provisioning its real output table,
  * pricing the full pipeline without paying for an output format.
  *
  * Byte accounting uses the row's UnsafeRow/serialized size via
  * `InternalRow.getSizeInBytes` where available — here approximated
  * as the sum of the declared field widths for fixed types plus
  * string/binary byte lengths: deterministic, schema-driven, and
  * cheap (no serialization pass). */
class MetricsSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftmetrics"
  override def supportsExternalMetadata(): Boolean = true
  // schema-less sink: whatever schema the written frame carries is fine
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MetricsSinkTable(schema, properties.getOrDefault("name", "(unnamed)"))
}

/** Driver-side totals per sink `name` option, committed atomically at
  * job commit (never incremented mid-flight — aborted tasks leave no
  * trace). */
object MetricsSinkRegistry {
  final case class Totals(rows: Long, bytes: Long, tasks: Long, commits: Long)
  private val totals = TrieMap.empty[String, Totals]

  private[sources] def commit(name: String, rows: Long, bytes: Long,
                              tasks: Long): Unit = {
    val prev = totals.getOrElse(name, Totals(0, 0, 0, 0))
    totals.put(name, Totals(prev.rows + rows, prev.bytes + bytes,
      prev.tasks + tasks, prev.commits + 1))
  }

  def lookup(name: String): Option[Totals] = totals.get(name)
  def clear(): Unit = totals.clear()
}

final class MetricsSinkTable(writeSchema: StructType, sinkName: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graftmetrics($sinkName)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // SupportsTruncate backs the advertised TRUNCATE capability:
    // Overwrite mode plans truncate() + write, and a metrics-only sink
    // (no stored rows) truncates as a no-op. Declaring the capability
    // without the trait fails at write PLANNING on mode("overwrite") —
    // past the capability check, before any data moves.
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MetricsBatchWrite(sinkName, info.schema())
      }
    }
}

/** One (rows, bytes) pair per task — the entire commit payload. */
final case class MetricsCommit(rows: Long, bytes: Long)
    extends WriterCommitMessage

final class MetricsBatchWrite(sinkName: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MetricsWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: MetricsCommit => m }
    MetricsSinkRegistry.commit(sinkName,
      ms.map(_.rows).sum, ms.map(_.bytes).sum, ms.length.toLong)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class MetricsWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      private val fields = schema.fields
      override def write(record: InternalRow): Unit = {
        rows += 1
        var i = 0
        while (i < fields.length) {
          if (!record.isNullAt(i)) {
            bytes += (fields(i).dataType match {
              case org.apache.spark.sql.types.StringType =>
                record.getUTF8String(i).numBytes.toLong
              case org.apache.spark.sql.types.BinaryType =>
                record.getBinary(i).length.toLong
              case dt => dt.defaultSize.toLong
            })
          }
          i += 1
        }
      }
      override def commit(): WriterCommitMessage = MetricsCommit(rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

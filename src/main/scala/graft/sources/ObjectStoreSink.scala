package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.ingest.{LocalDirObjectStore, ObjectStore}
import scala.jdk.CollectionConverters._

/** DataSource V2 batch writer for the object-store sink — the "proper"
  * v2 form of the reference's S3 upload (audit_data_ingest.py:169-187;
  * SURVEY.md §7.3): rows of `(key string, data binary, metadata
  * map<string,string>)` become objects with user metadata.
  *
  * `df.write.format("graft-objects").option("root", dir).mode("append").save()`
  *
  * One store client per task (the reference's one-boto3-client-per-thread,
  * :190-197); task retries re-put idempotently by key, giving the same
  * at-least-once semantics as the day-loop sink.
  */
class ObjectStoreSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-objects"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ObjectStoreSinkProvider.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    val root = properties.get("root")
    require(root != null && root.nonEmpty, "graft-objects sink requires option 'root'")
    new ObjectStoreTable(root)
  }
}

object ObjectStoreSinkProvider {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)
  ))
}

private[sources] class ObjectStoreTable(root: String) extends Table with SupportsWrite {
  override def name(): String = s"graft-objects($root)"
  override def schema(): StructType = ObjectStoreSinkProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val cols = info.schema().fieldNames.toSeq
    require(
      cols == Seq("key", "data", "metadata"),
      s"graft-objects sink expects columns (key, data, metadata), got $cols"
    )
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ObjectStoreBatchWrite(root)
      }
    }
  }
}

private[sources] class ObjectStoreBatchWrite(root: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ObjectStoreWriterFactory(root)
  // Objects are visible as soon as each task commits (object stores have
  // no atomic multi-object commit); the job-level commit is a no-op, like
  // the reference's per-file uploads inside a day batch.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class ObjectStoreWriterFactory(root: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ObjectStoreDataWriter(new LocalDirObjectStore(root))
}

private[sources] class ObjectStoreDataWriter(store: ObjectStore) extends DataWriter[InternalRow] {
  private var count = 0L

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(0).toString
    val data = row.getBinary(1)
    val metadata =
      if (row.isNullAt(2)) Map.empty[String, String]
      else {
        val m = row.getMap(2)
        val keys = m.keyArray()
        val vals = m.valueArray()
        (0 until m.numElements()).map { i =>
          keys.getUTF8String(i).toString -> vals.getUTF8String(i).toString
        }.toMap
      }
    store.put(key, data, metadata)
    count += 1
  }

  override def commit(): WriterCommitMessage = ObjectsWritten(count)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

case class ObjectsWritten(count: Long) extends WriterCommitMessage

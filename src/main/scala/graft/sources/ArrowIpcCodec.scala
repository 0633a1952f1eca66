package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel

/** Arrow IPC *file* (a.k.a. Feather v2) codec — the in-memory columnar
  * interchange format training loaders and dataframe libraries mmap.
  * Unlike the hand-built [[AvroCodec]]/[[TfRecordCodec]], this wraps the
  * REAL `arrow-vector` library that ships with Spark (Spark itself uses
  * it for its columnar interop paths), because the format's value is
  * precisely bit-compatibility with that ecosystem: record batches of
  * columnar buffers framed by flatbuffers metadata, with a footer
  * indexing the batches. The record batch is the intra-file parallel /
  * streaming unit (the OCF-block analogue), so the writer below takes a
  * batch size and emits many batches per file.
  *
  * Scope: the flat documents shape — long and utf8 columns. Each call
  * owns a child allocator and closes every vector it allocates; at
  * scale this runs once per task over its group iterator, so allocator
  * churn is per-task, not per-row.
  */
object ArrowIpcCodec {

  /** Ordered (name, type) with type in {"long", "string"}. */
  case class FlatSchema(fields: Seq[(String, String)]) {
    require(fields.nonEmpty, "empty schema")
    fields.foreach { case (f, t) =>
      require(t == "long" || t == "string", s"unsupported field type $t for $f")
    }
    def toArrow: Schema = new Schema(fields.map {
      case (f, "long") =>
        new Field(f, FieldType.notNullable(new ArrowType.Int(64, true)), null)
      case (f, _) =>
        new Field(f, FieldType.notNullable(ArrowType.Utf8.INSTANCE), null)
    }.asJava)
  }

  // One shared root allocator per JVM (the arrow-recommended pattern);
  // per-call work happens in child allocators so leaks are loud and local.
  private lazy val root = new RootAllocator(Long.MaxValue)

  /** Write rows (field values in schema order) as one Arrow IPC file. */
  def write(schema: FlatSchema, rows: Seq[Seq[Any]], rowsPerBatch: Int = 1024): Array[Byte] = {
    val alloc = root.newChildAllocator("graft-arrow-write", 0, Long.MaxValue)
    try {
      val vsRoot = VectorSchemaRoot.create(schema.toArrow, alloc)
      try {
        val out = new ByteArrayOutputStream()
        val writer = new ArrowFileWriter(vsRoot, null, Channels.newChannel(out))
        try {
          writer.start()
          rows.grouped(rowsPerBatch).foreach { batch =>
            vsRoot.allocateNew()
            batch.zipWithIndex.foreach { case (row, i) =>
              require(row.length == schema.fields.length,
                s"row arity ${row.length} != schema arity ${schema.fields.length}")
              schema.fields.zipWithIndex.foreach {
                case ((_, "long"), j) =>
                  vsRoot.getVector(j).asInstanceOf[BigIntVector].setSafe(i, row(j).asInstanceOf[Long])
                case ((_, _), j) =>
                  vsRoot.getVector(j).asInstanceOf[VarCharVector]
                    .setSafe(i, row(j).asInstanceOf[String].getBytes(UTF_8))
              }
            }
            vsRoot.setRowCount(batch.length)
            writer.writeBatch()
          }
          writer.end()
        } finally writer.close()
        out.toByteArray
      } finally vsRoot.close()
    } finally alloc.close()
  }

  /** Read a whole Arrow IPC file back to (schema, rows). */
  def parse(bytes: Array[Byte]): (FlatSchema, Seq[Seq[Any]]) = {
    val alloc = root.newChildAllocator("graft-arrow-read", 0, Long.MaxValue)
    try {
      val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), alloc)
      try {
        val vsRoot = reader.getVectorSchemaRoot
        val schema = FlatSchema(vsRoot.getSchema.getFields.asScala.toSeq.map { f =>
          f.getType match {
            case i: ArrowType.Int if i.getBitWidth == 64 => (f.getName, "long")
            case _: ArrowType.Utf8 => (f.getName, "string")
            case t => throw new IllegalArgumentException(s"unsupported Arrow type $t for ${f.getName}")
          }
        })
        val rows = Seq.newBuilder[Seq[Any]]
        while (reader.loadNextBatch()) {
          val n = vsRoot.getRowCount
          var i = 0
          while (i < n) {
            rows += schema.fields.zipWithIndex.map {
              case ((_, "long"), j) => vsRoot.getVector(j).asInstanceOf[BigIntVector].get(i): Any
              case ((_, _), j) =>
                new String(vsRoot.getVector(j).asInstanceOf[VarCharVector].get(i), UTF_8): Any
            }
            i += 1
          }
        }
        (schema, rows.result())
      } finally reader.close()
    } finally alloc.close()
  }
}

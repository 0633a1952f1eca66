package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowReader, ArrowStreamReader, ArrowStreamWriter, ArrowWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel

/** Arrow IPC codec — the in-memory columnar interchange format training
  * loaders and dataframe libraries consume, in BOTH published framings:
  *
  *  - the *file* format (a.k.a. Feather v2): record batches framed by
  *    flatbuffers metadata plus a FOOTER indexing the batches, bracketed
  *    by `ARROW1` magic — the random-access layout dataframe libraries
  *    mmap ([[write]]/[[parse]]);
  *  - the *stream* format: the same schema + record-batch messages with
  *    NO footer, terminated by an end-of-stream marker — the
  *    socket/pipe hand-off a live training loader reads front-to-back
  *    ([[writeStream]]/[[parseStream]]).
  *
  * Unlike the hand-built [[AvroCodec]]/[[TfRecordCodec]], this wraps the
  * REAL `arrow-vector` library that ships with Spark (Spark itself uses
  * it for its columnar interop paths), because the format's value is
  * precisely bit-compatibility with that ecosystem. The record batch is
  * the intra-file parallel / streaming unit (the OCF-block analogue), so
  * the writers take a batch size and emit many batches per payload.
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

  /** Shared write path: fill batches into `vsRoot` and drive whichever
    * framing's writer (file or stream — both are `ArrowWriter`s; only
    * the footer/EOS epilogue differs, and `end()` emits it).
    */
  private def writeWith(
      schema: FlatSchema,
      rows: Seq[Seq[Any]],
      rowsPerBatch: Int)(mkWriter: VectorSchemaRoot => (ArrowWriter, ByteArrayOutputStream)): Array[Byte] = {
    val alloc = root.newChildAllocator("graft-arrow-write", 0, Long.MaxValue)
    try {
      val vsRoot = VectorSchemaRoot.create(schema.toArrow, alloc)
      try {
        val (writer, out) = mkWriter(vsRoot)
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

  /** Shared read path over either framing's `ArrowReader`. */
  private def readWith(mkReader: org.apache.arrow.memory.BufferAllocator => ArrowReader): (FlatSchema, Seq[Seq[Any]]) = {
    val alloc = root.newChildAllocator("graft-arrow-read", 0, Long.MaxValue)
    try {
      val reader = mkReader(alloc)
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

  /** Write rows (field values in schema order) as one Arrow IPC file. */
  def write(schema: FlatSchema, rows: Seq[Seq[Any]], rowsPerBatch: Int = 1024): Array[Byte] =
    writeWith(schema, rows, rowsPerBatch) { vsRoot =>
      val out = new ByteArrayOutputStream()
      (new ArrowFileWriter(vsRoot, null, Channels.newChannel(out)), out)
    }

  /** Read a whole Arrow IPC file back to (schema, rows). */
  def parse(bytes: Array[Byte]): (FlatSchema, Seq[Seq[Any]]) =
    readWith(alloc => new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), alloc))

  /** Write rows as the Arrow IPC STREAM framing (no footer, EOS marker
    * at the end) — what a live loader hand-off over a socket or pipe
    * speaks (pyarrow's `RecordBatchStreamReader`).
    */
  def writeStream(schema: FlatSchema, rows: Seq[Seq[Any]], rowsPerBatch: Int = 1024): Array[Byte] =
    writeWith(schema, rows, rowsPerBatch) { vsRoot =>
      val out = new ByteArrayOutputStream()
      (new ArrowStreamWriter(vsRoot, null, Channels.newChannel(out)), out)
    }

  /** Read an Arrow IPC STREAM payload front-to-back to (schema, rows). */
  def parseStream(bytes: Array[Byte]): (FlatSchema, Seq[Seq[Any]]) =
    readWith(alloc => new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise sum of `array<float>` rows per group, as `array<double>`
  * — the centroid-update kernel.
  *
  * The built-in route (posexplode → groupBy(key, pos) → avg → re-collect
  * the positions into an array) multiplies the aggregated row count by
  * the dimensionality (64× here) and pays TWO aggregations plus the
  * array re-assembly. This aggregate keeps one double[dim] accumulator
  * per group (ObjectHashAggregate with map-side partial aggregation, so
  * the exchange carries one (key, dim·8 B) row per group per task — the
  * same bytes the folded posexplode partials carried, in one pass), and
  * the caller derives the mean with `transform(s, x -> x / n)`.
  *
  * Numerics: the same double additions as the avg path, associated in
  * partition order then merge order — the partial-aggregation order the
  * old plan also had; downstream consumers round (6dp cosines), which is
  * why the cross-engine oracle held for the avg path and equally holds
  * here (re-verified against DuckDB at both gate SFs).
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "vec_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum requires array<float|double> input, got $other")
    }

  // lazy: child is unresolved at construction (no dataType yet)
  private lazy val elemIsFloat: Boolean =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  // null buffer = no rows seen yet; sized lazily from the first vector
  // (dimensionality is data-defined, uniform per corpus)
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buffer == null) new Array[Double](n) else buffer
      require(b.length == n,
        s"vec_sum saw mixed dimensionalities: ${b.length} vs $n")
      var i = 0
      if (elemIsFloat) while (i < n) { b(i) += arr.getFloat(i); i += 1 }
      else while (i < n) { b(i) += arr.getDouble(i); i += 1 }
      b
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (other == null) buffer
    else if (buffer == null) other
    else {
      require(buffer.length == other.length,
        s"vec_sum saw mixed dimensionalities: ${buffer.length} vs ${other.length}")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
      buffer.foreach(bb.putDouble)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getDouble)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

object VectorAggregates {
  /** Element-wise per-group sum of an `array<float|double>` column as
    * `array<double>`; pair with `count` and `transform(s, x -> x / n)`
    * for the centroid mean.
    */
  def vec_sum(c: Column): Column =
    ColumnBridge.column(
      VectorSum(ColumnBridge.expression(c)).toAggregateExpression())
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd vector kernels over `array<float>` /
  * `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate the
  * lambda per element through the interpreter — measured ~10-30x slower on
  * the 64-dim similarity hot path than these fused loops, which compile
  * into the surrounding WholeStageCodegen stage. Element order is a
  * strict sequential fold, so results are bit-identical to the
  * `aggregate`-based formulation (and to DuckDB's list_dot_product).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}"
      )
  }

  /** Per-element accessor returning double, null-safe (null elements
    * contribute 0).
    */
  protected def getter(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType => s"($arr.isNullAt($i) ? 0.0d : (double) $arr.getFloat($i))"
      case _ => s"($arr.isNullAt($i) ? 0.0d : $arr.getDouble($i))"
    }

  protected def getDouble(e: Expression, arr: ArrayData, i: Int): Double =
    if (arr.isNullAt(i)) 0.0
    else
      elemType(e) match {
        case FloatType => arr.getFloat(i).toDouble
        case _ => arr.getDouble(i)
      }
}

/** dot(a, b) = sum_i a_i * b_i over min(len(a), len(b)) elements. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += getDouble(left, x, i) * getDouble(right, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot(a,b) / (|a| * |b|) in ONE fused pass; 0.0 when
  * either norm is zero (degenerate vector) instead of NaN.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = getDouble(left, x, i)
      val yi = getDouble(right, y, i)
      d += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $d = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = ${getter(left, a, i)};
          double $yi = ${getter(right, b, i)};
          $d += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $d / $denom;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Weighted byte-sum for SQ8 asymmetric scoring: sum_i w_i * (code_i &
  * 0xFF) over min(len) — `code` is the uint8-quantized vector stored as
  * BINARY (1 byte/dim), `w` the query-side per-dim weights (q_d *
  * scale_d, built once per query on the driver). The whole approximate
  * dot product against a quantized corpus is then `C + sq8_dot(code,
  * w)` with C = sum_d q_d * vmin_d — one fused byte loop inside
  * WholeStageCodegen, reading a quarter of float32's bytes. The same
  * null/order discipline as the float kernels: strict sequential fold,
  * bit-identical between interpreted and codegen paths.
  */
case class Sq8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_sq8_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, array<double>), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val w = b.asInstanceOf[ArrayData]
    val n = math.min(code.length, w.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!w.isNullAt(i)) acc += w.getDouble(i) * (code(i) & 0xFF)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.length, $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$b.isNullAt($i)) $acc += $b.getDouble($i) * (double) ($a[$i] & 0xFF);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance between two packed bit-codes stored as BINARY:
  * popcount of the bytewise XOR over min(len) bytes. The binary-
  * quantization (1-bit) candidate kernel: a 64-dim float vector packs
  * into 8 bytes (32x fewer bytes than float32, 8x fewer than SQ8), and
  * the whole candidate scan is this fused XOR/popcount loop inside
  * WholeStageCodegen — the cheapest possible first pass of a
  * two-stage (binary prune, exact rerank) search. Integer-valued and
  * symmetric; order-free by construction, so there is no fold-order
  * caveat to pin.
  */
case class BitHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_bit_hamming"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, binary), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"graft_bit_hamming: code length mismatch (${x.length} vs ${y.length} bytes) — " +
          "bit-codes from different-dimension quantizers are not comparable")
    val n = x.length
    var acc = 0
    var i = 0
    while (i < n) { acc += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xFF); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        if ($a.length != $b.length) {
          throw new IllegalArgumentException(
            "graft_bit_hamming: code length mismatch (" + $a.length + " vs " + $b.length +
            " bytes) — bit-codes from different-dimension quantizers are not comparable");
        }
        int $acc = 0;
        for (int $i = 0; $i < $a.length; $i++) {
          $acc += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xFF);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Weight-vector holder with STRUCTURAL equality (the [[CentroidMatrix]]
  * rationale: bare `Array[Long]` fields compare by reference and defeat
  * Catalyst canonicalization / CSE for the kernel).
  */
final class LongWeights(val w: Array[Long]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case that: LongWeights => java.util.Arrays.equals(w, that.w)
    case _ => false
  }
  override val hashCode: Int = java.util.Arrays.hashCode(w)
}

/** Integer sparse dot product of a `map<bigint,bigint>` feature column
  * against a driver-held weight vector shipped as ONE reference object:
  * sum over entries of c · w[bucket] — the fused kernel behind
  * [[graft.ops.TextOps.logregFit]]'s per-iteration margin.
  *
  * The round-18 attempt computed this with the higher-order
  * `aggregate(map_entries(f), …)` fold, whose lambda evaluates
  * INTERPRETED per element (the documented ~10-30x penalty these fused
  * kernels exist to avoid) — every logreg consumer regressed and the
  * change was reverted. This node keeps the whole margin inside
  * whole-stage codegen: one compiled loop over the map's key/value
  * arrays per row.
  *
  * Exactness: pure 64-bit integer multiply-add — order-free, so the
  * result is bit-identical to the old `sum(c * element_at(w, bucket+1))`
  * aggregate whatever the entry order. Out-of-range buckets contribute
  * 0, exactly like the old path (non-ANSI `element_at` past the array
  * end is NULL and `sum` skips it); null map values likewise.
  */
case class MapDotWeights(child: Expression, weights: LongWeights)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_map_dot"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case MapType(LongType, LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires map<bigint,bigint> input, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val m = input.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    val ks = m.keyArray()
    val vs = m.valueArray()
    val w = weights.w
    var acc = 0L
    var i = 0
    val n = m.numElements()
    while (i < n) {
      val k = ks.getLong(i)
      if (k >= 0 && k < w.length && !vs.isNullAt(i)) acc += vs.getLong(i) * w(k.toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights.w, "long[]")
    nullSafeCodeGen(ctx, ev, m => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val ks = ctx.freshName("ks")
      val vs = ctx.freshName("vs")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $ks = $m.keyArray();
        org.apache.spark.sql.catalyst.util.ArrayData $vs = $m.valueArray();
        long $acc = 0L;
        int $n = $m.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $k = $ks.getLong($i);
          if ($k >= 0 && $k < $wRef.length && !$vs.isNullAt($i)) {
            $acc += $vs.getLong($i) * $wRef[(int) $k];
          }
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Centroid matrix holder with STRUCTURAL equality. As bare case-class
  * fields, `Array[Array[Float]]`/`Array[Int]` compare by reference, so
  * two structurally identical [[NearestCentroid]] expressions would
  * compare unequal — defeating Catalyst canonicalization and common
  * subexpression elimination for the fused kernel. Wrapping the arrays
  * restores value semantics without copying them.
  */
final class CentroidMatrix(val cents: Array[Array[Float]], val ids: Array[Int])
    extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case that: CentroidMatrix =>
      java.util.Arrays.equals(ids, that.ids) &&
        cents.length == that.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), that.cents(i)))
    case _ => false
  }
  override val hashCode: Int =
    java.util.Arrays.hashCode(ids) * 31 + cents.foldLeft(0)((h, c) =>
      h * 31 + java.util.Arrays.hashCode(c))
}

/** Nearest-centroid assignment as ONE fused expression: argmax-cosine
  * over a k×d centroid matrix shipped as a REFERENCE OBJECT (not k
  * child expressions). The naive formulation — `array_max` over k
  * `struct(cosine_similarity(...), -id)` columns — generates a method
  * body past the JIT/codegen size limits at k=64, so the whole
  * projection stage fell back to interpreted eval (measured ~12µs per
  * cosine on the IVF build path: a 20k-vector assignment took 15s and
  * a 2-iteration k-means train 35s at the 10x fixture). This node
  * keeps the stage inside whole-stage codegen with a k·d loop.
  *
  * Arithmetic is bit-identical to the old fold: per cell,
  * d += x_i·c_i, na += x_i², nb += c_i², sim = d / (√na·√nb) (0 when a
  * norm is 0); ties broken toward the LOWEST cell id (the old struct
  * ordering: sim desc, then -id desc). Returns
  * struct<sim:double, cluster:int> so callers needing the best
  * similarity (drift metrics) and the assignment share one kernel.
  */
case class NearestCentroid(child: Expression, matrix: CentroidMatrix)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def cents: Array[Array[Float]] = matrix.cents
  private def ids: Array[Int] = matrix.ids
  require(cents.length == ids.length && cents.nonEmpty, "empty centroid set")

  override def dataType: DataType =
    StructType(Seq(StructField("sim", DoubleType, nullable = false),
      StructField("cluster", IntegerType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> input, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var bestSim = Double.NegativeInfinity
    var bestId = Int.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(x.numElements(), cv.length)
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = if (x.isNullAt(i)) 0.0 else if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val ci = cv(i).toDouble
        d += xi * ci; na += xi * xi; nb += ci * ci
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val sim = if (denom == 0.0) 0.0 else d / denom
      // Double.compare, not >: NaN (a corrupt embedding) must rank
      // GREATEST with ties to the lowest id — the old array_max struct
      // ordering's behavior — never fall through to a sentinel id that
      // names no real cell
      val cmp = java.lang.Double.compare(sim, bestSim)
      if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) { bestSim = sim; bestId = ids(c) }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSim, bestId))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    val getX =
      if (isFloat) (arr: String, i: String) => s"($arr.isNullAt($i) ? 0.0d : (double) $arr.getFloat($i))"
      else (arr: String, i: String) => s"($arr.isNullAt($i) ? 0.0d : $arr.getDouble($i))"
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val cv = ctx.freshName("cv"); val xi = ctx.freshName("xi"); val ci = ctx.freshName("ci")
      val denom = ctx.freshName("denom"); val sim = ctx.freshName("sim")
      val bestSim = ctx.freshName("bestSim"); val bestId = ctx.freshName("bestId")
      val cmp = ctx.freshName("cmp")
      s"""
        double $bestSim = Double.NEGATIVE_INFINITY;
        int $bestId = Integer.MAX_VALUE;
        for (int $c = 0; $c < $centsRef.length; $c++) {
          float[] $cv = $centsRef[$c];
          int $n = java.lang.Math.min($a.numElements(), $cv.length);
          double $d = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = ${getX(a, i)};
            double $ci = (double) $cv[$i];
            $d += $xi * $ci; $na += $xi * $xi; $nb += $ci * $ci;
          }
          double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
          double $sim = ($denom == 0.0) ? 0.0 : $d / $denom;
          int $cmp = java.lang.Double.compare($sim, $bestSim);
          if ($cmp > 0 || ($cmp == 0 && $idsRef[$c] < $bestId)) {
            $bestSim = $sim; $bestId = $idsRef[$c];
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[] { $bestSim, $bestId });
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level API for the vector kernels. */
object VectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sq8_dot(code: Column, weights: Column): Column =
    ColumnBridge.column(Sq8Dot(ColumnBridge.expression(code), ColumnBridge.expression(weights)))

  def bit_hamming(a: Column, b: Column): Column =
    ColumnBridge.column(BitHamming(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Integer sparse dot of a map<bigint,bigint> feature column against a
    * driver-held weight vector (one reference object, codegen loop).
    */
  def map_dot(f: Column, weights: Array[Long]): Column =
    ColumnBridge.column(MapDotWeights(ColumnBridge.expression(f), new LongWeights(weights)))

  /** struct<sim:double, cluster:int> of the max-cosine centroid (ties →
    * lowest id); `cents` ride as one reference object, keeping k=64
    * assignments inside whole-stage codegen.
    */
  def nearest_centroid(v: Column, cents: Array[(Int, Array[Float])]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v),
      new CentroidMatrix(cents.map(_._2), cents.map(_._1))))
}

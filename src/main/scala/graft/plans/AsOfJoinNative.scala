package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE as-of join — the custom whole-operator rung of the extension
  * ladder (SURVEY §7.3(c)): a logical node + planner strategy + physical
  * merge operator, for the one relational operator Spark lacks that the
  * composed form ([[graft.ops.AsOfJoin]]) pays extra for.
  *
  * Why a physical operator: the composed form union-tags both sides and
  * runs a window (`last(_, ignoreNulls=true)` over unbounded preceding) —
  * that is a shuffle of LEFT+RIGHT TOGETHER, one combined sort, and a
  * window buffer per partition. The native operator declares the join's
  * true requirements instead: each side hash-clustered on its OWN key and
  * sorted (key, ts, tie), then one streaming MERGE per partition — O(1)
  * state (the last matching right row), no combined sort, no window
  * machinery, and each side shuffles independently (a pre-bucketed side
  * shuffles not at all — EnsureRequirements sees the child's existing
  * partitioning, which the union in the composed form can never expose).
  *
  * Semantics match [[graft.ops.AsOfJoin.leftAsOf]] exactly (inclusive
  * `right.ts <= left.ts`, ties broken by the tie column, null right
  * values when no prior row) — AsOfJoinNativeSpec pins row-for-row parity
  * plus the plan shape.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    leftTie: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    asofOutput: Seq[Attribute]
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ asofOutput
  // The asof_* columns are MINTED here, not consumed from a child — keep
  // them out of missingInput (the Generate pattern).
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Maps the logical node to the physical merge; inject via
  * `GraftExtensions` or `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(
        planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.leftTie,
        p.rightKey, p.rightTs, p.rightTie,
        p.rightValues, p.asofOutput
      ) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    leftTie: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    rightValues: Seq[Attribute],
    asofOutput: Seq[Attribute]
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOutput)

  // Co-cluster each side on its OWN key; EnsureRequirements inserts the
  // minimal Exchange/Sort (none, for an already-bucketed side).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending), SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending), SortOrder(rightTie, Ascending))
  )

  // Left rows stream through in order; partitioning and ordering survive.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val numVals = rightValues.length
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
    val rValsB = rightValues.map(a => BindReferences.bindReference(a: Expression, right.output))
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullVals = new GenericInternalRow(numVals) // all null
      val valProj = UnsafeProjection.create(rValsB)
      val resultProj = UnsafeProjection.create(schema, schema)
      // One-row state: the last right row with key == current key and
      // ts <= current left ts, plus one look-ahead right row.
      var pending: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { lrow =>
        val lKey = lKeyB.eval(lrow)
        val lTs = lTsB.eval(lrow)
        if (lKey != null && lTs != null) {
          var scan = true
          while (scan) {
            if (pending == null && rIter.hasNext) pending = rIter.next().copy()
            if (pending == null) scan = false
            else {
              val rKey = rKeyB.eval(pending)
              val rTs = rTsB.eval(pending)
              if (rKey == null || rTs == null) pending = null // null keys never match
              else {
                val kc = keyOrd.compare(rKey, lKey)
                if (kc < 0) pending = null // right key exhausted before this left key
                else if (kc == 0 && tsOrd.compare(rTs, lTs) <= 0) {
                  lastMatch = pending // rows arrive (ts, tie)-ascending: keep the latest
                  lastMatchKey = rKey
                  pending = null
                } else scan = false // right row is ahead of this left row
              }
            }
          }
        }
        val matched =
          lKey != null && lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
        resultProj(joined(lrow, if (matched) valProj(lastMatch) else nullVals))
      }
    }
  }
}

object AsOfJoinNative {
  import org.apache.spark.sql.{functions => F, DataFrame}

  /** Native counterpart of [[graft.ops.AsOfJoin.leftAsOf]] — same
    * signature, same semantics, planned as [[AsOfJoinExec]]. Registers
    * [[AsOfJoinStrategy]] in `spark.experimental.extraStrategies` if
    * absent (an idempotent, additive registration — unlike data-dependent
    * conf, safe to perform lazily).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCols: Seq[String],
      tieBreak: String
  ): DataFrame = {
    val spark = left.sparkSession
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // Fresh exprIds on the right side so self-joins (left and right carved
    // from the same source) never alias each other's attributes.
    val rightFresh = right.select(right.columns.map(c => F.col(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"$side side has no column '$name'"))
    val rightValAttrs = valueCols.map(attr(rPlan, _, "right"))
    val asofOut =
      rightValAttrs.map(a => AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    org.apache.spark.sql.graft.DatasetBridge.ofRows(
      spark,
      AsOfJoinPlan(
        lPlan, rPlan,
        attr(lPlan, key, "left"), attr(lPlan, ts, "left"), attr(lPlan, tieBreak, "left"),
        attr(rPlan, key, "right"), attr(rPlan, ts, "right"), attr(rPlan, tieBreak, "right"),
        rightValAttrs, asofOut
      )
    )
  }
}

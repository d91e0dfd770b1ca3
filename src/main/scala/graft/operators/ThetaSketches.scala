package graft.operators

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches => DsSketches, Union}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Theta-sketch distinct counting — the SET-OPERATION face of the sketch
  * family. HLL ([[Sketches.hllSliceSketches]]) unions; theta sketches
  * additionally INTERSECT and difference, which is what "distinct users
  * active in slice A AND slice B" needs from MB-scale summaries — the
  * question HLL structurally cannot answer without re-scanning the corpus.
  *
  * The aggregate is a native `TypedImperativeAggregate[Union]` (one
  * DataSketches Union per group per partition; partial aggregation ships
  * one compact sketch per group-partition, never rows), the same
  * architecture as Spark's built-in `hll_sketch_agg`. Default seed ⇒
  * deterministic estimates; the accuracy contract (exact value within the
  * sketch's own [lb, ub] at 3 standard deviations) is oracle-gated as a
  * provably-empty violations frame (a18_theta_intersect).
  */
object ThetaSketches {

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def col2(e: Expression): Column = Bridge.column(e)

  /** Aggregate a LONG column into a compact theta sketch (binary). */
  def thetaSketchAgg(c: Column, lgK: Int = 12): Column =
    col2(ThetaSketchAgg(expr(c), lgK).toAggregateExpression())

  /** Estimate of a binary sketch. */
  def thetaEstimate(sketch: Column): Column = col2(ThetaEstimateExpr(expr(sketch)))

  /** Lower/upper bound at `numStdDev` ∈ {1, 2, 3}. */
  def thetaLowerBound(sketch: Column, numStdDev: Int): Column =
    col2(ThetaBoundExpr(expr(sketch), numStdDev, upper = false))
  def thetaUpperBound(sketch: Column, numStdDev: Int): Column =
    col2(ThetaBoundExpr(expr(sketch), numStdDev, upper = true))

  /** Intersection of two binary sketches → binary sketch. `lgK` must be ≥
    * the lgK the inputs were aggregated with — a smaller set-operation
    * builder silently downsamples higher-resolution inputs.
    */
  def thetaIntersect(a: Column, b: Column, lgK: Int = 12): Column =
    col2(ThetaIntersectExpr(expr(a), expr(b), lgK))

  /** Union of two binary sketches → binary sketch (pairwise; for N-way
    * group union use [[thetaSketchAgg]] over exploded sketch rows'
    * source items, or fold with this). Same `lgK` contract as
    * [[thetaIntersect]].
    */
  def thetaUnion(a: Column, b: Column, lgK: Int = 12): Column =
    col2(ThetaUnionExpr(expr(a), expr(b), lgK))

  /** Per-slice sketch table: one (slice, sketch) row per value of
    * `sliceCol` — the persisted MB-scale summary layer, same shape as the
    * HLL slice table but intersectable.
    */
  def thetaSliceSketches(df: DataFrame, sliceCol: Column, itemCol: Column, lgK: Int = 12): DataFrame =
    df.groupBy(sliceCol.as("slice"))
      .agg(thetaSketchAgg(itemCol, lgK).as("sketch"))

  // ----------------------------------------------------------------- agg

  case class ThetaSketchAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Union] with UnaryLike[Expression]
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_theta_sketch_agg"
    override def createAggregationBuffer(): Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    override def update(buffer: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) buffer.update(v.asInstanceOf[Long])
      buffer
    }
    override def merge(buffer: Union, other: Union): Union = {
      buffer.union(other.getResult)
      buffer
    }
    override def eval(buffer: Union): Any = buffer.getResult.toByteArray
    override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = createAggregationBuffer()
      u.union(DsSketches.heapifyCompactSketch(Memory.wrap(bytes)))
      u
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
      copy(child = c)
  }

  /** Union-of-sketches aggregate: folds BINARY sketch rows (e.g. per-batch
    * slice sketches appended by a stream) into one sketch — the reduce
    * side of the mergeable-summaries law for theta.
    */
  def thetaUnionAgg(sketches: Column, lgK: Int = 12): Column =
    col2(ThetaUnionAgg(expr(sketches), lgK).toAggregateExpression())

  case class ThetaUnionAgg(
      child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Union] with UnaryLike[Expression]
      with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_theta_union_agg"
    override def createAggregationBuffer(): Union =
      SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    override def update(buffer: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null)
        buffer.union(DsSketches.heapifyCompactSketch(
          Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buffer
    }
    override def merge(buffer: Union, other: Union): Union = {
      buffer.union(other.getResult); buffer
    }
    override def eval(buffer: Union): Any = buffer.getResult.toByteArray
    override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = createAggregationBuffer()
      u.union(DsSketches.heapifyCompactSketch(Memory.wrap(bytes)))
      u
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
      copy(child = c)
  }

  // --------------------------------------------------------------- scalars

  private def heapify(bytes: Array[Byte]): CompactSketch =
    DsSketches.heapifyCompactSketch(Memory.wrap(bytes))

  case class ThetaEstimateExpr(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def inputTypes = Seq(BinaryType)
    override def prettyName: String = "graft_theta_estimate"
    protected override def nullSafeEval(v: Any): Any =
      heapify(v.asInstanceOf[Array[Byte]]).getEstimate
    override protected def withNewChildInternal(c: Expression): ThetaEstimateExpr =
      copy(child = c)
  }

  case class ThetaBoundExpr(child: Expression, numStdDev: Int, upper: Boolean)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    require(numStdDev >= 1 && numStdDev <= 3)
    override def dataType: DataType = DoubleType
    override def inputTypes = Seq(BinaryType)
    override def prettyName: String = s"graft_theta_${if (upper) "ub" else "lb"}"
    protected override def nullSafeEval(v: Any): Any = {
      val s = heapify(v.asInstanceOf[Array[Byte]])
      if (upper) s.getUpperBound(numStdDev) else s.getLowerBound(numStdDev)
    }
    override protected def withNewChildInternal(c: Expression): ThetaBoundExpr =
      copy(child = c)
  }

  // Both set-operation expressions size their builder from `lgK`, and the
  // risk profile differs by op (ADVICE r6/r7): a UNION built at the
  // DataSketches default (lgK 12) silently DOWNSAMPLES inputs aggregated at
  // higher resolution — accuracy degrades with no error. An INTERSECTION's
  // result is bounded by the minimum input theta, so the builder's nominal-
  // entries setting matters far less there; lgK is still threaded through
  // for symmetry and so a copy/transform of either expression keeps the
  // caller's resolution intent.
  case class ThetaIntersectExpr(left: Expression, right: Expression, lgK: Int = 12)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def inputTypes = Seq(BinaryType, BinaryType)
    override def prettyName: String = "graft_theta_intersect"
    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val inter = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
      inter.intersect(heapify(a.asInstanceOf[Array[Byte]]))
      inter.intersect(heapify(b.asInstanceOf[Array[Byte]]))
      inter.getResult.toByteArray
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectExpr =
      copy(left = l, right = r)
  }

  case class ThetaUnionExpr(left: Expression, right: Expression, lgK: Int = 12)
      extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def inputTypes = Seq(BinaryType, BinaryType)
    override def prettyName: String = "graft_theta_union"
    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      u.union(heapify(a.asInstanceOf[Array[Byte]]))
      u.union(heapify(b.asInstanceOf[Array[Byte]]))
      u.getResult.toByteArray
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnionExpr =
      copy(left = l, right = r)
  }

  /** Accuracy contract: for every PAIR of slices, the intersection
    * estimate from the sketch table must bracket the exact distinct
    * intersection within [lb(3σ), ub(3σ)] — and the pair grid must be
    * complete. Emits one violation row per failing pair; provably empty
    * under correct sketches (the theta set-operation error analysis), so
    * the oracle hash-checks emptiness.
    */
  def thetaIntersectViolations(
      df: DataFrame, sliceCol: Column, itemCol: Column, lgK: Int = 12): DataFrame = {
    val sk = thetaSliceSketches(df, sliceCol, itemCol, lgK)
    val pairs = sk.select(col("slice").as("slice_a"), col("sketch").as("sk_a"))
      .join(sk.select(col("slice").as("slice_b"), col("sketch").as("sk_b")),
        col("slice_a") < col("slice_b"))
      .select(col("slice_a"), col("slice_b"),
        thetaIntersect(col("sk_a"), col("sk_b")).as("inter"))
      .select(col("slice_a"), col("slice_b"),
        thetaLowerBound(col("inter"), 3).as("lb"),
        thetaUpperBound(col("inter"), 3).as("ub"))
    val exact = df.select(sliceCol.as("s"), itemCol.as("item")).distinct()
    val exactPairs = exact.select(col("s").as("slice_a"), col("item"))
      .join(exact.select(col("s").as("slice_b"), col("item")),
        Seq("item"))
      .filter(col("slice_a") < col("slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("exact_n"))
    pairs.join(exactPairs, Seq("slice_a", "slice_b"), "left")
      .select(col("slice_a"), col("slice_b"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"), col("lb"), col("ub"))
      .filter(col("exact_n") < col("lb") || col("exact_n") > col("ub"))
  }
}

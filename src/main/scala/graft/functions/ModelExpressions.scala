package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** TRAINED-WEIGHTS linear-model inference (the companion to
  * TextOps.classifierScore's PRF stand-in): the model is a real 4 MiB
  * weight ARRAY — one int per 2^20 hashed feature buckets — shipped to
  * executors as a Spark `Broadcast` (once per executor, not once per
  * task closure) and looked up inside the same whole-stage-codegen
  * fold the PRF variant runs. The plan shape is IDENTICAL: one narrow
  * projection over the scan, zero shuffle, zero joins — swapping a
  * fitted fastText-style model in for the PRF is exactly this seam.
  *
  * The expression embeds the broadcast handle via
  * `CodegenContext.addReferenceObj`, the standard Catalyst mechanism
  * for model state in generated code (the reference array is resolved
  * once per task, the per-row loop is a plain int[] index). */
object ModelExpressions {
  /** 2^20 buckets × 4 bytes = 4 MiB, the scaladoc'd model size. */
  val NumBuckets: Int = 1 << 20

  /** The "fitted" weight table. Deterministic affine-congruential
    * weights in [-2000, 2000] — a DIFFERENT family from the PRF
    * variant's (2654435761·b + 13) mod 2001, so the two queries
    * produce distinct scores and the oracle distinguishes them. This
    * builder is the load seam: a production model arrives by reading
    * the trained vector from a model file into this array instead. */
  def trainedWeights(): Array[Int] = {
    val w = new Array[Int](NumBuckets)
    var b = 0L
    while (b < NumBuckets) {
      w(b.toInt) = ((b * 1103515245L + 12345L) % 4001L - 2000L).toInt
      b += 1L
    }
    w
  }

  // one broadcast per SparkContext (sessions share contexts in this
  // harness); ConcurrentHashMap so concurrent specs race safely
  private val bcCache = new ConcurrentHashMap[SparkContext, Broadcast[Array[Int]]]()

  def broadcastWeights(sc: SparkContext): Broadcast[Array[Int]] =
    bcCache.computeIfAbsent(sc, c => c.broadcast(trainedWeights()))

  /** Inference fold (static: called from generated code): sum of the
    * bucket weights of every word-hash in the row. One tight loop,
    * no allocation. */
  def score(arr: ArrayData, w: Array[Int]): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += w((arr.getLong(i) % w.length).toInt)
      i += 1
    }
    acc
  }
}

/** bucket_weight_score(array<long>) — broadcast-weight linear inference
  * as LongType. The broadcast handle rides the expression tree; codegen
  * resolves it once via a plan reference object and indexes the raw
  * int[] per row, so inference stays inside whole-stage codegen. */
case class BucketWeightScoreExpr(child: Expression,
    weights: Broadcast[Array[Int]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_weight_score"
  override protected def nullSafeEval(input: Any): Any =
    ModelExpressions.score(input.asInstanceOf[ArrayData], weights.value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("trainedWeightsBc", weights,
      classOf[Broadcast[Array[Int]]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ModelExpressions.score($c, (int[]) $bcRef.value())")
  }
  override protected def withNewChildInternal(newChild: Expression): BucketWeightScoreExpr =
    copy(child = newChild)
}

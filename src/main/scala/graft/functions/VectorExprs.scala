package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Primitive-loop kernels invoked from whole-stage-generated code —
  * no boxing, no per-element lambda dispatch. (The builtin
  * higher-order route — aggregate(zip_with(...)) — evaluates
  * interpreted with boxed Doubles; on the ANN paths that was both
  * slow and a GC source.)
  */
object VectorKernels {
  /** cosine(a,b) = a·b / (|a||b|); 0.0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** int8 quantization scale: max(|x|)/127, floored at 1e-300 so the
    * all-zero vector quantizes to zero instead of NaN (mirrors the
    * DuckDB oracle's greatest(list_max(list_transform(abs))/127, …)).
    */
  def int8Scale(a: ArrayData): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(a.getDouble(i))
      if (x > m) m = x
      i += 1
    }
    math.max(m / 127, 1e-300)
  }

  /** exact round-half-away-from-zero of r (|r| < 2^52): floor + an
    * EXACT fractional comparison — no `floor(r+0.5)` addition, whose
    * rounding can cross the boundary. Matches DuckDB's std::round and
    * decimal HALF_UP on every value both can represent.
    */
  private def roundHalfAway(r: Double): Int = {
    val f = math.floor(r)
    val diff = r - f                        // exact for |r| < 2^52
    (if (diff > 0.5) f + 1
     else if (diff < 0.5) f
     else if (r >= 0) f + 1 else f).toInt
  }

  /** per-element int8 quantization: round(x/scale) as ints. */
  def int8Round(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = roundHalfAway(a.getDouble(i) / scale)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `cosine_sim(array<double>, array<double>) → double` as a native
  * Catalyst expression with doGenCode: the generated code calls the
  * static kernel directly, so the whole ANN scoring pipeline stays
  * inside one WholeStageCodegen span.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(array<double>, array<double>) → double`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `int8_scale(array<double>) → double`: the quantization scale
  * max(|x|)/127 (1e-300-floored) as one primitive pass.
  */
case class Int8Scale(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_scale"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.int8Scale(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.int8Scale($a)")

  override protected def withNewChildInternal(newChild: Expression): Int8Scale =
    copy(child = newChild)
}

/** `int8_round(array<double>, double) → array<int>`: round(x/scale)
  * per element in one primitive loop — the codegen'd replacement for
  * `transform(v, x -> CAST(round(x / scale) AS INT))`, whose
  * higher-order lambda evaluates interpreted with boxed elements and,
  * when project-collapse inlines it past a join, re-quantizes the
  * corpus once per joined pair.
  */
case class Int8Round(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "int8_round"

  override def nullSafeEval(a: Any, s: Any): Any =
    VectorKernels.int8Round(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) => s"graft.functions.VectorKernels.int8Round($a, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Round =
    copy(left = newLeft, right = newRight)
}

/** `cosine_argmax(array<double>, array<struct<cid bigint, cv array<double>>>)
  * → bigint`: the id of the codebook row with the highest cosine to
  * the input vector (ties → lowest cid; the codebook literal must be
  * cid-ascending). The k-means-assignment kernel for SemDeDup-style
  * clustering: the codebook rides in as a FOLDABLE literal, parsed
  * once per task into primitive arrays (per-centroid norms
  * precomputed with the same sequential x² accumulation as
  * [[VectorKernels.dot]]), and each row runs k fused dot-products —
  * no n×k row materialization, no aggregate, the projection stays
  * inside whole-stage codegen. Cosine op order matches the pairwise
  * form exactly (dot / (sqrt(Σx²)·sqrt(Σc²))), so results are
  * bit-identical to the crossJoin+argmax plan and to DuckDB's
  * list_cosine_similarity ranking.
  */
case class CosineArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "cosine_argmax"

  // codebook parsed lazily from the foldable literal — once per task
  // after deserialization (transient), shared by every row
  @transient private lazy val codebook: (Array[Long], Array[Array[Double]], Array[Double]) = {
    require(right.foldable, "cosine_argmax codebook must be a literal")
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    // an empty codebook would assign the -1 sentinel to every row —
    // one giant cluster, quadratic prune, and divergence from the
    // oracle's empty-asg semantics; fail loudly instead
    require(k > 0, "cosine_argmax codebook is empty")
    val ids = new Array[Long](k)
    val vecs = new Array[Array[Double]](k)
    val norms = new Array[Double](k)
    var i = 0
    while (i < k) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1)
      val dim = v.numElements()
      val a = new Array[Double](dim)
      var nn = 0.0
      var j = 0
      while (j < dim) { a(j) = v.getDouble(j); nn += a(j) * a(j); j += 1 }
      vecs(i) = a
      norms(i) = math.sqrt(nn)
      i += 1
    }
    (ids, vecs, norms)
  }

  def evalVec(v: ArrayData): Long = {
    val (ids, vecs, norms) = codebook
    // copy the row vector to a primitive array ONCE — the k inner
    // loops then run pure double[] arithmetic instead of paying a
    // virtual ArrayData.getDouble per element per centroid
    val dim = v.numElements()
    val a = new Array[Double](dim)
    var nv = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); a(i) = x; nv += x * x; i += 1 }
    val nrm = math.sqrt(nv)
    var best = java.lang.Double.NEGATIVE_INFINITY
    var bestId = -1L
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      // dimension mismatch must be LOUD: DuckDB's
      // list_cosine_similarity raises on unequal lengths, and a
      // silently truncated dot product would assign a wrong cluster
      // with no gate tripping
      if (cv.length != dim)
        throw new IllegalArgumentException(
          s"cosine_argmax: vector dim $dim != codebook dim ${cv.length}")
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += a(j) * cv(j); j += 1 }
      val cos = dot / (nrm * norms(c))
      if (cos > best) { best = cos; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    evalVec(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argmaxKernel", this, classOf[CosineArgmax].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.evalVec($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineArgmax =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode(array<int> qv, array<struct<cid bigint, cv array<int>>>
  * codebook, int m) → array<struct<code bigint, dist bigint>>`:
  * product-quantization encoding — the vector splits into `m` equal
  * contiguous subspaces, and each subspace is assigned the codebook
  * row whose SAME subspace slice minimizes integer squared-L2
  * distance (ties → lowest cid; the codebook literal must be
  * cid-ascending). Every arithmetic step is exact int64 — unlike
  * cosine there is no float discipline to manage, which is what lets
  * the whole PQ family carry full DuckDB hash-match oracles.
  *
  * Same execution shape as [[CosineArgmax]]: the codebook rides in as
  * a FOLDABLE literal parsed once per task into primitive arrays, and
  * each row runs m·k fused difference loops inside whole-stage
  * codegen — no n×k row materialization, no aggregate, no exchange.
  * At 100 TB, PQ encoding is a pure map over the corpus scan.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("code", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist", org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val nSub: Int = {
    require(third.foldable, "pq_encode subspace count must be a literal")
    val m = third.eval(null).asInstanceOf[Number].intValue()
    require(m > 0, s"pq_encode subspace count must be positive, got $m")
    m
  }

  @transient private lazy val codebook: (Array[Long], Array[Array[Int]]) = {
    require(second.foldable, "pq_encode codebook must be a literal")
    val arr = second.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    require(k > 0, "pq_encode codebook is empty")
    val ids = new Array[Long](k)
    val vecs = new Array[Array[Int]](k)
    var i = 0
    while (i < k) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = row.getArray(1).toIntArray()
      // ragged codebooks are rejected ONCE at parse — the per-row
      // kernel then only checks the input dim against cbDim
      require(vecs(i).length == vecs(0).length,
        s"pq_encode codebook is ragged: row $i dim ${vecs(i).length} != ${vecs(0).length}")
      // the lowest-cid tie rule in the argmin loop depends on the
      // literal being cid-ascending; an out-of-order codebook would
      // silently return the first-LISTED cid on exact ties and
      // diverge from the oracle's ORDER BY dist, cid — fail loudly
      require(i == 0 || ids(i) > ids(i - 1),
        s"pq_encode codebook must be strictly cid-ascending: " +
          s"cid ${ids(i)} at row $i follows ${ids(i - 1)}")
      i += 1
    }
    (ids, vecs)
  }

  @transient private lazy val cbDim: Int = codebook._2(0).length

  def evalVec(v: ArrayData): ArrayData = {
    val (ids, vecs) = codebook
    val dim = v.numElements()
    if (dim % nSub != 0)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim $dim not divisible into $nSub subspaces")
    // a dim mismatch would silently zero-pad slices and mis-assign —
    // DuckDB's unnest join has no such row to match; checked once per
    // row (codebook raggedness is rejected at parse)
    if (cbDim != dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim $dim != codebook dim $cbDim")
    val sub = dim / nSub
    val a = v.toIntArray()
    val out = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val off = m * sub
      var bestDist = Long.MaxValue
      var bestId = -1L
      var c = 0
      while (c < ids.length) {
        val cv = vecs(c)
        var dist = 0L
        var j = 0
        while (j < sub) {
          val diff = (a(off + j) - cv(off + j)).toLong
          dist += diff * diff
          j += 1
        }
        // strict < keeps the FIRST minimum — lowest cid, since the
        // codebook literal is cid-ascending
        if (dist < bestDist) { bestDist = dist; bestId = ids(c) }
        c += 1
      }
      out(m) = InternalRow(bestId, bestDist)
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    evalVec(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) => s"${ev.value} = $ref.evalVec($a);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Runtime registration (idempotent) — callers that build their own
  * SparkSession can also install [[GraftExtensions]] instead.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "topk_struct", exprs => TopKStruct(exprs(0), exprs(1)).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "heavy_hitters", exprs => HeavyHitters(exprs(0), exprs(1)).toAggregateExpression(),
      "built-in")
    // Spark's own runtime-filter bloom pair (internal, so not in the
    // public registry): bloom_agg builds a map-side-combinable
    // BloomFilter sketch, bloom_contains probes it — the scale form
    // of broadcast-set semi-joins (q_decontam_bloom).
    reg.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_argmax", exprs => CosineArgmax(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_scale", exprs => Int8Scale(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "int8_round", exprs => Int8Round(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "pq_encode", exprs => PqEncode(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "nfkc_normalize", exprs => NfkcNormalize(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "mask_pii", exprs => MaskPii(exprs(0)), "built-in")
  }
}

/** SparkSessionExtensions hook:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_argmax"),
      new ExpressionInfo(classOf[CosineArgmax].getName, "cosine_argmax"),
      (exprs: Seq[Expression]) => CosineArgmax(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("topk_struct"),
      new ExpressionInfo(classOf[TopKStruct].getName, "topk_struct"),
      (exprs: Seq[Expression]) => TopKStruct(exprs(0), exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "heavy_hitters"),
      (exprs: Seq[Expression]) => HeavyHitters(exprs(0), exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo("org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate", "bloom_agg"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo("org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain", "bloom_contains"),
      (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("int8_scale"),
      new ExpressionInfo(classOf[Int8Scale].getName, "int8_scale"),
      (exprs: Seq[Expression]) => Int8Scale(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("int8_round"),
      new ExpressionInfo(classOf[Int8Round].getName, "int8_round"),
      (exprs: Seq[Expression]) => Int8Round(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => PqEncode(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc_normalize"),
      (exprs: Seq[Expression]) => NfkcNormalize(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("mask_pii"),
      new ExpressionInfo(classOf[MaskPii].getName, "mask_pii"),
      (exprs: Seq[Expression]) => MaskPii(exprs(0))))
  }
}

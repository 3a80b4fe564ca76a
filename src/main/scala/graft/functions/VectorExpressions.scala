package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two float/double array columns
  * (SURVEY.md §2.12 custom-code preference order: a codegen'd
  * `Expression` beats a UDF beats anything else). Sums in ascending
  * index order — the same order as the HOF `aggregate(zip_with(...))`
  * formulation and the DuckDB `list_reduce` oracle, so results are
  * bit-identical across all three.
  *
  * doGenCode emits a tight primitive loop (no per-element boxing, no
  * lambda dispatch) that stays inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)

  override def nullable: Boolean = true

  // null on length mismatch or null elements — matching the HOF
  // aggregate(zip_with(...)) formulation's null propagation
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left.dataType); val rf = isFloat(right.dataType)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (isFloat(left.dataType)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (isFloat(right.dataType)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ($getX) * ($getY);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** 64-bit SimHash over a token array: per-token xxhash64 (seed 42,
  * matching Spark's xxhash64 function), sign-sum per bit, bits packed
  * into a long. Replaces a 64-lambda nested-HOF formulation with one
  * native expression; codegen emits a single static call so the row
  * stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SimHash64.compute($x)")
}

object SimHash64 {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s, org.apache.spark.sql.types.StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** k seeded MinHash values over a token array in ONE pass (reference
  * operator: MinHash signature for LSH dedup). Replaces k independent
  * `array_min(transform(sh, x => xxhash64(lit(i), x)))` scans — k full
  * traversals of the shingle array per row — with a single traversal
  * maintaining all k running minima. Byte-identical to the HOF form:
  * slot i is min over tokens of xxhash64(lit(i), token) with Spark's
  * seed-chaining (seed 42 → int i → string token).
  */
case class MinHashK(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k > 0, s"minhash_k needs k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_k expects array<string>, got $t")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)

  override protected def withNewChildInternal(c: Expression): MinHashK = copy(child = c)

  override def nullSafeEval(a: Any): Any =
    MinHashK.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.MinHashK.compute($x, $k)")
}

object MinHashK {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function
  import org.apache.spark.sql.types.{IntegerType, StringType}

  /** Static kernel shared by interpreted eval and generated code.
    * Matches xxhash64(lit(i), token) exactly: per-slot seed is the hash
    * of the int literal i chained from Spark's default seed 42; a null
    * token contributes its slot seed (xxhash64 skips null children);
    * an empty token array yields k null slots (array_min of empty).
    */
  // per-slot seeds depend only on (k): memoize per executor JVM
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, k2 => {
      val s = new Array[Long](k2)
      var i = 0
      while (i < k2) { s(i) = XxHash64Function.hash(i, IntegerType, 42L); i += 1 }
      s
    })

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val seeds = seedsFor(k)
    val n = tokens.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](k)) // k nulls
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var t = 0
    while (t < n) {
      if (tokens.isNullAt(t)) {
        var j = 0
        while (j < k) { if (seeds(j) < mins(j)) mins(j) = seeds(j); j += 1 }
      } else {
        val s = tokens.getUTF8String(t)
        var j = 0
        while (j < k) {
          val h = XxHash64Function.hash(s, StringType, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** All `nTables` random-hyperplane LSH signatures of an embedding in
  * ONE compiled pass — packed as array<long>, table t's b-bit signature
  * at index t, bit p set iff Σᵢ e[i]·planes[t·b+p][i] ≥ 0 (ascending-
  * index double accumulation, exactly the composed
  * `when(DotProduct(e, planeLits) >= 0, 1<<p)` form it replaces).
  *
  * Why native: at b bits × nTables tables the composed form inlines
  * 8·b dot loops over 64-element literal arrays into ONE generated
  * method; past ~b=8 that method exceeds HotSpot's JIT bytecode budget
  * (DontCompileHugeMethods) and the whole stage silently drops to the
  * BYTECODE INTERPRETER — measured 16 ms/row (3,262 task-seconds for a
  * 200k-row signature pass, the r14 v2 straggler) vs ~µs/row compiled.
  * The kernel is one static method far under the JIT limit at any
  * geometry; codegen emits a single call (the MinHashK discipline).
  *
  * Null handling: a null ELEMENT mirrors the composed form it replaced
  * (every plane's dot was NULL, `when(null >= 0)` took otherwise(0) —
  * all-zero signatures). A WRONG-DIMENSION embedding (length ≠ plane
  * length) takes the same route: the composed form's DotProduct
  * returned NULL on a length mismatch, so all signatures were zero —
  * the kernel reproduces that (all-zero signature array) rather than
  * silently truncating the dot to the shorter prefix, so a malformed
  * vector never participates in ANN as an apparently valid one.
  * A fully-NULL embedding is a DELIBERATE
  * divergence: the expression is null-intolerant (UnaryExpression
  * default), so the signature array is NULL and the vector drops out
  * at the posexplode — where the composed form filed null vectors into
  * bucket 0 of every table as phantom candidates. Dropping missing
  * vectors from an approximate index is the defensible semantics;
  * callers that must surface them should filter/flag upstream.
  */
case class HyperplaneSigs(child: Expression, planes: Array[Array[Double]],
                          nTables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.length == nTables * bits,
    s"need ${nTables * bits} planes, got ${planes.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def withNewChildInternal(c: Expression): HyperplaneSigs =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    HyperplaneSigs.compute(a.asInstanceOf[ArrayData], planes, nTables, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.HyperplaneSigs.compute($x, $p, $nTables, $bits, $isFloat)")
  }
}

object HyperplaneSigs {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(e: ArrayData, planes: Array[Array[Double]], nTables: Int,
              bits: Int, isFloat: Boolean): ArrayData = {
    val n = e.numElements()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = e.isNullAt(i); i += 1 }
    // dimension mismatch ≡ null element: DotProduct's contract is NULL
    // on length mismatch, which the composed form routed to an all-zero
    // signature — never a prefix-truncated dot (see class doc)
    val dimOk = planes.length == 0 || planes(0).length == n
    val out = new Array[Long](nTables)
    if (!hasNull && dimOk) {
      var t = 0
      while (t < nTables) {
        var sig = 0L
        var p = 0
        while (p < bits) {
          val plane = planes(t * bits + p)
          var acc = 0.0
          var j = 0
          while (j < n) {
            acc += (if (isFloat) e.getFloat(j).toDouble else e.getDouble(j)) * plane(j)
            j += 1
          }
          if (acc >= 0.0) sig |= (1L << p)
          p += 1
        }
        out(t) = sig
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {
  /** Column-level dot product over array<float> columns. */
  def fdot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      DotProduct(org.apache.spark.sql.graft.Bridge.toExpression(a),
        org.apache.spark.sql.graft.Bridge.toExpression(b)))

  /** Column-level 64-bit SimHash over an array<string> token column. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      SimHash64(org.apache.spark.sql.graft.Bridge.toExpression(tokens)))

  /** Column-level k-slot MinHash signature over an array<string> column. */
  def minhashK(tokens: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      MinHashK(org.apache.spark.sql.graft.Bridge.toExpression(tokens), k))

  /** Column-level packed LSH table signatures (array<long>, one per
    * table) over an array<float|double> embedding column. */
  def hyperplaneSigs(emb: Column, planes: Array[Array[Double]],
                     nTables: Int, bits: Int): Column =
    org.apache.spark.sql.graft.Bridge.toColumn(
      HyperplaneSigs(org.apache.spark.sql.graft.Bridge.toExpression(emb),
        planes, nTables, bits))
}

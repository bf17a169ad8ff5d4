package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the embedding hot path.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a
  * higher-order function — CodegenFallback, interpreted per element, two
  * intermediate arrays allocated per row. For pairwise similarity
  * (n^2 candidate pairs x 64 dims) that interpretation cost dominates.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen: no allocation, no boxing.
  *
  * For equal-length arrays the result is BIT-IDENTICAL to the built-in
  * formulation (and to DuckDB's list_dot_product, which the oracle uses):
  * sequential left-to-right fold of double products, each float element
  * widened exactly before multiplying. Returns null if either array is null
  * or any touched element is null. On UNEQUAL lengths the semantics
  * deliberately diverge from the HOF form: this folds over min(len(a),
  * len(b)), whereas zip_with null-pads the shorter side and the aggregate
  * collapses to null — a ragged pair yields a value here and null there.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null is produced for null *elements* even when both array inputs are
  // non-null, so nullability cannot be derived from the children
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalStateException(s"unexpected element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, ta, i) * get(b, tb, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def access(arr: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ${access(a, elemType(left).get, i)} * ${access(b, elemType(right).get, i)};
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH sign signature as one codegen loop.
  *
  * Semantics identical to the HOF formulation in Similarity.lshBucket's
  * original form: plane component for (plane p, dim d) is
  * `pmod(xxhash64(p, d), 1e6)/5e5 - 1` (xxhash64 = seed-42 hashInt chain over
  * the two ints), bit p of the signature = sign of the projection. The HOF version
  * materializes a component array per row per plane (interpreted);
  * this evaluates nPlanes x dim hash+multiply in-register.
  */
case class HyperplaneSignature(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float|double>, got $other")
  }

  @inline private def component(p: Int, d: Int): Double = {
    // xxhash64(lit(p), d) hashes INT inputs via hashInt — match exactly
    var h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(p, 42L)
    h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(d, h)
    val r = h % 1000000L
    val m = if (r < 0) r + 1000000L else r
    m.toDouble / 500000.0 - 1.0
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        if (a.isNullAt(d)) return null
        val x = if (elemType == FloatType) a.getFloat(d).toDouble else a.getDouble(d)
        proj += x * component(p, d)
        d += 1
      }
      if (proj >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val acc = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val proj = ctx.freshName("proj")
      val h = ctx.freshName("h"); val r = ctx.freshName("r")
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $nPlanes && !${ev.isNull}; $p++) {
         |  double $proj = 0.0;
         |  for (int $d = 0; $d < $a.numElements(); $d++) {
         |    if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
         |    long $h = $xxh.hashInt($d, $xxh.hashInt($p, 42L));
         |    long $r = $h % 1000000L; if ($r < 0) $r += 1000000L;
         |    $proj += ((double) $a.$acc($d)) * (((double) $r) / 500000.0 - 1.0);
         |  }
         |  if ($proj >= 0) $sig |= 1L << $p;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $sig; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `bands` portable hyperplane band buckets in ONE pass over the vector.
  *
  * Semantics identical to the static-sum HOF formulation
  * [[graft.functions.PortableHashes.lshBandBucket]] evaluated for band
  * g = 0..bands-1 (bit-identical: same flat plane index
  * `(g*planesPerBand + p) * dim + d + 1`, same integer component hash, same
  * left-to-right double accumulation per plane, dim = the array's length) —
  * that form stays as the interpreted cross-check, but as a per-band Column
  * expression it expands to bands x planesPerBand x dim `element_at` terms,
  * each re-casting the float array, which is both too large for janino and
  * quadratic-ish in allocation (measured: 4 ms/row at 4x8x64 — the q88
  * signature stage alone took 15 s for 4,000 vectors). This loop touches
  * each element once per plane, in-register, inside whole-stage codegen.
  * Returns array<long> of length `bands` (the bucket per band); null input
  * or null element yields null. */
case class PortableBandSig(child: Expression, bands: Int, planesPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, false)
  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (bands < 1 || planesPerBand < 1 || planesPerBand > 63)
      TypeCheckResult.TypeCheckFailure(
        s"portable_band_sig needs bands >= 1 and 1 <= planesPerBand <= 63 " +
          s"(a band bucket is one long), got bands=$bands planes=$planesPerBand")
    else child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"portable_band_sig requires array<float|double>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val dim = a.numElements()
    val out = new Array[Long](bands)
    var g = 0
    while (g < bands) {
      var sig = 0L
      var p = 0
      while (p < planesPerBand) {
        val plane = g.toLong * planesPerBand + p
        var proj = 0.0
        var d = 0
        while (d < dim) {
          if (a.isNullAt(d)) return null
          val x = if (elemType == FloatType) a.getFloat(d).toDouble else a.getDouble(d)
          proj += x * (((plane * dim + d + 1) * 2654435761L % 2147483647L)
            / 1073741823.5 - 1.0)
          d += 1
        }
        if (proj >= 0) sig |= 1L << p
        p += 1
      }
      out(g) = sig
      g += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val g = ctx.freshName("g")
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val sig = ctx.freshName("sig"); val proj = ctx.freshName("proj")
      val plane = ctx.freshName("plane"); val dim = ctx.freshName("dim")
      s"""
         |int $dim = $a.numElements();
         |long[] $out = new long[$bands];
         |for (int $g = 0; $g < $bands && !${ev.isNull}; $g++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planesPerBand && !${ev.isNull}; $p++) {
         |    long $plane = ((long) $g) * $planesPerBand + $p;
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
         |      $proj += ((double) $a.$acc($d)) *
         |        ((double) (($plane * $dim + $d + 1) * 2654435761L % 2147483647L)
         |          / 1073741823.5 - 1.0);
         |    }
         |    if ($proj >= 0) $sig |= 1L << $p;
         |  }
         |  $out[$g] = $sig;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column API + SQL registration for the vector expressions. */
object VectorFunctions {

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplane_sig(emb: Column, nPlanes: Int): Column =
    ColumnBridge.column(HyperplaneSignature(ColumnBridge.expression(emb), nPlanes))

  def portable_band_sig(emb: Column, bands: Int, planesPerBand: Int): Column =
    ColumnBridge.column(
      PortableBandSig(ColumnBridge.expression(emb), bands, planesPerBand))

  /** The SQL form's nPlanes must be a foldable integer (the plane count is a
    * plan-time constant baked into codegen); fail analysis with a clear
    * message instead of an opaque eval error on a column argument. */
  private[expressions] def nPlanesArg(e: Expression): Int = {
    require(e.foldable, "hyperplane_sig: nPlanes must be an integer literal, not a column")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"hyperplane_sig: nPlanes must be an integer literal, got $other")
    }
  }

  /** Register the custom expressions into a session's function registry
    * (idempotent) so `spark.sql("... vec_dot(a, b) ...")`,
    * `hyperplane_sig(v, n)` and `poly_hash(s)` work without extensions
    * wiring. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "hyperplane_sig", exprs => HyperplaneSignature(exprs.head,
        VectorFunctions.nPlanesArg(exprs(1))), "scala_udf")
    reg.createOrReplaceTempFunction(
      "portable_band_sig", exprs => PortableBandSig(exprs.head,
        VectorFunctions.nPlanesArg(exprs(1)), VectorFunctions.nPlanesArg(exprs(2))),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
  }
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` or
  * spark.sql.extensions=graft.functions.expressions.GraftExtensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSignature(exprs.head,
        VectorFunctions.nPlanesArg(exprs(1)))))
    e.injectFunction((
      new FunctionIdentifier("portable_band_sig"),
      new ExpressionInfo(classOf[PortableBandSig].getName, "portable_band_sig"),
      (exprs: Seq[Expression]) => PortableBandSig(exprs.head,
        VectorFunctions.nPlanesArg(exprs(1)), VectorFunctions.nPlanesArg(exprs(2)))))
    e.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    // SQL range joins plan as nested loops; this rewrites them to the
    // bucketized equi join when spark.graft.rangeJoin.bucketWidth is set
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // opt-in approximate mode: COUNT(DISTINCT x) -> native HLL++ when
    // spark.graft.approxDistinct.rsd is set (sketch-sized exchanges)
    e.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    // opt-in top-N-per-group: row_number window + rn <= k filter -> the
    // bounded-heap physical operator when spark.graft.topk.rewrite=true
    // (rule and strategy install together — one without the other is
    // either a no-op or an unplannable node)
    e.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

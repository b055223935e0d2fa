package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/signature hot paths.
  *
  * The Column-combinator forms (zip_with/aggregate/filter) are correct but
  * fall out of whole-stage codegen (higher-order lambdas are interpreted,
  * ~0.4 ms per element-op measured); these expressions generate tight Java
  * loops over `ArrayData` instead — the difference between 10 s and 10 ms
  * on a few hundred candidate pairs, and the difference between feasible
  * and not at corpus scale.
  *
  * All accumulate left-to-right in double, exactly like a sequential fold,
  * so results are bit-identical to the interpreted forms (oracle parity).
  */
object VectorExpressions {

  private def elemIsDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Per-element-type accessors for the numeric array expressions:
    * (interpreted get, codegen get). Explicit dispatch — silently calling
    * getFloat on an int/byte array would reinterpret bits as floats and
    * produce garbage with no error (int8 quantization codes made that a
    * live hazard).
    */
  private def elemAccessors(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(ByteType, _) => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalArgumentException(
      s"vector expression expects array<double|float|int|byte>, got $other")
  }

  private def elemGenGet(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(IntegerType, _) => s"(double) $arr.getInt($i)"
    case ArrayType(ByteType, _) => s"(double) $arr.getByte($i)"
    case other => throw new IllegalArgumentException(
      s"vector expression expects array<double|float|int|byte>, got $other")
  }

  /** #positions where two equal-length long arrays agree (MinHash signature
    * agreement). null if either side is null; lengths must match.
    */
  case class ArrayAgreeCount(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var i = 0; var c = 0
      while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val c = ctx.freshName("c")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $c++;
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Dot product of two float/double arrays, accumulated in double,
    * ascending index order (bit-equal to a sequential fold).
    */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    private lazy val leftGet = elemAccessors(left.dataType)
    private lazy val rightGet = elemAccessors(right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var i = 0; var acc = 0.0
      while (i < n) {
        acc += leftGet(a, i) * rightGet(b, i); i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
        val gx = elemGenGet(left.dataType, a, i)
        val gy = elemGenGet(right.dataType, b, i)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $gx * $gy;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** L2 norm of a float/double array (double accumulation, ascending). */
  case class VecL2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val elemGet = elemAccessors(child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var i = 0; var acc = 0.0
      val n = a.numElements()
      while (i < n) {
        val x = elemGet(a, i)
        acc += x * x; i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
        val gx = elemGenGet(child.dataType, a, i)
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $gx;
           |  $acc += $x * $x;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** max |x| over a numeric array — the int8-quantization scale, as a
    * tight codegen loop instead of `array_max(transform(v, abs))` (the
    * transform lambda is an interpreted HOF and this runs per vector on
    * the quantized-index BUILD pass over the whole corpus). Matches the
    * combinator form bitwise: |x| via Math.abs on the double widening,
    * max propagates NaN like Spark's NaN-greatest ordering, empty array
    * → null (array_max of an empty array is null). A NULL ELEMENT is a
    * loud error, never a silent 0-read — a vector with a null slot is
    * malformed input, and the UnsafeArrayData payload under a null slot
    * is garbage.
    */
  case class VecMaxAbs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    private lazy val elemGet = elemAccessors(child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n == 0) null
      else {
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            "vec_max_abs: null element in vector — repair or drop the row")
          val x = math.abs(elemGet(a, i))
          if (x > acc || java.lang.Double.isNaN(x)) acc = x
          i += 1
        }
        acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
        val gx = elemGenGet(child.dataType, a, i)
        s"""
           |int $n = $a.numElements();
           |if ($n == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i)) throw new IllegalArgumentException(
           |      "vec_max_abs: null element in vector — repair or drop the row");
           |    double $x = java.lang.Math.abs($gx);
           |    if ($x > $acc || java.lang.Double.isNaN($x)) $acc = $x;
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def vec_max_abs(v: Column): Column = column(VecMaxAbs(expression(v)))

  /** Symmetric int8 codes of a numeric vector under scale `maxAbs` —
    * `floor(x/maxAbs·127 + 0.5)` per element as one codegen loop over a
    * primitive byte array, replacing the `transform(v, when(…))` lambda
    * on the same corpus-sized build pass as [[VecMaxAbs]]. maxAbs = 0
    * (the all-zero vector) yields all-zero codes, exactly like the
    * column form.
    *
    * Null handling is EXPLICIT, not BinaryExpression null-propagation:
    * an EMPTY vector yields an empty code array regardless of `maxAbs`
    * — [[VecMaxAbs]] returns null there, and default propagation would
    * turn the codes null too, silently diverging from the legacy
    * combinator form that mapped empty→empty (quantizeInt8 output for
    * zero-length embeddings changed under it). A null `maxAbs` paired
    * with a NON-empty vector has no meaning (the engine's scale source
    * is vec_max_abs, non-null on non-empty input) and fails loudly.
    */
  case class VecInt8Codes(left: Expression, right: Expression)
      extends BinaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._

    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def nullable: Boolean = left.nullable
    private lazy val elemGet = elemAccessors(left.dataType)

    private def codesOf(a: ArrayData, maxAbs: Double): GenericArrayData = {
      val n = a.numElements()
      val out = new Array[Byte](n)
      if (maxAbs != 0d) {
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            "vec_int8_codes: null element in vector — repair or drop the row")
          out(i) = math.floor(elemGet(a, i) / maxAbs * 127d + 0.5d).toByte
          i += 1
        }
      }
      new GenericArrayData(out)
    }

    override def eval(input: InternalRow): Any = {
      val v = left.eval(input)
      if (v == null) return null
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() == 0) return new GenericArrayData(Array.emptyByteArray)
      val m = right.eval(input)
      if (m == null) throw new IllegalArgumentException(
        "vec_int8_codes: null maxAbs for a non-empty vector — scale with vec_max_abs")
      codesOf(a, m.asInstanceOf[Double])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lg = left.genCode(ctx)
      val rg = right.genCode(ctx)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val gx = elemGenGet(left.dataType, lg.value.toString, i)
      val block =
        code"""
          |${lg.code}
          |boolean ${ev.isNull} = ${lg.isNull};
          |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
          |if (!${ev.isNull}) {
          |  int $n = ${lg.value}.numElements();
          |  byte[] $out = new byte[$n];
          |  if ($n > 0) {
          |    ${rg.code}
          |    if (${rg.isNull}) throw new IllegalArgumentException(
          |      "vec_int8_codes: null maxAbs for a non-empty vector — scale with vec_max_abs");
          |    if (${rg.value} != 0.0) {
          |      for (int $i = 0; $i < $n; $i++) {
          |        if (${lg.value}.isNullAt($i)) throw new IllegalArgumentException(
          |          "vec_int8_codes: null element in vector");
          |        $out[$i] = (byte) java.lang.Math.floor($gx / ${rg.value} * 127.0 + 0.5);
          |      }
          |    }
          |  }
          |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
          |}
        """
      ev.copy(code = block)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def vec_int8_codes(v: Column, maxAbs: Column): Column =
    column(VecInt8Codes(expression(v), expression(maxAbs)))

  /** Random-hyperplane LSH signature of a float/double vector: bit b =
    * sign(dot(v, plane(seed, b))), planes derived deterministically from
    * (seed, b, dim index) via a splitmix64 parity — identical on every
    * executor with zero shipped state, and distinct per `seed` so B
    * independent bands are B calls with seeds 0..B-1.
    *
    * Generates a tight bits×dim loop (the Column-combinator fold is
    * interpreted and was the dominant cost of the ANN queries).
    */
  case class HyperplaneSig(child: Expression, sigBits: Int, seed: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    private lazy val isDouble = elemIsDouble(child.dataType)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var sig = 0L
      var b = 0
      while (b < sigBits) {
        var acc = 0.0
        var d = 0
        while (d < n) {
          val x = if (isDouble) a.getDouble(d) else a.getFloat(d).toDouble
          acc += x * planeSign(seed, b, d)
          d += 1
        }
        if (acc > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // call through the RETURNED name: bare names break when a large
      // plan spills generated functions into a nested class
      val fn = ctx.addNewFunction("graftPlaneSign",
        """
          |private double graftPlaneSign(long seed, int b, int d) {
          |  long z = (seed * 4194304L + ((long) b << 6) + d) + 0x9E3779B97F4A7C15L;
          |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
          |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
          |  z = z ^ (z >>> 31);
          |  return ((z & 1L) == 1L) ? 1.0 : -1.0;
          |}
        """.stripMargin)
      nullSafeCodeGen(ctx, ev, a => {
        val b = ctx.freshName("b"); val d = ctx.freshName("d"); val n = ctx.freshName("n")
        val acc = ctx.freshName("acc"); val sig = ctx.freshName("sig")
        val gx = if (isDouble) s"$a.getDouble($d)" else s"(double) $a.getFloat($d)"
        s"""
           |int $n = $a.numElements();
           |long $sig = 0L;
           |for (int $b = 0; $b < $sigBits; $b++) {
           |  double $acc = 0.0;
           |  for (int $d = 0; $d < $n; $d++) {
           |    $acc += $gx * $fn($seed, $b, $d);
           |  }
           |  if ($acc > 0) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** IVF probe selection: the `probes` nearest centroids of a vector, by
    * inner product against unit-normalized centroids (equivalent to cosine
    * ranking — the query's own norm is constant across centroids).
    * Centroids ride as a reference object into generated code (same
    * technique as `proto_decode`), so the k×dim scoring loop runs compiled
    * inside whole-stage codegen with zero per-row setup.
    */
  case class CentroidProbes(child: Expression, centroids: Array[Array[Double]], probes: Int)
    extends UnaryExpression {
    require(probes >= 1 && probes <= centroids.length)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private lazy val isDouble = elemIsDouble(child.dataType)

    /** Unit-normalized centroid matrix (zero-norm centroids stay zero). */
    @transient private lazy val unit: Array[Array[Double]] = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c else c.map(_ / n)
    }

    /** Called from both eval and generated code. */
    def topProbes(a: ArrayData): ArrayData = {
      val n = a.numElements()
      val k = unit.length
      val scores = new Array[Double](k)
      var ci = 0
      while (ci < k) {
        val c = unit(ci)
        var acc = 0.0
        val d = math.min(n, c.length)
        var i = 0
        while (i < d) {
          acc += (if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble) * c(i)
          i += 1
        }
        scores(ci) = acc
        ci += 1
      }
      // selection of top `probes` by repeated max scan (probes, k both small)
      val out = new Array[Int](probes)
      val taken = new Array[Boolean](k)
      var p = 0
      while (p < probes) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          if (!taken(j) && scores(j) > bestScore) { best = j; bestScore = scores(j) }
          j += 1
        }
        taken(best) = true
        out(p) = best
        p += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(v: Any): Any = topProbes(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfProbes", this, classOf[CentroidProbes].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.topProbes($v);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** LSH band-bucket hashes of a MinHash signature: element `b` is a
    * splitmix64-style fold of the band's `rowsPerBand` longs (band index
    * seeds the fold). Replaces the interpreted
    * transform-of-slice-of-transform Column form, which paid the
    * higher-order-lambda tax once per band per document — this is one tight
    * generated loop per document. Bucket values are internal join keys
    * only (never oracle-compared), so the mix just needs uniformity.
    */
  case class SigBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
    require(bands >= 1 && rowsPerBand >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 0x9E3779B97F4A7C15L * (b + 1)
        var i = b * rowsPerBand
        val end = math.min(i + rowsPerBand, a.numElements())
        while (i < end) { h = mix64(h ^ a.getLong(i)); i += 1 }
        out(b) = h
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = ctx.addNewFunction("graftMix64",
        """
          |private long graftMix64(long z) {
          |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
          |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
          |  return z ^ (z >>> 31);
          |}
        """.stripMargin)
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out"); val b = ctx.freshName("b")
        val h = ctx.freshName("h"); val i = ctx.freshName("i"); val end = ctx.freshName("end")
        s"""
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $h = 0x9E3779B97F4A7C15L * ($b + 1);
           |  int $end = java.lang.Math.min(($b + 1) * $rowsPerBand, $a.numElements());
           |  for (int $i = $b * $rowsPerBand; $i < $end; $i++) {
           |    $h = $fn($h ^ $a.getLong($i));
           |  }
           |  $out[$b] = $h;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Single-pass cosine similarity of two numeric arrays, with the
    * zero-norm guard the composed `dot/(norm·norm)` form lacked: a
    * zero-norm side yields 0.0, never 0/0 = NaN (a 100 TB embedding corpus
    * WILL contain zero vectors — all-padding docs, dead encoder outputs —
    * and NaN scores poison every downstream ranking comparator).
    *
    * Arithmetic is kept BIT-IDENTICAL to the composed form (and to the
    * DuckDB oracle's `dot / (sqrt(ssq_a) * sqrt(ssq_b))`): each
    * accumulator folds in ascending index order, the dot runs over
    * min(len), each norm over its FULL array, and the denominator is
    * `sqrt(na)·sqrt(nb)` — not `sqrt(na·nb)`, which rounds differently.
    * One traversal instead of the composed form's three.
    */
  case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    private lazy val leftGet = elemAccessors(left.dataType)
    private lazy val rightGet = elemAccessors(right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      val n = math.min(na, nb)
      var i = 0; var dot = 0.0; var sa = 0.0; var sb = 0.0
      while (i < n) {
        val x = leftGet(a, i); val y = rightGet(b, i)
        dot += x * y; sa += x * x; sb += y * y; i += 1
      }
      while (i < na) { val x = leftGet(a, i); sa += x * x; i += 1 }
      i = n
      while (i < nb) { val y = rightGet(b, i); sb += y * y; i += 1 }
      if (sa == 0.0 || sb == 0.0) 0.0
      else dot / (math.sqrt(sa) * math.sqrt(sb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
        val dot = ctx.freshName("dot"); val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val gx = elemGenGet(left.dataType, a, i)
        val gy = elemGenGet(right.dataType, b, i)
        s"""
           |int $la = $a.numElements();
           |int $lb = $b.numElements();
           |int $n = java.lang.Math.min($la, $lb);
           |double $dot = 0.0; double $sa = 0.0; double $sb = 0.0;
           |int $i = 0;
           |for (; $i < $n; $i++) {
           |  double $x = $gx; double $y = $gy;
           |  $dot += $x * $y; $sa += $x * $x; $sb += $y * $y;
           |}
           |for (; $i < $la; $i++) { double $x = $gx; $sa += $x * $x; }
           |for ($i = $n; $i < $lb; $i++) { double $y = $gy; $sb += $y * $y; }
           |${ev.value} = ($sa == 0.0 || $sb == 0.0)
           |  ? 0.0 : $dot / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Scala mirror of the generated graftMix64. */
  private[graft] def mix64(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Scala mirror of the generated plane-sign (kept in sync with
    * graftPlaneSign in [[HyperplaneSig.doGenCode]]).
    */
  private[graft] def planeSign(seed: Long, b: Int, d: Int): Double = {
    var z = (seed * 4194304L + (b.toLong << 6) + d) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 1L) 1.0 else -1.0
  }

  // ------------------------------------------------------ Column wrappers

  def array_agree_count(a: Column, b: Column): Column = column(ArrayAgreeCount(expression(a), expression(b)))
  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def vec_norm(a: Column): Column = column(VecL2Norm(expression(a)))
  def vec_cosine(a: Column, b: Column): Column = column(VecCosine(expression(a), expression(b)))
  def centroid_probes(v: Column, centroids: Array[Array[Double]], probes: Int): Column =
    column(CentroidProbes(expression(v), centroids, probes))
  def hyperplane_sig(v: Column, sigBits: Int, seed: Int): Column =
    column(HyperplaneSig(expression(v), sigBits, seed))
  def sig_band_hashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    column(SigBandHashes(expression(sig), bands, rowsPerBand))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd dot product of two `array<float>` columns, accumulated
  * in double in element order — bit-identical to the declarative
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` fold (same IEEE op
  * sequence) and to the length-guarded DuckDB twin
  * ([[graft.sim.Similarity.dotSql]]: a bare `list_sum` over `list_zip`
  * would SKIP the pad nulls of a ragged pair and return a truncated sum
  * where this returns NULL — the guard keeps the engines identical on ALL
  * inputs), but one tight loop instead of an interpreted lambda tree with
  * two intermediate arrays per row. Higher-order functions are CodegenFallback
  * in Spark, so on pair-join hot paths (ANN verify, IVF assignment) the
  * declarative form dominates the profile; this expression keeps the loop
  * inside whole-stage codegen.
  */
case class DotProd(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_prod expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  // NULL on length mismatch (not a truncated dot) AND on a null ELEMENT:
  // the declarative twin `aggregate(zip_with(a,b,_*_), 0.0, _+_)` null-pads
  // the shorter side and a null element's product poisons the fold —
  // equality with it must hold on ALL inputs. Reading a null slot through
  // getFloat would silently contribute 0.0 instead. The element check is
  // emitted ONLY when the schema admits null elements (containsNull), so
  // the dense-vector hot path keeps the branch-free loop. A declared
  // containsNull=false is TRUSTED, not checked — Spark's own convention
  // (rows violating their declared schema are undefined behavior
  // everywhere in codegen); such a row would read 0.0 here, not NULL.
  override def nullable: Boolean = true

  private def mayHaveNullElems: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = mayHaveNullElems
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val elemGuard = if (mayHaveNullElems)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemGuard
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native sign-LSH key: bit p of the result is set iff the dot product of
  * the `array<float>` child with hyperplane p is strictly positive. One
  * expression evaluates ALL planes of a hash table in a single pass over
  * the vector — the declarative equivalent (one interpreted HOF fold per
  * plane, summed through a `when` chain) re-reads the vector `planes` times
  * per row and runs interpreted; with 6 tables × 16 planes that was the
  * dominant cost of the embedding near-dup query. Each per-plane
  * accumulation is element-ordered double math, so the sign (and therefore
  * the key) is bit-identical to the fold and to the DuckDB oracle SQL.
  *
  * The plane matrix rides along as a reference object (literal weights from
  * [[graft.text.Lex]]), not as child expressions — constant folding over
  * 16×64 literal arrays per row is exactly the overhead this avoids.
  */
case class PlaneKey(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  // the constructor arg stays a value-equal Seq: an Array field makes the
  // case-class equals/hashCode use reference identity, so two structurally
  // identical plane_key calls would never canonicalize together and
  // Catalyst's subexpression/exchange reuse would recompute all 16×64 dot
  // products once per occurrence; eval reads this once-converted matrix
  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"plane_key expects array<float>, got $t")
  }

  override def dataType: DataType = LongType

  // a null ELEMENT poisons a plane's fold in the declarative form (the
  // when-chain sees a null dot and leaves the bit unset) — getFloat on the
  // null slot would instead contribute 0.0 and could SET the bit. The
  // check is emitted only when the schema admits null elements.
  private def mayHaveNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val checkNulls = mayHaveNullElems
    var key = 0L
    var p = 0
    while (p < mat.length) {
      val w = mat(p)
      val n = math.min(x.numElements(), w.length)
      var dot = 0.0
      var poisoned = false
      var i = 0
      while (i < n && !poisoned) {
        if (checkNulls && x.isNullAt(i)) poisoned = true
        else { dot += x.getFloat(i).toDouble * w(i); i += 1 }
      }
      if (!poisoned && dot > 0) key |= 1L << p
      p += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", this.mat, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val key = ctx.freshName("key")
      val w = ctx.freshName("w")
      val poisoned = ctx.freshName("poisoned")
      val elemGuard = if (mayHaveNullElems)
        s"""if ($a.isNullAt($i)) { $poisoned = true; break; }"""
      else ""
      s"""
         |long $key = 0L;
         |for (int $p = 0; $p < $mat.length; $p++) {
         |  double[] $w = $mat[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  double $dot = 0.0;
         |  boolean $poisoned = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemGuard
         |    $dot += (double) $a.getFloat($i) * $w[$i];
         |  }
         |  if (!$poisoned && $dot > 0) $key |= 1L << $p;
         |}
         |${ev.value} = $key;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExprs {
  /** `dot_prod(a, b)`: element-ordered double dot of two float vectors. */
  def dot_prod(a: Column, b: Column): Column =
    graftshim.exprColumn(DotProd(graftshim.columnExpr(a), graftshim.columnExpr(b)))

  /** `plane_key(v, planes)`: sign-LSH bucket key over a hyperplane table. */
  def plane_key(v: Column, planes: Seq[Seq[Long]]): Column =
    graftshim.exprColumn(PlaneKey(graftshim.columnExpr(v),
      planes.map(_.map(_.toDouble))))
}

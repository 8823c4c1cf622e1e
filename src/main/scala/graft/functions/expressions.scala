package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for text semantics Spark's built-ins can't
  * express. All have `doGenCode` so they stay inside whole-stage codegen
  * (the generated code calls the static evaluators below — same pattern
  * Spark uses for its own string expressions).
  */
object GraftExpressions {
  def stripAccents(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))
  def stemDutch(c: Column): Column =
    GraftBridge.column(StemDutch(GraftBridge.expression(c)))
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftBridge.column(
      DamerauLevenshtein(GraftBridge.expression(a), GraftBridge.expression(b)))
  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  def tokenizeWs(c: Column): Column =
    GraftBridge.column(TokenizeWs(GraftBridge.expression(c)))
}

/** Whitespace tokenization fused into one codegen'd expression — the
  * single hottest text kernel (it runs in nearly every plan). Replaces
  * `filter(split(text, "\\s+", -1), t => t =!= "")`, whose outer filter
  * is a HigherOrderFunction and therefore an interpreted lambda island:
  * this expression produces the identical token array (same
  * java.util.regex split, same empty-token drop) in a single compiled
  * pass with no per-element lambda dispatch and no intermediate array.
  */
case class TokenizeWs(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TokenizeWs.split(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeWs.split($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeWs =
    copy(child = newChild)
}

object TokenizeWs {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Exactly `split(s, "\\s+", -1)` then drop empty tokens — the same
    * java.util.regex engine and limit semantics as Spark's StringSplit,
    * so results are bit-identical to the declarative form it replaces.
    */
  def split(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val parts = Ws.split(s.toString, -1)
    val out = new java.util.ArrayList[AnyRef](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size)))
  }
}

/** Unicode-NFD accent strip + non-ASCII drop, the semantics of the
  * reference's removeAccent (reference: src/NLP_functions.py:125-139:
  * NFD normalize then ascii-encode with errors ignored).
  */
case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(StripAccents.strip(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.StripAccents.strip($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  def strip(s: String): String = {
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < nfd.length) {
      val ch = nfd.charAt(i)
      if (ch < 128) sb.append(ch)
      i += 1
    }
    sb.toString
  }
}

/** Snowball Dutch stemmer (the published snowballstem.org algorithm the
  * reference applies via NLTK, reference: Notebook_Diagnosis_Extraction
  * .ipynb cell 16-17 / src/NLP_functions.py:89). Applied per whitespace
  * token, like the reference's stemmingText.
  */
case class StemDutch(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(DutchStemmer.stemText(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.DutchStemmer.stemText($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): StemDutch =
    copy(child = newChild)
}

/** Optimal-string-alignment Damerau-Levenshtein distance — the variant the
  * reference's pyxdameraulevenshtein computes for typo correction
  * (reference: src/NLP_functions.py:39-87).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.osa(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.osa($a.toString(), $b.toString())")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  /** Optimal string alignment distance (restricted Damerau-Levenshtein). */
  def osa(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    // three rolling rows of the OSA DP matrix
    var prev2 = new Array[Int](m + 1)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      j = 1
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 &&
            a.charAt(i - 1) == b.charAt(j - 2) && a.charAt(i - 2) == b.charAt(j - 1)) {
          d = math.min(d, prev2(j - 2) + 1)
        }
        cur(j) = d
        j += 1
      }
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

/** Dot product of two double arrays with a tight codegen loop — the hot
  * kernel of the similarity operators. Accumulates strictly left-to-right,
  * the same order as `aggregate(zip_with(...))` and the oracle's
  * `list_reduce`, so results are bit-identical to the declarative form it
  * replaces (which pays per-element lambda dispatch).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      _.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var acc = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a single-space-separated text, as one codegen'd
  * pass: `"a b c d", n=3` → `["a b c", "b c d"]`. Fewer than n words →
  * empty array.
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(" ",
  * slice(tokens, i+1, n)))` formulation: higher-order functions are
  * CodegenFallback and that chain allocates a sliced array + joined string
  * per shingle through the interpreter — this expression is the inner loop
  * of every shingle-based operator (fingerprint, MinHash, Jaccard), so it
  * earns a native implementation. Output is byte-identical to the HOF
  * form (shingle = the exact substring spanning n words).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Single pass over the UTF-8 bytes: record space offsets, then emit
    * each n-word span as a substring — no per-shingle token array. */
  def shingle(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toString // UTF-8-safe: operate on the String form
    // word start offsets (single-space separated corpus)
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = bytes.indexOf(' ')
    while (i >= 0) {
      starts.add(i + 1)
      i = bytes.indexOf(' ', i + 1)
    }
    val nWords = starts.size()
    if (nWords < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nWords - n + 1)
    var k = 0
    while (k <= nWords - n) {
      val from = starts.get(k)
      val until =
        if (k + n < nWords) starts.get(k + n) - 1 // up to the separator space
        else bytes.length
      out(k) = UTF8String.fromString(bytes.substring(from, until))
      k += 1
    }
    new GenericArrayData(out)
  }
}

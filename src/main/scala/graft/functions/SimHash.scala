package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string — a native Catalyst
  * expression (preference order (b) from SURVEY.md §4: a custom
  * `Expression` beats a Scala UDF; no whole-operator plan node is needed
  * because this is a scalar function).
  *
  * Algorithm: xxhash64 each token; for each of the 64 bit lanes add +1 if
  * the token hash has the bit set, else -1; the output bit is 1 where the
  * lane total is positive. Near-duplicate texts (similar token multisets)
  * land within small Hamming distance — pair candidates come from banding
  * the 64 bits into 16-bit chunks (see graft.ext.Similarity).
  *
  * CodegenFallback: the expression is evaluated per-row without codegen;
  * the surrounding projection still participates in whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes with CodegenFallback {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val lanes = new Array[Int](64)
    var start = 0
    val n = s.length
    while (start < n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val tok = UTF8String.fromString(s.substring(start, end))
        val h = XxHash64Function.hash(tok, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) lanes(b) += 1 else lanes(b) -= 1
          b += 1
        }
      }
      start = end + 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (lanes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Register `simhash64(str)` in the session's function registry so it is
    * usable from `expr(...)` and `spark.sql(...)`. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "builtin")
}

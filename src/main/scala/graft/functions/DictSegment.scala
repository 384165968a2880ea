package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary-based CJK segmentation: greedy forward maximum matching
  * (FMM) — the standard public algorithm behind dictionary analyzers
  * like IK (reference KeywordUtil.java:1). At each position inside a
  * Han run, take the LONGEST dictionary word starting there; fall
  * back to the single character. Non-Han runs split on whitespace and
  * pass through lowercased. Quality vs the bigram fallback
  * ([[Text.segmentKeywords]]): FMM emits real words (苹果手机壳 →
  * 苹果, 手机壳) where bigrams over-generate every adjacent pair.
  *
  * The wordlist is compiled in (a small common e-commerce vocabulary,
  * mirrored verbatim in the DuckDB oracle); a production deployment
  * would load a full dictionary per-executor the same way — a static
  * table walked per row, zero shuffle, zero driver state.
  */
object DictSegmenter {
  /** Small public wordlist; MUST stay in sync with the VALUES table
    * in the `text_segment_dict` oracle SQL (SparkEntry.oracleSql).
    */
  val words: Seq[String] = Seq(
    "苹果", "手机", "手机壳", "小米", "电视", "电视机",
    "华为", "平板", "电脑", "平板电脑", "运动", "运动鞋", "连衣裙",
    "洗衣", "洗衣机", "蓝牙", "耳机", "无线", "充电", "充电器")
  private val dict: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }
  private val maxLen: Int = words.map(_.length).max

  @inline private def isHan(c: Char): Boolean = c >= '一' && c <= '鿿'

  /** Called from generated code — must stay a static-forwardable
    * top-level object method.
    */
  def segment(u: UTF8String): ArrayData = {
    val s = u.toString.toLowerCase
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isHan(c)) {
        var l = math.min(maxLen, n - i)
        var m: String = null
        while (l >= 2 && m == null) {
          val cand = s.substring(i, i + l)
          if (dict.contains(cand)) m = cand
          l -= 1
        }
        if (m != null) { out += UTF8String.fromString(m); i += m.length }
        else { out += UTF8String.fromString(s.substring(i, i + 1)); i += 1 }
      } else if (Character.isWhitespace(c)) {
        i += 1
      } else {
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i)) && !isHan(s.charAt(i)))
          i += 1
        out += UTF8String.fromString(s.substring(start, i))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_dict_segment(text)` → array<string> of FMM segments. */
case class DictSegment(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dict_segment"

  override def checkInputDataTypes(): TypeCheckResult =
    InputChecks.expect(prettyName, 0, child, _ == StringType, "string")

  override def nullSafeEval(t: Any): Any =
    DictSegmenter.segment(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DictSegmenter.segment($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization with a LEARNED merge table ([EXT]) — the
  * real-tokenizer upgrade over the regex-only `tokensBpeish` heuristic, so
  * Packing/chunking token budgets can count actual subword tokens.
  *
  * `graft_bpe(text, merges)`: lowercases, pre-tokenizes into words with the
  * SAME regex as `TextAnalysis.tokensBpeish` (`[a-z]+|[0-9]+|[^a-z0-9\s]`),
  * then applies the merge table within each word — classic Sennrich-style
  * BPE: repeatedly merge the adjacent symbol pair with the lowest merge
  * rank until no pair is in the table. Merges never cross word boundaries,
  * so concatenating the output tokens always reconstructs the concatenated
  * word pieces (the lossless invariant `q_bpe_lossless` oracles
  * cross-engine).
  *
  * `merges` is a foldable string literal, one merge per line, the two
  * parent pieces space-separated, rank = line order — the format
  * `graft.operators.Bpe.serializeMerges` emits and `Bpe.fitMerges` learns.
  * Pieces come from whitespace-free word tokens, so the space separator is
  * unambiguous.
  *
  * Scale/codegen posture (SURVEY.md §7.3): the merge loop is inherently
  * iterative, so instead of HOF array expressions (interpreted lambdas,
  * measured 3-30× slower on comparable folds — see TextAnalysis scaladoc)
  * this is a Catalyst expression whose doGenCode emits one call into the
  * expression instance (the `addReferenceObj` pattern Spark's own
  * regexp/json expressions use), keeping the stage inside WholeStageCodegen
  * with zero per-element dispatch. The rank table parses ONCE per executor
  * (transient lazy), never per row; a bounded per-thread word→tokens memo
  * exploits the Zipfian word distribution (a 100 TB corpus re-encodes "the"
  * trillions of times — the memo makes that a hash probe).
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val textOk = left.dataType == StringType
    val mergesOk = right.foldable && right.dataType == StringType &&
      right.eval() != null
    if (textOk && mergesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, non-null string literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe"

  /** rank("a b") = merge priority; parsed once per executor from the
    * literal (the expression ships serialized inside the plan).
    */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val lines = right.eval().toString.split("\n")
    var i = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.nonEmpty) m.put(line, Integer.valueOf(m.size()))
      i += 1
    }
    m
  }

  @transient private lazy val wordPattern: Pattern =
    Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** Word→tokens memo, per thread (generated code shares the reference
    * object across an executor's tasks). Insertion stops at the cap; the
    * Zipf head stays memoized, the long tail recomputes.
    */
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap[String, Array[String]]()
    }
  private val MemoCap = 65536

  /** One word through the merge loop: start from single characters, merge
    * the lowest-rank adjacent pair (all its occurrences, left-to-right
    * non-overlapping) until no adjacent pair is in the table. Terminates:
    * every step shrinks the symbol count.
    */
  private def encodeWord(word: String): Array[String] = {
    if (word.length <= 1) return Array(word)
    val cache = memo.get()
    val hit = cache.get(word)
    if (hit != null) return hit
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      var bestPair: String = null
      while (j < syms.length - 1) {
        val pair = syms(j) + " " + syms(j + 1)
        val r = ranks.get(pair)
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestPair = pair
        }
        j += 1
      }
      if (bestPair == null) done = true
      else {
        val out = new java.util.ArrayList[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && (syms(k) + " " + syms(k + 1)) == bestPair) {
            out.add(syms(k) + syms(k + 1)); k += 2
          } else { out.add(syms(k)); k += 1 }
        }
        syms = out.toArray(new Array[String](out.size()))
      }
    }
    if (cache.size() < MemoCap) cache.put(word, syms)
    syms
  }

  /** Full text → BPE token array; called from both eval and generated code. */
  def encodeText(text: UTF8String): ArrayData = {
    // Locale.ROOT: the default-locale toLowerCase diverges from Spark's
    // locale-independent lower() under e.g. a Turkish JVM locale
    // (I -> dotless i), silently breaking fit/apply tokenizer parity
    val matcher = wordPattern.matcher(
      text.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new java.util.ArrayList[UTF8String]()
    while (matcher.find()) {
      val toks = encodeWord(matcher.group())
      var i = 0
      while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(text: Any, merges: Any): Any =
    encodeText(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, (text, _) => s"${ev.value} = $ref.encodeText($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

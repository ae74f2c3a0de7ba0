package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(tokens, n)`: the array of space-joined n-grams of a
  * token array — codegen replacement for the HOF form
  * `transform(sequence(1, size-n+1), i -> concat_ws(' ', toks[i..i+n-1]))`.
  *
  * The HOF form is quadratic in practice: higher-order lambdas evaluate
  * INTERPRETED (CodegenFallback), each position re-walks `element_at`
  * n times, and when the token expression is inlined (not an attribute)
  * every access re-tokenizes the document. Measured on the sf0.1 corpus
  * the swap in seed/shingle producers is ~20×. This kernel builds the
  * gram array in one pass over the materialized token array, stays inside
  * WholeStageCodegen via the same `addReferenceObj` pattern as
  * [[MapSumScore]], and is string-identical to the HOF output (nulls in
  * the token array are skipped by `UTF8String.concatWs`, exactly as
  * `concat_ws` does): a null array yields null, fewer than n tokens
  * yield an empty array.
  */
case class ShingleArray(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val toksOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val nOk = right.foldable && right.dataType == IntegerType &&
      (right.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (toksOk && nOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive int literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  @transient private lazy val n: Int =
    right.eval().asInstanceOf[java.lang.Integer].intValue()

  private val space = UTF8String.fromString(" ")

  def build(toksRaw: Any): ArrayData = {
    val toks = toksRaw.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val out = sz - n + 1
    if (out <= 0) return new GenericArrayData(new Array[Any](0))
    val res = new Array[Any](out)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var k = 0
      while (k < n) {
        parts(k) = if (toks.isNullAt(i + k)) null else toks.getUTF8String(i + k)
        k += 1
      }
      res(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(toks: Any, nArg: Any): Any = build(toks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleArray].getName)
    nullSafeCodeGen(ctx, ev, (toks, _) => s"${ev.value} = $ref.build($toks);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleArray =
    copy(left = newLeft, right = newRight)
}

/** `graft_cms_atleast(key, sketch, min)`: true iff a Count-Min sketch's
  * estimate for `key` reaches `min` — the candidate prefilter of the
  * heavy-hitters operator. The sketch (a `count_min_sketch(...)`
  * aggregate result, carried as a binary literal) is deserialized once
  * per executor from the plan; each probe is `depth` hash-and-read
  * operations, inside WholeStageCodegen via the [[MapSumScore]]
  * reference-object pattern.
  *
  * CMS estimates NEVER undercount, so filtering on this predicate keeps
  * a superset of the true heavy keys: downstream exact counting gives an
  * exact final answer regardless of sketch error. Probes hash the key's
  * UTF-8 bytes — the same path `count_min_sketch` takes when adding
  * string values, so fit and probe agree byte-for-byte.
  */
case class CmsAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = first.dataType == StringType
    val sketchOk = second.foldable && second.dataType == BinaryType &&
      second.eval() != null
    val minOk = third.foldable && third.dataType == LongType &&
      third.eval() != null
    if (keyOk && sketchOk && minOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, non-null binary literal, non-null " +
        s"long literal), got (${first.dataType.simpleString}, " +
        s"${second.sql}, ${third.sql})")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cms_atleast"

  @transient private lazy val sketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      second.eval().asInstanceOf[Array[Byte]])
  @transient private lazy val min: Long =
    third.eval().asInstanceOf[java.lang.Long].longValue()

  def probe(key: Any): Boolean =
    sketch.estimateCount(key.asInstanceOf[UTF8String].getBytes) >= min

  override protected def nullSafeEval(key: Any, sk: Any, m: Any): Any =
    probe(key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsAtLeast].getName)
    nullSafeCodeGen(ctx, ev, (key, _, _) => s"${ev.value} = $ref.probe($key);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CmsAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_strip_lines(text, table)`: remove corpus-boilerplate lines from a
  * document in one codegen pass — the apply kernel of
  * [[graft.operators.Boilerplate]]. `table` is a [[ScoreTable]]-serialized
  * literal whose KEYS are the trimmed boilerplate lines (values unused);
  * the kernel splits on `\n` (trailing empties kept, like Spark's `split`
  * and DuckDB's `string_split`), drops every line whose space-trimmed form
  * is a non-empty key of the set, and rejoins with `\n`. Returns
  * `struct<clean: string, dropped: int>` so the caller gets the cleaned
  * text and the per-document drop count from the same pass.
  *
  * Blank (trim-empty) lines are NEVER dropped — the empty string is
  * [[ScoreTable.DefaultKey]] and boilerplate discovery excludes it, so a
  * document's paragraph structure survives cleaning.
  *
  * The set rides the plan as one literal and is parsed once per executor
  * via the [[MapSumScore]] reference-object pattern; per-row work is one
  * split + one hash probe per line, inside WholeStageCodegen — no explode,
  * no join, no shuffle.
  */
case class StripLines(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val textOk = left.dataType == StringType
    val tableOk = right.foldable && right.dataType == StringType &&
      right.eval() != null
    if (textOk && tableOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, non-null string literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("dropped", IntegerType, nullable = false)))
  override def prettyName: String = "graft_strip_lines"

  @transient private lazy val lineSet: java.util.HashSet[String] = {
    val (m, _) = ScoreTable.parse(right.eval().asInstanceOf[UTF8String].toString)
    new java.util.HashSet[String](m.keySet())
  }

  /** Space-only trim (ASCII 0x20), matching DuckDB's `trim(s, ' ')` — NOT
    * Java's `String.trim`, which also strips control characters.
    */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  def build(textRaw: Any): org.apache.spark.sql.catalyst.InternalRow = {
    val text = textRaw.asInstanceOf[UTF8String].toString
    // limit -1: trailing empty lines survive, like split('a\n','\n')
    val lines = text.split("\n", -1)
    val kept = new java.lang.StringBuilder(text.length)
    var dropped = 0
    var first = true
    var i = 0
    while (i < lines.length) {
      val key = trimSpaces(lines(i))
      if (key.nonEmpty && lineSet.contains(key)) {
        dropped += 1
      } else {
        if (!first) kept.append('\n')
        kept.append(lines(i))
        first = false
      }
      i += 1
    }
    val clean = if (dropped == 0) textRaw.asInstanceOf[UTF8String]
      else UTF8String.fromString(kept.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](clean, dropped))
  }

  override protected def nullSafeEval(text: Any, table: Any): Any = build(text)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stripper", this, classOf[StripLines].getName)
    nullSafeCodeGen(ctx, ev, (text, _) => s"${ev.value} = $ref.build($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripLines =
    copy(left = newLeft, right = newRight)
}

/** `graft_winnow(grams, w)`: the sorted-distinct winnowing selection over
  * a gram array — per gram the hash is the FIRST 4 BYTES of its md5
  * digest as an unsigned 32-bit value (exactly `conv(substring(md5(g),
  * 1, 8), 16, 10)`, the cross-engine contract the q_winnow_* oracles
  * replay), then the minimum of each w-hash sliding window is selected
  * (one window over the whole stream when there are fewer than w grams),
  * deduplicated and sorted ascending.
  *
  * Codegen replacement for the HOF chain `array_sort(array_distinct(
  * transform(sequence, i -> array_min(slice(h, i, w)))))` over
  * `transform(grams, g -> conv(substring(md5(g),1,8),16,10))`: the HOF
  * form evaluates interpreted, paying a boxed md5+hex+parse round trip
  * per gram and a w-element array COPY per window. This kernel is one
  * pass (thread-local MessageDigest, no hex detour — the first 4 digest
  * bytes ARE the hash) plus one small sort. Null gram elements are
  * impossible from [[ShingleArray]] (containsNull = false), which is the
  * only producer in the repo; the kernel requires them absent.
  */
case class WinnowSelect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val gramsOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val wOk = right.foldable && right.dataType == IntegerType &&
      (right.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (gramsOk && wOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive int literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  @transient private lazy val w: Int =
    right.eval().asInstanceOf[java.lang.Integer].intValue()

  def build(gramsRaw: Any): ArrayData = {
    val grams = gramsRaw.asInstanceOf[ArrayData]
    val n = grams.numElements()
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    val md = WinnowSelect.digest.get()
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(grams.getUTF8String(i).getBytes)
      hashes(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val nw = n - w + 1
    val sel =
      if (nw <= 0) {
        var m = hashes(0); var j = 1
        while (j < n) { if (hashes(j) < m) m = hashes(j); j += 1 }
        Array(m)
      } else {
        val out = new Array[Long](nw)
        var s = 0
        while (s < nw) {
          var m = hashes(s); var j = s + 1
          while (j < s + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
          out(s) = m
          s += 1
        }
        out
      }
    java.util.Arrays.sort(sel)
    var uniq = 0
    var p = 0
    while (p < sel.length) {
      if (uniq == 0 || sel(p) != sel(uniq - 1)) { sel(uniq) = sel(p); uniq += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, uniq))
  }

  override protected def nullSafeEval(grams: Any, wArg: Any): Any = build(grams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", this, classOf[WinnowSelect].getName)
    nullSafeCodeGen(ctx, ev, (grams, _) => s"${ev.value} = $ref.build($grams);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowSelect =
    copy(left = newLeft, right = newRight)
}

object WinnowSelect {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** `graft_bloom_any(bloom, arr)`: true iff ANY element of the string
  * array might be in the Bloom filter (probes `xxhash64(element)`, seed
  * 42 — byte-identical to the `xxhash64(col)` values a
  * `graft_bloom_agg` fit consumed). The document-level prefilter of
  * decontamination: a corpus document with NO eval-shared shingle — the
  * overwhelming majority — is eliminated by one in-task array scan,
  * WITHOUT materializing its exploded shingle rows through
  * Generate/array_distinct/join machinery. Null or empty arrays (and a
  * null filter from an empty fit) are `false`, never null: "cannot be
  * contaminated", so the predicate composes under `filter` without
  * null-stripping surprises.
  *
  * False positives are fine by construction — survivors re-probe
  * per-shingle and exact-verify against the broadcast eval set; this
  * predicate only needs to never produce a false NEGATIVE, which the
  * Bloom contract guarantees.
  */
case class BloomAnyContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // BinaryBlob is accepted alongside foldable constants: it is a plan
    // constant in every way that matters here (eval() ignores the row),
    // but deliberately reports foldable = false so ConstantFolding cannot
    // rewrite it back into the megabyte Literal it exists to avoid
    val bloomOk = (left.foldable || left.isInstanceOf[BinaryBlob]) &&
      left.dataType == BinaryType
    val arrOk = right.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (bloomOk && arrOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (foldable binary or graft_binary_blob, " +
        s"array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_any"

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
  }

  def probe(arrRaw: Any): Boolean = {
    if (bloom == null || arrRaw == null) return false
    val arr = arrRaw.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bloom.mightContainLong(
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(arr.getUTF8String(i), 42L)))
        return true
      i += 1
    }
    false
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    probe(right.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("bloomAny", this,
      classOf[BloomAnyContain].getName)
    val rightGen = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${rightGen.code}
        final boolean ${ev.value} = $ref.probe(
          ${rightGen.isNull} ? null : ${rightGen.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomAnyContain =
    copy(left = newLeft, right = newRight)
}

/** `graft_tokens(text)`: the array of lowercased `[a-z0-9]+` runs of a
  * string — codegen replacement for
  * `regexp_extract_all(lower(text), "[a-z0-9]+", 0)`, the tokenizer on
  * every text operator's hot path (spans, winnowing, NB, BM25, LMs,
  * shingle dedup). One pass over the raw UTF-8 bytes: no lowercased
  * string copy, no regex engine, no token-array rescan.
  *
  * Exact-parity contract with the regex form (pinned by a ScalaCheck
  * spec): ASCII `A-Z` lowercase in place; the ONLY non-ASCII code points
  * whose Java/ROOT lowercase contributes `[a-z0-9]` characters are
  * U+212A KELVIN SIGN (→ `k`, run continues) and U+0130 LATIN CAPITAL I
  * WITH DOT ABOVE (→ `i` + combining U+0307, which BREAKS the run
  * immediately after the `i`); both are special-cased. Every other
  * non-ASCII sequence is a separator, exactly as its lowercase form
  * contains no ASCII alphanumerics. Invalid UTF-8 bytes act as
  * separators (the regex path sees U+FFFD there — also a separator).
  */
case class TokenizeAscii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  def tokenize(sRaw: Any): ArrayData = {
    val s = sRaw.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var buf = new Array[Byte](64)
    var len = 0
    def flush(): Unit = {
      if (len > 0) {
        out += UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
        len = 0
      }
    }
    def append(b: Byte): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = b
      len += 1
    }
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) append(b)
        else if (b >= 'A' && b <= 'Z') append((b + 32).toByte)
        else flush()
        i += 1
      } else if (b == 0xC4.toByte && i + 1 < n &&
          s.getByte(i + 1) == 0xB0.toByte) {
        append('i'.toByte); flush() // U+0130 → i + U+0307 (breaks the run)
        i += 2
      } else if (b == 0xE2.toByte && i + 2 < n &&
          s.getByte(i + 1) == 0x84.toByte &&
          s.getByte(i + 2) == 0xAA.toByte) {
        append('k'.toByte) // U+212A → k (run continues)
        i += 3
      } else {
        flush()
        // skip the UTF-8 sequence this leading byte announces — but only
        // when its continuation bytes really are 0x80..0xBF. A malformed
        // sequence (e.g. 0xC4 'a') advances ONE byte, so the following
        // ASCII alphanumeric is tokenized exactly as the decoder path
        // does (U+FFFD for the bad lead, then 'a'). Consuming too MANY
        // valid continuation bytes is harmless for parity — a byte in
        // 0x80..0xBF can never decode to an ASCII alphanumeric — so the
        // overlong/surrogate-range checks a full validator needs are
        // token-neutral here and deliberately omitted.
        val ub = b & 0xFF
        val declared = if (ub >= 0xF0) 4 else if (ub >= 0xE0) 3
                       else if (ub >= 0xC0) 2 else 1
        var ok = i + declared <= n
        var j = 1
        while (ok && j < declared) {
          val cb = s.getByte(i + j) & 0xFF
          ok = cb >= 0x80 && cb <= 0xBF
          j += 1
        }
        i += (if (ok) declared else 1)
      }
    }
    flush()
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(s: Any): Any = tokenize(s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenizer", this,
      classOf[TokenizeAscii].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.tokenize($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenizeAscii = copy(child = newChild)
}

/** `graft_minhash(shingles, k)`: the k-component xxhash64 MinHash
  * signature in ONE pass over the shingle array — codegen replacement
  * for the nested HOF form
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, s -> xxhash64(s,i))))`.
  *
  * The HOF form evaluates INTERPRETED and re-hashes every shingle's
  * BYTES k times (xxhash64(s, i) is the two-child hash chain
  * `hashInt(i, hashBytes(s, 42))`). This kernel hashes each shingle's
  * bytes ONCE (the inner `hashBytes(s, 42)` does not depend on i) and
  * derives the k components with k cheap int-mixes — bit-identical to
  * the HOF by construction, asserted by the parity spec. Empty arrays
  * yield all-Long.MaxValue components (the HOF's
  * `coalesce(array_min(...), MaxValue)`); a NULL array yields NULL here
  * — [[graft.operators.Dedup.minhashSignature]] coalesces to the
  * MaxValue array to complete the HOF parity.
  */
case class MinhashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val shOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val kOk = right.foldable && right.dataType == IntegerType &&
      (right.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (shOk && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive int literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val k: Int =
    right.eval().asInstanceOf[java.lang.Integer].intValue()

  def compute(shRaw: Any): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val arr = shRaw.asInstanceOf[ArrayData]
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // xxhash64(s, i) chains children left-to-right from seed 42: a
      // null element leaves the running hash at the seed (HashExpression
      // skips nulls), exactly reproduced here
      val h0 =
        if (arr.isNullAt(j)) 42L
        else XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(i, IntegerType, h0)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(sh: Any, kArg: Any): Any = compute(sh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhasher", this, classOf[MinhashSig].getName)
    nullSafeCodeGen(ctx, ev, (sh, _) => s"${ev.value} = $ref.compute($sh);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSig =
    copy(left = newLeft, right = newRight)
}

/** `graft_lsh_bands(sig, bands, rowsPerBand)`: the banded LSH keys of a
  * MinHash signature — codegen replacement for
  * `transform(sequence(0,bands-1), b -> xxhash64(concat_ws(",", slice(sig, b*r+1, r)), b))`.
  * Each band key hashes the comma-joined decimal rendering of its
  * signature slice (the exact string `concat_ws` builds after the
  * implicit bigint→string element cast), then mixes the band index —
  * `hashInt(b, hashBytes(joined, 42))`, bit-identical to the HOF form
  * (parity spec). NULL signatures yield NULL (callers null band keys
  * for shingle-less docs explicitly).
  */
case class LshBandKeys(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val sigOk = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def posLit(e: Expression) = e.foldable && e.dataType == IntegerType &&
      (e.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (sigOk && posLit(second) && posLit(third)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, positive int literal, " +
        s"positive int literal), got (${first.dataType.simpleString}, " +
        s"${second.sql}, ${third.sql})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  @transient private lazy val bands: Int =
    second.eval().asInstanceOf[java.lang.Integer].intValue()
  @transient private lazy val rowsPerBand: Int =
    third.eval().asInstanceOf[java.lang.Integer].intValue()

  def compute(sigRaw: Any): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val sig = sigRaw.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        // slice past the end contributes nothing (concat_ws skips what
        // slice never produced); null elements are skipped by concat_ws
        if (idx < n && !sig.isNullAt(idx)) {
          if (sb.length > 0) sb.append(',')
          sb.append(sig.getLong(idx))
        }
        r += 1
      }
      val h0 = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      out(b) = XxHash64Function.hash(b, IntegerType, h0)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(sig: Any, bandsArg: Any,
      rArg: Any): Any = compute(sig)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bander", this, classOf[LshBandKeys].getName)
    nullSafeCodeGen(ctx, ev, (sig, _, _) => s"${ev.value} = $ref.compute($sig);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LshBandKeys =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_minhash_md5(shingles, k)`: the k-component md5-permutation
  * MinHash signature (array of lowercase hex strings) in one pass —
  * codegen replacement for
  * `transform(sequence(0,k-1), i -> array_min(transform(sh, s -> md5(concat(i, ' ', s)))))`.
  *
  * The HOF form evaluates interpreted, allocating a concat + an md5 +
  * a 32-char hex string per (component, shingle); this kernel digests
  * `"i " + shingle` bytes directly, keeps the per-component minimum as
  * a 16-byte digest (unsigned byte order == lowercase-hex lexicographic
  * order, since '0'..'9' < 'a'..'f' and hex position maps to nibble),
  * and hexes only the k winners. Bit-identical to the HOF (parity
  * spec). Null elements are skipped (md5 of a null concat is NULL and
  * array_min ignores it); an empty array — or all-null elements —
  * yields all-null components; a NULL array yields NULL here, completed
  * to the all-null-component array by the operator's coalesce.
  */
case class Md5MinhashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val shOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val kOk = right.foldable && right.dataType == IntegerType &&
      (right.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (shOk && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive int literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_md5"

  @transient private lazy val k: Int =
    right.eval().asInstanceOf[java.lang.Integer].intValue()
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i ".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
  // MessageDigest is stateful and this expression object is shared
  // across task threads via addReferenceObj — one digest per thread
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(shRaw: Any): ArrayData = {
    val arr = shRaw.asInstanceOf[ArrayData]
    val mins = new Array[Array[Byte]](k)
    val md = digests.get()
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val sBytes = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(prefixes(i))
          md.update(sBytes)
          val d = md.digest()
          if (mins(i) == null ||
              java.util.Arrays.compareUnsigned(d, mins(i)) < 0) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      if (mins(i) != null) {
        val hex = new Array[Byte](32)
        val digits = "0123456789abcdef".getBytes
        var b = 0
        while (b < 16) {
          hex(2 * b) = digits((mins(i)(b) >> 4) & 0xf)
          hex(2 * b + 1) = digits(mins(i)(b) & 0xf)
          b += 1
        }
        out(i) = UTF8String.fromBytes(hex)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(sh: Any, kArg: Any): Any = compute(sh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5minhasher", this,
      classOf[Md5MinhashSig].getName)
    nullSafeCodeGen(ctx, ev, (sh, _) => s"${ev.value} = $ref.compute($sh);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5MinhashSig =
    copy(left = newLeft, right = newRight)
}

/** `graft_lsh_bands_md5(sig, bands, rowsPerBand)`: banded keys with the
  * band id baked into the md5 — codegen replacement for
  * `transform(sequence(0,bands-1), b -> md5(concat(b, '|', concat_ws(",", slice(sig, b*r+1, r)))))`.
  * Builds the exact `b|c1,c2,...` string per band (null components
  * skipped as concat_ws does), digests once, hexes once. NULL
  * signatures yield NULL (callers null band keys for shingle-less docs
  * before this runs).
  */
case class Md5BandKeys(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val sigOk = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    def posLit(e: Expression) = e.foldable && e.dataType == IntegerType &&
      (e.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (sigOk && posLit(second) && posLit(third)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive int literal, " +
        s"positive int literal), got (${first.dataType.simpleString}, " +
        s"${second.sql}, ${third.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands_md5"

  @transient private lazy val bands: Int =
    second.eval().asInstanceOf[java.lang.Integer].intValue()
  @transient private lazy val rowsPerBand: Int =
    third.eval().asInstanceOf[java.lang.Integer].intValue()
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def compute(sigRaw: Any): ArrayData = {
    val sig = sigRaw.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val md = digests.get()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 33 + 8)
    val digits = "0123456789abcdef".getBytes
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      sb.append(b).append('|')
      var first0 = true
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        if (idx < n && !sig.isNullAt(idx)) {
          if (!first0) sb.append(',')
          sb.append(sig.getUTF8String(idx).toString)
          first0 = false
        }
        r += 1
      }
      md.reset()
      md.update(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      val hex = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = digits((d(i) >> 4) & 0xf)
        hex(2 * i + 1) = digits(d(i) & 0xf)
        i += 1
      }
      out(b) = UTF8String.fromBytes(hex)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(sig: Any, bandsArg: Any,
      rArg: Any): Any = compute(sig)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5bander", this,
      classOf[Md5BandKeys].getName)
    nullSafeCodeGen(ctx, ev, (sig, _, _) => s"${ev.value} = $ref.compute($sig);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Md5BandKeys =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_pair_gen(ids)`: streaming in-bucket pair generator — emits
  * (id_a, id_b) rows for all i < j over a SORTED member-id array via a
  * LAZY iterator, never materializing the n·(n−1)/2 pair array.
  *
  * Why a Generator and not explode(pairs-array kernel): a capped LSH bucket
  * can legally hold `maxBucketSize` members (10 000 on the embedding
  * path), and the materialized expansion is then ~50M row objects —
  * gigabytes of transient allocation in one task. The generator yields
  * one reused-then-copied row at a time; downstream operators (the
  * cross-band distinct's partial hash agg) consume each row before the
  * next exists. Interpreted eval runs once per BUCKET (not per pair), so
  * CodegenFallback costs nothing measurable; the pair loop itself is two
  * long-indexed reads per row.
  */
case class PairsGenerator(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))
  override def prettyName: String = "graft_pair_gen"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Iterator.empty
    else {
      val ids = raw.asInstanceOf[ArrayData]
      val n = ids.numElements()
      if (n < 2) Iterator.empty
      else {
        // The member array arrives SORTED, so duplicate ids sit adjacent.
        // Collapse them before pairing: a duplicated id must not emit the
        // degenerate (x, x) pair the replaced self-join's id_a < id_b
        // predicate filtered — downstream nearDupPairs would score it at
        // jaccard 1.0 and drop the document as a near-dup of itself.
        var m = 1
        var k = 1
        while (k < n) {
          if (ids.getLong(k) != ids.getLong(k - 1)) m += 1
          k += 1
        }
        if (m < 2) Iterator.empty
        else {
          val vals: Int => Long =
            if (m == n) ids.getLong
            else {
              val arr = new Array[Long](m)
              arr(0) = ids.getLong(0)
              var w = 1; var r = 1
              while (r < n) {
                val v = ids.getLong(r)
                if (v != arr(w - 1)) { arr(w) = v; w += 1 }
                r += 1
              }
              arr(_)
            }
          new Iterator[InternalRow] {
            private var i = 0
            private var j = 1
            private var a = vals(0)
            override def hasNext: Boolean = i < m - 1
            override def next(): InternalRow = {
              // fresh row per pair: GenerateExec's consumer may hold a
              // reference across next() (the joined-output projection), so a
              // shared mutable buffer would corrupt emitted pairs
              val row = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(Array[Any](a, vals(j)))
              j += 1
              if (j == m) { i += 1; j = i + 1; if (i < m - 1) a = vals(i) }
              row
            }
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): PairsGenerator =
    copy(child = newChild)
}

/** Opaque binary constant for megabyte-scale plan constants (Bloom filter
  * bytes): a `lit(bytes)` Literal hashes and compares its FULL payload on
  * every plan canonicalization — and AQE canonicalizes/compares plans per
  * stage submission (exchange-reuse maps are keyed by canonicalized
  * plans), so a 1 MB Bloom literal was costing repeated full-array
  * Arrays.hashCode walks in the driver hot loop (measured on
  * q_curate_full: part of a 0.6 s plan-time gap). This leaf carries the
  * bytes OUTSIDE the Literal machinery with a once-computed content hash:
  * equality stays content-based (reuse across identical filters still
  * fires; different filters never alias) at O(1) per comparison after the
  * first, and toString renders a fingerprint, not 2M hex chars.
  *
  * Deliberately NOT foldable: ConstantFolding would rewrite a foldable
  * constant back into the Literal this exists to avoid. Consumers that
  * gate on `foldable` (BloomAnyContain) accept this class explicitly.
  */
case class BinaryBlob(bytes: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = bytes == null
  override def foldable: Boolean = false
  override def prettyName: String = "graft_binary_blob"

  @transient private lazy val contentHash: Int =
    if (bytes == null) 0 else java.util.Arrays.hashCode(bytes)

  override def hashCode(): Int = contentHash

  override def equals(other: Any): Boolean = other match {
    case b: BinaryBlob =>
      (b eq this) || ((b.bytes eq bytes) ||
        (b.hashCode == hashCode &&
          java.util.Arrays.equals(b.bytes, bytes)))
    case _ => false
  }

  override def toString: String =
    s"graft_binary_blob(len=${if (bytes == null) -1 else bytes.length}, " +
      s"xxh=$contentHash)"

  override def eval(input: InternalRow): Any = bytes

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("blob", this, classOf[BinaryBlob].getName)
    if (bytes == null)
      ev.copy(code = code"""
        byte[] ${ev.value} = null;
        boolean ${ev.isNull} = true;""")
    else
      ev.copy(code = code"""
        byte[] ${ev.value} = $ref.bytes();""",
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

object BinaryBlob {
  /** Rewrites a binary Literal into a [[BinaryBlob]] — applied by the
    * function REGISTRY builders of blob-aware kernels, so call sites keep
    * the natural `lit(bytes)` spelling while the RESOLVED plan (the one
    * AQE canonicalizes per stage) carries the blob. The unresolved tree
    * holds the Literal only through analysis — a handful of walks, not
    * the per-stage-submission hot loop.
    */
  def fromLiteral(e: Expression): Expression = e match {
    case org.apache.spark.sql.catalyst.expressions
      .Literal(b: Array[Byte], BinaryType) => BinaryBlob(b)
    case other => other
  }
}

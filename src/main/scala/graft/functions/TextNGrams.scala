package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd n-gram generators for the text-analysis family (r14
  * optimization round).
  *
  * Why Expressions and not `transform(sequence(...))`: same reason as
  * [[ShingleArray]] — higher-order builtins interpret their lambda per
  * element (ShingleArray's header records 5 s vs 0.2 s measured on
  * sf0.1), while these compile to one tight loop per row. Each kernel
  * replicates the EXACT semantics of the `transform(sequence(...))`
  * expression it replaces (tokenization rule, window arithmetic,
  * join separator, dup handling), so the declared queries' outputs are
  * bit-identical — the DuckDB oracles are untouched and stay
  * hash-green.
  *
  * Tokenization contracts (two, matching the two call-site families):
  *  - FILTERED: split on single spaces, EMPTY TOKENS DROPPED — the
  *    corpus rule (SURVEY §7.2), identical to
  *    `filter(split(text, " "), t => t =!= "")`.
  *  - RAW: split on single spaces with trailing empties KEPT,
  *    identical to Spark's `split(text, " ")` (regex split, limit -1)
  *    — llm_ngrams_bigram declared its bigrams over the raw stream.
  */
private[functions] trait TextKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} requires a string input, got $other")
    }
}

/** All code-point `n`-character windows of a text column, duplicates
  * KEPT, document order preserved — the occurrence stream for
  * char-n-gram frequency profiles (llm_char_trigrams). Matches
  * `transform(sequence(1, length(text) - (n-1)), i -> substr(text, i, n))`:
  * Spark's `length`/`substr` count Unicode code points, as does the
  * code-point array here. */
case class CharNGramList(child: Expression, n: Int)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    CharNGramList.grams(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNGramList.grams($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): CharNGramList =
    copy(child = newChild)
}

object CharNGramList {
  def grams(text: UTF8String, n: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cps.length - n + 1)
    var i = 0
    while (i <= cps.length - n) {
      out(i) = UTF8String.fromString(new String(cps, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** DISTINCT contiguous `n`-token windows (filtered tokenization),
  * joined by single spaces, sorted in UTF-8 byte order — the per-doc
  * gram SET for membership tests (llm_decontaminate). Matches
  * `transform(sequence(0, size(tok) - n), i -> concat_ws(' ', slice(tok, i + 1, n)))`
  * followed by a per-doc DISTINCT: emitting the set directly makes the
  * downstream `.distinct()` exchange unnecessary. */
case class WordNGramSet(child: Expression, n: Int)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    WordNGramSet.grams(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramSet.grams($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordNGramSet =
    copy(child = newChild)
}

object WordNGramSet {
  def grams(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(' ').filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[Any]])
  }
}

/** Consecutive `n`-token chunks (filtered tokenization, last chunk
  * partial), joined by single spaces, document order — the paragraph
  * chunking rule (llm_dedup_paragraph). Matches
  * `transform(sequence(0, (size(tok) + n - 1) div n - 1), i -> concat_ws(' ', slice(tok, i*n + 1, n)))`. */
case class WordChunkList(child: Expression, n: Int)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    WordChunkList.chunks(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordChunkList.chunks($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordChunkList =
    copy(child = newChild)
}

object WordChunkList {
  def chunks(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(' ').filter(_.nonEmpty)
    if (toks.length == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = (toks.length + n - 1) / n
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      var j = c * n
      val end = math.min(j + n, toks.length)
      while (j < end) {
        if (j > c * n) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Token pairs within distance <= maxDist (filtered tokenization) as
  * (w1, w2, dist) structs, duplicates KEPT, document order — the
  * word2vec context-window pair stream (llm_skipgram_counts at
  * maxDist = 3; plain adjacent bigram pairs at maxDist = 1 for the
  * PMI-collocation and bigram-entropy queries). Matches
  * `transform(sequence(1, n-1), i -> transform(sequence(1, least(maxDist, n-i)), d -> struct(tk[i], tk[i+d], d)))`
  * flattened. */
case class SkipGramList(child: Expression, maxDist: Int)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false),
    StructField("dist", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(t: Any): Any =
    SkipGramList.pairs(t.asInstanceOf[UTF8String], maxDist)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SkipGramList.pairs($c, $maxDist);")
  override protected def withNewChildInternal(newChild: Expression): SkipGramList =
    copy(child = newChild)
}

object SkipGramList {
  def pairs(text: UTF8String, maxDist: Int): ArrayData = {
    val toks = text.toString.split(' ').filter(_.nonEmpty)
    val n = toks.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // total pairs: sum over i of min(maxDist, n-1-i)
    var total = 0
    var i = 0
    while (i < n - 1) { total += math.min(maxDist, n - 1 - i); i += 1 }
    val out = new Array[Any](total)
    val u8 = new Array[UTF8String](n)
    i = 0
    while (i < n) { u8(i) = UTF8String.fromString(toks(i)); i += 1 }
    var k = 0
    i = 0
    while (i < n - 1) {
      var d = 1
      val dmax = math.min(maxDist, n - 1 - i)
      while (d <= dmax) {
        val row = new GenericInternalRow(3)
        row.update(0, u8(i))
        row.update(1, u8(i + d))
        row.setLong(2, d.toLong)
        out(k) = row.asInstanceOf[InternalRow]
        k += 1
        d += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Adjacent bigrams over the RAW token stream (split on single spaces,
  * empties KEPT — Spark's `split(text, " ")`), as "w1 w2" strings,
  * duplicates kept, document order — llm_ngrams_bigram declared its
  * bigram universe over the raw stream, so empty tokens mint bigrams
  * like "w1 " exactly as `concat(element_at(tok, i), ' ', element_at(tok, i+1))` does. */
case class RawBigramList(child: Expression)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    RawBigramList.bigrams(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RawBigramList.bigrams($c);")
  override protected def withNewChildInternal(newChild: Expression): RawBigramList =
    copy(child = newChild)
}

object RawBigramList {
  def bigrams(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document (bucket, tok) -> cnt pre-counts over the filtered
  * token stream, bucket = (3·pos) div len ∈ {0,1,2} (the doc-third
  * position key of the unigram ledger). One pass per row replacing
  * `size(toks)` + `posexplode(toks)` + a div projection (the old form
  * tokenized every document twice — once for size, once for the
  * generator — and exploded one row per OCCURRENCE; this emits one row
  * per distinct (bucket, tok), which the ledger's groupBy then sums —
  * counts are associative, so the ledger is bit-identical). */
case class TokenBucketCounts(child: Expression)
    extends TextKernelExpr {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("tok", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TokenBucketCounts.counts(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenBucketCounts.counts($c);")
  override protected def withNewChildInternal(newChild: Expression): TokenBucketCounts =
    copy(child = newChild)
}

object TokenBucketCounts {
  def counts(text: UTF8String): ArrayData = {
    val toks = text.toString.split(' ').filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // (bucket, tok) -> count; bucket = (3*pos) div len, pos 0-based
    val m = new java.util.HashMap[(Long, String), Long]()
    var i = 0
    while (i < n) {
      val key = ((3L * i) / n, toks(i))
      val old = m.get(key)
      m.put(key, if (old == null) 1L else old + 1L)
      i += 1
    }
    val out = new Array[Any](m.size)
    var k = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val row = new GenericInternalRow(3)
      row.setLong(0, e.getKey._1)
      row.update(1, UTF8String.fromString(e.getKey._2))
      row.setLong(2, e.getValue)
      out(k) = row.asInstanceOf[InternalRow]
      k += 1
    }
    new GenericArrayData(out)
  }
}

object TextNGrams {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** All code-point n-grams, dups kept, in order. */
  def mkCharNGrams(c: Column, n: Int): Column =
    ColumnBridge.column(CharNGramList(ColumnBridge.expr(c), n))

  /** Distinct sorted word n-grams (filtered tokens, space-joined). */
  def mkWordNGramSet(c: Column, n: Int): Column =
    ColumnBridge.column(WordNGramSet(ColumnBridge.expr(c), n))

  /** Consecutive n-token chunks (filtered tokens, space-joined). */
  def mkWordChunks(c: Column, n: Int): Column =
    ColumnBridge.column(WordChunkList(ColumnBridge.expr(c), n))

  /** (w1, w2, dist) token pairs within maxDist, dups kept, in order. */
  def mkSkipGrams(c: Column, maxDist: Int): Column =
    ColumnBridge.column(SkipGramList(ColumnBridge.expr(c), maxDist))

  /** Raw-stream adjacent bigrams ("w1 w2"), dups kept, in order. */
  def mkRawBigrams(c: Column): Column =
    ColumnBridge.column(RawBigramList(ColumnBridge.expr(c)))

  /** Per-doc (bucket, tok, cnt) pre-counts for the unigram ledger. */
  def mkTokenBucketCounts(c: Column): Column =
    ColumnBridge.column(TokenBucketCounts(ColumnBridge.expr(c)))
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) subword ENCODERS — the compiled twins of
  * [[graft.llm.WordPiece.segmentGreedy]] and
  * [[graft.llm.Unigram.segmentStruct]].
  *
  * The higher-order-function formulations evaluate interpreted per
  * candidate probe (HOF lambdas never enter whole-stage codegen), which
  * put the two tokenizer gates at the top of the bench; these expressions
  * run the same walk as one compiled pass per document over the token
  * array, with the same per-document distinct-word memo. Value parity is
  * BIT-EXACT by construction and pinned by spec A/B + the DuckDB gates:
  *  - WordPiece greedy = the LONGEST vocab hit at each position (the
  *    HOF's filter-over-lengths + array_max picks the same length);
  *    whole word → `[UNK]` on any unmatched position.
  *  - Unigram Viterbi = struct-min over (cost, np, path) candidates with
  *    the identical left-to-right cost accumulation; Spark's struct
  *    comparison (double, int, then UTF8String binary order — these
  *    paths are ASCII, where it coincides with String.compareTo) is
  *    replayed field-for-field. Unreachable word → null struct, mapped
  *    to `<unk>`/1 at the document level, exactly as before.
  *
  * Both take the token ARRAY (the [[graft.llm.Dedup.tokens]] output) so
  * the tokenization itself stays the plan's own `regexp_extract_all` —
  * the parity burden here is only the segmentation walk. Output:
  * struct(n_pieces: bigint, segmented: string).
  */
object SubwordSeg {
  val OutType: StructType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("segmented", StringType, nullable = false)))
}

final case class WordPieceSeg(child: Expression, vocab: Set[String],
                              maxPieceLen: Int) extends UnaryExpression {

  override def dataType: DataType = SubwordSeg.OutType
  override def prettyName: String = "graft_wordpiece_seg"

  @transient private lazy val jvocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  def computeRow(toks: ArrayData): InternalRow =
    WordPieceSeg.compute(toks, jvocab, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wpseg", this, classOf[WordPieceSeg].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.computeRow($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceSeg {
  /** Greedy longest-match for one word: (np, path) or null for [UNK]. */
  private def segWord(w: String, vocab: java.util.HashSet[String],
                      maxLen: Int): (Long, String) = {
    val n = w.length
    var pos = 0
    var np = 0L
    val sb = new java.lang.StringBuilder
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        val sub = w.substring(pos, pos + l)
        val key = if (pos == 0) sub else "##" + sub
        if (vocab.contains(key)) hit = l else l -= 1
      }
      if (hit < 0) return (1L, "[UNK]")
      if (np > 0) sb.append(' ')
      if (pos > 0) sb.append("##")
      sb.append(w, pos, pos + hit)
      np += 1
      pos += hit
    }
    (np, sb.toString)
  }

  def compute(toks: ArrayData, vocab: java.util.HashSet[String],
              maxLen: Int): InternalRow = {
    val n = toks.numElements()
    val memo = new java.util.HashMap[String, (Long, String)]()
    var total = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      var seg = memo.get(w)
      if (seg == null) { seg = segWord(w, vocab, maxLen); memo.put(w, seg) }
      total += seg._1
      if (i > 0) sb.append(' ')
      sb.append(seg._2)
      i += 1
    }
    new GenericInternalRow(Array[Any](total, UTF8String.fromString(sb.toString)))
  }
}

/** RAW-text (byte-fallback) subword segmentation — the lossless siblings
  * of [[WordPieceSeg]]/[[UnigramSeg]].
  *
  * The word-level encoders ride `Dedup.tokens` (`[a-z0-9]+` of lowered
  * text), so they can never represent case, punctuation or non-ASCII —
  * fine for corpus statistics, destructive for a trainable token stream.
  * The raw encoders take the RAW text column instead:
  *
  *  1. pre-tokenization = alternating `\S+` / `\s+` RUNS (their
  *     concatenation IS the text — nothing is normalized away);
  *  2. each run is segmented against the vocab exactly like the word
  *     encoders (Viterbi / greedy longest-match);
  *  3. any position no vocab piece covers takes BYTE-FALLBACK edges
  *     (the SentencePiece `--byte_fallback` recipe): the code point's
  *     UTF-8 bytes become pieces spelled `<0xAB>`, one piece per byte
  *     (surrogate pairs consumed whole, so fallback never splits a code
  *     point into lone surrogates). Every string is therefore coverable —
  *     no `<unk>`, ever.
  *
  * Output: struct(n_pieces, pieces array<string>) — an ARRAY, not the
  * word encoders' space-joined display string, because raw pieces can
  * contain whitespace. [[SubwordRaw.decode]] inverts losslessly:
  * decode(encode(text)) == text EXACTLY (the `tokenize_raw_*` gates pin
  * it corpus-wide against injected case/punct/UTF-8). Vocab pieces
  * spelled like a byte piece (`<0xAB>`) are rejected at construction —
  * the one spelling collision that could break decode. */
object SubwordRaw {
  val OutType: StructType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))

  private val Hex = "0123456789ABCDEF"
  def bytePiece(b: Byte): String = {
    val v = b & 0xff
    new java.lang.StringBuilder(6).append("<0x")
      .append(Hex.charAt(v >> 4)).append(Hex.charAt(v & 15)).append('>')
      .toString
  }
  def isBytePiece(p: String): Boolean =
    p.length == 6 && p.startsWith("<0x") && p.charAt(5) == '>' &&
      Hex.indexOf(p.charAt(3)) >= 0 && Hex.indexOf(p.charAt(4)) >= 0

  def requireNoBytePieceSpelling(vocab: Iterable[String]): Unit =
    vocab.find(isBytePiece).foreach(p => throw new IllegalArgumentException(
      s"vocab piece '$p' is spelled like a byte-fallback piece — decode " +
        "could not distinguish them; rename or drop it"))

  /** Alternating \S+/\s+ runs; concat(runs) == s by construction. */
  def runs(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      val ws = Character.isWhitespace(s.charAt(i))
      var j = i + 1
      while (j < n && Character.isWhitespace(s.charAt(j)) == ws) j += 1
      out += s.substring(i, j)
      i = j
    }
    out.toArray
  }

  /** The code point ending at code-unit index i (1-based end): start
    * index i-2 for a surrogate pair, else i-1. */
  def cpStart(w: String, i: Int): Int =
    if (i >= 2 && Character.isLowSurrogate(w.charAt(i - 1)) &&
      Character.isHighSurrogate(w.charAt(i - 2))) i - 2 else i - 1

  /** Lossless inverse: concatenate pieces, decoding maximal runs of
    * byte pieces as UTF-8. Column wrapper for [[SubwordDecode]]. */
  def decode(pieces: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftExpr.column(
      SubwordDecode(org.apache.spark.sql.GraftExpr.expression(pieces)))
}

final case class UnigramSegRaw(child: Expression, pieces: Map[String, Double],
                               maxPieceLen: Int, byteCost: Double)
    extends UnaryExpression {
  SubwordRaw.requireNoBytePieceSpelling(pieces.keys)

  override def dataType: DataType = SubwordRaw.OutType
  override def prettyName: String = "graft_unigram_seg_raw"

  @transient private lazy val jpieces: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }
  @transient private lazy val lens: Array[Int] =
    pieces.keys.map(_.length).filter(l => l >= 1 && l <= maxPieceLen)
      .toArray.distinct.sorted

  def computeRow(text: UTF8String): InternalRow =
    UnigramSegRaw.compute(text.toString, jpieces, lens, byteCost)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("usegr", this, classOf[UnigramSegRaw].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.computeRow($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegRaw {
  private final class State(val cost: Double, val np: Int,
                            val pieces: List[String]) // reversed

  /** Viterbi with byte-fallback edges. Tie law: (cost — primitive ==, so
    * -0.0 == 0.0 like Spark SQL — then piece count, then the reversed
    * piece list compared front-to-back lexicographically); any total
    * deterministic order works here — raw mode has no HOF/oracle twin to
    * agree with, only determinism and the round-trip law to keep. */
  private def segRun(w: String, costs: java.util.HashMap[String, java.lang.Double],
                     lens: Array[Int], byteCost: Double): State = {
    val n = w.length
    val st = new Array[State](n + 1)
    st(0) = new State(0.0, 0, Nil)
    var i = 1
    while (i <= n) {
      var best: State = null
      def consider(j: Int, c: Double, addNp: Int, ps: List[String]): Unit = {
        if (st(j) != null) {
          val cc = st(j).cost + c
          val cn = st(j).np + addNp
          val better =
            if (best == null) true
            else {
              val cmp = if (cc == best.cost) 0
                        else java.lang.Double.compare(cc, best.cost)
              cmp < 0 || (cmp == 0 && (cn < best.np ||
                (cn == best.np && lexLt(ps reverse_::: st(j).pieces, best.pieces))))
            }
          if (better) best = new State(cc, cn, ps reverse_::: st(j).pieces)
        }
      }
      var li = 0
      while (li < lens.length) {
        val l = lens(li)
        if (l <= i) {
          val c = costs.get(w.substring(i - l, i))
          if (c != null) consider(i - l, c.doubleValue(), 1,
            List(w.substring(i - l, i)))
        }
        li += 1
      }
      // byte-fallback edge: one code point, one piece per UTF-8 byte
      val j = SubwordRaw.cpStart(w, i)
      val bytes = w.substring(j, i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      consider(j, byteCost * bytes.length, bytes.length,
        bytes.toList.map(SubwordRaw.bytePiece))
      st(i) = best
      i += 1
    }
    st(n)
  }

  private def lexLt(a: List[String], b: List[String]): Boolean = {
    var x = a; var y = b
    while (x.nonEmpty && y.nonEmpty) {
      val c = x.head.compareTo(y.head)
      if (c != 0) return c < 0
      x = x.tail; y = y.tail
    }
    x.isEmpty && y.nonEmpty
  }

  def compute(text: String, costs: java.util.HashMap[String, java.lang.Double],
              lens: Array[Int], byteCost: Double): InternalRow = {
    val memo = new java.util.HashMap[String, State]()
    var total = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    SubwordRaw.runs(text).foreach { w =>
      var s = memo.get(w)
      if (s == null) { s = segRun(w, costs, lens, byteCost); memo.put(w, s) }
      total += s.np
      s.pieces.reverse.foreach(p => out += UTF8String.fromString(p))
    }
    new GenericInternalRow(Array[Any](total,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)))
  }
}

final case class WordPieceSegRaw(child: Expression, vocab: Set[String],
                                 maxPieceLen: Int) extends UnaryExpression {
  SubwordRaw.requireNoBytePieceSpelling(vocab)

  override def dataType: DataType = SubwordRaw.OutType
  override def prettyName: String = "graft_wordpiece_seg_raw"

  @transient private lazy val jvocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  def computeRow(text: UTF8String): InternalRow =
    WordPieceSegRaw.compute(text.toString, jvocab, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wpsegr", this, classOf[WordPieceSegRaw].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.computeRow($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceSegRaw {
  /** Greedy longest-match (MaxMatch) with byte fallback. No `##`
    * continuation marking — it is a display convention that a byte-exact
    * decode cannot tolerate (a raw piece may itself start with `##`). */
  private def segRun(w: String, vocab: java.util.HashSet[String],
                     maxLen: Int,
                     out: scala.collection.mutable.ArrayBuffer[UTF8String]): Long = {
    val n = w.length
    var pos = 0
    var np = 0L
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (vocab.contains(w.substring(pos, pos + l))) hit = l else l -= 1
      }
      if (hit > 0) {
        out += UTF8String.fromString(w.substring(pos, pos + hit))
        np += 1
        pos += hit
      } else {
        // consume one code point as byte pieces (surrogate-pair aware)
        val end = if (pos + 1 < n && Character.isHighSurrogate(w.charAt(pos)) &&
          Character.isLowSurrogate(w.charAt(pos + 1))) pos + 2 else pos + 1
        val bytes = w.substring(pos, end)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bytes.foreach(b => out += UTF8String.fromString(SubwordRaw.bytePiece(b)))
        np += bytes.length
        pos = end
      }
    }
    np
  }

  def compute(text: String, vocab: java.util.HashSet[String],
              maxLen: Int): InternalRow = {
    var total = 0L
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    SubwordRaw.runs(text).foreach(w => total += segRun(w, vocab, maxLen, out))
    new GenericInternalRow(Array[Any](total,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)))
  }
}

/** Lossless decode of a raw-piece array: concatenate pieces, turning each
  * MAXIMAL run of byte pieces back into its UTF-8 string. Inverse of both
  * raw encoders by construction. */
final case class SubwordDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_subword_decode"

  def computeRow(arr: ArrayData): UTF8String = SubwordDecode.compute(arr)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("swdec", this, classOf[SubwordDecode].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.computeRow($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordDecode {
  def compute(arr: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    val buf = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (buf.size() > 0) {
      sb.append(new String(buf.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      buf.reset()
    }
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val p = arr.getUTF8String(i).toString
      if (SubwordRaw.isBytePiece(p)) {
        val hi = "0123456789ABCDEF".indexOf(p.charAt(3))
        val lo = "0123456789ABCDEF".indexOf(p.charAt(4))
        buf.write((hi << 4) | lo)
      } else { flush(); sb.append(p) }
      i += 1
    }
    flush()
    UTF8String.fromString(sb.toString)
  }
}

final case class UnigramSeg(child: Expression, pieces: Map[String, Double],
                            maxPieceLen: Int) extends UnaryExpression {

  override def dataType: DataType = SubwordSeg.OutType
  override def prettyName: String = "graft_unigram_seg"

  @transient private lazy val jpieces: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }
  // distinct piece lengths, ascending — the candidate SET per position is
  // exactly the HOF's (filter over the same length list)
  @transient private lazy val lens: Array[Int] =
    pieces.keys.map(_.length).filter(l => l >= 1 && l <= maxPieceLen)
      .toArray.distinct.sorted

  def computeRow(toks: ArrayData): InternalRow =
    UnigramSeg.compute(toks, jpieces, lens)

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("useg", this, classOf[UnigramSeg].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.computeRow($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSeg {
  /** Viterbi best segmentation for one word: (np, path) or null when no
    * segmentation covers it. Tie law = Spark struct-min on
    * (cost: double, np: int, path: string) — cost strictly first, then
    * piece count, then the path string (ASCII ⇒ String.compareTo ==
    * UTF8String binary order). */
  private def segWord(w: String, costs: java.util.HashMap[String, java.lang.Double],
                      lens: Array[Int]): (Long, String) = {
    val n = w.length
    val cost = new Array[Double](n + 1)
    val np = new Array[Int](n + 1)
    val path = new Array[String](n + 1)
    val ok = new Array[Boolean](n + 1)
    ok(0) = true; path(0) = ""
    var i = 1
    while (i <= n) {
      var bc = 0.0; var bn = 0; var bp: String = null
      var li = 0
      while (li < lens.length) {
        val l = lens(li)
        if (l <= i) {
          val j = i - l
          if (ok(j)) {
            val c = costs.get(w.substring(j, i))
            if (c != null) {
              val cc = cost(j) + c.doubleValue()
              val cn = np(j) + 1
              val cp = if (np(j) == 0) w.substring(j, i)
                       else path(j) + " " + w.substring(j, i)
              // Primitive == first: Spark SQL's double ordering
              // (SQLOrderingUtil, SPARK-26021) treats -0.0 == 0.0, so a
              // signed-zero cost pair is a TIE for the HOF's struct-min —
              // java.lang.Double.compare alone would order -0.0 below 0.0
              // and pick a different equal-cost segmentation. NaN never
              // reaches here (costs are finite -log probs by construction).
              val cmp = if (bp == null) -1
                        else if (cc == bc) 0
                        else java.lang.Double.compare(cc, bc)
              val better = cmp < 0 ||
                (cmp == 0 && (cn < bn || (cn == bn && cp.compareTo(bp) < 0)))
              if (better) { bc = cc; bn = cn; bp = cp }
            }
          }
        }
        li += 1
      }
      if (bp != null) { ok(i) = true; cost(i) = bc; np(i) = bn; path(i) = bp }
      i += 1
    }
    if (ok(n)) (np(n).toLong, path(n)) else null
  }

  def compute(toks: ArrayData, costs: java.util.HashMap[String, java.lang.Double],
              lens: Array[Int]): InternalRow = {
    val n = toks.numElements()
    val memo = new java.util.HashMap[String, (Long, String)]()
    var total = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i).toString
      var seg = memo.get(w)
      if (seg == null) {
        seg = segWord(w, costs, lens)
        if (seg == null) seg = (1L, "<unk>")
        memo.put(w, seg)
      }
      total += seg._1
      if (i > 0) sb.append(' ')
      sb.append(seg._2)
      i += 1
    }
    new GenericInternalRow(Array[Any](total, UTF8String.fromString(sb.toString)))
  }
}

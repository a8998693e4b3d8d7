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

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** First-fit-decreasing bin packing over one bucket's documents as a
  * native expression — the in-row walk under
  * [[graft.llm.Curation.packBinsFFD]].
  *
  * Input: array<struct<doc_id: long, tok: long>> (one doc_id-range
  * bucket's members, any order). The walk: sort by (tok DESC, doc_id
  * ASC) — the FFD rule plus a total tiebreak — then place each doc in
  * the LOWEST-indexed bin whose remaining capacity fits it, opening a
  * new bin when none does. A doc larger than `binSize` gets a dedicated
  * new bin (documents are never split — the whole point of FFD packing
  * over GPT-style concatenate-then-chunk); zero-token docs fit wherever
  * free ≥ 0 first holds, like any other size.
  *
  * Output: struct(n_bins, placements: array<struct<doc_id, tok, bin,
  * off>>) with `bin` the 1-based LOCAL bin index and `off` the bin load
  * before placement — the caller turns local bins global with a
  * per-bucket base.
  *
  * First-fit is found with a segment tree over per-bin free space
  * (leftmost leaf with free ≥ tok via max-descent): O(n log n) per
  * bucket, not the naive O(n · bins) scan that degenerates quadratically
  * on small-doc corpora. Non-existent bins are modeled as pre-existing
  * empty slots (free = binSize) — first fit lands on the first of them
  * exactly when no real bin fits, which IS "open a new bin". Memory is
  * O(bucket) — the same bound the collect_list input already set. */
final case class FfdPack(child: Expression, binSize: Long)
    extends UnaryExpression {

  require(binSize >= 1, s"binSize must be >= 1, got $binSize")

  override def dataType: DataType = FfdPack.OutType
  override def prettyName: String = "graft_ffd_pack"

  override def nullSafeEval(input: Any): Any =
    FfdPack.compute(input.asInstanceOf[ArrayData], binSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.FfdPack$$.MODULE$$.compute($s, ${binSize}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FfdPack {
  val PlacementType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tok", LongType, nullable = false),
    StructField("bin", LongType, nullable = false),
    StructField("off", LongType, nullable = false)))
  val OutType: StructType = StructType(Seq(
    StructField("n_bins", LongType, nullable = false),
    StructField("placements", ArrayType(PlacementType, containsNull = false),
      nullable = false)))

  def compute(docs: ArrayData, binSize: Long): InternalRow = {
    val n = docs.numElements()
    val ids = new Array[Long](n)
    val toks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = docs.getStruct(i, 2)
      ids(i) = r.getLong(0)
      toks(i) = r.getLong(1)
      i += 1
    }
    // FFD order: tok desc, doc_id asc
    val order = Array.range(0, n).sortWith { (a, b) =>
      if (toks(a) != toks(b)) toks(a) > toks(b) else ids(a) < ids(b)
    }
    // segment tree of max free space over `cap` slots, all starting at
    // binSize (virtual empty bins)
    var cap = 1
    while (cap < math.max(n, 1)) cap <<= 1
    val tree = Array.fill(2 * cap)(binSize)
    def place(slot: Int, free: Long): Unit = {
      var p = slot + cap
      tree(p) = free
      p >>= 1
      while (p >= 1) { tree(p) = math.max(tree(2 * p), tree(2 * p + 1)); p >>= 1 }
    }
    // leftmost slot with free >= want, −1 if none
    def firstFit(want: Long): Int =
      if (tree(1) < want) -1
      else {
        var p = 1
        while (p < cap) p = if (tree(2 * p) >= want) 2 * p else 2 * p + 1
        p - cap
      }
    var nBins = 0L
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val d = order(k)
      val t = toks(d)
      val slot = firstFit(t) match {
        case -1 => // oversize doc: dedicated new bin
          val s = nBins.toInt
          place(s, binSize - t)
          nBins += 1
          (s, 0L)
        case s =>
          val off = binSize - tree(s + cap)
          place(s, tree(s + cap) - t)
          if (s >= nBins) nBins = s + 1L
          (s, off)
      }
      out(k) = InternalRow(ids(d), t, slot._1 + 1L, slot._2)
      k += 1
    }
    InternalRow(nBins, new GenericArrayData(out))
  }
}

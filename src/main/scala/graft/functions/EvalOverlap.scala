package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The eval-suite shingle set of [[graft.ops.Decontam]], frozen at plan
  * time: the distinct `(shingle_hash, eval_doc)` pairs of the benchmark
  * set as three flat primitive arrays — `hashes` sorted ascending for
  * binary search, and for `hashes(i)` the dense eval-doc indices
  * `idsFlat(idOffsets(i) until idOffsets(i+1))`. Eval doc ids are
  * remapped to dense ints at build time (only their DISTINCT COUNT per
  * corpus doc is ever needed), so the model costs ~12 bytes per
  * distinct pair regardless of the id column's type. Eval docs with a
  * NULL id contribute their hashes (they can still hit) but no id —
  * mirroring `count(DISTINCT eval_id)`, which skips nulls.
  *
  * Size stance: the eval side is a benchmark suite (thousands of docs,
  * not billions — the [[graft.ops.Decontam]] contract), so the model is
  * a few MB. It is never larger than the broadcast HashedRelation the
  * pre-round-20 join plan shipped to every executor for the same pairs.
  */
final class EvalShingleModel(
    val hashes: Array[Long],
    val idOffsets: Array[Int],
    val idsFlat: Array[Int]
) extends Serializable {
  require(idOffsets.length == hashes.length + 1,
    s"offsets ${idOffsets.length} != hashes ${hashes.length} + 1")
}

object EvalShingleModel {
  /** Build from the collected distinct `(h, eval_id)` pairs. */
  def fromPairs(pairs: Array[(Long, Any)]): EvalShingleModel = {
    val idIndex = new java.util.HashMap[Any, Integer]()
    pairs.foreach { case (_, id) =>
      if (id != null && !idIndex.containsKey(id)) idIndex.put(id, idIndex.size)
    }
    val byHash = pairs.groupBy(_._1)
    val hashes = byHash.keysIterator.toArray
    java.util.Arrays.sort(hashes)
    val idOffsets = new Array[Int](hashes.length + 1)
    val idsBuf = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < hashes.length) {
      byHash(hashes(i)).foreach { case (_, id) =>
        if (id != null) idsBuf += idIndex.get(id).intValue()
      }
      idOffsets(i + 1) = idsBuf.length
      i += 1
    }
    new EvalShingleModel(hashes, idOffsets, idsBuf.toArray)
  }
}

/** Native codegen decontamination counts: given a document's
  * shingle-hash array (see [[TextHash.shingleHashes]]) and a plan-time
  * [[EvalShingleModel]], returns `(n_hits << 32) | n_eval_docs` where
  * `n_hits` is the count of DISTINCT document shingle hashes present
  * in the eval set and `n_eval_docs` the count of DISTINCT eval docs
  * owning any of those hashes — exactly the two `count(DISTINCT …)`
  * aggregates of the pre-round-20 broadcast-join formulation, computed
  * in one row-local pass with no explode, no join and no exchange.
  * Both counts are bounded by the eval pair count, which is far below
  * 2^31, so the packing is lossless. A NULL shingle array (null text)
  * yields NULL (the caller coalesces to zero, like the old left join).
  */
case class EvalOverlapCounts(child: Expression, model: EvalShingleModel)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_eval_overlap_counts"

  override def nullSafeEval(a: Any): Any =
    EvalOverlapCounts.compute(a.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("evalModel", model, classOf[EvalShingleModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.EvalOverlapCounts.compute($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EvalOverlapCounts {

  /** Packed overlap counts — called from generated code, must stay
    * public. Fast path: a document with zero matched shingles (the
    * overwhelming majority of a clean corpus) allocates nothing.
    */
  def compute(shingles: ArrayData, model: EvalShingleModel): Long = {
    val hashes = model.hashes
    val n = shingles.numElements()
    var matched: Array[Int] = null
    var nMatched = 0
    var i = 0
    while (i < n) {
      val idx = java.util.Arrays.binarySearch(hashes, shingles.getLong(i))
      if (idx >= 0) {
        if (matched == null) matched = new Array[Int](8)
        else if (nMatched == matched.length)
          matched = java.util.Arrays.copyOf(matched, matched.length * 2)
        matched(nMatched) = idx
        nMatched += 1
      }
      i += 1
    }
    if (nMatched == 0) return 0L
    // dedup matched eval-hash indices (a doc can repeat a shingle);
    // then union the per-hash eval-doc slices
    java.util.Arrays.sort(matched, 0, nMatched)
    val idSet = new java.util.HashSet[Integer]()
    var nHits = 0L
    var prev = -1
    i = 0
    while (i < nMatched) {
      val idx = matched(i)
      if (idx != prev) {
        nHits += 1
        var j = model.idOffsets(idx)
        val end = model.idOffsets(idx + 1)
        while (j < end) {
          idSet.add(Integer.valueOf(model.idsFlat(j)))
          j += 1
        }
        prev = idx
      }
      i += 1
    }
    (nHits << 32) | idSet.size().toLong
  }

  /** Packed `(n_hits, n_eval_docs)` of a shingle-hash array column
    * against the plan-time eval model (codegen).
    */
  def counts(shingleHashes: Column, model: EvalShingleModel): Column =
    Bridge.column(EvalOverlapCounts(Bridge.expression(shingleHashes), model))
}

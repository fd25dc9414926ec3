package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bounded-state distinct-count sketching: KMV (bottom-k) sketches over
  * a portable 60-bit md5 item hash.
  *
  * The 100 TB story: exact `COUNT(DISTINCT item)` must shuffle every
  * distinct item to its group's reducer — at corpus scale that is a
  * vocabulary-sized exchange per group. A KMV sketch caps per-group
  * state at the k smallest item hashes: the partial aggregate combines
  * map-side, so the shuffle carries at most k longs per (partition,
  * group), and sketches merge associatively (set-union + trim), so
  * per-shard sketches roll up to corpus sketches without touching raw
  * data again. Estimator: with U_(k) the k-th smallest of n distinct
  * uniform 60-bit hashes, E[U_(k)/2^60] = k/(n+1), so
  * `est = (k-1) * 2^60 / U_(k)` is the standard unbiased KMV estimate
  * (relative error ~ 1/sqrt(k-2)); below k distinct items the sketch
  * holds every hash and the count is exact.
  *
  * Unlike FP partial sums, the sketch is a SET — merge order cannot be
  * observed — so the result is partition-invariant and fully
  * DuckDB-replayable: the oracle sorts the same md5 prefixes and keeps
  * the first k per group (lexicographic hex order IS numeric order at
  * fixed width). Pinned by SketchSpec (partition invariance, merge law,
  * below-k exactness) and the `p_sketch_*` contract queries.
  *
  * Reference scope: the reference SDK has no sketching surface
  * (`python-sdk/src/astro/sql/operators` stops at exact SQL
  * aggregation); this is part of the beyond-reference scale family.
  */
object Sketch {

  /** Portable 60-bit item hash: the first 15 hex digits of md5 as a
    * non-negative long. 60 bits keeps the value inside both engines'
    * exact BIGINT range and converts to double with one well-defined
    * rounding, and md5 makes the k-min set replayable anywhere. */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** KMV aggregate over pre-hashed longs (see [[kmvHash]]): the sorted
    * array of the group's k smallest distinct hashes. */
  def kmv(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  }

  /** 2^60 — exactly representable; the hash-domain width. */
  val TwoPow60: Double = 1152921504606846976.0d

  /** Distinct-count estimate from a sorted k-min array: exact size when
    * the sketch never filled, else `(k-1)·2^60 / U_(k)`. The arithmetic
    * is one exact product (k-1 has ≤ 53 significant bits, 2^60 is a
    * power of two) and one correctly-rounded division, so DuckDB
    * replays the double bit-for-bit.
    *
    * Total on every input, ANSI mode included: a NULL sketch yields
    * NULL (never the legacy size(NULL) = −1 masquerading as an
    * estimate), an under-filled or empty sketch yields its exact size,
    * and the k-th element is read with the non-throwing 0-indexed
    * `get` so no branch can raise an out-of-bounds error. */
  def kmvEstimate(kmins: Column, k: Int): Column =
    when(kmins.isNull, lit(null).cast("double"))
      .when(size(kmins) < k, size(kmins).cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(TwoPow60) /
          get(kmins, lit(k - 1)).cast("double"))

  /** Union k-min set of two sketches with the same k: k smallest of the
    * merged sets — exactly the sketch of the concatenated inputs (the
    * KMV merge law, pinned by SketchSpec). */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  // ---------------------------------------------------------------------
  // Bottom-k-by-hash QUANTILE sketch: the same [[KmvAgg]] machinery turned
  // into a bounded-state quantile estimator. Pack (36-bit md5 hash of the
  // item's IDENTITY, 24-bit clamped VALUE) into one long — the k-min SET
  // over packed longs is then a deterministic, order-free, duplicate-safe
  // bottom-k sample keyed by hash with the value riding in the low bits.
  // Merge stays set-union + trim (partition-invariant, map-side
  // combinable, O(k) state per group), and because every stage is integer
  // arithmetic over md5 prefixes, DuckDB replays the sample AND the
  // quantiles cell-exactly. Below k items per group, the sample is the
  // whole group → quantiles are EXACT (the KMV below-k law carried over).
  //
  // 100 TB shape: exact per-group quantiles need a full sort or an exact
  // histogram of the value domain; this carries ≤ k longs per
  // (partition, group) through the shuffle no matter the corpus size —
  // the standard bottom-k-sampling estimator (relative rank error
  // ~ 1/sqrt(k)). exactIntQuantiles remains the tool for small bounded
  // value domains; this is the unbounded-domain path.
  // ---------------------------------------------------------------------

  /** Low-bits value domain of a packed quantile-sketch item: 2^24. */
  val QuantileValueDomain: Long = 1L << 24

  /** Pack an item for the quantile sketch: 36-bit hash of `id` (first 9
    * hex digits of md5) in the high bits, `value` clamped to
    * [0, 2^24) in the low bits — 60 bits total, exact in a BIGINT and in
    * a double-free DuckDB replay. `id` must identify the item (so the
    * sample is uniform over items); clamping bounds are part of the
    * declared contract (token counts / scores at 2^24 ≈ 16.7M are
    * saturated, which for a p90-style statistic is indistinguishable). */
  def kmvQuantilePack(id: Column, value: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 9), 16, 10).cast("long") *
      lit(QuantileValueDomain) +
      least(greatest(value.cast("long"), lit(0L)), lit(QuantileValueDomain - 1))

  /** The sorted sample VALUES back out of a packed k-min sketch. */
  def kmvSampleValues(kmins: Column): Column =
    array_sort(transform(kmins, x => x % QuantileValueDomain))

  /** `pct`-th percentile (0..100) of a sorted sample: the nearest-lower
    * rank `1 + floor(pct·(m−1)/100)`. The rank arithmetic is exact in
    * doubles (pct·(m−1) ≤ 100k ≪ 2^53 and true integer quotients are
    * representable, so floor cannot straddle a boundary) and replays as
    * DuckDB integer `//`. NULL on an empty sample — the estimator is
    * total. */
  def kmvQuantileAt(sortedVals: Column, pct: Int): Column = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    when(size(sortedVals) > 0,
      element_at(sortedVals,
        (lit(1) + floor(lit(pct) * (size(sortedVals) - 1) / lit(100.0))).cast("int")))
  }
}

/** Typed partial aggregate holding a group's k smallest distinct long
  * hashes (buffer = a capped TreeSet): `update` inserts when the value
  * beats the current k-th min, `merge` is set-union + trim. State is
  * O(k) per group regardless of input size, combines map-side, and is
  * insertion-order-free, so results are partition-invariant. */
case class KmvAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv expects bigint (use Sketch.kmvHash), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buffer.size < k) { buffer.add(v); () }
    else if (v < buffer.last) { if (buffer.add(v)) { buffer.pollLast(); () } }

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]) =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv"
}

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
    * rounding, and md5 makes the k-min set replayable anywhere.
    *
    * Fused ([[Md5PrefixExpr]], round 12): one digest → long per row,
    * bit-identical to the former `conv(substring(md5(c),1,15),16,10)`
    * column form (the 15-nibble value IS the top 60 bits of the
    * digest) but without materializing the 32-char hex string,
    * substringing it, and re-parsing — the md5-replay machinery under
    * every sketch/portable-twin row, so the alloc chain was suite-wide
    * hot. Equality pinned in SketchSpec. */
  def kmvHash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      Md5PrefixExpr(ColumnBridge.expression(c.cast("string")), 15))
  }

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
  def kmvQuantilePack(id: Column, value: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // fused 9-nibble digest ([[Md5PrefixExpr]]) — bit-identical to the
    // former conv(substring(md5(id),1,9),16,10) column form
    ColumnBridge.column(
      Md5PrefixExpr(ColumnBridge.expression(id.cast("string")), 9)) *
      lit(QuantileValueDomain) +
      least(greatest(value.cast("long"), lit(0L)), lit(QuantileValueDomain - 1))
  }

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

  // ---------------------------------------------------------------------
  // HyperLogLog — the fixed-size register sibling of KMV. Where a KMV
  // sketch carries k longs per group, HLL carries m = 2^p BYTE registers
  // (p = 8 → 256 bytes/group at ~6.5% relative error, vs k = 64 longs for
  // ~12.7%), merge is elementwise max (order-free, map-side combinable),
  // and union across shards never loses precision — the register array IS
  // the union state. The estimator is made PORTABLE by construction:
  //  * per-item (bucket, rho) derive from the same 60-bit md5 prefix as
  //    [[kmvHash]] — bucket = top p bits, rho = run of leading zeros in
  //    the remaining W = 60−p bits, plus one;
  //  * the harmonic term Σ 2^(−M_j) is carried as the EXACT integer
  //    Σ 2^(W+1−M_j) (M_j ≤ W+1, so each term ≥ 1; the total is at most
  //    m·2^(W+1) = 2^61 < 2^63) — an order-free integer sum any engine
  //    reproduces bit-for-bit;
  //  * the raw estimate is then ONE double division of two exact values
  //    (the numerator α·m²·2^(W+1) is a Scala-computed literal embedded
  //    in both plans), and the small-range correction m·ln(m/V) comes
  //    from a LITERAL lookup table over the m possible values of V — no
  //    transcendental is evaluated at query time on either engine, so
  //    the corrected estimate hash-matches exactly.
  // Large-range correction is a 32-bit-hash artifact (collisions near
  // 2^32) and does not apply to a 60-bit hash domain at any realistic
  // cardinality; documented out of scope.
  // ---------------------------------------------------------------------

  /** HLL register array (length 2^p, values 0..61−p) over pre-hashed
    * longs (see [[kmvHash]]). */
  def hll(hashed: Column, p: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(hashed), p).toAggregateExpression())
  }

  /** Exact integer harmonic state: Σ_j 2^(W+1 − M_j) over all m
    * registers (empty registers contribute 2^(W+1)). Fits a long for
    * every p ≥ 4; replays as the identical integer sum anywhere. */
  def hllSumInvScaled(regs: Column, p: Int): Column = {
    val s = 61 - p // W + 1
    val pow2 = typedLit(Array.tabulate(s + 1)(i => 1L << i))
    aggregate(regs, lit(0L),
      (acc, r) => acc + element_at(pow2, lit(s + 1) - r))
  }

  /** Number of still-zero registers — the V of the small-range
    * correction; also a useful fill diagnostic. */
  def hllZeroRegs(regs: Column): Column =
    size(filter(regs, r => r === 0))

  /** Union of two register arrays with the same p: elementwise max —
    * exactly the sketch of the concatenated inputs (max is idempotent,
    * so overlap between the inputs is free). */
  def hllUnion(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  /** α_m of the standard HLL estimator (Flajolet et al. 2007). */
  def hllAlpha(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The literal m·ln(m/V) correction table, index V = 1..m. Both the
    * Spark plan and the generated oracle SQL embed these exact doubles
    * (Double.toString round-trips), so the branch is transcendental-free
    * at query time. */
  def hllCorrectionTable(p: Int): Array[Double] = {
    val m = 1 << p
    Array.tabulate(m)(i => m * math.log(m.toDouble / (i + 1)))
  }

  /** Cardinality estimate from a register array: raw harmonic estimate
    * with the small-range linear-counting correction. Every arithmetic
    * step is a literal, an exact integer, or one correctly-rounded
    * double op, so an external replay hash-matches. In-suite use only:
    * round-11 driver boards showed the double path sits at the oracle
    * engine's version-portability cliff (literal parse / fetch
    * conversion drift); contract rows ship [[hllEstimateMicro]]. */
  def hllEstimate(regs: Column, p: Int): Column = {
    val m = 1 << p
    val numer = hllAlpha(p) * m.toDouble * m.toDouble * Math.pow(2.0, 61 - p)
    val corr = typedLit(hllCorrectionTable(p))
    val raw = lit(numer) / hllSumInvScaled(regs, p).cast("double")
    val v = hllZeroRegs(regs)
    when(raw <= lit(2.5 * m) && v > 0, element_at(corr, v)).otherwise(raw)
  }

  /** Micro-units per distinct item of the integer estimate surface. */
  val HllEstScale = 1000000L

  /** Exact integer numerator of the micro-unit raw estimate:
    * floor(α·m²·2^(W+1)·10^6). α's BINARY double value expands exactly
    * in decimal (java BigDecimal(double) is exact), so this ~27-digit
    * integer is one deterministic literal both the Spark plan and the
    * generated oracle SQL embed verbatim. */
  def hllNumerMicro(p: Int): java.math.BigDecimal = {
    val m = (1 << p).toLong
    new java.math.BigDecimal(hllAlpha(p))
      .multiply(new java.math.BigDecimal(m * m))
      .multiply(new java.math.BigDecimal(
        java.math.BigInteger.ONE.shiftLeft(61 - p)))
      .multiply(new java.math.BigDecimal(HllEstScale))
      .setScale(0, java.math.RoundingMode.FLOOR)
  }

  /** The m·ln(m/V) small-range correction table in integer micro-units
    * (floor), index V = 1..m — BIGINT literals, so neither engine parses
    * a double or evaluates a transcendental at query time. */
  def hllCorrectionTableMicro(p: Int): Array[Long] = {
    val m = 1 << p
    Array.tabulate(m)(i =>
      math.floor(m * math.log(m.toDouble / (i + 1)) * HllEstScale).toLong)
  }

  /** Integer-exact cardinality estimate in micro-units (10⁻⁶ items):
    * floor(numer_micro / sum_inv_scaled) via DECIMAL(38,0) integral
    * division, with the small-range branch a literal BIGINT table
    * lookup — every step is integer arithmetic, so the value replays
    * bit-for-bit on ANY oracle engine version (no double literal parse,
    * no double division, no HUGEINT fetch conversion). est_distinct =
    * micro / 10^6 to within 1 micro-unit of [[hllEstimate]]'s double
    * (pinned in SketchSpec). Scope: the quotient exceeds BIGINT only
    * past ~9·10^12 distinct — far beyond the 60-bit hash domain's
    * collision-safe range. */
  def hllEstimateMicro(regs: Column, p: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val m = 1 << p
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val corr = typedLit(hllCorrectionTableMicro(p))
    val raw = ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(lit(hllNumerMicro(p)).cast(dec38)),
      ColumnBridge.expression(hllSumInvScaled(regs, p).cast(dec38))))
    val v = hllZeroRegs(regs)
    when(raw <= lit(5L * m / 2 * HllEstScale) && v > 0, element_at(corr, v))
      .otherwise(raw)
  }

  // ---------------------------------------------------------------------
  // Count-Min sketch — bounded-state FREQUENCY estimation, completing the
  // sketch family: KMV/HLL answer "how many distinct", CMS answers "how
  // often does THIS key occur" without carrying the full key → count map.
  // The sketch is a d×w counter table (depth d independent hash rows,
  // width w buckets); an item increments one counter per row, a point
  // query reads its d counters and takes the min. Guarantees (Cormode &
  // Muthukrishnan 2005): est ≥ true always (counters only over-count via
  // collisions), and est ≤ true + εN with probability 1−δ for ε = e/w,
  // δ = e^−d, N the total item count.
  //
  // The representation here is deliberately RELATIONAL — the counter
  // table is a (group, row, bucket, cnt) DataFrame, not an opaque buffer:
  // the build is one groupBy COUNT whose shuffle carries at most d·w rows
  // per group after map-side combine (corpus-size-independent), shard
  // merge is elementwise ADD (a union + re-aggregate — counts are
  // order-free sums), and point lookups are a broadcast join of the query
  // keys against d·w rows. Row hashes derive from the same md5 machinery
  // as [[kmvHash]] with the row index prefixed, so every counter and
  // every estimate replays exactly in any engine.
  // ---------------------------------------------------------------------

  /** Bucket of `item` in CMS row `row` (0-based): the 60-bit md5 prefix
    * of "row:item" mod `width`. The fixed-position prefix keeps rows
    * independent; within a row distinct items map through distinct
    * strings. */
  def cmsBucket(item: Column, row: Column, width: Int): Column = {
    require(width > 0, s"cms width must be positive, got $width")
    pmod(kmvHash(concat(row.cast("string"), lit(":"), item)),
      lit(width.toLong))
  }

  /** The d×w counter table of `items(itemCol)` per `groupCols` group:
    * (groupCols..., cms_row, cms_bucket, cnt). Occurrences count — items
    * are NOT deduplicated. Absent (row, bucket) pairs are zero counters
    * (kept implicit: the table is sparse, lookups coalesce to 0). */
  def cmsTable(
      items: org.apache.spark.sql.DataFrame,
      itemCol: String,
      depth: Int,
      width: Int,
      groupCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    require(depth >= 1 && depth <= 16, s"cms depth must be in [1,16], got $depth")
    val rows = explode(typedLit(Array.tabulate(depth)(identity))).as("cms_row")
    val keyed = items.select(
      (groupCols.map(col) :+ rows :+ col(itemCol).as("__item")): _*)
    keyed
      .select((groupCols.map(col) :+ col("cms_row") :+
        cmsBucket(col("__item"), col("cms_row"), width).as("cms_bucket")): _*)
      .groupBy((groupCols :+ "cms_row" :+ "cms_bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join CARDINALITY estimate from two [[cmsTable]]s built with the
    * same (depth, width): |A ⋈ B| on the sketched key equals
    * Σ_k f_A(k)·f_B(k), and the per-row counter dot product
    * Σ_bucket a·b estimates it from above (collisions only add terms),
    * so min over the d rows is the standard AMS/CMS inner-product
    * estimator — est ≥ true always, est ≤ true + (e/w)·N_A·N_B with
    * probability 1−e^−d. The planning story at 100 TB: the two d×w
    * tables price a join BEFORE running it (broadcast vs shuffle vs
    * skew-salt) from corpus-size-independent state. A hash row with NO
    * overlapping buckets proves zero common keys, so the estimate is a
    * true 0, not a min over absent rows. Output: one row,
    * (join_est: bigint). */
  def cmsInnerProduct(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      depth: Int): org.apache.spark.sql.DataFrame = {
    // grouped counter tables (extra groupCols) would silently pair
    // buckets ACROSS groups here and inflate the estimate — fail fast:
    // this estimator is defined over exactly one (row, bucket, cnt)
    // table per side (filter a grouped table to one group first)
    Seq(a, b).foreach { df =>
      require(df.columns.sorted.toSeq == Seq("cms_bucket", "cms_row", "cnt"),
        "cmsInnerProduct expects ungrouped counter tables with exactly " +
          s"(cms_row, cms_bucket, cnt); got (${df.columns.mkString(", ")})")
    }
    val dots = a.join(b.withColumnRenamed("cnt", "cnt_b"),
        Seq("cms_row", "cms_bucket"))
      .groupBy("cms_row")
      .agg(sum(col("cnt") * col("cnt_b")).as("dot"))
      .agg(min(col("dot")).as("min_dot"), count(lit(1)).as("n_rows"))
    dots.select(
      when(col("n_rows") < depth, lit(0L))
        .otherwise(col("min_dot")).cast("bigint").as("join_est"))
  }

  /** Point-frequency estimates for `keys(keyCol)` against a [[cmsTable]]:
    * min over the key's d counters, absent counters read as 0. Output:
    * (groupCols..., keyCol, cms_est). The keys side is expected to be
    * small (a broadcast join against the d·w-bounded table). */
  def cmsLookup(
      table: org.apache.spark.sql.DataFrame,
      keys: org.apache.spark.sql.DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      groupCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val rows = explode(typedLit(Array.tabulate(depth)(identity))).as("cms_row")
    val probes = keys
      .select((groupCols.map(col) :+ col(keyCol) :+ rows): _*)
      .withColumn("cms_bucket", cmsBucket(col(keyCol), col("cms_row"), width))
    probes
      .join(table, groupCols ++ Seq("cms_row", "cms_bucket"), "left")
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
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

/** Typed partial aggregate holding a group's HLL registers (buffer = one
  * byte per register, m = 2^p of them): `update` raises the item's
  * bucket register to max(register, rho), `merge` is elementwise max.
  * State is EXACTLY m bytes per group regardless of input size, combines
  * map-side, and max is commutative/associative/idempotent, so results
  * are partition- and duplicate-invariant. Input must be the 60-bit
  * [[Sketch.kmvHash]] long (enforced below) so the registers replay from
  * md5 prefixes in any engine. */
case class HllAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Byte]] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

  require(p >= 4 && p <= 16, s"hll needs p in [4,16], got $p")
  private val m = 1 << p
  private val w = 60 - p // bits left after the bucket prefix

  override def children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq(child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hll expects bigint (use Sketch.kmvHash), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> w).toInt & (m - 1)
      val rem = h & ((1L << w) - 1)
      // rho = leading-zero run of the W-bit remainder + 1
      //     = W + 1 − bitlen(rem), with bitlen(0) = 0
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(rem)
      val rho = (w + 1 - bitlen).toByte
      if (rho > buffer(bucket)) buffer(bucket) = rho
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any =
    new GenericArrayData(Array.tabulate(m)(i => buffer(i).toInt))

  // defensive copies both ways: the framework may hold serialized bytes
  // while update keeps mutating the live buffer (and vice versa)
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]) =
    copy(child = newChildren.head)
  override def prettyName: String = "hll"
}

/** The first `nibbles` hex digits of md5(utf8 bytes) as a non-negative
  * long, as ONE codegen'd digest → shift per row — bit-identical to
  * `conv(substring(md5(c), 1, nibbles), 16, 10)` (the value of the
  * leading nibbles IS the top 4·nibbles bits of the digest) without
  * materializing the 32-char hex string, substringing it, and
  * re-parsing. This is the portable-hash kernel under every md5-replay
  * surface (KMV/HLL/CMS sketches, the portable dedup twins, tar
  * sharding), so the per-row alloc chain was suite-wide hot.
  * Equality with the column form is pinned in SketchSpec. */
case class Md5PrefixExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    nibbles: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{DataType, LongType, StringType}

  require(nibbles >= 1 && nibbles <= 15,
    s"md5 prefix must keep 1..15 nibbles (sign-safe long), got $nibbles")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix expects string (cast first), got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5PrefixExpr.prefix(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, nibbles)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5PrefixExpr.prefix($c.getBytes(), $nibbles);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
    copy(child = newChild)
  override def prettyName: String = "md5_prefix"
}

object Md5PrefixExpr {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Top 4·nibbles bits of md5(bytes) as a long (big-endian digest
    * order — hex digit i of the canonical md5 string is nibble i). */
  def prefix(bytes: Array[Byte], nibbles: Int): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> (64 - 4 * nibbles)
  }
}

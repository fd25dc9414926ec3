package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction: hash-based (stable
  * across runs, retries, and cluster sizes — unlike `df.sample`, which
  * depends on partitioning), plus stratified and per-group top-k variants.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~`fraction` of rows, selected by a stable hash of `keyCols` —
    * the same rows survive on every run and at any parallelism. A salt
    * gives independent samples over the same keys. */
  def deterministicSample(
      df: DataFrame,
      keyCols: Seq[String],
      fraction: Double,
      salt: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val h = pmod(xxhash64(lit(salt) +: keyCols.map(col): _*), lit(Buckets))
    df.where(h < (fraction * Buckets).toLong)
  }

  /** Stratified deterministic sample: per-stratum fractions (missing
    * strata default to `defaultFraction`). */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      keyCols: Seq[String],
      defaultFraction: Double = 0.0,
      salt: Long = 0L): DataFrame = {
    val h = pmod(xxhash64(lit(salt) +: keyCols.map(col): _*), lit(Buckets))
    val threshold = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.where(h < threshold)
  }

  /** Deterministic train/val/test split: a `labelCol` assigned by the
    * md5 bucket of `keyCol` (+ optional salt) — a pure narrow projection
    * (zero shuffle) whose assignment is stable across runs, partitionings,
    * cluster sizes, and engines (md5 hex is engine-portable where
    * xxhash64 is not, which is what makes the split reproducible by any
    * downstream consumer, not just Spark). Fractions are quantized to
    * 1/256 (first two hex chars = 256 buckets, compared as strings):
    * the granularity every hash-mod-N split scheme quantizes to, and
    * coarse enough that the bucket boundary is auditable by eye.
    * The production default for non-portable splits remains
    * [[deterministicSample]]'s xxhash64 (faster, codegen'd). */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      salt: String = "",
      labelCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "hashSplit needs at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val bucket = substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 2)
    // cumulative upper bounds as two-char hex; the last split is the
    // `otherwise` so rounding never orphans bucket "ff"
    val bounds = fractions.init.scanLeft(0.0)(_ + _._2).tail
      .map(c => f"${math.min(255L, math.round(c * 256))}%02x")
    val label = bounds.zip(fractions.init).foldRight(
      lit(fractions.last._1): Column) { case ((bound, (name, _)), rest) =>
      when(bucket < lit(bound), lit(name)).otherwise(rest)
    }
    df.withColumn(labelCol, label)
  }

  /** Per-group top-k by `orderBy` expressions (e.g. best-quality docs per
    * language) — one shuffle, rank + filter. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k).drop("__rk")
  }

  /** Exact-k-per-stratum deterministic sample: the k rows with the lowest
    * stable rank per stratum — uniform within the stratum when the rank is
    * a hash, with exact per-stratum counts (what fraction-based sampling
    * can't give). Rank ties break on `rankBy`'s trailing columns; pass the
    * id last for full determinism. Scale shape: `row_number() <= k` is
    * rewritten by Catalyst into a partial WindowGroupLimit BEFORE the
    * exchange (rank-limit pushdown), so each map task ships at most k rows
    * per stratum — no full-stratum sort ever materializes
    * (PlanSpec-asserted). */
  def stratifiedExactK(
      df: DataFrame,
      strataCols: Seq[String],
      k: Int,
      rankBy: Seq[Column]): DataFrame = {
    require(k > 0, "k must be positive")
    topKPerGroup(df, strataCols, rankBy, k)
  }

  /** [[stratifiedExactK]] ranked by a salted stable hash of `keyCols` —
    * the deterministic-uniform default. */
  def stratifiedExactK(
      df: DataFrame,
      strataCols: Seq[String],
      keyCols: Seq[String],
      k: Int,
      salt: Long): DataFrame =
    stratifiedExactK(df, strataCols, k,
      xxhash64(lit(salt) +: keyCols.map(col): _*) +: keyCols.map(col))

  /** Greedy sequence packing for training batches: within each group
    * (e.g. language shard), documents are taken in `orderCol` order and
    * assigned to fixed-`budget` token sequences — doc d lands in sequence
    * `floor(cumulative_tokens_before_d / budget)`, so a sequence may
    * overflow by at most one document (the standard greedy packer;
    * oversized docs occupy their own sequences). One shuffle (the
    * per-group window); groups pack independently, so 100 TB packs as
    * wide as the grouping key's cardinality. Adds `seq_id` (0-based per
    * group) and `seq_pos` (0-based slot within the sequence). */
  def packSequences(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    val before = coalesce(
      sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val seqId = floor(before / budget)
    val wSeq = Window.partitionBy((groupCols.map(col) :+ seqId): _*).orderBy(col(orderCol))
    df.withColumn("seq_id", seqId.cast("bigint"))
      .withColumn("seq_pos", (row_number().over(wSeq) - 1).cast("bigint"))
  }

  /** Materialize the [[packSequences]] assignment into actual training
    * sequences: one row per (group, seq_id) with member texts joined in
    * slot order around an end-of-document separator, plus token/doc
    * counts. One additional shuffle (the group-by); sequence payloads
    * are bounded by the token budget, so rows stay small no matter the
    * corpus size. */
  def materializePacked(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      tokenCol: String,
      textCol: String,
      budget: Long,
      eod: String = " <|eod|> "): DataFrame = {
    val packed = packSequences(df, groupCols, orderCol, tokenCol, budget)
    packed.groupBy((groupCols.map(col) :+ col("seq_id")): _*)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("seq_pos"), col(textCol)))),
            s => s.getField(textCol)),
          eod).as("seq_text"),
        sum(col(tokenCol)).cast("long").as("seq_tokens"),
        count(lit(1)).cast("long").as("n_docs"))
  }

  /** Global ordinal under a total order — the "materialize the training
    * order" step (every pretraining pipeline ends with a deterministic
    * global shuffle; pass a stable hash as the order for a uniform one).
    * Adds `shuffle_pos` (0-based, dense, gap-free).
    *
    * The naive `row_number() OVER (ORDER BY …)` collapses the corpus
    * into ONE partition — a non-starter at scale. This is the
    * two-job linear shape instead: range-partition + in-partition sort
    * on `orderBy`, local ordinals from `monotonically_increasing_id()`
    * evaluated above the sort (partitionId·2³³ + sorted row offset — no
    * window, no extra shuffle), and a per-partition count job whose
    * cumulative offsets broadcast-join back to turn local ordinals
    * global. The count job re-runs the range shuffle with columns pruned
    * to the order keys — the same extra key-only pass zipWithIndex pays.
    * Requirements: `orderBy` must order rows UNIQUELY (append
    * the row id last) — ties would leave sort placement
    * partition-stability-dependent; ≤ 2³³ rows per partition (the
    * monotonic-id partition stride). Spark's range sampling is
    * seeded deterministically per partition, so both jobs see identical
    * bounds over deterministic input splits. */
  def globalOrderIndex(
      df: DataFrame,
      orderBy: Seq[Column],
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed = df.repartitionByRange(p, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mid"), 33).cast("int"))
      .withColumn("__local", col("__mid").bitwiseAND((1L << 33) - 1))
    val counts = keyed.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    keyed.join(broadcast(offDf), Seq("__pid"))
      .withColumn("shuffle_pos", col("__off") + col("__local"))
      .drop("__mid", "__pid", "__local", "__off")
  }

  /** Deterministic token-budget sampling for training-mix construction
    * ("≤ N tokens per language"): within each stratum, rows are taken in
    * `orderBy` order (pass a stable hash for a uniform draw, or a quality
    * score for best-first) while the running `tokenCol` total stays at or
    * under `budget` — the greedy prefix, so the selection overshoots
    * never, undershoots by less than one document, and is a pure function
    * of (data, order, budget): stable across runs, retries, and cluster
    * sizes. One shuffle (the per-stratum cumulative-sum window); strata
    * sample independently, so 100 TB samples as wide as the stratum
    * cardinality — same shape as [[packSequences]]. */
  def sampleToTokenBudget(
      df: DataFrame,
      strataCols: Seq[String],
      tokenCol: String,
      budget: Long,
      orderBy: Seq[Column]): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(strataCols.map(col): _*).orderBy(orderBy: _*)
    val through = sum(col(tokenCol)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__cum", through)
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Reproducibility manifest over a sharded dataset: per shard, the
    * row count, token total, and an ORDER-STABLE md5 over the member
    * texts (sorted by `orderCol`, joined with a fixed separator) — the
    * audit row a training run records so a rebuilt dataset can be
    * byte-verified shard by shard without shipping the data. One
    * combinable aggregation; the collect_list is bounded by shard size
    * (shards are budget-packed, not corpus-sized). */
  /** Morton / z-order interleave of two non-negative `bits`-bit columns:
    * bit 2i+1 of the result is bit i of `x`, bit 2i is bit i of `y` —
    * pure integer shifts and masks (codegen'd, replayable bit-for-bit
    * by any engine with `>> << & |`). The write-side clustering trick
    * behind multi-dimensional scan pruning (Delta/Iceberg OPTIMIZE
    * ZORDER): sorting or bucketing by z bounds every file's range in
    * BOTH dimensions at once, so min/max file stats prune selective
    * predicates on EITHER column — the layout that makes a 100 TB fact
    * table scannable by more than its partition key. */
  def zorderBits(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be 1-31")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  def shardManifest(
      df: DataFrame,
      shardCols: Seq[String],
      orderCol: String,
      textCol: String,
      tokenCol: String): DataFrame = {
    val sorted = sort_array(collect_list(struct(col(orderCol).as("o"),
      col(textCol).as("t"))))
    df.groupBy(shardCols.map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("n_seqs"),
        sum(col(tokenCol)).cast("bigint").as("total_tokens"),
        md5(array_join(transform(sorted, x => x.getField("t")), "|#|"))
          .as("content_md5"))
  }

  /** Temperature-flattened domain mixing (the GPT-3/PaLM recipe at
    * T = 2): per-stratum budgets ∝ √(stratum token total), computed from
    * the corpus's OWN composition rather than hand-set weights — small
    * domains get boosted, huge ones damped. `sqrt` is IEEE
    * correctly-rounded (unlike `pow`, which is only 1-ulp and may
    * differ across libms — that is why the exponent is fixed at ½), the
    * √-sum folds in stratum order, and each budget is
    * `floor(T · (√n / Σ√n))` — every FP step exactly rounded and
    * replayable. Stratum totals are #strata rows, driver-resident (the
    * LM/centroid discipline); the corpus pays one aggregation plus the
    * same single budget window as the weighted variant. */
  def sampleToTokenBudgetSqrt(
      df: DataFrame,
      strataCol: String,
      tokenCol: String,
      totalBudget: Long,
      orderBy: Seq[Column]): DataFrame = {
    require(totalBudget > 0, "token budget must be positive")
    val totalRows = df.groupBy(col(strataCol)).agg(sum(col(tokenCol)).as("__n")).collect()
    // a NULL stratum would stringify to "null" here but the === selector
    // below can never match NULL rows — they'd silently eat budget share
    // while contributing zero rows; fail loudly instead
    require(totalRows.forall(!_.isNullAt(0)),
      s"sampleToTokenBudgetSqrt: NULL $strataCol stratum — filter or impute it before budgeting")
    val totals = totalRows.map(r => String.valueOf(r.get(0)) -> r.getLong(1))
      .sortBy(_._1)
    require(totals.nonEmpty, "corpus has no strata")
    val roots = totals.map { case (s, n) => s -> math.sqrt(n.toDouble) }
    val z = roots.map(_._2).reduceLeft(_ + _) // stratum-ordered fold
    val budgets = roots.map { case (s, r) =>
      s -> math.floor(totalBudget.toDouble * (r / z)).toLong
    }
    val budgetFor = budgets.foldLeft(lit(0L)) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol)).orderBy(orderBy: _*)
    val through = sum(col(tokenCol)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__cum", through)
      .where(col("__cum") <= budgetFor)
      .drop("__cum")
  }

  /** Domain-mixing variant of [[sampleToTokenBudget]]: one total token
    * budget divided across strata by `weights` (the "70% web / 20% code /
    * 10% books" training-mix recipe) — each stratum takes its greedy
    * deterministic prefix under its own share, floor-rounded so the
    * realized total never exceeds `totalBudget`. Strata missing from
    * `weights` get zero (dropped). Same single-window shape and the same
    * stability guarantees; the per-stratum budget rides a broadcast-sized
    * when-chain, never a join against the corpus. */
  def sampleToTokenBudgetWeighted(
      df: DataFrame,
      strataCol: String,
      tokenCol: String,
      totalBudget: Long,
      weights: Map[String, Double],
      orderBy: Seq[Column]): DataFrame = {
    require(totalBudget > 0, "token budget must be positive")
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val wsum = weights.values.sum
    require(wsum > 0, "weights must not all be zero")
    val budgetFor = weights.foldLeft(lit(0L)) { case (acc, (stratum, wt)) =>
      when(col(strataCol) === stratum,
        lit(math.floor(totalBudget * wt / wsum).toLong)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol)).orderBy(orderBy: _*)
    val through = sum(col(tokenCol)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__cum", through)
      .where(col("__cum") <= budgetFor)
      .drop("__cum")
  }

  /** Epoch-based domain mixing — the published LLaMA recipe (Touvron et
    * al. 2023, table 1: "Wikipedia 2.45 epochs, C4 0.64 epochs, …"; also
    * the DoReMi resampling step, Xie et al. 2023): each stratum is
    * repeated `factor` epochs, where a fractional epoch keeps a
    * deterministic `frac(factor)` subset. Row `r` in stratum `s` with
    * factor `f` emits `floor(f)` replicas plus one more iff the first 8
    * hex chars of `md5(key ∥ salt)` sort below the per-stratum threshold
    * `round(frac(f)·2³²)` — the [[hashSplit]] portable-hash idiom, so the
    * realized mix is stable across runs, partitionings, cluster sizes,
    * AND engines (any consumer can recompute membership from md5 alone).
    * Output rows carry `epochCol` (0-based replica index). Strata absent
    * from `factors` default to exactly 1 epoch; a factor of 0.0 drops the
    * stratum. A NULL stratum can never match a factor entry and so also
    * defaults to 1 epoch (and a NULL key gets no fractional top-up) —
    * both deterministic, neither silently dropped.
    *
    * Scale shape: pure narrow projection + explode — zero shuffle, zero
    * join; both the replica count and the hex threshold ride
    * broadcast-sized literal when-chains. Output size is Σ fₛ·|s| by
    * construction. (The `where(n ≥ 1)` guard precedes the explode because
    * Spark's `sequence(0, -1)` counts DOWN rather than returning empty.) */
  def epochMix(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      factors: Seq[(String, Double)],
      salt: String = "",
      epochCol: String = "epoch"): DataFrame = {
    require(factors.forall(_._2 >= 0), "epoch factors must be non-negative")
    require(factors.map(_._1).distinct.size == factors.size, "duplicate stratum in factors")
    def hexThr(frac: Double): String =
      f"${math.min(0xffffffffL, math.round(frac * 4294967296.0))}%08x"
    val copies = factors.foldRight(lit(1): Column) { case ((s, x), rest) =>
      when(col(strataCol) === s, lit(math.floor(x).toInt)).otherwise(rest)
    }
    val thr = factors.foldRight(lit("00000000"): Column) { case ((s, x), rest) =>
      when(col(strataCol) === s, lit(hexThr(x - math.floor(x)))).otherwise(rest)
    }
    val h = substring(md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8)
    val n = copies + when(h < thr, lit(1)).otherwise(lit(0))
    df.withColumn("__n", n)
      .where(col("__n") >= 1)
      .withColumn(epochCol, explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }
}

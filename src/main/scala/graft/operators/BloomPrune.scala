package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit Bloom-filter join pruning — the runtime-filter pattern as a
  * first-class, deterministic operator: build an m-bit filter from the
  * small side's join keys, drop large-side rows whose key cannot match
  * BEFORE the join's shuffle, then run the exact join on the survivors.
  *
  * The final result is EXACTLY the plain join (the filter admits no
  * false negatives by construction — every build key sets its bits —
  * and false positives are removed by the join itself), which is what
  * lets the p52 oracle verify the operator against the plain SQL join.
  *
  * Why this exists when AQE has runtime bloom filters: Spark's
  * injected filter fires only for shuffle joins under size/stat
  * heuristics the optimizer controls; the explicit form covers the
  * shapes the heuristics miss (pre-filtered dimensions whose stats the
  * optimizer doesn't see, broadcast-ineligible builds, reuse of one
  * filter across several scans) and is reproducible: the bit positions
  * come from seeded xxhash64 — Spark's codegen'd native hash, chosen
  * over the portable md5-based h60 because the filter is a PURE
  * PERFORMANCE HINT (the exact join removes false positives, so no
  * oracle ever recomputes the bits; what matters is that the probe
  * runs at scan speed, and a per-row md5 does not).
  *
  * Scale shape: the BUILD is one distinct aggregation of bit positions
  * — the driver collects at most m/64 longs (8 KiB at m = 2¹⁶)
  * REGARDLESS of build-side cardinality, the same bounded-driver
  * contract as the IVF/PQ codebooks. The PROBE is a pure projection
  * against the literal word array (codegen'd shifts/masks, zero
  * exchanges — PlanSpec pins that pruning adds no shuffle), applied at
  * scan time, before the join exchange: at 100 TB the fact table
  * shuffles only candidate rows instead of every row. False-positive
  * rate ~ (1 − e^(−k·n/m))^k; size m for the expected build
  * cardinality, k ≈ (m/n)·ln 2.
  */
object BloomPrune {

  /** Canonical hash type for a pair of key types: BOTH sides cast to
    * this before hashing, so build and probe hash equal bits exactly
    * where the join's own coercion would make the values equal.
    * Integral × integral widens to long; any numeric mix involving a
    * fractional or decimal goes through double — a double collapse can
    * only MERGE distinct values (a false positive, removed by the
    * exact join), never split equal ones, so the no-false-negative
    * guarantee holds. Type pairs with no safe family (string vs
    * numeric, date vs timestamp, …) are rejected loudly instead of
    * risking silently dropped rows (round-5 ADVICE: int 5 hashed "5"
    * while a decimal build key hashed "5.00"). */
  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def numeric(t: DataType): Boolean = integral(t) || (t match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  })

  private[operators] def hashType(a: DataType, b: DataType): DataType =
    (a, b) match {
      case (x, y) if x == y => x
      case (x, y) if integral(x) && integral(y) => LongType
      case (x, y) if numeric(x) && numeric(y) => DoubleType
      case _ => throw new IllegalArgumentException(
        s"BloomPrune: join key types $a vs $b share no hash-safe " +
        "family; cast the sides to a common type before pruning")
    }

  /** Build the m-bit filter from `df`'s `key` column: the driver
    * receives the DISTINCT bit positions (≤ m ints, bounded by the
    * filter size, never by the build cardinality) and packs them into
    * m/64 words.
    *
    * Keys hash through a CANONICAL string form: xxhash64 is
    * type-sensitive (int 5 and long 5 hash differently), so hashing the
    * raw columns would turn a key-type mismatch between the two join
    * sides into silent FALSE NEGATIVES — dropped matching rows — where
    * the plain join would coerce and match. `prunedJoin` additionally
    * pre-casts both sides to [[hashType]]'s resolved common type, so
    * the string form agrees across the numeric families too (int 5 and
    * decimal 5.00 both hash as double "5.0"). Callers using
    * bloomWords/mightContain directly must apply the same cast to both
    * sides themselves. */
  def bloomWords(df: DataFrame, key: Column, mBits: Int,
      kHashes: Int): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0 && kHashes >= 1)
    val posCols = (0 until kHashes).map(i =>
      pmod(xxhash64(lit(i), key.cast("string")), lit(mBits.toLong)))
    val positions = df.select(explode(array(posCols: _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    positions.foreach(p => words(p.toInt / 64) |= (1L << (p.toInt % 64)))
    words
  }

  /** Membership test against a literal word array — one codegen'd
    * shift/mask per hash, no shuffle, no join. May return true for a
    * key not in the build set (false positive, removed by the real
    * join); never false for one that is, PROVIDED build and probe keys
    * were cast to the same resolved common type (see [[hashType]] —
    * prunedJoin/prunedSemiJoin do this; direct callers must). */
  def mightContain(key: Column, words: Array[Long], mBits: Int,
      kHashes: Int): Column =
    (0 until kHashes).map { i =>
      val pos = pmod(xxhash64(lit(i), key.cast("string")), lit(mBits.toLong))
      val word = element_at(typedLit(words.toSeq),
        call_function("div", pos, lit(64L)).cast("int") + 1)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Inner equi-join with the large side Bloom-pruned before the join
    * exchange. Result is set-identical to `large.join(small, keys)`:
    * both sides' keys are pre-cast to the resolved common hash type
    * (see [[hashType]]) so no type-family mismatch can produce a false
    * negative. */
  def prunedJoin(large: DataFrame, small: DataFrame, key: String,
      mBits: Int = 1 << 16, kHashes: Int = 3): DataFrame = {
    val ht = hashType(large.schema(key).dataType, small.schema(key).dataType)
    val words = bloomWords(small, col(key).cast(ht), mBits, kHashes)
    large.filter(mightContain(col(key).cast(ht), words, mBits, kHashes))
      .join(small, Seq(key))
  }

  /** Left-semi variant — "keep large rows whose key exists in small",
    * the decontamination/allowlist shape: prune at scan speed, verify
    * with the exact semi join. */
  def prunedSemiJoin(large: DataFrame, small: DataFrame, key: String,
      mBits: Int = 1 << 16, kHashes: Int = 3): DataFrame = {
    val ht = hashType(large.schema(key).dataType, small.schema(key).dataType)
    val words = bloomWords(small, col(key).cast(ht), mBits, kHashes)
    large.filter(mightContain(col(key).cast(ht), words, mBits, kHashes))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}

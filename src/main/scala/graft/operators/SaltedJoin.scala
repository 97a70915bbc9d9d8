package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-join hardened against heavy key skew WITHOUT relying on AQE's
  * runtime skew split: the skewed (large, hot-keyed) side is salted into
  * `salts` sub-keys by a per-row hash of its key columns mixed with a
  * row-position component, the other side is replicated across every salt
  * value, and the join runs on (keys :+ salt) — so one hot key's rows
  * spread across `salts` tasks instead of funneling into one straggler,
  * EVEN when the hot key's rows are byte-identical duplicates (a common
  * skew shape, e.g. a projected fact carrying only the key column).
  *
  * Correctness: the result multiset is IDENTICAL to the plain join — each
  * skewed-side row carries exactly one salt, and the other side matches it
  * on that salt because it was replicated across all of them (asserted
  * row-for-row in OperatorsSpec; the q45 gate query replays the whole
  * pipeline against a plain-join DuckDB oracle).
  *
  * Cost model: replicates the non-skewed side `salts`× through the
  * shuffle — worth it when that side is modest and the skewed side has
  * hot keys AQE can't split well (e.g. a skewed aggregation feeding the
  * join, or a sort-merge join whose hot partition spills). Prefer plain
  * join + AQE when keys are uniform; prefer broadcast when the small side
  * fits in memory (salting a broadcastable join is pure overhead).
  */
object SaltedJoin {

  def join(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "SaltedJoin: inputs must not already carry a __salt column")
    // per-row salt = hash(key cols, partition, row offset): the
    // monotonically_increasing_id term encodes (partition_id, local offset),
    // so identical duplicate rows STILL spread across salts — hashing row
    // content alone would funnel a hot key of literal duplicates into one
    // task, silently defeating the operator. Deterministic given a fixed
    // input partitioning (salt = f(keys, partition, offset), no RNG);
    // correctness never depends on WHICH salt a row gets, because the
    // other side is replicated across all of them — so a recompute that
    // re-lays-out partitions (task retry, AQE re-plan) still joins every
    // row exactly once.
    val l = salted(skewed, keys, salts)
    val r = other.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** The skewed side with its `__salt` column attached — package-visible so
    * the spec can assert the spread property (identical duplicate rows land
    * on many salts) directly on the salt assignment.
    */
  private[graft] def salted(skewed: DataFrame, keys: Seq[String], salts: Int)
      : DataFrame =
    skewed.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salts.toLong)))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-join hardened against heavy key skew WITHOUT relying on AQE's
  * runtime skew split: the skewed (large, hot-keyed) side is salted into
  * `salts` sub-keys by a deterministic per-row hash of its columns, the
  * other side is replicated across every salt value, and the join runs on
  * (keys :+ salt) — so one hot key's rows spread across `salts` tasks
  * instead of funneling into one straggler.
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
    // deterministic per-row salt: hash every column, so identical rows
    // land on the same salt (stable across runs — no RNG, no row ids)
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts.toLong)))
    val r = other.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}

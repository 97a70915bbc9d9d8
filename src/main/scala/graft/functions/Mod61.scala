package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Arithmetic over the Mersenne field GF(2^61 - 1) — the hash family the
  * MinHash / SimHash sketches are built on (round 11).
  *
  * Why this field and not xxhash64: the sketches' per-document outputs are
  * oracle-checked against DuckDB, and a 64-bit wrapping multiply is not
  * expressible there (BIGINT overflow throws; HUGEINT can't hold a full
  * 64×64 product). Products of two values below 2^61 fit in 122 bits —
  * inside both a Java high/low 64-bit pair (`Math.multiplyHigh`) and
  * DuckDB's signed 128-bit HUGEINT — so every signature slot is REPLAYABLE
  * in plain SQL: `(a*x + c) % 2305843009213693951` with HUGEINT
  * intermediates is this exact arithmetic. Mersenne reduction is also
  * branch-light: 2^61 ≡ 1 (mod p), so a 122-bit value folds with shifts
  * and adds, no division.
  *
  * The hash family (public textbook constructions):
  *   - base hash: polynomial rolling hash over UTF-8 bytes, base 131 —
  *     `h = (h·131 + byte) mod p` (the t10 fingerprint oracle replays the
  *     same shape in DuckDB with `list_reduce`).
  *   - per-slot: Carter-Wegman double hashing `slot_i = (u + i·v) mod p`
  *     with `u = (A1·x + C1) mod p`, `v = (A2·x + C2) mod p` — the
  *     universal-family construction whose pairwise independence gives the
  *     MinHash S-curve its guarantees.
  *
  * Constants are splitmix64(42) outputs reduced mod p, fixed here AND
  * inlined into the DuckDB oracle SQL (graft.queries.TextQueries) — the
  * two sides must agree literally.
  */
object Mod61 {

  /** 2^61 - 1, prime. */
  val P: Long = (1L << 61) - 1

  // splitmix64(seed=42) stream reduced mod P (zeroes skipped);
  // A·x+C params for the MinHash (A1,C1,A2,C2) and SimHash (A3,C3,A4,C4)
  // Carter-Wegman hashes
  val A1 = 2150242486686805658L
  val C1 = 643983082913198340L
  val A2 = 527597730035375956L
  val C2 = 1737512041830867862L
  val A3 = 701532786141963250L
  val C3 = 2180923070380825356L
  val A4 = 1723021703563930974L
  val C4 = 933993271705612202L

  /** (hi·2^64 + lo) mod p for hi < 2^58, lo unsigned 64-bit. */
  @inline private def fold(hi: Long, lo: Long): Long = {
    // 2^64 ≡ 8, 2^61 ≡ 1 (mod p): fold lo's top 3 bits down, hi up by 8
    var r = hi * 8 + (lo & P) + (lo >>> 61)
    r = (r & P) + (r >>> 61)
    if (r >= P) r - P else r
  }

  /** (a·b) mod p for 0 <= a, b < p. */
  @inline def mulmod(a: Long, b: Long): Long =
    fold(Math.multiplyHigh(a, b), a * b)

  /** (a·x + c) mod p — the Carter-Wegman affine hash. */
  @inline def affine(a: Long, x: Long, c: Long): Long = {
    val r = mulmod(a, x) + c
    if (r >= P) r - P else r
  }

  /** Polynomial base-131 hash of a UTF8String's bytes, mod p. Walks the
    * string's own byte buffer — no allocation.
    *
    * Processes 4 bytes per field reduction (Horner in base 131^4):
    * `h·131^4 + b0·131³ + b1·131² + b2·131 + b3` is mathematically
    * identical to four sequential base-131 steps mod p, but costs one
    * 128-bit fold instead of four — this hash runs once per token/shingle
    * in every sketch pass (t08/t09/t32), so the constant matters. The
    * byte polynomial is < 2^31, so adding it to the folded product needs
    * only one extra Mersenne fold. DuckDB replays the one-byte recurrence
    * (`(a*131+b) % p` via list_reduce) — same value by construction.
    */
  def hash61(s: UTF8String): Long = {
    var h = 0L
    var i = 0
    val n = s.numBytes()
    while (i + 4 <= n) {
      val poly = (s.getByte(i) & 0xFF).toLong * 2248091L + // 131^3
        (s.getByte(i + 1) & 0xFF).toLong * 17161L +        // 131^2
        (s.getByte(i + 2) & 0xFF).toLong * 131L +
        (s.getByte(i + 3) & 0xFF)
      // h·131^4 < 2^89: high word < 2^25, safe for fold; + poly < 2^31
      h = fold(Math.multiplyHigh(h, 294499921L), h * 294499921L) + poly
      h = (h & P) + (h >>> 61)
      if (h >= P) h -= P
      i += 4
    }
    while (i < n) {
      // h·131 < 2^68: high word < 2^5, safe for fold
      h = fold(Math.multiplyHigh(h, 131L), h * 131L) + (s.getByte(i) & 0xFF)
      if (h >= P) h -= P
      i += 1
    }
    h
  }
}

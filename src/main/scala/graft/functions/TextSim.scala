package graft.functions

/** Deterministic, cross-engine text/similarity SQL builders.
  *
  * The training-data operators (MinHash/SimHash/n-gram-Jaccard dedup,
  * LSH + brute-force ANN, language ID, quality scoring, fingerprinting)
  * must produce bit-identical results in Spark and in the DuckDB oracle.
  * Each query is therefore authored ONCE as a template over a [[Dialect]]
  * and rendered for both engines, with these determinism rules:
  *
  *  - integer polynomial hashing mod 1e9+7 — no engine-specific `hash()`;
  *  - left-to-right folds (`aggregate` / `list_reduce`) so double sums
  *    associate identically;
  *  - element-to-double casts before any float math (exact);
  *  - no libm beyond sqrt (exactly rounded per IEEE-754).
  *
  * All testdata text is ASCII, where Spark `ascii` and DuckDB `unicode`
  * agree on code points.
  */
object TextSim {
  val P = 1000000007L

  /** The tiny SQL surface where the two engines differ. */
  final case class Dialect(
      size: String,          // array length fn
      explode: String,       // table-generating array unnest
      arrayDistinct: String,
      arrayIntersect: String,
      arrayMin: String,
      charCode: String,      // code point of a 1-char string
      xor: (String, String) => String,
      intDiv: (String, String) => String,
      transform: (String, String) => String,          // (array, lambda)
      foldLong: (String, Long, String) => String,     // (array, init, lambda)
      foldDouble: (String, String) => String,         // (array, lambda), init 0.0
      zipMul: (String, String) => String,             // elementwise double product array
      at: (String, String) => String,                 // 1-based element access
      arrayOf: Seq[String] => String,                 // array literal from exprs
      ramp: String => String)                         // [1..n] as an array expr

  val spark: Dialect = Dialect(
    size = "size",
    explode = "explode",
    arrayDistinct = "array_distinct",
    arrayIntersect = "array_intersect",
    arrayMin = "array_min",
    charCode = "ascii",
    xor = (a, b) => s"($a ^ $b)",
    intDiv = (a, b) => s"($a div $b)",
    transform = (arr, f) => s"transform($arr, $f)",
    foldLong = (arr, init, f) => s"aggregate($arr, ${init}L, $f)",
    foldDouble = (arr, f) => s"aggregate($arr, cast(0 as double), $f)",
    zipMul = (a, b) => s"zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double))",
    at = (arr, i) => s"element_at($arr, $i)",
    arrayOf = items => items.mkString("array(", ", ", ")"),
    // Spark's sequence(1, 0) yields a DESCENDING [1,0] rather than [] —
    // build 0..n and slice off the 0 so n<1 gives a genuinely empty ramp.
    ramp = n => s"slice(sequence(0, greatest($n, 0)), 2, greatest($n, 0))")

  val duck: Dialect = Dialect(
    size = "len",
    explode = "unnest",
    arrayDistinct = "list_distinct",
    arrayIntersect = "list_intersect",
    arrayMin = "list_min",
    charCode = "unicode",
    xor = (a, b) => s"xor($a, $b)",
    intDiv = (a, b) => s"($a // $b)",
    transform = (arr, f) => s"list_transform($arr, $f)",
    foldLong = (arr, init, f) => s"list_reduce(list_prepend(CAST($init AS BIGINT), $arr), $f)",
    foldDouble = (arr, f) => s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $arr), $f)",
    zipMul = (a, b) =>
      s"list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)",
    at = (arr, i) => s"$arr[$i]",
    arrayOf = items => items.mkString("list_value(", ", ", ")"),
    ramp = n => s"range(1, $n + 1)") // duck range(lo, hi<lo) is already []

  /** Polynomial rolling hash over a word's characters:
    * fold(h*31 + code) mod P, init 7. On the Spark side this is the
    * codegen'd [[PolyHash]] expression (one tight loop in WSCG); the HOF
    * fold below is the portable form the DuckDB oracle runs —
    * bit-identical by construction (PolyHashSpec asserts it). */
  def wordHash(d: Dialect, w: String): String =
    if (d eq spark) s"graft_poly_hash($w)"
    else {
      val codes = d.transform(d.ramp(s"length($w)"), s"i -> ${d.charCode}(substring($w, i, 1))")
      d.foldLong(codes, 7L, s"(h, c) -> (h * 31 + c) % $P")
    }

  /** The HOF form of [[wordHash]] for either dialect (used by the oracle
    * and by the equivalence spec). */
  def wordHashHof(d: Dialect, w: String): String = {
    val codes = d.transform(d.ramp(s"length($w)"), s"i -> ${d.charCode}(substring($w, i, 1))")
    d.foldLong(codes, 7L, s"(h, c) -> (h * 31 + c) % $P")
  }

  /** Word-hash array of a space-tokenized text column. */
  def wordHashes(d: Dialect, text: String): String =
    d.transform(tokens(d, text), s"w -> ${wordHash(d, "w")}")

  /** Space tokenizer. */
  def tokens(d: Dialect, text: String): String =
    if (d eq spark) s"split($text, ' ')" else s"string_split($text, ' ')"

  /** Hashes of 3-word shingles from a word-hash array column `wh`
    * (callers must filter size(wh) >= 3):
    * sh_i = ((wh_i*131 + wh_{i+1}) % P * 131 + wh_{i+2}) % P. */
  def shingleHashes(d: Dialect, wh: String): String =
    d.transform(
      d.ramp(s"${d.size}($wh) - 2"),
      s"i -> ((${d.at(wh, "i")} * 131 + ${d.at(wh, "i + 1")}) % $P * 131 + ${d.at(wh, "i + 2")}) % $P")

  /** MinHash coefficient pairs (a, b) — 16 independent permutations,
    * banded 4×4 for LSH (4 rows per band: P(candidate) = 1-(1-s^4)^4,
    * steep enough that sub-0.2-Jaccard pairs almost never collide — the
    * parameter that keeps candidate generation sub-quadratic). */
  val minhashCoeffs: Seq[(Long, Long)] =
    Seq((31L, 7L), (37L, 11L), (41L, 13L), (43L, 17L), (47L, 19L), (53L, 23L),
      (59L, 29L), (61L, 3L), (67L, 37L), (71L, 41L), (73L, 43L), (79L, 47L),
      (83L, 53L), (89L, 59L), (97L, 61L), (101L, 67L))

  def minhash(d: Dialect, shs: String, a: Long, b: Long): String =
    s"${d.arrayMin}(${d.transform(shs, s"h -> ($a * h + $b) % $P")})"

  /** 30-bit SimHash over the word-hash multiset (hashes < 1e9+7 < 2^30):
    * bit_j set iff more than half the tokens have bit j of their hash set. */
  val simhashBits = 30
  def simhash(d: Dialect, wh: String): String =
    (0 until simhashBits).map { j =>
      val p = 1L << j
      val ones = d.foldLong(
        d.transform(wh, s"h -> ${d.intDiv("h", p.toString)} % 2"), 0L, "(a, b) -> a + b")
      s"(CASE WHEN 2 * $ones > ${d.size}($wh) THEN $p ELSE 0 END)"
    }.mkString("(CAST(", " + ", " AS BIGINT))")

  /** Left-to-right double dot product of two float-array columns. Spark
    * runs the codegen'd [[DotProduct]] kernel; the fold form below is the
    * oracle's portable twin (bit-identical — DotProductSpec asserts it). */
  def dot(d: Dialect, a: String, b: String): String =
    if (d eq spark) s"graft_dot($a, $b)"
    else d.foldDouble(d.zipMul(a, b), "(acc, v) -> acc + v")

  /** The HOF form of [[dot]] (oracle + equivalence spec). */
  def dotHof(d: Dialect, a: String, b: String): String =
    d.foldDouble(d.zipMul(a, b), "(acc, v) -> acc + v")

  /** Squared L2 norm (same fold). */
  def norm2(d: Dialect, a: String): String = dot(d, a, a)

  /** Squared Euclidean distance, one left-to-right fold of (a_i-b_i)²
    * (used by the IVF cell assignment — deterministic in both engines).
    * The Spark side is the codegen'd [[Dist2]] kernel; the HOF chain
    * below is the portable form the DuckDB oracle runs — bit-identical
    * by construction (KernelProps fuzz + the oracle hash compare). */
  def dist2(d: Dialect, a: String, b: String): String =
    if (d eq spark) s"graft_dist2($a, $b)"
    else
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), (acc, v) -> acc + v)"

  /** Deterministic random-hyperplane weight for (plane j, 0-based dim d):
    * LCG-derived integer in [-1000, 1000]; all intermediates positive and
    * within int64 in both engines. */
  private def planeWeight(j: Int, dim: String): String =
    s"((CAST(1103515245 AS BIGINT) * ($j * 64 + $dim) + 12345) % 2001) - 1000"

  /** Random-hyperplane sign code over `lshPlanes` planes. The FULL code is
    * always computed; callers take `code % mask` to use however many low
    * planes the corpus size warrants ([[lshMask]]) — the masked-off planes
    * cost only their per-element multiply and keep the template static.
    * 20 planes carries the bucket ladder to 2^20 (~16M vectors at the
    * ~16/bucket design point); the round-10 x100 tier measured the old
    * 12-plane cap clamping at 4096 buckets, with occupancy growing
    * linearly past ~64k vectors and the Hamming-1 probe join spilling
    * out of disk at 200k. Raising the constant changes NOTHING at
    * masks ≤ 4096: `code % 2^k` reads only the low k planes, so stored
    * 12-plane-era bucket values and every gate-scale oracle answer are
    * bit-identical (the extra planes only become visible when the
    * ladder assigns a mask above 4096). The Spark side is the codegen'd
    * [[LshCode]] kernel (ONE pass over the array for all planes instead
    * of 20 interpreted folds); the HOF form below is the portable twin
    * the DuckDB oracle runs — bit-identical by construction (KernelProps
    * fuzz + the oracle hash compare through t39/t51/t54). */
  val lshPlanes = 20
  def lshCode(d: Dialect, emb: String): String =
    if (d eq spark) s"graft_lsh_code($emb)" else lshCodeHof(d, emb)

  /** The HOF form of [[lshCode]] (oracle + equivalence spec). */
  def lshCodeHof(d: Dialect, emb: String): String =
    (0 until lshPlanes).map { j =>
      val proj = d.foldDouble(
        d.transform(
          d.ramp(s"${d.size}($emb)"),
          s"dd -> ${d.at(emb, "dd")}::DOUBLE * (${planeWeight(j, "(dd - 1)")})::DOUBLE"),
        "(acc, v) -> acc + v")
      s"(CASE WHEN $proj >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(CAST(", " + ", " AS BIGINT))")

  /** Bucket count (a power of two ≤ 2^lshPlanes) as a pure INTEGER CASE
    * chain over the corpus row count `n` — targets ~16 vectors/bucket so
    * per-bucket pair generation stays bounded as the corpus grows. A
    * deterministic integer ladder, NOT floor(log2(n)): libm log2 is not
    * bit-identical across engines. Clamped to [16, 2^20] (the 20-plane
    * code width — ~16M vectors at the design point; the next decade
    * raises [[lshPlanes]] again, one constant + CASE arms). The first
    * nine arms are unchanged from the 12-plane era, so every frozen mask
    * and gate-scale oracle answer carries over bit-identically. */
  def lshMask(n: String): String =
    s"""CASE WHEN $n < 256 THEN 16 WHEN $n < 512 THEN 32 WHEN $n < 1024 THEN 64
       | WHEN $n < 2048 THEN 128 WHEN $n < 4096 THEN 256 WHEN $n < 8192 THEN 512
       | WHEN $n < 16384 THEN 1024 WHEN $n < 32768 THEN 2048 WHEN $n < 65536 THEN 4096
       | WHEN $n < 131072 THEN 8192 WHEN $n < 262144 THEN 16384
       | WHEN $n < 524288 THEN 32768 WHEN $n < 1048576 THEN 65536
       | WHEN $n < 2097152 THEN 131072 WHEN $n < 4194304 THEN 262144
       | WHEN $n < 8388608 THEN 524288 ELSE 1048576 END""".stripMargin

  /** Scala mirror of [[lshMask]] — the incremental cosine-dedup index
    * freezes its bucket mask from the FIRST batch's count (codes must
    * keep their meaning across appends), so it needs the ladder as a
    * value; the DuckDB oracle evaluates the SQL form over the same
    * count. A divergence breaks t69 parity, which the oracle compare
    * catches. */
  def lshMaskValue(n: Long): Int =
    if (n < 256) 16 else if (n < 512) 32 else if (n < 1024) 64
    else if (n < 2048) 128 else if (n < 4096) 256 else if (n < 8192) 512
    else if (n < 16384) 1024 else if (n < 32768) 2048 else if (n < 65536) 4096
    else if (n < 131072) 8192 else if (n < 262144) 16384
    else if (n < 524288) 32768 else if (n < 1048576) 65536
    else if (n < 2097152) 131072 else if (n < 4194304) 262144
    else if (n < 8388608) 524288 else 1048576

  /** IVF cell count ladder over corpus size `n` — tracks ~sqrt(n) (the
    * classical nlist choice balancing probe cost against cell size),
    * clamped to [8, 256]. */
  def ivfCells(n: String): String =
    s"""CASE WHEN $n < 256 THEN 8 WHEN $n < 1024 THEN 16 WHEN $n < 4096 THEN 32
       | WHEN $n < 16384 THEN 64 WHEN $n < 65536 THEN 128 ELSE 256 END""".stripMargin

  /** Scala mirror of [[ivfCells]] — the Spark side trains IVF centroids
    * stepwise in the driver, so it needs the ladder as a value; the DuckDB
    * oracle evaluates the SQL form. A divergence here breaks t41 parity,
    * which is exactly what the oracle compare would catch. */
  def ivfCellsValue(n: Long): Int =
    if (n < 256) 8 else if (n < 1024) 16 else if (n < 4096) 32
    else if (n < 16384) 64 else if (n < 65536) 128 else 256

  /** Deterministic id scramble for UNBIASED bounded training samples: a
    * multiplicative permutation mod P, `(id mod P) · 1103515245 mod P`.
    * An id-ordered PREFIX is a biased sample whenever ids correlate with
    * source or time — at 100 TB they always do, and a source-skewed
    * quantizer degrades cell balance and recall silently. Ordering by
    * this scramble picks a systematic sample spread across the id space:
    * seeded, deterministic, oracle-replayable, and EXACT in both engines
    * — the product is < 2^62 (both factors < 2^31.4), so int64 never
    * overflows, and no engine-specific hash() is involved. The same SQL
    * text renders for both dialects. */
  def idShuffle(id: String): String = s"((($id % $P) * 1103515245) % $P)"

  /** IVF k-means training-sample bound: centroids are trained on
    * `cells * ivfTrainPerCell` vectors sampled by [[idShuffle]] order
    * (deterministic, bounded, unbiased — the standard
    * train-on-a-sample contract; the full corpus is only ever
    * ASSIGNED, never iterated over). */
  val ivfTrainPerCell = 16

  /** Deterministic Lloyd iterations for the IVF coarse quantizer. */
  val ivfLloydIters = 2
}

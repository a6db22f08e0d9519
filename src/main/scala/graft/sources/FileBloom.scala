package graft.sources

/** Per-file BLOOM FILTER for point-predicate file skipping — the stats
  * surface min/max cannot provide: a high-NDV column SCATTERED across
  * files (a key clustered by some OTHER column — the steady-state layout
  * after compaction sorts by one dimension) has every file's [min, max]
  * box covering essentially the whole domain, so `k = literal` opens
  * every file; a per-file bloom answers "is this value POSSIBLY here"
  * and lets the planner skip files that provably lack it. Iceberg plays
  * the same card via parquet row-group bloom filters; riding it in the
  * MANIFEST (like [[NdvSketch]]) prunes BEFORE any file opens — at
  * 100 TB that is the difference between a metadata lookup and a
  * thousand-task scan that discards everything.
  *
  * Soundness: a bloom has NO false negatives — `mightContain == false`
  * proves absence, so skipping is exactly as sound as min/max pruning;
  * false positives only open a file the predicate then filters to
  * nothing. Predicates stay residual either way.
  *
  * Opt-in + shape: table property `stats.bloom-columns = 'k, v'`
  * (columns must be stats-supported types — they hash through
  * [[NdvSketch.hash]]'s CANONICAL form, so a later `int → long` type
  * widen never detaches a stored bloom from its literals).
  * `stats.bloom-max-bytes` (default 32 KiB, rounded to a power of two)
  * caps the per-column, per-file metadata weight.
  *
  * COLLECTION is streaming and flat-memory: values hash into a
  * max-size power-of-two bit array as the writer streams rows (bloom
  * insertion is idempotent — no distinct-set is buffered), and at file
  * close the array FOLDS to the smallest power-of-two size whose fill
  * fraction stays ≤ 1/2 (folding ORs the two halves; with power-of-two
  * masking, bit `c & (m-1)` lands on `c & (m/2-1)` — membership is
  * preserved exactly). Self-sizing by MEASURED density is the exact
  * form of sizing-by-NDV: fill ≈ 1 - exp(-K·ndv/m). A low-NDV column
  * folds to a few dozen bytes; a column too dense even at max size
  * (fill > ~0.79, false-positive rate > 25%) stores NOTHING — a bloom
  * that opens nearly every file anyway is not worth manifest weight.
  *
  * Probing uses K = 6 positions per value via Kirsch–Mitzenmacher
  * double hashing of the canonical 64-bit hash (h1 + i·h2 over the two
  * 32-bit halves); at the fold target of ≤ 1/2 fill the false-positive
  * rate is ≤ (1/2)^6 ≈ 1.6%. Serialized form: one header byte (the
  * probe count, so the constant can evolve without breaking stored
  * filters) + the bit array as little-endian longs. */
private[graft] object FileBloom {

  val ColumnsProp = "stats.bloom-columns"
  val MaxBytesProp = "stats.bloom-max-bytes"
  val DefaultMaxBytes: Int = 32 * 1024

  /** Probe count — fixed at collection; readers honor the stored byte. */
  val K = 6

  /** Max fill fraction a stored bloom may carry (fpr = fill^K ≈ 25%
    * here); denser filters skip almost nothing and are dropped. */
  private val MaxFill = math.pow(0.25, 1.0 / K)

  /** Comma-parsed opted-in column names (lowercased), empty when the
    * property is unset/blank. */
  def columnsOf(props: Map[String, String]): Set[String] =
    props.get(ColumnsProp).fold(Set.empty[String])(
      _.split(',').iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)

  /** Collection bit-array size in BITS: the capped property rounded DOWN
    * to a power of two (mask indexing + exact folding require it),
    * floored at 512 bits. */
  def maxBits(props: Map[String, String]): Int = {
    val bytes = props.get(MaxBytesProp).map(raw =>
      raw.trim.toIntOption.filter(b => b >= 64 && b <= (1 << 24)).getOrElse(
        throw new IllegalArgumentException(
          s"$MaxBytesProp must be an integer in [64, ${1 << 24}], got '$raw'")))
      .getOrElse(DefaultMaxBytes)
    Integer.highestOneBit(math.max(64, bytes)) * 8
  }

  def emptyBits(mBits: Int): Array[Long] = new Array[Long](mBits >>> 6)

  /** Insert the canonical 64-bit hash of one value. */
  def add(bits: Array[Long], hash: Long): Unit = {
    val m = bits.length << 6
    val h1 = (hash >>> 32).toInt
    val h2 = hash.toInt
    var i = 0
    while (i < K) {
      val idx = ((h1 + i * h2) & (m - 1)).toInt
      bits(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  private def fill(bits: Array[Long]): Double = {
    var pop = 0L
    var i = 0
    while (i < bits.length) { pop += java.lang.Long.bitCount(bits(i)); i += 1 }
    pop.toDouble / (bits.length.toLong << 6)
  }

  /** OR the two halves — exact under power-of-two mask indexing. */
  private def fold(bits: Array[Long]): Array[Long] = {
    val half = bits.length >>> 1
    val out = new Array[Long](half)
    var i = 0
    while (i < half) { out(i) = bits(i) | bits(i + half); i += 1 }
    out
  }

  /** Fold to the smallest half-full-or-better size and serialize; null
    * when the column saw nothing, or is too dense to prune usefully even
    * at max size. */
  def finish(bits0: Array[Long]): Array[Byte] = {
    var bits = bits0
    if (fill(bits) == 0.0) return null
    var shrinking = true
    while (shrinking && bits.length > 1) {
      val folded = fold(bits)
      if (fill(folded) <= 0.5) bits = folded else shrinking = false
    }
    if (fill(bits) > MaxFill) return null
    val out = java.nio.ByteBuffer.allocate(1 + bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(K.toByte)
    bits.foreach(out.putLong)
    out.array()
  }

  /** Membership probe against a serialized filter — false PROVES the
    * hashed value was never inserted. Malformed bytes (wrong length, bad
    * header) conservatively answer true: pruning is best-effort. */
  def mightContain(bytes: Array[Byte], hash: Long): Boolean = {
    if (bytes == null || bytes.length < 9 ||
      !isPow2(bytes.length - 1) || bytes(0) <= 0) return true
    val m = (bytes.length - 1) << 3
    val k = bytes(0).toInt
    val h1 = (hash >>> 32).toInt
    val h2 = hash.toInt
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & (m - 1)).toInt
      // Little-endian longs: bit `idx` lives in byte 1 + idx/8, bit idx%8.
      if ((bytes(1 + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  private def isPow2(n: Int): Boolean = n > 0 && (n & (n - 1)) == 0
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators: tokenization,
  * shingling, hashing. Everything here is built from codegen'd/HOF built-ins
  * — no UDFs — so the expressions stay inside Catalyst and the same logic is
  * expressible as ANSI SQL for the oracle.
  *
  * Hash-family trick: a MinHash permutation is simulated by
  * `min(md5(shingle || '#' || seed))` — md5 hex strings are uniformly
  * distributed, lexicographic min over them is a valid min-wise hash, and
  * md5 is bit-identical across engines, unlike engine-native hash().
  */
object TextFns {

  /** Whitespace tokens, empties removed (split keeps boundary empties). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Character k-shingles; strings shorter than k yield one short shingle. */
  def charShingles(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k)))

  /** Word n-grams over a token array. */
  def wordShingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** First 32 bits of md5 as a long (0..2^32-1) — the base hash for the
    * MinHash permutation family. One md5 per shingle, total; the per-seed
    * permutations below are integer arithmetic. Mirrors the oracle's
    * strpos-arithmetic over the same 8 hex characters. */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Vectorized [[hash32]] over a string array — bound to the native
    * graft_hash32_arr expression; `transform(arr, x => hash32(x))` runs an
    * interpreted md5 tree per element (HOFs are CodegenFallback) and was
    * the dominant cost of the one-time shingle/fingerprint table builds.
    * Values identical; elements must be non-null. */
  def hash32Array(arr: Column): Column =
    call_function("graft_hash32_arr", arr)

  /** Universal-hash permutation of a base hash: (a·h + b) mod p with p =
    * 2^31-1 and small odd multipliers, so products stay well inside Long.
    * Identical integer arithmetic on both engines. */
  def permute(h: Column, seed: Int): Column =
    (h * lit(2L * seed + 1) + lit(seed.toLong * seed + 7L)) % lit(2147483647L)

  /** One MinHash value over a pre-hashed shingle array (see hash32). */
  def minhash(hashes: Column, seed: Int): Column =
    array_min(transform(hashes, h => permute(h, seed)))

  /** MinHash signature as an array of `num` independent min-hashes over a
    * pre-hashed shingle array. Callers bind `hashes =
    * transform(shingles, hash32)` ONCE (e.g. as a materialized column) so
    * the md5 pass is not repeated per seed. Bound to the native one-pass
    * expression (graft_minhash_hs): the HOF form ran `num` interpreted
    * array_min/transform passes per row per consumer. Output longs are
    * identical (same affine arithmetic; MinHashExprSpec parity). */
  def minhashSignature(hashes: Column, num: Int): Column =
    call_function("graft_minhash_hs", hashes, lit(num))

  /** The HOF formulation graft_minhash_hs replaces — kept as the parity
    * reference for MinHashExprSpec. */
  def minhashSignatureHof(hashes: Column, num: Int): Column =
    array((0 until num).map(i => minhash(hashes, i)): _*)

  /** LSH band key: hash of `rows` consecutive signature positions.
    * Signature array is 1-indexed for `slice`. */
  def lshBand(signature: Column, band: Int, rows: Int): Column =
    md5(concat_ws("|", slice(signature, band * rows + 1, rows)))

  /** First 16 bits of md5 as a long (0..65535) — the per-token hash used by
    * the 16-bit SimHash gate query. Exactly mirrors the oracle's
    * strpos-arithmetic on the same hex characters. */
  def md5Bits16(s: Column): Column =
    conv(substring(md5(s), 1, 4), 16, 10).cast("long")

  /** Vectorized [[md5Bits16]] over a string array — native
    * graft_hash16_arr (see [[hash32Array]] for why). */
  def hash16Array(arr: Column): Column =
    call_function("graft_hash16_arr", arr)

  /** 48-bit md5-prefix hash (first 12 hex chars), the SimHash near-dup
    * JOIN fingerprint width — wide enough that a hamming<=3 match is
    * evidence of shared content, not hash noise (random-pair collision
    * P ~ 1.8e4 / 2^48), where 16 bits is only an audit fingerprint. */
  def hash48(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Vectorized [[hash48]] over a string array — native graft_hash48_arr. */
  def hash48Array(arr: Column): Column =
    call_function("graft_hash48_arr", arr)

  /** Native 48-bit SimHash over a pre-hashed token array — one pass over
    * all 48 bit-counters (graft_simhash48), same kernel family as q36's
    * graft_simhash16. */
  def simhash48(hashes: Column): Column =
    call_function("graft_simhash48", hashes)

  /** Fused `hash32Array(array_distinct(wordShingles(toks, n)))` — native
    * graft_shingle_hash32: window, join, first-occurrence string dedup and
    * md5 prefix in one pass (ShingleHash32Expr). The shingle-table build's
    * dominant cost was the interpreted per-shingle concat_ws/slice tree. */
  def shingleHash32(toks: Column, n: Int): Column =
    call_function("graft_shingle_hash32", toks, lit(n))

  /** Injective int encoding of an ASCII ≤3-gram: c1·2^16 + c2·2^8 + c3
    * (missing tail chars encode as 0 — `ascii('')` is 0 on both engines).
    * Pure arithmetic, no hash: packed-set Jaccard IS trigram Jaccard. */
  def packTrigram(x: Column): Column =
    (ascii(substring(x, 1, 1)) * 65536 +
     ascii(substring(x, 2, 1)) * 256 +
     ascii(substring(x, 3, 1))).cast("long")

  /** BPE-ish token count: word / number / single-other-symbol pieces. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Small per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny: language ID here is a
    * frequency heuristic, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh" -> Seq("de", "le", "shi", "zai", "you", "wo", "ta", "men"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    call_function("graft_word_hits", toks, array(words.map(lit): _*))

  /** The HOF formulation graft_word_hits replaces — kept as the parity
    * reference (WordHitsParitySpec). */
  def stopwordHitsHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
}

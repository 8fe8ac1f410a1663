package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text hashing primitives used by the
  * dedup/similarity operators (the LLM-data-pipeline extensions on top of
  * the reference — SURVEY.md §7.6).
  *
  * Everything here is a pure Column expression (whole-stage codegen, no
  * UDFs) AND reproducible bit-for-bit in ANSI-ish SQL, so every operator
  * built on it stays oracle-checkable in DuckDB:
  *   Spark  cast(conv(substring(md5(s),1,15),16,10) as bigint)
  *   DuckDB ('0x' || substr(md5(s),1,15))::bigint
  * 15 hex chars = 60 bits, comfortably inside int64.
  */
object TextHash {

  /** Whitespace tokenization of trimmed text (multi-space safe). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Portable 60-bit hash of a string column; `seed` varies the function
    * family (h_k(s) = H(s || "#k")) for MinHash. */
  def portableHash(s: Column, seed: Int = -1): Column = {
    val keyed = if (seed < 0) s else concat(s, lit(s"#$seed"))
    conv(substring(md5(keyed), 1, 15), 16, 10).cast("bigint")
  }

  /** Normalized content key for exact dedup: lower + whitespace-collapse,
    * then md5 (grouping on a 32-char key instead of full text keeps the
    * dedup shuffle narrow at 100 TB). */
  def contentKey(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** n-token shingles of a token array (caller guarantees size(tok) >= n).
    * tok must be a column named expression usable inside `expr`. */
  def shingles(tokCol: String, n: Int = 3): Column = {
    val parts = (0 until n).map(j => s"$tokCol[i + $j]").mkString(", ")
    expr(s"transform(sequence(0, size($tokCol) - $n), i -> concat_ws(' ', $parts))")
  }

  /** 32-bit portable hash array of a shingle array column — the ONE md5
    * pass per shingle; all k MinHash functions derive from it
    * arithmetically (universal hashing), so the expensive hashing is never
    * re-expanded by projection collapse. */
  def shingleHashes(shCol: String): Column =
    expr(s"transform($shCol, x -> pmod(cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint), 4294967296))")

  /** MinHash parameters: h_k(x) = (a_k*x + b_k) mod p over 32-bit inputs;
    * products stay < 2^60, exactly reproducible in int64 SQL. The base
    * constants are THE single source for every surface (typed operators,
    * SQL registration, oracle builders) — duplicating them would let the
    * hash family silently desynchronize. */
  val minhashP = 4294967291L // largest 32-bit prime
  val minhashABase = 15485863L
  val minhashBBase = 32452843L
  def minhashA(k: Int): Long = minhashABase * (k + 1)
  def minhashB(k: Int): Long = minhashBBase * k

  /** MinHash signature: array of k minima of universal-hash permutations
    * of the precomputed 32-bit shingle-hash array (arithmetic only — no
    * md5 re-evaluation even when Catalyst collapses projections). */
  def minhashSignature(hashArrCol: String, k: Int): Column = {
    val mins = (0 until k).map { s =>
      s"array_min(transform($hashArrCol, h -> pmod(h * ${minhashA(s)}L + ${minhashB(s)}L, ${minhashP}L)))"
    }
    expr(s"array(${mins.mkString(", ")})")
  }

  /** LSH banding of a minhash signature column: array of structs
    * (band, bh) where bh = md5 of the band's signature slice. Banded
    * bucketing is what keeps near-dup search a bucket-join instead of an
    * all-pairs cross product at scale. */
  def lshBands(sigCol: String, bands: Int, rowsPerBand: Int): Column = {
    val entries = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => s"$sigCol[${b * rowsPerBand + r}]").mkString(", ")
      s"struct($b as band, md5(concat_ws(',', $slice)) as bh)"
    }
    expr(s"array(${entries.mkString(", ")})")
  }

  /** SimHash fingerprint (`bits` wide) over a precomputed token-hash array
    * column: bit k is set iff the majority of token hashes have bit k set.
    * Single pass per bit over the in-row array — no shuffle. */
  def simhash(hashArrCol: String, bits: Int): Column =
    (0 until bits).map { k =>
      val vote = expr(
        s"aggregate($hashArrCol, cast(0 as bigint), " +
          s"(acc, h) -> acc + (CASE WHEN (shiftright(h, $k) & 1) = 1 THEN 1 ELSE -1 END))")
      when(vote > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
}

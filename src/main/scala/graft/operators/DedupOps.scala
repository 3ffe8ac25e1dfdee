package graft.operators

import graft.functions.Text
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication primitives for LLM-data pipelines, as pure Column
  * expressions (codegen'd, shuffle-free until the final group/join):
  *
  *  - exact:    md5 over raw or token-normalized text -> groupBy
  *  - MinHash:  word-shingles -> k seeded min-hashes -> LSH band keys;
  *              candidate pairs come from a single shuffle on band key
  *              (no O(n^2) compare — the scale path for 100 TB corpora)
  *  - SimHash:  per-token hash bit votes -> 16-bit locality hash
  *  - n-gram Jaccard: exact set overlap for candidate verification
  *
  * Hash function choice: md5 (not Spark's murmur/xxhash) so signatures
  * are reproducible in any engine — the DuckDB oracle recomputes them
  * bit-for-bit. For a pure-Spark production run, swapping md5 for
  * xxhash64 is a one-line change and ~3x faster; semantics identical.
  */
object DedupOps {

  /** Canonical content fingerprint: md5 of the lowercased token stream
    * (whitespace/punct-insensitive, case-insensitive). Canonical form is
    * separator-runs -> single space + trim, which equals the tokens
    * joined by spaces — one codegen'd regexp pass, no array
    * materialization (the HOF token-array formulation is interpreted).
    */
  def fingerprint(textCol: Column): Column =
    md5(trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " ")).cast("binary"))

  /** Distinct word n-shingles of a text column (MinHash input sets). */
  def shingles(textCol: Column, n: Int = 3): Column =
    array_distinct(Text.ngrams(Text.tokensLower(textCol), n))

  /** MinHash signatures, computed with ONE md5 per (doc, shingle) and k
    * universal integer hashes g_i = h1 + i*h2 derived from the digest
    * (h1, h2 are 48-bit, so g_i < 2^52 — exact in long on any engine).
    * Shape: explode shingles -> hash -> single hash-agg of k `min`s per
    * doc. One shuffle on doc id; k-fold cheaper than per-seed md5 and
    * immune to expression re-inlining blowup.
    *
    * Returns (idCol, sig: array<long>[k]); docs with no shingles drop.
    */
  def minhashSignatures(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: Column, n: Int = 3, k: Int = 16): org.apache.spark.sql.DataFrame = {
    // Fused generator: lowercased text -> (h1, h2) per n-gram shingle,
    // one digest each, no intermediate arrays (see ShingleHashes).
    // Duplicate shingles need no dedup: MIN is idempotent over them.
    val hashed = df.select(col(idCol),
      graft.functions.ShingleHashes
        .shingleHashes(df.sparkSession, lower(textCol), n).as(Seq("h1", "h2")))
    val mins = (0 until k).map(i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"_m$i"))
    hashed.groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** LSH band keys: split the k-signature into `bands` groups of
    * `rowsPer`; the group's joined values are the bucket key. Docs
    * sharing ANY band key are candidate pairs.
    */
  def bandKeys(sigCol: Column, bands: Int, rowsPer: Int): Column =
    array((0 until bands).map { b =>
      array_join(slice(sigCol, b * rowsPer + 1, rowsPer).cast("array<string>"), "|")
    }: _*)

  /** Estimated Jaccard from two k-signatures: matching fraction.
    * Unrolled to k element_at comparisons — Spark's array HOFs
    * (aggregate/zip_with) are CodegenFallback, and on millions of
    * candidate pairs the interpreted fold dominated the profile; the
    * unrolled form stays inside whole-stage codegen.
    */
  def estJaccard(a: Column, b: Column, k: Int): Column =
    (1 to k).map(i => when(element_at(a, i) === element_at(b, i), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k.toDouble

  /** Exact Jaccard similarity of two pre-deduplicated string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Cosine similarity of two float-array embeddings, computed in
    * double with left-to-right accumulation; `*1e6` integer scaling at
    * call sites makes results engine-exact.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Cosine scaled to an exact integer (1e-6 resolution). */
  def cosineScaled(a: Column, b: Column): Column =
    round(cosine(a, b) * 1e6).cast("long")
}

package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.Text
import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication query surface over `documents` / `embeddings`:
  * exact (hash groupBy), normalized fingerprint, MinHash+LSH candidate
  * pairs, n-gram Jaccard verification, SimHash, embedding-cosine.
  *
  * Scale shape: every variant is one map-side signature pass + ONE
  * shuffle (groupBy hash / band key / block key) + a bucket-local join.
  * Nothing here is O(n^2) in the corpus — the cross-products are
  * confined to LSH buckets / prefix blocks, which is what survives a
  * 100 TB corpus. At production scale the signature frame would be
  * persisted before the pair join; at test SF recomputation is cheaper.
  */
object Dedup extends QueryModule {

  private val K = 16 // minhash signature length
  private val BANDS = 4
  private val ROWS = 4 // rows per band; BANDS*ROWS == K

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- exact dedup over raw text (with injected duplicates) -------------
    "dedup_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // Inject one duplicate per 10 docs so the op has real work to do.
      val dups = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      docs.union(dups)
        .groupBy(md5(col("text").cast("binary")).as("text_hash"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash")
    }),

    // -- exact dedup on normalized content fingerprint --------------------
    "dedup_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(DedupOps.fingerprint(col("text")).as("fingerprint"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("fingerprint")),

    // -- minhash signatures (spot-checkable scalar projection) ------------
    "dedup_minhash_sig" -> ((s, d) =>
      DedupOps.minhashSignatures(
        Tables.documents(s, d), "doc_id", col("text"), 3, K)
        .select(
          col("doc_id"),
          element_at(col("sig"), 1).as("mh0"),
          md5(array_join(col("sig").cast("array<string>"), "|")
            .cast("binary")).as("sig_hash"))
        .orderBy("doc_id")),

    // -- MinHash + LSH candidate pairs with estimated Jaccard -------------
    // Pair generation is bucket-local: band keys -> ONE shuffle grouping
    // (doc, sig) per bucket -> in-bucket pair explosion. The signature
    // pipeline runs exactly once (a self-join would recompute it per
    // side), and the cross-product is bounded by bucket size — the only
    // O(n^2) anywhere is within an LSH collision bucket, which is the
    // whole point of banding. (Production guard for adversarial skew:
    // cap bucket size before exploding.)
    "dedup_minhash_pairs" -> ((s, d) => {
      val base = DedupOps.minhashSignatures(
        Tables.documents(s, d), "doc_id", col("text"), 3, K)
      val banded = base
        .select(col("doc_id"), col("sig"),
          posexplode(DedupOps.bandKeys(col("sig"), BANDS, ROWS)))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "bkey")
      val buckets = banded.groupBy("band", "bkey")
        .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ms"))
        .filter(size(col("ms")) > 1)
      // ordered index pairs (i < j) within each bucket
      val combos = flatten(transform(sequence(lit(0), size(col("ms")) - 2), i =>
        transform(sequence(i + 1, size(col("ms")) - 1), j =>
          struct(element_at(col("ms"), i + 1).as("x"),
            element_at(col("ms"), j + 1).as("y")))))
      val norm = when(col("p.x.doc_id") < col("p.y.doc_id"), col("p"))
        .otherwise(struct(col("p.y").as("x"), col("p.x").as("y")))
      buckets.select(explode(combos).as("p"))
        .select(norm.as("p"))
        .select(col("p.x.doc_id").as("a_id"), col("p.y.doc_id").as("b_id"),
          DedupOps.estJaccard(col("p.x.sig"), col("p.y.sig"), K).as("est_jaccard"))
        .distinct()
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("a_id", "b_id")
    }),

    // -- exact n-gram Jaccard over prefix-blocked candidates --------------
    "dedup_jaccard_pairs" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          array_distinct(Text.tokensLower(col("text"))).as("ts"),
          array_join(slice(Text.tokensLower(col("text")), 1, 3), " ").as("blk"))
      val a = t.select(col("doc_id").as("a_id"), col("ts").as("a_ts"), col("blk"))
      val b = t.select(col("doc_id").as("b_id"), col("ts").as("b_ts"), col("blk"))
      a.join(b, "blk")
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          DedupOps.jaccard(col("a_ts"), col("b_ts")).as("jac"))
        .filter(col("jac") >= 0.5)
        .orderBy("a_id", "b_id")
    }),

    // -- SimHash (16-bit votes over the low bits of a 60-bit md5 slice).
    //    One hex->long parse per token, then the 16 per-bit +-1 votes are
    //    pure long bitwise ops inside whole-stage codegen (the earlier
    //    per-hex-digit substr/instr formulation did 16 string ops per
    //    token and dominated the profile) ----------------------------------
    "dedup_simhash" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TokenizeExplode.tokenize(s, lower(col("text"))).as("tok"))
        // 15 hex chars = 60 bits: fits signed 64-bit in both engines
        .withColumn("h",
          conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10)
            .cast("long"))
      val bitSums = (1 to 16).map(j =>
        sum(shiftright(col("h"), j - 1).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$j"))
      val votes = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val simhash = (1 to 16)
        .map(j => when(col(s"b$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
        .reduce(_ + _)
      votes.select(col("doc_id"), simhash.as("simhash")).orderBy("doc_id")
    }),

    // -- embedding near-dup: top-20 within-label pairs by cosine ----------
    "dedup_embedding_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val a = e.select(col("vec_id").as("a_id"), col("label"),
        col("embedding").as("a_v"))
      val b = e.select(col("vec_id").as("b_id"), col("label"),
        col("embedding").as("b_v"))
      a.join(b, "label")
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("label"),
          graft.functions.Vectors.cosineScaled(s, col("a_v"), col("b_v")).as("icos_e6"))
        .orderBy(col("icos_e6").desc, col("a_id"), col("b_id"))
        .limit(20)
    })
  )

  // ---------- DuckDB oracle fragments (generated to mirror Spark) --------

  private val sqlToksL =
    "list_filter(string_split_regex(lower(text), '[^A-Za-z0-9]+'), t -> t <> '')"

  /** trigram shingles of a token-list expression named `t` */
  private def sqlShingles(t: String): String =
    s"list_distinct(CASE WHEN len($t) >= 3 THEN " +
      s"list_transform(range(1, len($t) - 1), i -> $t[i] || ' ' || $t[i+1] || ' ' || $t[i+2]) " +
      "ELSE [] END)"

  /** CTEs computing integer minhash signatures, mirroring
    * DedupOps.minhashSignatures: one md5 per (doc, shingle), two 48-bit
    * halves, k universal hashes h1 + i*h2, min per doc.
    * Yields a relation `sg(doc_id, sig)`.
    */
  private def sqlSigCtes: String = {
    val mins = (0 until K)
      .map(i => s"min(h1 + $i * h2)").mkString("[", ", ", "]")
    s"""sh AS (SELECT doc_id, unnest(${sqlShingles(sqlToksL)}) AS s FROM documents),
           hh AS (SELECT doc_id,
                         ('0x' || substr(md5(s), 1, 12))::BIGINT AS h1,
                         ('0x' || substr(md5(s), 13, 12))::BIGINT AS h2
                  FROM sh),
           sg AS (SELECT doc_id, $mins AS sig FROM hh GROUP BY doc_id)"""
  }

  override def oracles: Map[String, String] = Map(
    "dedup_exact" -> """
      WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
      SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(1) AS n_copies
      FROM all_docs
      GROUP BY 1
      ORDER BY text_hash""",

    "dedup_fingerprint" -> s"""
      SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
             min(doc_id) AS keeper, count(1) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY fingerprint""",

    "dedup_minhash_sig" -> s"""
      WITH $sqlSigCtes
      SELECT doc_id, sig[1] AS mh0,
             md5(array_to_string(sig, '|')) AS sig_hash
      FROM sg
      ORDER BY doc_id""",

    "dedup_minhash_pairs" -> s"""
      WITH $sqlSigCtes,
           bands AS (
             SELECT doc_id, sig, bb.b AS band,
                    array_to_string(list_slice(sig, bb.b * $ROWS + 1, bb.b * $ROWS + $ROWS), '|') AS bkey
             FROM sg CROSS JOIN (SELECT unnest(range(0, $BANDS)) AS b) bb),
           cand AS (
             SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                    a.sig AS a_sig, b.sig AS b_sig
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      SELECT a_id, b_id,
             list_aggregate(list_transform(range(1, ${K + 1}),
               i -> CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END), 'sum')::DOUBLE
               / $K.0 AS est_jaccard
      FROM cand
      WHERE list_aggregate(list_transform(range(1, ${K + 1}),
              i -> CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END), 'sum')::DOUBLE
              / $K.0 >= 0.5
      ORDER BY a_id, b_id""",

    "dedup_jaccard_pairs" -> s"""
      WITH t AS (
        SELECT doc_id, list_distinct($sqlToksL) AS ts,
               array_to_string(($sqlToksL)[1:3], ' ') AS blk
        FROM documents)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.ts, b.ts))::DOUBLE
               / len(list_distinct(a.ts || b.ts))::DOUBLE AS jac
      FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.ts, b.ts))::DOUBLE
              / len(list_distinct(a.ts || b.ts))::DOUBLE >= 0.5
      ORDER BY a_id, b_id""",

    "dedup_simhash" -> {
      val bitSums = (1 to 16).map(j =>
        s"sum((((h >> ${j - 1}) & 1) * 2 - 1)) AS b$j")
        .mkString(",\n               ")
      val hashExpr = (1 to 16).map(j =>
        s"(CASE WHEN b$j > 0 THEN ${1L << (j - 1)} ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH tok AS (
        SELECT doc_id, ('0x' || substr(md5(t.tok), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest($sqlToksL) AS tok FROM documents) t),
      votes AS (
        SELECT doc_id,
               $bitSums
        FROM tok GROUP BY doc_id)
      SELECT doc_id, ($hashExpr)::BIGINT AS simhash
      FROM votes
      ORDER BY doc_id"""
    },

    "dedup_embedding_topk" -> """
      WITH e AS (SELECT vec_id, label,
                        list_transform(embedding, x -> x::DOUBLE) AS v
                 FROM embeddings)
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
             round(list_cosine_similarity(a.v, b.v) * 1e6)::BIGINT AS icos_e6
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      ORDER BY icos_e6 DESC, a_id, b_id
      LIMIT 20"""
  )
}

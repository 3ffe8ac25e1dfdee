package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.Text
import graft.operators.WordCount
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own query surface (SURVEY.md §0, §2.1), generalized
  * from "one text file" to the `documents` table's `text` column:
  * tokenize -> count -> bytewise order. Tokenization contract is
  * reference-exact (graft.functions.Text, SURVEY §1.4).
  */
object Core extends QueryModule {

  /** DuckDB-side tokenizer equivalent to Text.tokens. */
  private val sqlTokens =
    "list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), t -> t <> '')"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The reference query itself over documents.text.
    "wordcount" -> ((s, d) =>
      WordCount.counts(Tables.documents(s, d), col("text"))),

    // Top-k variant (reference lacks limits; SURVEY §2.2 "extended").
    "wordcount_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(graft.functions.TokenizeExplode.tokenize(s, col("text")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)),

    // Grouped by document language (multi-key aggregation).
    "wordcount_by_lang" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), graft.functions.TokenizeExplode.tokenize(s, col("text")).as("word"))
        .groupBy("lang", "word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "word")),

    // Skew-safe two-phase aggregation (salting): when one key dominates
    // (think "the" at 100 TB), pre-aggregate on (key, salt) so no single
    // reducer owns a hot key, then merge. Same result as `wordcount` —
    // which is exactly what the shared oracle asserts.
    "wordcount_salted" -> ((s, d) =>
      Tables.documents(s, d)
        .select(graft.functions.TokenizeExplode.tokenize(s, col("text")).as("word"),
          spark_partition_id().as("salt"))
        .groupBy("word", "salt")
        .agg(count(lit(1)).as("c1"))
        .groupBy("word")
        .agg(sum("c1").as("cnt"))
        .orderBy("word"))
  )

  override def oracles: Map[String, String] = Map(
    "wordcount" -> s"""
      SELECT word, count(1) AS cnt
      FROM (SELECT unnest($sqlTokens) AS word FROM documents)
      GROUP BY word
      ORDER BY word""",

    "wordcount_topk" -> s"""
      SELECT word, count(1) AS cnt
      FROM (SELECT unnest($sqlTokens) AS word FROM documents)
      GROUP BY word
      ORDER BY cnt DESC, word
      LIMIT 20""",

    "wordcount_by_lang" -> s"""
      SELECT lang, word, count(1) AS cnt
      FROM (SELECT lang, unnest($sqlTokens) AS word FROM documents)
      GROUP BY lang, word
      ORDER BY lang, word""",

    "wordcount_salted" -> s"""
      SELECT word, count(1) AS cnt
      FROM (SELECT unnest($sqlTokens) AS word FROM documents)
      GROUP BY word
      ORDER BY word"""
  )
}

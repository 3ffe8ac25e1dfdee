package graft

import org.scalatest.funsuite.AnyFunSuite

/** txt_nb_quality: exact-score agreement between [[graft.queries
  * .TextAnalysis.nbQualityFrom]] and an OUT-OF-BAND pure-Scala
  * computation (its own lnDet mirror + hand-rolled count model — no
  * Spark, no DataFrame, no shared code path) on a seeded corpus whose
  * Gopher labels are known by construction.
  */
class NbQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // pure-Scala mirror of DetMath.lnColumn (same range reduction, same
  // Horner fold, same operation order — independent implementation)
  private def lnDet(x: Double): Double = {
    val m = math.floor(x).toLong
    val e = 63 - java.lang.Long.numberOfLeadingZeros(m)
    val y = x / (1L << e).toDouble
    val z = (y - 1.0) / (y + 1.0)
    val z2 = z * z
    val coefs = (3 to 25 by 2).map(d => 1.0 / d)
    val s = coefs.reverse.tail.foldLeft(coefs.last)((acc, c) => c + z2 * acc)
    e.toDouble * 0.6931471805599453 + (2.0 * z) * (1.0 + z2 * s)
  }
  private def lnMu(a: Long, b: Long): Long =
    math.round((lnDet(a.toDouble) - lnDet(b.toDouble)) * 1e6)

  private val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")

  private def gopherPass(t: Seq[String]): Boolean = {
    val n = t.size
    val alpha = t.count(_.exists(_.isLetter))
    val chars = t.map(_.length).sum.toLong
    n >= 50 && n <= 100000 && chars >= n * 3L && chars <= n * 10L &&
      alpha * 5 >= n * 4 && t.count(stop) >= 2
  }

  test("NB scores match the out-of-band computation exactly") {
    import spark.implicits._
    // two passing docs (60 tokens, stopword-rich, all-alpha) and two
    // failing ones (far under the 50-token floor)
    val corpus: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq.fill(10)(Seq("the", "quick", "brown", "fox", "jumps",
        "over")).flatten,
      2L -> Seq.fill(10)(Seq("a", "lazy", "dog", "sits", "in",
        "grass")).flatten,
      3L -> Seq("spam", "spam", "buy", "now"),
      4L -> Seq("click", "here", "cheap", "deal", "now", "buy"))
    // ---- out-of-band model (plain collections) ----
    val labels = corpus.map { case (id, t) => id -> gopherPass(t) }.toMap
    assert(labels(1L) && labels(2L) && !labels(3L) && !labels(4L))
    val tf = corpus.flatMap { case (id, t) =>
      t.groupBy(identity).map { case (w, o) => (id, w, o.size.toLong) }
    }
    val cp = tf.filter(r => labels(r._1)).groupBy(_._2)
      .view.mapValues(_.map(_._3).sum).toMap.withDefaultValue(0L)
    val cn = tf.filterNot(r => labels(r._1)).groupBy(_._2)
      .view.mapValues(_.map(_._3).sum).toMap.withDefaultValue(0L)
    val vocab = tf.map(_._2).distinct
    val (tp, tn, v) = (cp.values.sum, cn.values.sum, vocab.size.toLong)
    val llr = vocab.map(w =>
      w -> lnMu((cp(w) + 1) * (tn + v), (cn(w) + 1) * (tp + v))).toMap
    val nPos = labels.values.count(identity).toLong
    val prior = lnMu(nPos + 1, labels.size - nPos + 1)
    val expected = corpus.map { case (id, t) =>
      val terms = t.groupBy(identity)
      val score = prior + terms.map { case (w, o) => o.size * llr(w) }.sum
      (id, terms.size.toLong, score, score > 0, labels(id))
    }
    // ---- the engine ----
    val df = corpus.map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.nbQualityFrom(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    assert(got == expected,
      s"engine scores $got differ from out-of-band $expected")
    // the two failing docs share no vocabulary with the passing ones,
    // so the model must separate the classes on this corpus
    assert(got.forall(r => r._4 == r._5))
  }

  test("registry query scores every doc and both classes appear") {
    val rows = SparkEntry.queries("txt_nb_quality")(
      spark, TestSpark.sf0001).collect()
    assert(rows.length == 500)
    val passes = rows.count(_.getBoolean(3))
    assert(passes > 0 && passes < rows.length,
      s"degenerate classifier: $passes/${rows.length} predicted pass")
  }
}

package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** TF-IDF ranking, vocabulary stats, and PII redaction. Exact value parity
  * lives in the DuckDB oracles; these are the semantic contracts.
  */
class TextRelevanceSpec extends SparkSpecBase {

  test("tfidfTopK ranks rarer terms above commoner ones at equal tf") {
    val top = TextAnalysis.tfidfTopK(spark, Sf, k = 3).cache()
    assert(top.filter(col("rnk") < 1 || col("rnk") > 3).count() == 0)
    // at most k rows per doc, ranks dense from 1
    val badDocs = top.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"), min(col("rnk")).as("mn"))
      .filter(col("n") > 3 || col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(badDocs == 0)
    // within a doc, scores are non-increasing with rank; a term with the
    // same tf but strictly larger df can never outrank one with smaller df
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rnk")
    val nonMonotone = top
      .withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev")).count()
    assert(nonMonotone == 0, "score must be non-increasing in rank")
    top.unpersist()
  }

  test("tfidfTopK score definition: tf * N / df on a hand-built corpus") {
    // df("common") = 2, df("rare") = 1, N = 2
    import spark.implicits._
    val docs = Seq((1L, "common rare common"), (2L, "common x"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("tfidf_fixture")
    // inline the operator's core over the fixture rather than testdata
    val terms = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("doc_id"), lower(col("t")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score", col("tf").cast("double") * lit(2) / col("df"))
      .collect().map(r => (r.getLong(1), r.getString(0)) -> r.getDouble(4)).toMap
    assert(scored((1L, "common")) == 2.0) // tf=2 * 2 / df=2
    assert(scored((1L, "rare")) == 2.0)   // tf=1 * 2 / df=1
    assert(scored((2L, "x")) == 2.0)
    assert(scored((2L, "common")) == 1.0)
  }

  test("vocabTopK returns frequency-ordered terms with document frequencies") {
    val v = TextAnalysis.vocabTopK(spark, Sf, k = 10).collect()
    assert(v.nonEmpty && v.length <= 10)
    val occ = v.map(_.getLong(1))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b }, "ordered by count desc")
    assert(v.forall(r => r.getLong(2) <= r.getLong(1)), "n_docs <= n_occurrences")
  }

  test("cmsTokenTopK: estimates never undercount and equal exact sans collisions") {
    val got = TextAnalysis.cmsTokenTopK(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    // the defining CMS property: min-of-counters can only overcount
    got.foreach { case (tok, exact, cms) =>
      assert(cms >= exact, s"$tok: CMS $cms under exact $exact") }
    // at w=1024 with this vocabulary, most tokens should probe a clean bucket
    assert(got.count { case (_, e, c) => c == e } >= got.length / 2,
      "collision rate implausibly high for the sketch width")
  }

  test("unigramScore equals a driver-side reimplementation and orders common above rare") {
    val got = TextAnalysis.unigramScore(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent reimplementation on collected rows
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim)
      .collect { case (id, t) if t.nonEmpty => id -> t.split("\\s+").toSeq }
    val dfreq = docs.flatMap { case (id, toks) => toks.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = docs.map { case (id, toks) =>
      val sumDf = toks.map(dfreq).sum
      id -> ((toks.length.toLong, sumDf, sumDf.toDouble / toks.length))
    }.toMap
    assert(got == expected)
    // a doc of corpus-common words must outscore one of singleton words
    assert(got.nonEmpty && got.values.map(_._3).max > got.values.map(_._3).min)
  }

  test("piiRedact masks emails and IPv4s and counts them") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at alice.smith+test@sub.example.org thanks"),
      (2L, "server 192.168.0.1 and 10.0.0.255 are down"),
      (3L, "both bob@x.io from 172.16.4.2"),
      (4L, "clean text, no pii; not-an-ip 1.2.3 and a@b only"),
      (5L, ""),
      (6L, "mail bob@10.1.2.3.io or ping 10.1.2.3")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getString(3) == "reach me at <EMAIL> thanks")
    assert(out(2L).getLong(2) == 2 && out(2L).getString(3) == "server <IP> and <IP> are down")
    assert(out(3L).getLong(1) == 1 && out(3L).getLong(2) == 1 &&
      out(3L).getString(3) == "both <EMAIL> from <IP>")
    // "a@b" has no dot-TLD; "1.2.3" has only three octets — neither matches
    assert(out(4L).getLong(1) == 0 && out(4L).getLong(2) == 0 &&
      out(4L).getString(3) == "clean text, no pii; not-an-ip 1.2.3 and a@b only")
    assert(out(5L).getLong(1) == 0 && out(5L).getLong(2) == 0 && out(5L).getString(3) == "")
    // the dotted quad inside the email's matched span is consumed by the
    // email mask — n_ipv4 counts post-email-redaction, so it sees only the
    // free-standing IP and the counts reconcile with clean_text's tokens
    assert(out(6L).getLong(1) == 1 && out(6L).getLong(2) == 1 &&
      out(6L).getString(3) == "mail <EMAIL> or ping <IP>")
  }

  test("bigramFluency: formulaic text outscores unique-bigram text; short docs are null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"), // every bigram repeats
      (2L, "quick brown foxes jump over lazy dogs"), // all bigrams unique
      (3L, "one")                                    // no bigrams at all
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramFluencyOf(docs).collect()
      .map(row => row.getLong(0) ->
        (row.getLong(1), if (row.isNullAt(2)) None else Some(row.getDouble(2))))
      .toMap
    assert(r(1L)._1 == 8L && r(2L)._1 == 6L && r(3L) == ((0L, None)))
    assert(r(1L)._2.get > r(2L)._2.get,
      s"repeated bigrams must score higher: $r")
    // probabilities: every term in (0, 1]
    assert(r(1L)._2.get > 0 && r(1L)._2.get <= 1.0)
  }

  test("booleanSearch returns exactly the docs containing ALL query terms") {
    val terms = Seq("vector", "merge")
    val got = TextAnalysis.booleanSearch(spark, Sf, terms)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // independent formulation: per-doc token-set containment
    val expected = Tables.documents(spark, Sf)
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("t"))
      .filter(terms.map(t => array_contains(col("t"), t)).reduce(_ && _))
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "test terms must match at sf0.001")
    assert(got == expected)
  }

  test("substringSearch: trigram candidates prune hard yet lose no match") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), lower(col("text")).as("t"))
    val corpus = docs.count()
    val tris = "hash join".sliding(3).toSeq.distinct
    val cand = TextAnalysis.substringCandidates(docs, tris)
      .collect().map(_.getLong(0)).toSet
    val verified = TextAnalysis.substringSearch(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = docs.filter(instr(col("t"), "hash join") > 0)
      .select(col("doc_id"), instr(col("t"), "hash join").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(direct.nonEmpty, "pattern must match at sf0.001")
    assert(verified == direct, "index path diverged from the direct scan")
    assert(direct.keySet.subsetOf(cand), "pruning lost a true match")
    assert(cand.size < corpus / 2,
      s"trigram pruning kept ${cand.size} of $corpus docs — no selectivity")
  }

  test("bm25Search: disjunctive match, descending scores, k-bounded") {
    val rows = TextAnalysis.bm25Search(spark, Sf, k = 20).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b },
      "scores must be non-increasing in rank order")
    // every returned doc contains at least one query term (OR semantics)
    val ids = rows.map(_.getLong(0)).toSet
    val matching = Tables.documents(spark, Sf)
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("t"))
      .filter(array_contains(col("t"), "vector") || array_contains(col("t"), "merge"))
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(matching))
  }
}

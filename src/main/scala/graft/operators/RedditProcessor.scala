package graft.operators

import graft.functions.TextClean
import graft.plans.VaderExpr
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, StopWordsRemover, Tokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's batch analytics entry point on reddit-shaped frames —
  * SURVEY.md §3.3 (redditProcessor.py:56-156) end to end:
  *
  *   coffee filter (F1) → projections (P1/P2) → text concat/rename (X6/X7) →
  *   union (U1) → chronological sort (O1) → clean (D2) → VADER (D1) →
  *   TF-IDF (A1) → LDA k=20 seed=42 (A2/D4) → top-10 topic words (O4) →
  *   batch-id stamp (X9) and composite row ids (X12).
  *
  * Input schemas are the declared §1.2 shapes
  * ([[graft.streaming.QueuePipeline.postSchema]] / commentSchema). Returns
  * (analysis, topics) — the two ES-index-shaped outputs.
  *
  * Design deltas from the reference, all deliberate (SURVEY §7.4):
  * `topicDistribution` stays attached through `transform` (the pandas
  * positional zip-join J1 has no distributed analog and is not needed);
  * `concat_ws` + coalesce reproduces pandas' NaN-propagation observable
  * behavior; row ids come from `row_number` over the explicit (created_utc,
  * id) total order rather than an implicit frame index.
  */
object RedditProcessor {

  private val K = 20
  private val Seed = 42L

  /** F1 — the ES multi_match "coffee" semantics: the ES standard analyzer
    * lowercases AND strips punctuation before tokenizing, so "Coffee," must
    * match — punctuation becomes a token break before the split. */
  private def coffeeMatch(cols: Seq[org.apache.spark.sql.Column]) =
    array_contains(
      split(regexp_replace(
        lower(concat_ws(" ", cols.map(c => coalesce(c, lit(""))): _*)),
        TextClean.PunctRe, " "), "\\s+"),
      "coffee")

  /** The §3.3 pipeline. Returns (analysis, topics). */
  def analyze(spark: SparkSession, posts: DataFrame, comments: DataFrame,
              batchId: String): (DataFrame, DataFrame) = {
    VaderExpr.register(spark)

    val p = posts
      .where(coffeeMatch(Seq(col("title"), col("selftext"))))
      .select(col("id"), col("created_utc"), col("subreddit"), col("score"),
        concat_ws(" ", coalesce(col("title"), lit("")), coalesce(col("selftext"), lit("")))
          .as("text"))
    val c = comments
      .where(coffeeMatch(Seq(col("body"))))
      .select(col("p_id").as("id"), col("created_utc"), col("subreddit"),
        col("score"), col("body").as("text"))

    val corpus = p.unionByName(c)
      .orderBy(col("created_utc"), col("id"))
      .withColumn("text", TextClean.clean(col("text")))
      .withColumn("sentiment_score", VaderExpr.vaderCompound(col("text")))
      .withColumn("sentiment",
        when(col("sentiment_score") > 0.05, "positive")
          .when(col("sentiment_score") < -0.05, "negative")
          .otherwise("neutral"))

    // The corpus (scan → filter → union → sort → clean → VADER) is consumed
    // by CountVectorizer.fit, IDF.fit, the LDA fit and the final transform;
    // without a persist each pass re-runs the regex chain and VADER scorer
    // over every row. maxDF is passed in fraction form (< 1.0 means a
    // fraction of the doc count) so no eager count() is needed to size it.
    corpus.persist()
    try {
      val pipeline = new Pipeline().setStages(Array(
        new Tokenizer().setInputCol("text").setOutputCol("raw_tokens"),
        new StopWordsRemover().setInputCol("raw_tokens").setOutputCol("tokens"),
        new CountVectorizer().setInputCol("tokens").setOutputCol("tf")
          .setMinDF(2.0).setMaxDF(0.95),
        new IDF().setInputCol("tf").setOutputCol("features")))
      val fm = pipeline.fit(corpus)
      // Degenerate-corpus guard: an empty vocabulary (every term pruned by
      // minDF/maxDF — e.g. one shared word across all docs falls to maxDF)
      // aborts deep inside the ML stage with an opaque "requirement failed".
      // Diagnose it here; the reference crashes identically (sklearn raises
      // on an empty vocabulary).
      val vocabSize = fm.stages(2).asInstanceOf[CountVectorizerModel].vocabulary.length
      require(vocabSize >= 1,
        s"corpus too small for topic modeling: vocabulary=$vocabSize after minDF/maxDF pruning")
      // Online variational Bayes — see Analytics.fitLdaUncached for the
      // scale rationale (EM's GraphX doc-term state vs streamed mini-batches)
      // and the sklearn-family-parity argument.
      val lda = new LDA().setK(K).setSeed(Seed).setOptimizer("online").setMaxIter(10)
        .setFeaturesCol("features")
      val vecs = fm.transform(corpus)
      val model = lda.fit(vecs)

      val withTopics = model.transform(vecs)
        .withColumn("t", vector_to_array(col("topicDistribution")))
      val topicCols = (0 until K).map(i => col("t")(i).as(s"topic_${i + 1}"))
      // (created_utc, id) is NOT total for comments — they inherit the parent
      // post's id, so two comments on one post in the same second tie. Extend
      // the order with the payload columns; remaining ties are fully identical
      // rows, for which any row_id assignment yields the same output set.
      // The index itself comes from GlobalIndex (per-partition row_number +
      // range-partition offsets) so no stage funnels the corpus through a
      // single task — the round-1 plan audit's only non-distributed stage.
      val analysis = graft.plans.GlobalIndex.withRowIndex(
        withTopics.select(
          col("id") +: col("created_utc") +: col("subreddit") +: col("score") +:
            col("text") +: col("sentiment_score") +: col("sentiment") +: topicCols: _*),
        Seq(col("created_utc"), col("id"), col("text"), col("score"), col("subreddit")),
        "__idx")
        .withColumn("row_id", concat_ws("_", col("__idx"), lit(batchId)))
        .withColumn("batch_id", lit(batchId))
        .drop("__idx")

      val vocab = fm.stages(2).asInstanceOf[CountVectorizerModel].vocabulary
      val vocabCol = array(vocab.map(lit).toSeq: _*)
      val topics = model.describeTopics(10)
        .withColumn("words",
          concat_ws(" ", transform(col("termIndices"), i => element_at(vocabCol, i + 1))))
        .select(
          concat_ws(": ", concat(lit("topic_"), col("topic") + 1), col("words")).as("topic_name"),
          (col("topic") + 1).as("topic"),
          lit(batchId).as("batch_id"))
        .orderBy("topic")

      (analysis, topics)
    // The eager multi-pass phase (the two fits) is over. The returned frames
    // are lazy: each ACTION a caller takes on them recomputes the corpus
    // chain (clean + VADER + transform) once — a caller that runs several
    // actions (as StreamDemo does) should persist the frames around its own
    // consumption. We release here anyway: pinning the blocks for an
    // unbounded caller lifetime is the worse default, and the finally also
    // covers the failure paths (a fit throwing, the empty-vocabulary
    // require) that would otherwise leak the cache for the session.
    } finally corpus.unpersist()
  }
}

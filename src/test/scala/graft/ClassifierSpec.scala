package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** NB log-odds classifier semantics: learns a word-separable signal from
  * hashed features, scores unseen docs correctly, smooths unseen dims,
  * and stays bit-deterministic across repartitionings.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // toy corpus: "good"-family docs contain happy tokens, "bad" ones sad
  // tokens; doc 7/8 are held out of training.
  private val corpus = Seq(
    (1L, "great excellent wonderful great", true),
    (2L, "great superb excellent nice", true),
    (3L, "awful terrible bad awful", false),
    (4L, "bad horrid terrible poor", false),
    (5L, "excellent nice wonderful", true),
    (6L, "poor awful horrid", false),
    (7L, "wonderful superb nice great", true),   // holdout +
    (8L, "terrible poor bad horrid", false)      // holdout −
  ).toDF("doc_id", "text", "label")

  private def feats = corpus
    .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    .select(col("doc_id"),
            (abs(xxhash64(col("tok"))) % 16).as("dim"))
    .groupBy("doc_id", "dim").agg(count(lit(1)).as("n_hits"))

  test("fit on the train slice separates holdout docs by word signal") {
    val out = Classifier.nbLogOddsScore(
      corpus.select("doc_id"), feats,
      corpus.select(col("doc_id"), col("label")),
      corpus.filter(col("doc_id") <= 6).select("doc_id"), dims = 16)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(2))).toMap
    val expected = Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
                       5L -> true, 6L -> false, 7L -> true, 8L -> false)
    for (id <- 1L to 8L) {
      val (pred, inTrain) = out(id)
      assert(pred === expected(id), s"doc $id misclassified")
      assert(inTrain === (id <= 6))
    }
  }

  test("scores are identical under repartitioning (integer fold, no order)") {
    def score(parts: Int): Map[Long, Long] =
      Classifier.nbLogOddsScore(
        corpus.select("doc_id").repartition(parts), feats.repartition(parts),
        corpus.select(col("doc_id"), col("label")),
        corpus.filter(col("doc_id") <= 6).select("doc_id"), dims = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(score(1) === score(7))
  }
}

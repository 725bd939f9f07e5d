package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the algorithmic operators. Few cases (Spark
  * jobs per case), but randomized where the math has sharp edges: the
  * AllPairs prefix length ⌈t·|S|⌉ boundary, decimal-exact aggregation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Drive a Gen with fixed seeds (no scalatest-scalacheck bridge in the
    * offline dependency set) — deterministic, 5 cases per property.
    */
  private def forSeeds[A](gen: Gen[A], seeds: Seq[Long] = Seq(1L, 2L, 3L, 4L, 5L))(f: A => Unit): Unit =
    seeds.foreach { sd =>
      f(gen.pureApply(Gen.Parameters.default, Seed(sd)))
    }

  private val corpusGen: Gen[(Seq[(Long, String)], Double)] = for {
    vocab     <- Gen.choose(5, 12)
    nDocs     <- Gen.choose(8, 25)
    threshold <- Gen.oneOf(0.3, 0.5, 0.7, 0.9)
    docs <- Gen.sequence[Seq[(Long, String)], (Long, String)]((0 until nDocs).map { i =>
      for {
        len  <- Gen.choose(3, 12)
        toks <- Gen.listOfN(len, Gen.choose(0, vocab - 1).map(v => s"w$v"))
      } yield (i.toLong, toks.mkString(" "))
    })
  } yield (docs, threshold)

  test("prefix-filtered jaccard ≡ naive all-pairs for random corpora and thresholds") {
    forSeeds(corpusGen) { case (docs, threshold) =>
      val df = docs.toDF("doc_id", "text")
      val smart = Dedup.jaccardPairs(df, "doc_id", "text", threshold)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = Dedup.shingled(df, "doc_id", "text")
      val naive = sh.alias("a").crossJoin(sh.alias("b"))
        .filter(col("a.doc_id") < col("b.doc_id") && col("a.n_shingles") > 0)
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          (size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
            (col("a.n_shingles") + col("b.n_shingles") -
              size(array_intersect(col("a.shingles"), col("b.shingles")))).cast("double"))
            .as("j"))
        .filter(col("j") >= threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(smart == naive, s"threshold=$threshold docs=${docs.size}")
    }
  }

  test("exact decimal sums equal plain double sums within 1e-9 on 2-decimal data") {
    forSeeds(Gen.listOfN(200, Gen.choose(0, 5000000).map(_ / 100.0))) { xs =>
      {
        val df  = xs.toDF("v")
        val row = df.agg(
          graft.functions.Exact.sumExact(col("v")).as("exact"),
          sum(col("v")).as("plain")).head
        assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-6)
      }
    }
  }
}

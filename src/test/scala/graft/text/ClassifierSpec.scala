package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained x72 quality classifier: training behavior, bit-reproducibility,
  * and the committed artifact's calibration signal — the monotone x84
  * gate the r12 stand-in weights could not produce (PLANS.md recorded
  * that table flat at ~0.46–0.49). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def tinyFixture = Seq(
    // clean English-ish prose (label 1)
    (1L, "the table of values and the index of keys lead to a fast scan in the engine", 1),
    (2L, "a merge of sorted runs and a hash of the keys keep the query plan simple and fast", 1),
    (3L, "the planner picks a broadcast join and the executor streams rows to the sink in order", 1),
    // junk (label 0)
    (4L, "click here subscribe now free offer limited deal best price order today " * 3, 0),
    (5L, "### $$$ ... 000 " * 5, 0),
    (6L, "42 404 503 12345 99 " * 4, 0)
  ).toDF("doc_id", "text", "label")

  test("train: separates a tiny labeled fixture; weights are bit-reproducible") {
    val w1 = Classifier.train(tinyFixture, dim = 256, maxEpochs = 20)
    val w2 = Classifier.train(tinyFixture.repartition(7), dim = 256, maxEpochs = 20)
    // order-free integer training: identical weights under any partitioning
    assert(w1.toSeq === w2.toSeq)
    val scored = TextOps.classifierScore(tinyFixture, col("doc_id"), col("text"), w1)
      .join(tinyFixture.select("doc_id", "label"), "doc_id")
      .select("label", "keep").collect()
    scored.foreach { r =>
      assert(r.getBoolean(1) === (r.getInt(0) == 1),
        s"label ${r.getInt(0)} misclassified")
    }
  }

  test("train: NB init alone already orients junk negative (polish-free path)") {
    val w = Classifier.train(tinyFixture, dim = 256, maxEpochs = 0)
    val s = TextOps.classifierScore(tinyFixture, col("doc_id"), col("text"), w)
      .join(tinyFixture.select("doc_id", "label"), "doc_id")
      .groupBy("label").agg(avg("score").as("m")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(s(1) > s(0), s"NB means not ordered: ${s(1)} <= ${s(0)}")
  }

  test("committed artifact generalizes: monotone calibration on HELD-OUT sf0.001 docs") {
    // weights were trained on the sf0.01 fixture; sf0.001 documents are a
    // disjoint draw from the same generator — a real held-out check
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Classifier.loadWeights(spark)
    assert(w.length === Classifier.Dim)
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(
      Classifier.junkCorpus(docs, col("doc_id"), col("text")))
    val table = TextOps.signalAgreement(
        TextOps.classifierScore(corpus, col("doc_id"), col("text"), w)
          .select("doc_id", "score"),
        TextOps.gopherFlags(corpus, col("doc_id"), col("text"))
          .select("doc_id", "passes"))
      .orderBy("score_bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(table.nonEmpty)
    // THE x84 gate: pass rate non-decreasing in score bin — the trained
    // model ranks quality consistently with the rules it bootstrapped from
    table.sliding(2).foreach {
      case Array((b1, _, r1), (b2, _, r2)) =>
        assert(r2 >= r1, s"calibration not monotone: bin $b1 rate $r1 > bin $b2 rate $r2")
      case _ =>
    }
    // and it carries SIGNAL, not a constant: both extremes are populated
    assert(table.head._3 === 0.0 && table.last._3 === 1.0,
      s"expected a 0-rate low bin and a 1-rate high bin, got ${table.toSeq}")
    assert(table.map(_._2).sum === corpus.count())
  }

  test("committed artifact generalizes: junk rejected, Gopher-pass docs kept on sf0.001") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Classifier.loadWeights(spark)
    val junk = Classifier.junkCorpus(docs, col("doc_id"), col("text"))
    val junkKept = TextOps.classifierScore(junk, col("doc_id"), col("text"), w)
      .filter(col("keep")).count()
    assert(junkKept === 0L, s"$junkKept junk docs kept")
    val real = TextOps.classifierScore(docs, col("doc_id"), col("text"), w)
      .join(TextOps.gopherFlags(docs, col("doc_id"), col("text"))
        .select("doc_id", "passes"), "doc_id")
    val n = real.count().toDouble
    val agree = real.filter(col("keep") === col("passes")).count().toDouble
    // held-out agreement with the labeling rules; exact 100% is not
    // required (the model generalizes, it does not memorize)
    assert(agree / n >= 0.9, s"held-out agreement ${agree / n} < 0.9")
  }
}

package graft

import graft.operators.LangId
import org.apache.spark.sql.functions._

/** Hashed-linear language-ID semantics: kernel ≡ driver mirror
  * (byte-level, multi-byte UTF-8 included), distributed softmax
  * training bit-equal to the reference under any partitioning,
  * deterministic argmax tie-break, and the headline law — the trained
  * classifier beats q27's marker heuristic on text carrying NO marker
  * words at all.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val pools = Seq(
    "through should because people world never might while",
    "también están mucho años señor ciudad cuando entonces",
    "zwischen während müssen schön öffnen vielleicht immer heute",
    "être déjà toujours français beaucoup même aussi jamais")

  test("hashedNgramHist kernel equals the driver mirror, including " +
      "multi-byte UTF-8 and short/empty strings") {
    val texts = Seq("hello world", "también años señor",
      "schön über müssen", "ab", "a", "", "être déjà 日本語 text")
    val got = texts.toDF("t")
      .select(graft.expressions.TextOps.hashedNgramHist(col("t"), 3, 16))
      .as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, hist) =>
      val bytes = t.getBytes("UTF-8")
      val expTotal = math.max(bytes.length - 2, 0)
      assert(hist.sum === expTotal, s"'$t': total")
      val ref = LangId.ngramFeaturesReference(t, 3, 16)
      val tot = math.max(hist.sum, 1L).toDouble
      assert(ref.toSeq === hist.map(_.toDouble * 16 / tot).toSeq, s"'$t'")
    }
  }

  test("trainSoftmaxFull is bit-identical to the driver reference under " +
      "different partitionings") {
    val rows: Array[(Array[Double], Int)] = Array(
      (Array(2.0, 0.1, 0.2), 0), (Array(1.8, 0.3, 0.1), 0),
      (Array(0.2, 2.1, 0.3), 1), (Array(0.1, 1.9, 0.2), 1),
      (Array(0.3, 0.2, 2.2), 2), (Array(0.2, 0.1, 2.0), 2))
    val ref = LangId.trainSoftmaxFullReference(rows, numClasses = 3,
      iters = 30, lr = 3.0)
    for (parts <- Seq(1, 5)) {
      val df = spark.createDataFrame(rows.toSeq.map(r =>
          (r._1(0), r._1(1), r._1(2), r._2)))
        .toDF("a", "b", "c", "y").repartition(parts)
      val m = LangId.trainSoftmaxFull(df, Seq("a", "b", "c"), "y",
        numClasses = 3, iters = 30, lr = 3.0)
      assert(m.weights.map(_.toSeq).toSeq === ref.weights.map(_.toSeq).toSeq
        && m.biases.toSeq === ref.biases.toSeq, s"parts=$parts")
    }
    rows.foreach { case (x, y) =>
      assert(LangId.predictReference(ref, x) === y)
    }
  }

  test("predict: argmax with the lowest-index tie-break, and the column " +
      "form equals predictReference") {
    val m = LangId.SoftmaxModel(
      Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(0.0, 0.0, 0.0))
    // x = (1, 1): z = (1, 1, 1) — full tie → class 0
    assert(LangId.predictReference(m, Array(1.0, 1.0)) === 0)
    // x = (0, 2): z = (0, 0, 2) → class 2
    assert(LangId.predictReference(m, Array(0.0, 2.0)) === 2)
    val got = Seq((1.0, 1.0), (0.0, 2.0), (3.0, 1.0)).toDF("a", "b")
      .select(m.predict(Seq(col("a"), col("b"))))
      .as[Long].collect().toSeq
    assert(got === Seq(0L, 2L, 0L))
  }

  test("the trained classifier beats the marker heuristic on marker-free " +
      "text: pool-word docs carry ZERO q27 markers, so the vote defaults " +
      "to 'en' while the trigram model separates all four languages") {
    val markers: Seq[Seq[String]] = Seq(
      Seq("the", "a", "of", "and", "to"),
      Seq("el", "la", "los", "de", "que"),
      Seq("der", "die", "das", "und", "ist"),
      Seq("le", "les", "et", "des", "une"))
    // train on pool-only soup (NO marker words anywhere)
    val train = (0 until 200).map { i =>
      val l = i % 4
      (i.toLong, l.toLong, (pools(l) + " ") * 3 + s"doc $i")
    }.toDF("doc_id", "label", "text")
    val (feat, fcols) = LangId.withNgramFeatures(train, "text", 3, 32)
    val model = LangId.trainSoftmaxFull(feat, fcols, "label",
      numClasses = 4, iters = 25, lr = 3.0)
    val clfAcc = feat
      .select(avg((model.predict(fcols.map(col)) === col("label"))
        .cast("double")))
      .as[Double].head()
    // q27's heuristic on the same docs: count marker hits per language,
    // argmax with the same >=-chain default
    val mh = graft.functions.TextFunctions.markerHitsAll(col("text"), markers)
    val vote = when(element_at(mh, 1) >= element_at(mh, 2) &&
        element_at(mh, 1) >= element_at(mh, 3) &&
        element_at(mh, 1) >= element_at(mh, 4), 0L)
      .when(element_at(mh, 2) >= element_at(mh, 3) &&
        element_at(mh, 2) >= element_at(mh, 4), 1L)
      .when(element_at(mh, 3) >= element_at(mh, 4), 2L)
      .otherwise(3L)
    val heurAcc = train
      .select(avg((vote === col("label")).cast("double")))
      .as[Double].head()
    // no marker word appears in any pool → every vote is the 'en'
    // default → exactly 25% on the balanced fixture
    assert(heurAcc === 0.25, s"heuristic=$heurAcc (fixture leaked markers?)")
    assert(clfAcc === 1.0, s"classifier=$clfAcc")
  }

  test("trainSoftmaxFull loud-fails on bad shapes") {
    val df = Seq((1.0, 0L)).toDF("a", "y")
    intercept[IllegalArgumentException] {
      LangId.trainSoftmaxFull(df, Seq("a"), "y", numClasses = 1)
    }
    intercept[IllegalArgumentException] {
      LangId.trainSoftmaxFull(df, Seq.empty, "y", numClasses = 2)
    }
    intercept[IllegalArgumentException] {
      LangId.trainSoftmaxFull(df, Seq("a"), "y", numClasses = 2, iters = 0)
    }
  }
}

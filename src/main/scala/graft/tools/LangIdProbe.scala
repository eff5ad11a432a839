package graft.tools

import graft.GraftSession
import graft.operators.LangId
import org.apache.spark.sql.functions._

/** Scratch: replicate q310 stage by stage to localize the
  * constraint-propagation OOM.
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("langid-probe")
    if (args.contains("--no-constraints"))
      spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "to"),
      "es" -> Seq("el", "la", "los", "de", "que"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "fr" -> Seq("le", "les", "et", "des", "une"))
    val pools = Seq(
      "through should because people world never might while",
      "también están mucho años señor ciudad cuando entonces",
      "zwischen während müssen schön öffnen vielleicht immer heute",
      "être déjà toujours français beaucoup même aussi jamais")
    val soups = markers.map(_._1).zip(pools).map { case (lg, pool) =>
      val mk = markers.find(_._1 == lg).get._2.mkString(" ")
      ((mk + " " + pool + " ") * 3).trim
    }
    val soupExpr = when(col("label") === 0, soups(0))
      .when(col("label") === 1, soups(1))
      .when(col("label") === 2, soups(2))
      .otherwise(soups(3))
    val planted = graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .withColumn("label", col("doc_id") % 4)
      .withColumn("text", concat(soupExpr, lit(" "),
        array_join(slice(split(col("text"), " "), 1, 8), " ")))
      .select(col("doc_id"), col("label"), col("text"))
    println("[probe] stage1 plant count=" + planted.count())
    val (feat, fcols) = LangId.withNgramFeatures(planted, "text", 3, 32)
    val rows = feat.select(
        (fcols.map(col) :+ col("label").cast("int")): _*)
      .collect()
      .map(r => (fcols.indices.map(r.getDouble).toArray,
        r.getInt(fcols.length)))
    val t0 = System.nanoTime()
    val m25 = LangId.trainSoftmaxFull(feat, fcols, "label",
      numClasses = 4, iters = 25, lr = 3.0)
    println(f"[probe] trainSoftmaxFull 25 iters: ${(System.nanoTime()-t0)/1e9}%.2f s (bias0=${m25.biases(0)})")
    val t1 = System.nanoTime()
    val m25b = LangId.trainSoftmaxFull(feat, fcols, "label",
      numClasses = 4, iters = 25, lr = 3.0)
    println(f"[probe] second run: ${(System.nanoTime()-t1)/1e9}%.2f s (same=${m25b.biases(0) == m25.biases(0)})")
    for (scale <- Seq(0.0);
         lr <- Seq(1.0, 3.0, 10.0, 30.0, 100.0);
         iters <- Seq(15, 25, 40, 60, 100)) {
      val sr = rows.map { case (x, y) => (x.map(_ * scale), y) }
      val m = LangId.trainSoftmaxFullReference(sr, numClasses = 4,
        iters = iters, lr = lr)
      val acc = sr.count { case (x, y) =>
        LangId.predictReference(m, x) == y
      }.toDouble / sr.length
      println(f"[probe] scale=$scale%4.0f lr=$lr%7.1f iters=$iters%4d acc=$acc%.4f")
    }
    spark.stop()
  }
}

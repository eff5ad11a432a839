package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev-only probe for sparseCosinePairs stage costs (not part of the
  * battery; delete or keep as a tools utility).
  */
object SparseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("sparse-probe")
    val docs = Tables.load(spark, dir, "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val threshold = 0.95
    val wArr = split(col("text"), " ")
    val grams = when(size(wArr) >= 3,
        transform(sequence(lit(0), size(wArr) - 3),
          i => array_join(slice(wArr, i + 1, lit(3)), " ")))
      .otherwise(array(col("text")))
    val tf = timed("tf checkpoint") {
      docs.select(col("doc_id").as("id"), explode(grams).as("term"))
        .filter(col("term").isNotNull && col("term") =!= "")
        .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
        .localCheckpoint(eager = true)
    }
    println("[probe] tf rows " + tf.count())
    val nDocs = broadcast(docs.agg(count(lit(1)).as("nd")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // Distributed two-phase rank — same as the production operator
    // (Similarity.sparseCosinePairs); never a single-partition window.
    val ranks = graft.operators.Profile.exactRank(dfreq, "df", "term", "rank")
    val tw = tf.join(ranks, Seq("term")).crossJoin(nDocs)
      .select(col("id"), col("rank"), col("df"), (col("tf") *
        (log((col("nd") + 1).cast("double") / (col("df") + 1)) + 1)).as("tw"))
    val nrm = tw.groupBy("id").agg(sqrt(sum(col("tw") * col("tw"))).as("nn"))
    val winDesc = Window.partitionBy("id").orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = timed("flagged checkpoint") {
      tw.join(nrm, Seq("id"))
        .select(col("id"), col("rank"), col("df"), (col("tw") / col("nn")).as("w"))
        .withColumn("ssq", sum(col("w") * col("w")).over(winDesc))
        .localCheckpoint(eager = true)
    }
    val full = flagged.filter(col("df") >= 2).select(col("rank"), col("id"))
    val pref = flagged.filter(col("df") >= 2 &&
      col("ssq") >= lit(threshold * threshold - 1e-9)).select(col("rank"), col("id"))
    println("[probe] full rows " + timed("full count")(full.count()))
    println("[probe] pref rows " + timed("pref count")(pref.count()))
    val cand = full.select(col("rank"), col("id").as("id_f"))
      .join(pref.select(col("rank"), col("id").as("id_p")), Seq("rank"))
      .filter(col("id_f") =!= col("id_p"))
      .select(least(col("id_f"), col("id_p")).as("id_a"),
        greatest(col("id_f"), col("id_p")).as("id_b"))
    println("[probe] raw cand rows " + timed("raw cand count")(cand.count()))
    println("[probe] distinct cand " + timed("distinct cand")(cand.distinct().count()))
    spark.stop()
  }
}

package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.{MinMaxScaler => _, _}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FlinkML capability mapping (SURVEY §2.8: SVM / multiple linear
  * regression / KNN / ALS / scalers → spark.ml superset).
  *
  * Two layers:
  *  - exact relational preprocessing (min-max + z-score scaling) expressed
  *    as deterministic column arithmetic — these participate in the value
  *    oracle;
  *  - thin façade over spark.ml estimators (LinearRegression, KMeans) — the
  *    reference's iterative ML is float-iterative and seed-dependent, so
  *    correctness is pinned by MLSpec properties, not the SQL oracle.
  */
object MLOps {

  /** Min-max scale `valueCol` within each `partition` group:
    * (x − min)/(max − min). Pure picks + one division — bit-exact on any
    * engine. */
  def minMaxScale(df: DataFrame, valueCol: String, partition: Column): DataFrame = {
    val w = Window.partitionBy(partition)
    df.withColumn("scaled",
      (col(valueCol) - min(col(valueCol)).over(w)) /
        (max(col(valueCol)).over(w) - min(col(valueCol)).over(w)))
  }

  /** Z-score scale a 2-decimal monetary column within groups using exact
    * integer-cents moments: mean = Σc/n, var = Σc²/n − mean² (population).
    */
  def standardScaleCents(df: DataFrame, valueCol: String,
                         partition: Column): DataFrame = {
    val c = expr(s"CAST(round($valueCol * 100) AS BIGINT)")
    val w = Window.partitionBy(partition)
    val n = count(lit(1)).over(w)
    val mean = (sum(c).over(w).cast("double") / n)
    val m2 = (sum(c * c).over(w).cast("double") / n)
    val variance = m2 - mean * mean
    df.withColumn("z", (c.cast("double") - mean) / sqrt(variance))
  }

  /** Multiple linear regression façade (FlinkML MLR). */
  def fitLinearRegression(df: DataFrame, featureCols: Seq[String],
                          labelCol: String): Array[Double] = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    val model = new LinearRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setRegParam(0.0).setSolver("normal")
      .fit(assembled)
    model.coefficients.toArray :+ model.intercept
  }

  /** KNN classification (FlinkML `nn` package): majority label among the k
    * nearest neighbors by cosine, ties broken toward the smaller label —
    * deterministic, so it participates in the value oracle. Built on
    * [[graft.operators.SimilarityOps.topKBruteForce]]; swap in topKLsh /
    * topKIvf for the ANN path at scale. */
  def knnClassify(corpus: DataFrame, labeled: DataFrame, queries: DataFrame,
                  k: Int, labelCol: String = "label",
                  idCol: String = "vec_id"): DataFrame = {
    val nn = graft.operators.SimilarityOps.topKBruteForce(corpus, queries, k)
    nn.join(labeled.select(col(idCol).as("nid"), col(labelCol)), "nid")
      .groupBy(col("qid"), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("votes").desc, col(labelCol))))
      .filter(col("rk") === 1)
      .select(col("qid"), col(labelCol).as("predicted"), col("votes"))
  }

  /** KMeans façade over an `array<float>` embedding column. */
  def kmeansAssign(df: DataFrame, vecCol: String, k: Int,
                   seed: Long = 42L): DataFrame = {
    val feat = df.withColumn("features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(feat)
    model.transform(feat).withColumnRenamed("prediction", "cluster")
      .drop("features")
  }
}

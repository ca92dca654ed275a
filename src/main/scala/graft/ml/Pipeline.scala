package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FlinkML pipeline surface (reference `flink-ml/.../pipeline/
  * {Estimator,Transformer,Predictor,ChainedTransformer,ChainedPredictor}
  * .scala`).
  *
  * The reference chains UNFITTED stages; `fit` runs left-to-right, each
  * fitted stage transforming the training set before the next stage fits
  * (`ChainedTransformer.chainedFitOperation`), and the fitted chain
  * replays the same transforms at prediction time
  * (`ChainedPredictor.scala` predict = left.transform andThen
  * right.predict). Here a fitted model is an immutable
  * `DataFrame => DataFrame`; learned parameters are driver-side scalars —
  * model state is tiny by construction, the training statistics are
  * computed distributed, and the emitted transform is pure column
  * arithmetic that inlines into whole-stage codegen.
  */
trait PipelineStage extends Serializable {

  /** Learn from `train`, return the fitted transform. */
  def fit(train: DataFrame): DataFrame => DataFrame

  /** Chain another stage after this one (reference
    * `Transformer.chainTransformer` / `chainPredictor`). */
  def chain(next: PipelineStage): PipelineStage = ChainedStage(this, next)

  /** Fit and immediately transform the training set. */
  def fitTransform(train: DataFrame): DataFrame = fit(train)(train)
}

/** reference `ChainedTransformer.scala` / `ChainedPredictor.scala`. */
final case class ChainedStage(left: PipelineStage, right: PipelineStage)
  extends PipelineStage {
  override def fit(train: DataFrame): DataFrame => DataFrame = {
    val lt = left.fit(train)
    val rt = right.fit(lt(train))
    in => rt(lt(in))
  }
}

/** Global min-max scaler (reference `preprocessing/MinMaxScaler.scala`):
  * fit learns [min, max] of `inCol`; transform emits
  * `outCol = (x − min) / (max − min)`. */
final case class MinMaxScalerStage(inCol: String, outCol: String = "scaled")
  extends PipelineStage {
  override def fit(train: DataFrame): DataFrame => DataFrame = {
    val r = train.agg(min(col(inCol)).cast("double"),
      max(col(inCol)).cast("double")).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    require(hi > lo, s"degenerate range for $inCol: [$lo, $hi]")
    in => in.withColumn(outCol, (col(inCol) - lit(lo)) / lit(hi - lo))
  }
}

/** Global z-score scaler (reference `preprocessing/StandardScaler.scala`),
  * population moments. */
final case class StandardScalerStage(inCol: String, outCol: String = "z")
  extends PipelineStage {
  override def fit(train: DataFrame): DataFrame => DataFrame = {
    val r = train.agg(
      avg(col(inCol)).cast("double"),
      (sum(col(inCol) * col(inCol)).cast("double") / count(lit(1))))
      .head()
    val mean = r.getDouble(0)
    val std = math.sqrt(r.getDouble(1) - mean * mean)
    require(std > 0, s"zero variance for $inCol")
    in => in.withColumn(outCol, (col(inCol) - lit(mean)) / lit(std))
  }
}

/** Stateless polynomial expansion (reference
  * `preprocessing/PolynomialFeatures.scala`) — fit learns nothing. */
final case class PolynomialFeaturesStage(cols: Seq[String], degree: Int)
  extends PipelineStage {
  override def fit(train: DataFrame): DataFrame => DataFrame =
    in => MLOps.polynomialFeatures(in, cols, degree)
}

/** Terminal predictor: multiple linear regression by normal equations
  * (reference `regression/MultipleLinearRegression.scala` as the
  * `chainPredictor` target). The fitted transform appends `outCol` as the
  * inlined linear form — no model object crosses the executor boundary. */
final case class LinearRegressionStage(featureCols: Seq[String],
                                       labelCol: String,
                                       outCol: String = "prediction")
  extends PipelineStage {
  override def fit(train: DataFrame): DataFrame => DataFrame = {
    val coef = MLOps.fitLinearRegression(train, featureCols, labelCol)
    in => in.withColumn(outCol, MLOps.linearPredict(featureCols, coef))
  }
}

/** Terminal predictor trained by the iterative-optimizer façade (reference
  * `optimization/GradientDescent.scala` behind
  * `MultipleLinearRegression.setIterations/setStepsize` — seeded-free,
  * fixed-iteration, deterministic given the training set). Same fitted
  * surface as [[LinearRegressionStage]]: the learned linear form inlines
  * into whole-stage codegen. */
final case class SgdRegressionStage(featureCols: Seq[String],
                                    labelCol: String,
                                    outCol: String = "prediction",
                                    iterations: Int = 50,
                                    stepSize: Double = 0.1,
                                    l2: Double = 0.0,
                                    constantStep: Boolean = false)
  extends PipelineStage {
  override def fit(train: DataFrame): DataFrame => DataFrame = {
    val coef = MLOps.fitLinearRegressionSgd(train, featureCols, labelCol,
      iterations, stepSize, l2, constantStep)
    in => in.withColumn(outCol, MLOps.linearPredict(featureCols, coef))
  }
}

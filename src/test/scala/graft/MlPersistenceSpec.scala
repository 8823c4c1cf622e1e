package graft

import graft.ml.Classifiers
import org.apache.spark.ml.classification.DecisionTreeClassificationModel
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Model persistence — the reference saves fitted models with joblib
  * dump/load (getTrainedClassifier, src/TextClassification.py:515,
  * savedModels/); the MLlib surface is Model.write.save / load with
  * identical predictions after the round trip.
  */
class MlPersistenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("saved and reloaded model reproduces its predictions exactly") {
    import spark.implicits._
    val (train, test) = Classifiers.featurize(spark, dir)
    val model = Classifiers.fitOn("dtree", train)
      .asInstanceOf[DecisionTreeClassificationModel]
    val path = "/tmp/graft_model_dtree"
    model.write.overwrite().save(path)
    val loaded = DecisionTreeClassificationModel.load(path)
    val before = model.transform(test)
      .select($"doc_id", $"prediction").as[(Long, Double)].collect().toMap
    val after = loaded.transform(test)
      .select($"doc_id", $"prediction").as[(Long, Double)].collect().toMap
    assert(before.nonEmpty && before == after)
  }
}

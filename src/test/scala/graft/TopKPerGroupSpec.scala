package graft

import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

/** The custom bounded-heap top-k operator must return EXACTLY the rows of
  * the stock Window row_number formulation (its semantics contract), while
  * planning as TopKPerGroupExec with no sort and no window.
  */
class TopKPerGroupSpec extends SparkSpec {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("x").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  private def seededDf(n: Int, groups: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // duplicate x values on purpose: ties must resolve identically (the
    // id tiebreak makes the ordering total)
    (0 until n).map(i => (i.toLong, rnd.nextInt(groups), rnd.nextInt(20)))
      .toDF("id", "g", "x")
  }

  test("equals the window formulation across k, including ties") {
    val df = seededDf(5000, 7, seed = 42L).repartition(8)
    for (k <- Seq(1, 3, 10)) {
      val custom = TopKPerGroup(df, Seq("g"),
        Seq("x" -> Descending, "id" -> Ascending), k)
        .collect().map(_.toSeq).toSet
      val stock = windowTopK(df, k).collect().map(_.toSeq).toSet
      assert(custom == stock, s"k=$k")
      assert(custom.nonEmpty)
    }
  }

  test("groups smaller than k return every row") {
    val df = seededDf(40, 20, seed = 7L)
    val custom = TopKPerGroup(df, Seq("g"),
      Seq("x" -> Descending, "id" -> Ascending), 50)
      .collect().map(_.toSeq).toSet
    assert(custom == df.collect().map(_.toSeq).toSet)
  }

  test("plans as TopKPerGroupExec + one exchange; no Sort, no Window") {
    val df = seededDf(1000, 5, seed = 1L).repartition(4)
    val out = TopKPerGroup(df, Seq("g"), Seq("x" -> Descending,
      "id" -> Ascending), 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TopKPerGroup "), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Long, Int, Int)].toDF("id", "g", "x")
    assert(TopKPerGroup(df, Seq("g"),
      Seq("x" -> Descending, "id" -> Ascending), 3).count() == 0)
  }

  test("unknown column fails fast with a clear error") {
    val df = seededDf(10, 2, seed = 3L)
    val e = intercept[RuntimeException] {
      TopKPerGroup(df, Seq("nope"), Seq("x" -> Descending), 3)
    }
    assert(e.getMessage.contains("no column 'nope'"))
  }
}

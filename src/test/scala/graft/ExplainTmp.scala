package graft

import org.scalatest.funsuite.AnyFunSuite

class ExplainTmp extends AnyFunSuite {
  test("explain decontaminate_url") {
    val df = SparkEntry.queryFn("ns_decontaminate_url").get(spark0, "/root/testdata/sf0.1")
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"wall: ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    df.sparkSession.sparkContext.setJobGroup("x","x")
    df.write.mode("overwrite").format("noop").save()
    println(f"wall2: ${(System.nanoTime()-t1)/1e9}%.2f s")
  }
  lazy val spark0 = SparkSpec.session
}

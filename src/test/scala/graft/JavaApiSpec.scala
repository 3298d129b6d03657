package graft

/** Runs the pure-Java facade exercise (`src/test/java/graft/japi/
  * JavaApiCheck.java`) — the compile of that .java file is itself half
  * the assertion (no Scala types leak through `graft.japi.Graft`); the
  * run checks the representative queries against the engine. */
class JavaApiSpec extends SparkSuite {
  init()

  test("Java-facing facade: representative queries run from pure Java source") {
    graft.japi.JavaApiCheck.run(spark, sfDir)
  }
}

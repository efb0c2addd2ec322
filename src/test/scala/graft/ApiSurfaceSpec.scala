package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adoption-surface registry pins (r10 verdict ask #8): docs/API.md is
  * the migration map a `pds.*` user follows; every SQL name it
  * mentions must actually exist in one of the two registries
  * (`functions/SqlFunctions.scala` UDFs,
  * `org.apache.spark.sql.graft.GraftExtensions` natives), and the UDF
  * registry must really bind on a live session. The registry name
  * sets are parsed from SOURCE, not hardcoded — adding a function to
  * either registry without documenting it (or documenting a name that
  * was never registered) fails here. */
class ApiSurfaceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  private lazy val extensionNames: Set[String] =
    "FunctionIdentifier\\(\"([a-z0-9_]+)\"\\)".r
      .findAllMatchIn(read(
        "src/main/scala/org/apache/spark/sql/graft/GraftExtensions.scala"))
      .map(_.group(1)).toSet

  private lazy val udfNames: Set[String] =
    "register\\(\"([a-z0-9_]+)\"".r
      .findAllMatchIn(read(
        "src/main/scala/graft/functions/SqlFunctions.scala"))
      .map(_.group(1)).toSet

  test("every graft_* SQL name in docs/API.md is registered somewhere") {
    val documented = "graft_[a-z0-9_]+".r
      .findAllIn(read("docs/API.md")).toSet
    val registered = extensionNames ++ udfNames
    val ghosts = documented -- registered
    assert(ghosts.isEmpty,
      s"docs/API.md documents unregistered SQL names: $ghosts")
    // and the reverse: a newly registered function must be documented
    val undocumented = registered -- documented
    assert(undocumented.isEmpty,
      s"registered SQL names missing from docs/API.md: $undocumented")
    assert(documented.nonEmpty && extensionNames.size >= 10 &&
      udfNames.size >= 5) // registries parsed, not empty regex misses
  }

  test("SqlFunctions.registerAll binds every parsed UDF name on a " +
      "live session and the bindings evaluate") {
    graft.functions.SqlFunctions.registerAll(spark)
    udfNames.foreach { n =>
      assert(spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"$n not bound after registerAll")
    }
    // spot evaluation through SQL (one per return type family)
    val r = spark.sql(
      "SELECT graft_str_jaro('martha','marhta') j, " +
        "graft_str_lcs_subseq('AGGTAB','GXTXAYB') l").head
    assert(math.abs(r.getDouble(0) - 0.9444444444444445) < 1e-12)
    assert(r.getInt(1) == 4)
  }

  test("docs/API.md covers every reference module") {
    val api = read("docs/API.md")
    Seq("metrics.py", "stats.py", "num.py", "string.py", "survival.py",
        "ts_features.py", "expr_knn.py", "expr_linear.py",
        "expr_spline.py", "expr_iter.py", "pipeline/",
        "sample_and_split/", "diagnosis.py", "expander.py")
      .foreach(m => assert(api.contains(m), s"API.md missing module $m"))
  }
}

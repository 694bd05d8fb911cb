package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins round 15's single biggest perf win — GraftSession's
  * `spark.sql.codegen.cache.maxEntries=10000` — against regression.
  *
  * The conf is STATIC (fixed at first session creation), so it cannot
  * be probed inside the shared suite JVM; instead this spec forks
  * [[CodegenProbe]] (which builds its session THROUGH GraftSession,
  * the path every engine CLI takes) and reads its per-pass Janino
  * compile counts:
  *
  *  - default fork: warm pass 0 compiles the probe surface, passes 1–2
  *    must be ~zero — byte-identical regenerated source hits the cache.
  *    If GraftSession loses (or shrinks) the conf, the 20-query probe
  *    surface alone overflows a 100-entry LRU and this leg turns RED.
  *  - negative control: the same main with the conf explicitly
  *    reverted to Spark's 100-entry default
  *    (`-Dspark.sql.codegen.cache.maxEntries=100`, honored by
  *    GraftSession's sys-prop override). A sequential scan over an LRU
  *    smaller than the working set hits nothing, so passes 1–2 recompile
  *    at pass-0 scale — proof the green leg measures the cache, not a
  *    tautology.
  *
  * Both forks run CONCURRENTLY (independent JVMs) to halve wall cost.
  */
class CodegenCacheSpec extends AnyFunSuite with Matchers {

  private case class Probe(cacheMax: String, p0: Long, p1: Long, p2: Long)

  /** Fork a JVM running CodegenProbe with the test classpath and the
    * JDK-17 module opens the test JVM itself was launched with. */
  private def fork(extraJvmArgs: Seq[String]): Probe = {
    import scala.jdk.CollectionConverters._
    val javaBin = sys.props("java.home") + "/bin/java"
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC") ++ extraJvmArgs ++ Seq(
      "-cp", sys.props("java.class.path"), "graft.tools.CodegenProbe")
    val out = new StringBuilder
    val err = new StringBuilder
    val p = scala.sys.process.Process(cmd, None, "SPARK_GRAFT_CPUS" -> "4")
    val code = p ! scala.sys.process.ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') },
      l => err.synchronized { err.append(l).append('\n') })
    withClue(s"probe JVM failed (exit $code): ${err.toString.takeRight(2000)}") {
      code shouldBe 0
    }
    val line = out.toString.linesIterator
      .find(_.startsWith("""{"metric":"codegen_probe"""))
      .getOrElse(fail(s"no probe JSON in output: ${out.toString.take(2000)}"))
    def field(k: String): String =
      s""""$k":"?([^,"}]*)"?""".r.findFirstMatchIn(line)
        .getOrElse(fail(s"missing $k in $line")).group(1)
    Probe(field("cache_max"), field("pass0").toLong,
      field("pass1").toLong, field("pass2").toLong)
  }

  test("GraftSession's 10000-entry codegen cache holds the probe " +
      "surface (re-passes compile ~nothing); the 100-entry negative " +
      "control thrashes (re-passes recompile at first-pass scale)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val defFut = Future(fork(Seq.empty))
    val negFut = Future(
      fork(Seq("-Dspark.sql.codegen.cache.maxEntries=100")))
    val deflt = Await.result(defFut, Duration.Inf)
    val neg = Await.result(negFut, Duration.Inf)

    deflt.cacheMax shouldBe "10000"
    neg.cacheMax shouldBe "100"

    // The negative control's premise: one probe pass must generate
    // well over 100 distinct classes, or a 100-entry cache could hold
    // it and the control would prove nothing.
    withClue(s"default probe: $deflt ") {
      deflt.p0 should be > 150L
      // Re-passes hit the cache: a stray compile or two is tolerated
      // (e.g. a late-initialized internal plan), wholesale recompilation
      // is not.
      deflt.p1 should be <= (deflt.p0 / 10)
      deflt.p2 should be <= (deflt.p0 / 10)
    }
    withClue(s"negative control: $neg ") {
      neg.p1 should be > (neg.p0 / 2)
      neg.p2 should be > (neg.p0 / 2)
    }
  }
}

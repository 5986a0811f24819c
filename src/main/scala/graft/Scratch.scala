package graft

/** Throwaway investigation main (not part of the library surface):
  * break down the per-server cost of an idle 1000-server fleet tick. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = StressCorpus.session("8")
    import spark.implicits._
    val n = 300
    val root = java.nio.file.Files.createTempDirectory("graft_prof")
    val eng = new graft.core.Engine(spark, root.toString)
    val t0 = System.nanoTime()
    (1 to n).foreach(i => eng.registry.registerServer(
      graft.core.ServerConfig(id = i, hostname = s"h$i",
        powaCoalesce = 1000, retentionSec = 3650L * 86400)))
    println(f"[prof] register $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def time(label: String)(f: => Unit): Unit = {
      val t = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t) / 1e9}%.3f s")
    }
    // component timings over all n servers
    time("refreshMeta x n") {
      (1 to n).foreach(i => eng.registry.refreshMeta(i)) }
    time("persistMetas x n") {
      (1 to n).foreach(i => eng.registry.persistMetas(Set(i))) }
    time("persistMetas x n (2nd)") {
      (1 to n).foreach(i => eng.registry.persistMetas(Set(i))) }
    val now = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    time("full idle tickDue") { eng.tickDue(now) }
    val now2 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    time("full idle tickDue (2nd)") { eng.tickDue(now2) }
    // raw single-row parquet write into a flat dir (no AtomicSwap)
    val flat = root.resolve("flat")
    java.nio.file.Files.createDirectories(flat)
    time("RegistryIo.write x n (flat dir)") {
      (1 to n).foreach { i =>
        graft.core.RegistryIo.write(flat.resolve(s"probe$i"),
          graft.core.RegistryIo.metasSchema)(f => Seq(
          graft.core.RegistryIo.metaGroup(f,
            graft.core.RegistryStore.MetaRow(i, 1L, None, None, None,
              Seq.empty))))
      }
    }
    graft.core.AtomicSwap.deleteRecursively(root)
    spark.stop()
  }
}

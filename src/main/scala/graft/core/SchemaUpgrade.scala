package graft.core

/** Declared, ordered store-schema upgrades — the engine analogue of the
  * reference's 15 versioned upgrade scripts (`powa--5.0.0--5.0.1.sql` …
  * applied in sequence by ALTER EXTENSION powa UPDATE).
  *
  * Division of labor: TABLE-shape evolution needs no script here — the
  * reference's upgrade class is add-nullable-column only, and the store
  * reads mixed-generation files under the widest spec natively
  * (EngineSpec "spec evolution" pins one and two widenings and the loud
  * rejection of a type change). What DOES need sequencing is layout and
  * bookkeeping migrations — registry table reshapes, marker formats —
  * exactly what the reference scripts' DDL does around its data tables.
  *
  * Protocol:
  *   - the root's version lives at `_registry/schema_version`
  *     (absent = 1, every pre-runner root);
  *   - [[ensure]] applies the contiguous step chain from the persisted
  *     version up to the binary's [[CurrentVersion]], persisting the
  *     marker AFTER each step — a crash mid-sequence resumes at the
  *     first unapplied step, so steps must be idempotent (each step doc
  *     says why it is);
  *   - a root NEWER than the binary refuses loudly (the manifest-format
  *     fence rule: an old binary must never silently mis-read a newer
  *     layout), mirroring PostgreSQL's refusal to downgrade an
  *     extension;
  *   - a gap in the declared chain is a build error surfaced loudly at
  *     the first ensure, never a silent skip.
  *
  * Runs under the registry file lock, so two engines sharing a root
  * race safely: the loser re-reads the bumped marker and applies
  * nothing.
  */
object SchemaUpgrade {

  /** One declared upgrade hop. `apply` must be idempotent — it may be
    * re-run after a crash that hit between the step and its marker
    * bump, and concurrently-raced engines may both observe `from`. */
  final case class Step(from: Int, to: Int, description: String)(
      val apply: RegistryStore => Unit)

  /** The binary's registry-layout version. Bump together with a new
    * [[steps]] entry. */
  val CurrentVersion = 3

  /** The declared chain, ascending. */
  def steps: Seq[Step] = Seq(
    Step(1, 2, "spill legacy single-file snapshot metas into the " +
        "per-server row-scoped layout (idempotent: spilling checks " +
        "per-server ownership; the legacy drop is a no-op once gone)")(
      reg => reg.migrateLegacyMetas()),
    Step(2, 3, "spill per-server parquet meta links into single-line " +
        "text rows under _registry/metas/ and retire the links — the " +
        "hot per-tick row must not pay parquet-writer init plus two " +
        "O(fleet) directory listings per write (StressR11: ~32 s idle " +
        "pass at 1000 servers on v2). Idempotent: an existing text " +
        "row wins; re-running only drops leftover links")(
      reg => reg.migrateMetaRows())
  )

  /** Bring `reg`'s root up to `binary`. Returns the number of steps
    * applied (0 when already current). Throws on a newer root or a
    * non-contiguous chain. */
  def ensure(reg: RegistryStore, binary: Int = CurrentVersion,
      chain: Seq[Step] = steps): Int = reg.withLock {
    val have = reg.schemaVersion()
    if (have > binary)
      throw new IllegalStateException(
        s"store registry is schema version $have; this binary supports " +
          s"<= $binary — refusing to run an old binary against a newer " +
          "root (upgrade the binary)")
    else if (have == binary) 0
    else {
      // validate contiguity BEFORE applying anything: a gap must fail
      // the whole upgrade, not strand the root mid-chain
      var v = have
      while (v < binary) {
        chain.find(_.from == v) match {
          case Some(s) =>
            require(s.to == v + 1,
              s"upgrade step $v->${s.to} skips versions; steps must " +
                "be single hops")
            v = s.to
          case None => throw new IllegalStateException(
            s"no declared upgrade step from schema version $v " +
              s"(root at $have, binary at $binary) — the chain has a gap")
        }
      }
      val todo = chain.filter(s => s.from >= have && s.to <= binary)
        .sortBy(_.from)
      todo.foreach { s =>
        s.apply(reg)
        reg.writeSchemaVersion(s.to) // marker AFTER the step: crash-resume
      }
      todo.size
    }
  }
}

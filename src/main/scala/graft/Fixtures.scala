package graft

/** Fixture-directory resolution shared by the test session, the driver
  * smoke entry and CI: an explicit `GRAFT_SF_DIR` wins; otherwise the
  * driver-generated fixtures are used when present (the normal dev loop),
  * falling back to the small copy committed under `ci/fixtures/` so the
  * GitHub Actions workflow (EP3 parity — see `.github/workflows/ci.yml`)
  * runs the same suites and verify dump with no external data.
  */
object Fixtures {
  val sf0001: String = sys.env.get("GRAFT_SF_DIR")
    .orElse(
      Option("/root/testdata/sf0.001")
        .filter(p => new java.io.File(p).isDirectory))
    .getOrElse("ci/fixtures/sf0.001")
}

"""engine.zip staleness guard (BENCH/BASELINE.md gotcha #8): local-cluster
scaling legs import the engine from the zip, so a stale or incomplete zip
silently benchmarks an old kernel. The guard is SELF-HEALING: it rebuilds
the artifact via scripts/make_pyfiles.sh (deterministic, <1 s) and then
asserts byte-identity with the working tree — after the suite runs, the
committed recipe is proven to produce a current zip."""

from __future__ import annotations

import pathlib
import subprocess
import zipfile

ROOT = pathlib.Path(__file__).resolve().parents[1]
ZIP = ROOT / "engine.zip"


def test_engine_zip_rebuild_matches_source_tree():
    subprocess.run(
        ["sh", str(ROOT / "scripts" / "make_pyfiles.sh")],
        check=True,
        capture_output=True,
    )
    with zipfile.ZipFile(ZIP) as z:
        zipped = {n: z.read(n) for n in z.namelist() if n.endswith(".py")}
    tree = {
        p.relative_to(ROOT).as_posix(): p.read_bytes()
        for p in ROOT.glob("cpp_paddle_ocr_spark/**/*.py")
    }
    missing = sorted(set(tree) - set(zipped))
    extra = sorted(set(zipped) - set(tree))
    assert not missing, f"modules missing from engine.zip: {missing}"
    assert not extra, f"stale modules in engine.zip: {extra}"
    stale = sorted(n for n in tree if zipped[n] != tree[n])
    assert not stale, f"engine.zip content is stale for: {stale}"

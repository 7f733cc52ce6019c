from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    import os

    from cpp_paddle_ocr_spark.session import get_spark

    # Iceberg confs are STATIC (spark.sql.extensions cannot be set on a
    # live session), so they must be baked in at build time: export
    # SPARK_GRAFT_ICEBERG_WAREHOUSE=/path (with the runtime jar on the
    # classpath) and the whole suite — including the otherwise-skipped
    # Iceberg round-trip/pruning tests — runs against a real catalog.
    extra = {}
    wh = os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE")
    if wh:
        from cpp_paddle_ocr_spark.iceberg import iceberg_conf

        extra = iceberg_conf(wh)
    s = get_spark(
        app_name="tests", master="local[4]", shuffle_partitions=4,
        extra_conf=extra,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_checksums() -> dict[str, tuple[str, bool, int]]:
    path = pathlib.Path(__file__).parent / "golden" / "CHECKSUMS.tsv"
    out = {}
    for line in path.read_text(encoding="utf-8").splitlines():
        url, digest, success, n_blocks = line.split("\t")
        out[url] = (digest, success == "1", int(n_blocks))
    return out

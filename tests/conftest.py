from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from cpp_paddle_ocr_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
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

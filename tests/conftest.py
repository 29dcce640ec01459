from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neosearch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("neosearch_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_docs(spark):
    """FIXTURES.md F2 golden corpus: 4 reference docs + analyzer edge
    cases from F3, as (doc_id, text) rows."""
    rows = [
        (1, "Neoway Business Solution"),
        (2, "Google Inc."),
        (3, "Facebook Company"),
        (4, "Neoway Teste"),
        (5, "hyphen - token"),
        (6, "  spaced   out  "),
        (7, "singletoken"),
        (8, "Florianópolis is florianópolis"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="session")
def tiny_oracle():
    from neosearch_spark.oracle import OracleIndex

    return OracleIndex(
        {
            1: "Neoway Business Solution",
            2: "Google Inc.",
            3: "Facebook Company",
            4: "Neoway Teste",
            5: "hyphen - token",
            6: "  spaced   out  ",
            7: "singletoken",
            8: "Florianópolis is florianópolis",
        }
    )


@pytest.fixture(scope="session")
def repo_root():
    import pathlib
    return pathlib.Path(__file__).resolve().parent.parent

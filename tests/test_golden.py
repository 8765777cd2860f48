"""Golden regression corpus (reference: src/htsql/ctl/regress.py —
YAML cases, recorded once, diffed on every run).

``tests/golden/corpus.yaml`` holds ``- q: <query>`` cases with
recorded output rows at sf0.001.  Re-train after an intentional
semantic change with::

    python tests/test_golden.py --train

Rows are recorded sorted with floats rounded to 6 digits, so the
corpus is insensitive to partitioning/order but locks values, column
names, and nesting shape.
"""

import math
import os
import sys

import pytest
import yaml

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "corpus.yaml")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return int(r) if r == int(r) else r
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if v is None or isinstance(v, (bool, int, str)):
        return v
    return str(v)  # dates, decimals, …


def _run(db, query):
    rows = [_norm(r) for r in db.produce(query)]
    return sorted(rows, key=lambda r: str(r))


def _load():
    with open(GOLDEN) as f:
        return yaml.safe_load(f)


CASES = _load() if os.path.exists(GOLDEN) else []


@pytest.mark.parametrize("case", CASES, ids=[c["q"][:60] for c in CASES])
def test_golden(db, case):
    got = _run(db, case["q"])
    assert got == case["rows"], case["q"]


def train() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from htsql_spark import HTSQL, get_spark

    spark = get_spark("golden-train", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    db = HTSQL(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"))
    queries = [c["q"] for c in _load()]
    out = [{"q": q, "rows": _run(db, q)} for q in queries]
    with open(GOLDEN, "w") as f:
        yaml.safe_dump(out, f, sort_keys=False, allow_unicode=True, width=100)
    print(f"recorded {len(out)} cases")


if __name__ == "__main__":
    if "--train" in sys.argv:
        train()
    else:
        print(__doc__)

"""Gate-rotation policy check (r8 judge directive #2): any operator
module changed since the last driver round-commit MUST be exercised by
at least one query in the CURRENT round's 50-slot driver gate window
(`__spark_entry__._GATE_ORDER`) — the r1..r8 gate union covers every
oracle-backed registry query, and this check keeps the now-complete
verification regime from decaying: a code change without a
current-round hard driver row is exactly how the r7 stream_anomaly
ordering bug survived inspection-free.

Mechanics: the op→module map is derived automatically from each
registry query function's source (its `htsql_spark.operators` imports),
so the check cannot go stale as rows are added; "changed since the
round started" is `git diff` against the most recent driver commit
(message `round N: …`), which includes uncommitted worktree edits.
"""

from __future__ import annotations

import inspect
import os
import re
import subprocess

import pytest

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: operator modules with no registry-query mapping of their own —
#: exercised only through other modules' plans.  layout and skew were
#: WRONGLY listed here through r9 (both ARE mapped — op_zorder_key /
#: op_cdc_upsert import layout, op_skew_join imports skew — so the
#: exemption silently waived the policy for them; caught by the r9
#: self-review when layout.py changed with its only gate row rotated
#: out).  Keep this set EMPTY unless a module genuinely has no
#: registry query importing it.
UNMAPPED_OK: set[str] = set()


def _last_round_commit() -> str | None:
    try:
        out = subprocess.run(
            ["git", "log", "--grep", "^round [0-9]", "-1", "--format=%H"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    sha = out.stdout.strip()
    return sha or None


def _changed_operator_modules(since: str) -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", since, "--", "htsql_spark/operators/"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=30,
    )
    mods = set()
    for line in out.stdout.splitlines():
        m = re.fullmatch(r"htsql_spark/operators/(\w+)\.py", line.strip())
        if m and m.group(1) != "__init__":
            mods.add(m.group(1))
    return mods


def _op_modules() -> dict[str, set[str]]:
    """registry query name -> operator modules its source imports."""
    out: dict[str, set[str]] = {}
    for name, fn in entry.queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        mods: set[str] = set()
        for m in re.finditer(r"operators\s+import\s+([\w, ]+)", src):
            mods.update(x.strip() for x in m.group(1).split(","))
        mods.update(re.findall(r"operators\.(\w+)", src))
        out[name] = {m for m in mods if m}
    return out


def test_changed_operator_modules_hold_a_gate_slot():
    since = _last_round_commit()
    if since is None:
        pytest.skip("no driver round commit found (fresh checkout?)")
    changed = _changed_operator_modules(since)
    if not changed:
        return
    op_mods = _op_modules()
    gated_mods: set[str] = set()
    for name in entry._GATE_ORDER:
        gated_mods |= op_mods.get(name, set())
    mapped = {m for mods in op_mods.values() for m in mods}
    missing = sorted(
        m
        for m in changed
        if m in mapped and m not in gated_mods and m not in UNMAPPED_OK
    )
    assert not missing, (
        f"operator module(s) {missing} changed since {since[:9]} but no"
        " registry query importing them occupies a current _GATE_ORDER"
        " slot — rotate one in (r8 judge directive #2: changed code"
        " must get a hard driver row the round it changes)"
    )


def test_language_bridge_changes_hold_a_gate_slot():
    """compile.py (the flow-method bridge and every query shape) is
    the language surface's implementation file: when it changes, at
    least one lang_* bridge row must be in the gate window."""
    since = _last_round_commit()
    if since is None:
        pytest.skip("no driver round commit found")
    out = subprocess.run(
        ["git", "diff", "--name-only", since, "--", "htsql_spark/compile.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=30,
    )
    if not out.stdout.strip():
        return
    assert any(n.startswith("lang_") for n in entry._GATE_ORDER), (
        "compile.py changed since the round started but no lang_* row"
        " is in _GATE_ORDER"
    )

"""Sync ``VERIFIED_FINGERPRINTS.json`` with the newest driver check.

Run at ROUND START, before editing any operator:

    python -m deker_server_adapters_spark.tools.sync_fingerprints

For every op with a green row in the newest ``CORRECTNESS_r*.json``
(hash match, or rows-only-by-design with rows > 0) it records the op's
CURRENT fingerprint (oracle SQL + builder source + the builder's
transitive in-package helper/constant closure) as "driver-verified".
This is sound exactly at round start: the driver ran against the
previous round's final committed text, which is what the working tree
still contains before any edits. The rotation in
``operators/__init__.py`` then fronts any op whose fingerprint later
drifts from its verified one, so a redefined op re-verifies in the NEXT
driver window instead of hiding behind a stale green round.

Ops NOT in the newest window keep their previous entry (their text was
not re-checked, but it also has not changed — if it changes, the
mismatch fronts them regardless of any entry).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

from deker_server_adapters_spark.operators import all_ops, op_fingerprint

REPO_ROOT = Path(__file__).resolve().parents[2]
VERIFIED_PATH = REPO_ROOT / "VERIFIED_FINGERPRINTS.json"


def latest_correctness(repo_root: Path = REPO_ROOT) -> tuple[int, dict]:
    best_round, best = -1, {}
    for p in repo_root.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd <= best_round:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            best_round, best = rnd, data
    return best_round, best


def sync(repo_root: Path = REPO_ROOT) -> dict[str, str]:
    rnd, rows = latest_correctness(repo_root)
    verified: dict[str, str] = {}
    path = repo_root / "VERIFIED_FINGERPRINTS.json"
    if path.exists():
        try:
            verified = {
                k: v for k, v in json.loads(path.read_text()).items() if isinstance(v, str)
            }
        except (OSError, ValueError):
            verified = {}
    ops = all_ops()
    updated = []
    for name, row in rows.items():
        if name not in ops or not isinstance(row, dict):
            continue
        green = row.get("hash_match") is True or (
            row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
        )
        if green:
            fp = op_fingerprint(ops[name])
            if verified.get(name) != fp:
                updated.append(name)
            verified[name] = fp
    path.write_text(json.dumps(dict(sorted(verified.items())), indent=1) + "\n")
    print(
        f"synced round r{rnd}: {len(updated)} fingerprints updated "
        f"({len(verified)} total verified)",
        file=sys.stderr,
    )
    return verified


if __name__ == "__main__":
    sync()

"""One-off (r8) migration of ``VERIFIED_FINGERPRINTS.json`` to the
helper-closure fingerprint algorithm.

The r7 fingerprint hashed oracle SQL + builder source only, so a helper
rewrite left the fingerprint unchanged and the op silently skipped
re-verification (the ``text_bpe_merges`` incident: rewritten entirely in
``_bpe_apply_merge``/``bpe_merge_table``, builder body byte-identical,
never driver-checked post-rewrite). r8 widens the hash to the builder's
transitive in-package helper/constant closure — which invalidates every
stored (old-algorithm) fingerprint.

A naive re-sync against the CURRENT tree would be UNSOUND for ops whose
last green driver check predates this round: it would bless text the
driver never saw (exactly the BPE case). Instead, for each verified op
this tool recomputes the NEW fingerprint against the tree of the op's
last-green round — the driver's ``round N: verdict/...`` commit carries
round-N-end operator text — via a temporary ``git worktree`` and a
subprocess that imports the OLD package but applies the NEW algorithm
(loaded by file path from the current tree). An op rewritten since its
last green check therefore mismatches and fronts the rotation, with no
hand-maintained exception list.

Run once, after changing the fingerprint algorithm, before any operator
edits:

    python -m deker_server_adapters_spark.tools.migrate_fingerprints

MID-ROUND caveat: the "latest green round's checked text IS the current
tree" shortcut is only sound at round start. If operators were edited
since the latest driver check, re-anchor those ops' entries at the
latest round's driver commit afterwards (``_fingerprints_at`` does the
worktree recompute) so edited ops correctly mismatch and front — done
in r8 after the import-aware algorithm change."""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

from deker_server_adapters_spark.operators import (
    _last_green_round,
    all_ops,
    op_fingerprint,
)

REPO_ROOT = Path(__file__).resolve().parents[2]
NEW_INIT = REPO_ROOT / "deker_server_adapters_spark" / "operators" / "__init__.py"

_SUBPROC = r"""
import importlib.util, json, sys
worktree, new_init = sys.argv[1], sys.argv[2]
names = json.loads(sys.stdin.read())
sys.path.insert(0, worktree)
from deker_server_adapters_spark.operators import all_ops  # OLD tree's ops
spec = importlib.util.spec_from_file_location("_new_fp", new_init)
mod = importlib.util.module_from_spec(spec)
sys.modules["_new_fp"] = mod  # dataclass() resolves cls.__module__ here
spec.loader.exec_module(mod)  # NEW algorithm, standalone
ops = all_ops()
print(json.dumps({n: mod.op_fingerprint(ops[n]) for n in names if n in ops}))
"""


def _round_commit(rnd: int) -> str | None:
    """The driver's ``round N: verdict/...`` commit — its tree is the
    round-N-end operator text plus round-N result files."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO_ROOT, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith(f"round {rnd}: verdict"):
            return sha
    return None


def _fingerprints_at(commit: str, names: list[str]) -> dict[str, str]:
    with tempfile.TemporaryDirectory(prefix="fp_migrate_") as tmp:
        wt = str(Path(tmp) / "wt")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO_ROOT, check=True, capture_output=True,
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _SUBPROC, wt, str(NEW_INIT)],
                input=json.dumps(names), capture_output=True, text=True,
            )
            if proc.returncode != 0:
                raise RuntimeError(f"fingerprint subprocess failed:\n{proc.stderr}")
            return json.loads(proc.stdout)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO_ROOT, check=True, capture_output=True,
            )


def migrate() -> dict[str, str]:
    last_green = _last_green_round(REPO_ROOT)
    latest = max(last_green.values(), default=0)
    ops = all_ops()
    old_verified = json.loads((REPO_ROOT / "VERIFIED_FINGERPRINTS.json").read_text())

    by_round: dict[int, list[str]] = {}
    for name in old_verified:
        if name not in ops or name not in last_green:
            continue  # dropped or never-green op: no entry -> fronts
        by_round.setdefault(last_green[name], []).append(name)

    verified: dict[str, str] = {}
    for rnd, names in sorted(by_round.items()):
        if rnd == latest:
            # the latest round's checked text IS the current tree (the
            # driver commit only adds result files) — compute in-process
            for n in names:
                verified[n] = op_fingerprint(ops[n])
            print(f"r{rnd}: {len(names)} ops fingerprinted at current tree",
                  file=sys.stderr)
            continue
        commit = _round_commit(rnd)
        if commit is None:
            print(f"r{rnd}: no driver commit found; {len(names)} ops left "
                  f"unverified (will front)", file=sys.stderr)
            continue
        fps = _fingerprints_at(commit, names)
        verified.update(fps)
        print(f"r{rnd}: {len(fps)}/{len(names)} ops fingerprinted at "
              f"{commit[:7]}", file=sys.stderr)

    (REPO_ROOT / "VERIFIED_FINGERPRINTS.json").write_text(
        json.dumps(dict(sorted(verified.items())), indent=1) + "\n"
    )
    changed = [n for n in verified
               if n in ops and verified[n] != op_fingerprint(ops[n])]
    print(f"migrated {len(verified)} entries; {len(changed)} now mismatch the "
          f"current tree (rewritten since last green, will front): "
          f"{sorted(changed)}", file=sys.stderr)
    return verified


if __name__ == "__main__":
    migrate()

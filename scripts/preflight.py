#!/usr/bin/env python
"""Pre-commit gate for registry-touching changes (round-5 lesson:
commit `5c06510` changed an operator's output schema without running
any check and voided the whole round's bench).

Run this before ANY commit that touches `time_series_data_trimmer_spark/operators/`
or `time_series_data_trimmer_spark/queries*` — especially end-of-round snapshots:

    python scripts/preflight.py            # changed-module-targeted
    python scripts/preflight.py --all      # full 139-query oracle run
    python scripts/preflight.py q1 q2 ...  # explicit query names

What it does:
1. Runs the registry-wide plan sweep
   (`tests/test_plan_shapes.py::test_registry_sweep_global_invariants`) —
   this analyzes every registered query's plan, so ANY AnalysisException
   introduced anywhere in the registry fails here in seconds.
2. Determines affected queries: for each operator/function module
   changed per `git diff --name-only HEAD` (staged + unstaged), finds
   every registered query whose source references that module's import
   alias, and runs `scripts/check_oracle.py` on exactly those at
   sf0.001 (exact DuckDB comparison, small data, fast).

Exit code 0 == safe to commit.
"""

from __future__ import annotations

import inspect
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "time_series_data_trimmer_spark"


def changed_files() -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", "HEAD"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    extra = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return [f for f in (out + extra).splitlines() if f.strip()]


def module_aliases() -> dict[str, set[str]]:
    """Map repo-relative module path -> the import aliases the query
    registries use for it (parsed from their import statements)."""
    alias_map: dict[str, set[str]] = {}
    pat = re.compile(
        rf"from {PKG}(?:\.([\w.]+))? import ([\w]+)(?: as ([\w]+))?"
    )
    for regfile in ("queries.py", "queries_ext.py", "queries_parity.py"):
        path = os.path.join(REPO, PKG, regfile)
        with open(path) as fh:
            for line in fh:
                m = pat.match(line.strip())
                if not m:
                    continue
                sub, name, alias = m.groups()
                modpath = f"{PKG}/{sub.replace('.', '/')}" if sub else PKG
                # `from pkg.operators import dedup as dd` -> module file
                # pkg/operators/dedup.py, alias dd. `from pkg.operators.filters
                # import apply_filter` -> module file pkg/operators/filters.py,
                # alias apply_filter (a function name works the same for the
                # source-reference scan).
                cand_file = f"{modpath}/{name}.py"
                if os.path.exists(os.path.join(REPO, cand_file)):
                    key = cand_file
                else:
                    key = f"{modpath}.py"
                alias_map.setdefault(key, set()).add(alias or name)
    return alias_map


def affected_queries(files: list[str]) -> set[str] | None:
    """None == run everything (a registry file itself changed)."""
    from time_series_data_trimmer_spark.queries import REGISTRY
    import time_series_data_trimmer_spark.queries_ext  # noqa: F401
    import time_series_data_trimmer_spark.queries_parity  # noqa: F401

    reg_files = {f"{PKG}/queries.py", f"{PKG}/queries_ext.py", f"{PKG}/queries_parity.py"}
    if any(f in reg_files for f in files):
        return None
    amap = module_aliases()
    hit_aliases: set[str] = set()
    for f in files:
        if f in amap:
            hit_aliases |= amap[f]
    if not hit_aliases:
        return set()
    alias_pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in sorted(hit_aliases)) + r")\b"
    )
    out: set[str] = set()
    for name, (fn, _sql) in REGISTRY.items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            out.add(name)  # can't inspect -> be safe, include it
            continue
        if alias_pat.search(src):
            out.add(name)
    return out


def main() -> int:
    argv = sys.argv[1:]
    print("preflight: [1/2] registry-wide plan sweep ...", flush=True)
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x",
         "tests/test_plan_shapes.py"],
        cwd=REPO,
    ).returncode
    if rc != 0:
        print("preflight: PLAN SWEEP FAILED — do not commit.")
        return 1

    if argv and argv[0] == "--all":
        targets: list[str] = []
    elif argv:
        targets = argv
    else:
        files = changed_files()
        aff = affected_queries(files)
        if aff is None:
            print("preflight: registry file changed -> full oracle run")
            targets = []
        elif not aff:
            print("preflight: no registry-relevant modules changed — done.")
            return 0
        else:
            targets = sorted(aff)
            print(f"preflight: {len(targets)} affected queries: "
                  + " ".join(targets[:12]) + ("..." if len(targets) > 12 else ""))

    print("preflight: [2/2] exact oracle check (sf0.001) ...", flush=True)
    rc = subprocess.run(
        [sys.executable, "scripts/check_oracle.py", "/root/testdata/sf0.001",
         *targets],
        cwd=REPO,
    ).returncode
    if rc != 0:
        print("preflight: ORACLE CHECK FAILED — do not commit.")
        return 1
    print("preflight: GREEN — safe to commit.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

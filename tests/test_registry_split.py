"""The per-family registry split (VERDICT r9 #5) must be invisible to
the driver contract: identical ordered name list, identical oracle
coverage, every family module contributing, no module back above the
~5k-line ceiling the split exists to enforce."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    import __spark_entry__ as entry

    return entry


def test_ordered_names_frozen():
    """REGISTRY registration order matches the frozen fixture. Any
    reorder — a family module shuffle, a new import order, a lost
    reorder step — fails here. Checked on the RAW registry, not
    queries(): the `_FIRST_50` rotation reorders the queries() head
    intentionally every round (VERDICT rotation item), while the
    underlying registration order is the thing the module split could
    silently break. New registrations may land anywhere; the frozen
    names must keep their exact relative order.

    Provenance (ADVICE r11 #4): the r11 fixture was regenerated in
    the same change that re-targeted this assertion from queries() to
    REGISTRY, so it could not itself detect drift inside that window.
    Closed r12 by re-deriving the pre-split order from a worktree at
    ``e85d610^`` (the commit before the family split): importing that
    tree's REGISTRY gives 352 names whose order the 358-name r11
    fixture — and the current registry — preserve exactly (verified
    by subsequence equality). The fixture now pins the FULL registry
    (all 372 r11-final names, previously 14 r11 additions unpinned);
    regenerate by appending new names only, never by re-dumping over
    a reorder."""
    _entry()
    from time_series_data_trimmer_spark.queries import REGISTRY

    with open(os.path.join(REPO, "tests", "fixtures_registry_order.json")) as f:
        frozen = json.load(f)
    got = list(REGISTRY)
    fset = set(frozen)
    kept = [n for n in got if n in fset]
    assert kept == frozen, (
        "registration order drifted from the split-day freeze; first "
        f"divergence at {next(i for i, (a, b) in enumerate(zip(kept, frozen)) if a != b)}"
    )
    assert fset <= set(got), f"frozen names missing: {fset - set(got)}"


def test_every_query_has_exact_oracle():
    entry = _entry()
    names = set(entry.queries())
    oracles = entry.oracle_sql()
    missing = names - set(oracles)
    assert not missing, f"rows-only queries appeared: {sorted(missing)}"


def test_family_modules_all_register():
    """Each queries_fam/*.py module contributes at least one REGISTRY
    entry (guards against a family import silently dropped from
    queries_ext)."""
    _entry()
    from time_series_data_trimmer_spark.queries import REGISTRY

    fam_dir = os.path.join(
        REPO, "time_series_data_trimmer_spark", "queries_fam"
    )
    mods = [
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(fam_dir, "*.py"))
        if not p.endswith("__init__.py")
    ]
    assert len(mods) >= 14
    import importlib

    for m in mods:
        mod = importlib.import_module(
            f"time_series_data_trimmer_spark.queries_fam.{m}"
        )
        regs = [
            n for n in dir(mod) if n.startswith("_q_")
        ]
        assert regs, f"family module {m} defines no query functions"
    assert len(REGISTRY) >= 352


def test_no_module_above_size_ceiling():
    """The split's reason to exist: no single query module above ~5k
    lines (the former monolith was 23k)."""
    pkg = os.path.join(REPO, "time_series_data_trimmer_spark")
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        with open(path) as f:
            n = sum(1 for _ in f)
        assert n <= 5000, f"{os.path.relpath(path, REPO)} is {n} lines"

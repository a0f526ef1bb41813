"""Drift-proof registry inventory.

COVERAGE.md narrates the surface; this module DERIVES it —
``python -m mspr2_back_spark.tools.registry_report`` prints one
markdown row per registered query: defining module, oracle coverage
(hash-compared vs rows-only), and the query's driver-sweep position
(the driver's per-round correctness sweep covers the first 50
registry entries — plans/__init__.py::_SWEEP_FIRST). A pytest keeps
the derived counts in lockstep with the documented ones, so the
narration can't silently drift from the code.
"""

from __future__ import annotations

from mspr2_back_spark.plans import ORACLE_SQL, QUERIES

SWEEP_WINDOW = 50

# Queries retired from the freshness treadmill (COVERAGE.md registry
# retirement policy): still registered, oracle-parity-checked every
# pytest run, and user-callable — but no longer owed driver
# re-sweeps, because a registered sibling subsumes them and an
# in-repo test pins the equivalence. value = (round, subsumed-by).
RETIRED = {
    "percentile_prices": ("r12", "percentile_prices_refined"),
}


def registry_rows() -> list[dict]:
    """One dict per registered query, in registry (sweep) order."""
    rows = []
    for slot, (name, fn) in enumerate(QUERIES.items()):
        rows.append(
            {
                "name": name,
                "module": fn.__module__,
                "oracle": name in ORACLE_SQL,
                "sweep_slot": slot if slot < SWEEP_WINDOW else None,
            }
        )
    return rows


def summary() -> dict:
    rows = registry_rows()
    return {
        "total": len(rows),
        "treadmill": len(rows) - len(RETIRED),
        "retired": {k: v for k, v in sorted(RETIRED.items())},
        "oracle_checked": sum(r["oracle"] for r in rows),
        "rows_only": sorted(r["name"] for r in rows if not r["oracle"]),
        "in_sweep_window": sum(r["sweep_slot"] is not None for r in rows),
        "modules": sorted({r["module"] for r in rows}),
    }


def markdown() -> str:
    lines = [
        "| # | query | module | oracle | swept this round |",
        "|---|---|---|---|---|",
    ]
    for r in registry_rows():
        slot = "—" if r["sweep_slot"] is None else f"slot {r['sweep_slot']}"
        lines.append(
            f"| {r['sweep_slot'] if r['sweep_slot'] is not None else ''} "
            f"| `{r['name']}` | `{r['module'].rsplit('.', 1)[-1]}` "
            f"| {'hash' if r['oracle'] else 'rows-only'} | {slot} |"
        )
    s = summary()
    lines.append("")
    retired = ", ".join(
        f"`{k}` ({rnd}, subsumed by `{by}`)"
        for k, (rnd, by) in s["retired"].items()
    )
    lines.append(
        f"Total {s['total']} queries ({s['treadmill']} on the freshness "
        f"treadmill; retired: {retired or 'none'}) — "
        f"{s['oracle_checked']} oracle-checked, "
        f"{len(s['rows_only'])} rows-only ({', '.join(s['rows_only'])}); "
        f"{s['in_sweep_window']} in the driver's {SWEEP_WINDOW}-slot sweep "
        f"window this round."
    )
    return "\n".join(lines)


if __name__ == "__main__":
    print(markdown())

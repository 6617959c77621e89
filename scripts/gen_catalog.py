"""Regenerate docs/catalog.md from the query registry."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mapreducepy_spark.registry import load_catalog  # noqa: E402


def main() -> None:
    cat = load_catalog()
    lines = [
        "# Operator catalog",
        "",
        "Auto-generated from `mapreducepy_spark.registry` (regenerate with",
        "`python scripts/gen_catalog.py`). One row per `queries()` entry;",
        "'oracle' = hash-checked against DuckDB, 'rows-only' = approximate/",
        "RNG semantics that no cross-engine oracle can reproduce.",
        "",
        "| key | check | tags | summary |",
        "| --- | --- | --- | --- |",
    ]
    for name, q in sorted(cat.items()):
        doc = (q.doc or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        check = "oracle" if q.oracle else "rows-only"
        lines.append(f"| `{name}` | {check} | {', '.join(q.tags)} | {summary} |")
    out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "catalog.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {len(cat)} rows to {out}")


if __name__ == "__main__":
    main()

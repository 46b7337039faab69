#!/usr/bin/env python
"""Driver-budget rotation helper (see COVERAGE.md §rotation).

Reads every CORRECTNESS_r*.json in the repo root and prints, for the next
round's ``queries/__init__.py``:

  1. the updated ``_DRIVER_CHECKED`` set (every query name that has ever
     received a green driver row — hash or rows-only);
  2. any RED driver rows (fix these first — they got credit slots and
     failed);
  3. the never-driver-checked names in current registration order —
     the first 50 are the next round's window (the rotation in
     ``queries/__init__.py`` is a single ``_PRIORITY`` queue and
     self-promotes from disk, so normally NOTHING needs editing);
  4. whether ``zz_canary`` ever appeared (budget reached the end of the
     registry → rotation no longer needed).

Usage:  python tools/rotate.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    green: set[str] = set()
    last: dict[str, tuple[bool, str]] = {}
    canary_seen = False
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))

    def is_green(row: dict) -> bool:
        # hash-checked green, OR the driver's weaker rows-only check
        # (no oracle registered: spark ran and produced rows).
        if row.get("hash_match") is True:
            return True
        if row.get("err") == "no_oracle":
            return row.get("spark_rows") is not None
        return bool(row.get("rows_match")) and not row.get("err") \
            and row.get("hash_match") is not False

    for path in files:
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if name == "zz_canary":
                canary_seen = True
            ok = is_green(row)
            if ok:
                green.add(name)
            last[name] = (ok, f"{os.path.basename(path)}: {row}")

    # red = latest driver verdict is bad AND no later round fixed it
    red = {
        n: why for n, (ok, why) in last.items() if not ok and n not in green
    }

    import __spark_entry__ as entry

    names = list(entry.queries())
    never = [n for n in names if n not in green and n != "zz_canary"]

    print(f"# rounds scanned: {[os.path.basename(f) for f in files]}")
    print(f"# canary seen: {canary_seen}"
          + (" -> budget reaches registry end; rotation unnecessary"
             if canary_seen else ""))
    print(f"# driver-ever-green: {len(green)} / {len(names)} registered")
    if red:
        print(f"\n# RED driver rows ({len(red)}) — fix before rotating:")
        for n, why in sorted(red.items()):
            print(f"#   {n}: {why[:160]}")
    print(f"\n# never-driver-checked ({len(never)}), registration order.")
    print("# Rotation is the self-promoting _PRIORITY queue "
          "(queries/__init__.py):")
    print("#   positions 0-49 = this round's window; 50+ = staged for "
          "later rounds;")
    print("#   credited names park at the back automatically at import.")
    pos = {n: i for i, n in enumerate(names)}
    for n in never:
        i = pos[n]
        tag = "window" if i < 50 else "staged"
        print(f"    {n!r},  # {tag} (pos {i})")
    print("\n_DRIVER_CHECKED = frozenset({")
    for n in sorted(green):
        print(f"    {n!r},")
    print("})")


if __name__ == "__main__":
    main()

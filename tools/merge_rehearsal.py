"""Merge per-leg rehearsal JSONs (tools/scale_rehearsal.py --leg X) into
one artifact.

    python tools/merge_rehearsal.py OUT.json leg1.json leg2.json ...

Scalars that must agree across legs (n_docs, threshold, banding, ...)
are verified equal; the ``legs`` lists concatenate; everything else
unions (a key present in two legs must carry the same value).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, *ins = sys.argv[1:]
    merged: dict = {}
    legs: list = []
    for p in ins:
        with open(p) as f:
            rep = json.load(f)
        legs.extend(rep.pop("legs", []))
        for k, v in rep.items():
            if k in merged and merged[k] != v and not k.startswith("t_"):
                raise SystemExit(
                    f"conflicting value for {k!r}: {merged[k]!r} vs {v!r} ({p})"
                )
            merged[k] = v
    merged["legs"] = legs
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

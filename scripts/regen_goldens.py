"""Consciously regenerate tests/goldens.json (the build-date canary —
see tests/test_langid.py::test_frozen_goldens) after a deliberate
table or scoring change.

Prints a field-level diff of every changed entry first; pass --write
to actually update the file. Review the diff: summary changes OUTSIDE
the reference close sets are regressions, not drift.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cld2_ray.functions import langs  # noqa: E402
from cld2_ray.functions.langid import Detector  # noqa: E402
from cld2_ray.data.seeds import HELDOUT  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens.json")


def main() -> None:
    old = json.load(open(GOLDENS))
    det = Detector()
    new = {}
    n_changed = 0
    for code in old:
        r = det.detect(HELDOUT[code])
        entry = {
            "is_reliable": bool(r.is_reliable),
            "language3": [langs.lang_code(l) for l in r.language3],
            "percent3": [int(p) for p in r.percent3],
            "summary": r.summary_code,
            "text_bytes": int(r.text_bytes),
        }
        new[code] = entry
        if entry != old[code]:
            n_changed += 1
            for k in entry:
                if entry[k] != old[code][k]:
                    print(f"  {code}.{k}: {old[code][k]} -> {entry[k]}")
    print(f"{n_changed}/{len(old)} entries changed")
    if "--write" in sys.argv:
        with open(GOLDENS, "w") as f:
            json.dump(new, f, indent=1, ensure_ascii=False, sort_keys=True)
            f.write("\n")
        print(f"wrote {GOLDENS}")
    else:
        print("dry run — pass --write to update")


if __name__ == "__main__":
    main()

"""Fold standalone bitrate-curve JSONs into artifacts/bitrate_curves.json.

The judge-facing bitrate-ladder evidence lives in ONE indexed artifact
(artifacts/bitrate_curves.json, keyed by run name) rather than a pile of
per-run files (VERDICT r4 item 8). tools/eval_bitrate_curve.py still
writes standalone JSONs; this folds them into the index and removes the
standalone copies.

Run: python tools/fold_curves.py speechC_heldout=artifacts/bitrate_curve_speechC_heldout.json ...
(no args = the default r5 chain outputs; missing files are reported and
skipped so the tool is safe to run before the chain finishes.)
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IDX = os.path.join(_REPO, "artifacts", "bitrate_curves.json")

DEFAULTS = {
    "speechC_heldout":
        os.path.join(_REPO, "artifacts", "bitrate_curve_speechC_heldout.json"),
    "speechCAdv_heldout":
        os.path.join(_REPO, "artifacts",
                     "bitrate_curve_speechCAdv_heldout.json"),
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    pairs = (dict(a.split("=", 1) for a in argv) if argv else DEFAULTS)
    with open(IDX) as f:
        merged = json.load(f)
    changed = False
    for key, path in pairs.items():
        if not os.path.exists(path):
            print(f"missing {path} (skipped)")
            continue
        with open(path) as f:
            merged[key] = json.load(f)
        os.remove(path)
        changed = True
        print(f"folded {key} <- {path}")
    if changed:
        with open(IDX, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"wrote {IDX}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

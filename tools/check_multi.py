#!/usr/bin/env python3
"""Merge VerifyMulti's per-SF dumps into the committed multi-SF
correctness artifact.

Usage: python3 tools/check_multi.py <outRoot> <artifact.json> [round]

<outRoot> is `runMain graft.VerifyMulti <outRoot> ...`'s output root: one
check.py-layout dir per scale factor (sf0.001/sf0.01/sf0.1). Each SF's
DuckDB compare runs via check.compare; the merged statuses land in
<artifact.json> as one row per query:

    {"round": 13,
     "sfs": ["sf0.001", "sf0.01", "sf0.1"],
     "queries": {"q_x": {"sf0.001": "ok", "sf0.01": "ok", "sf0.1": "ok"}},
     "summary": {"n_queries": 1, "n_green": 1, "all_ok": true}}

Exit 1 unless every query is "ok" at every SF. VerifyMultiSpec pins that
each round's SparkEntry.newThisRound names have fully-green rows in the
committed artifact.
"""
import json, os, sys
import check

SFS = ["sf0.001", "sf0.01", "sf0.1"]
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

def main():
    out_root, artifact = sys.argv[1], sys.argv[2]
    rnd = int(sys.argv[3]) if len(sys.argv) > 3 else None
    merged = {}
    for sf in SFS:
        outdir = f"{out_root}/{sf}"
        if not os.path.isdir(outdir):
            sys.exit(f"missing VerifyMulti dump dir: {outdir}")
        print(f"-- {sf}")
        for name, status in check.compare(f"{TESTDATA}/{sf}", outdir).items():
            merged.setdefault(name, {})[sf] = status
    n_green = sum(1 for v in merged.values()
                  if all(v.get(sf) == "ok" for sf in SFS))
    doc = {
        "round": rnd,
        "sfs": SFS,
        "queries": {k: {sf: v.get(sf, "missing") for sf in SFS}
                    for k, v in sorted(merged.items())},
        "summary": {"n_queries": len(merged), "n_green": n_green,
                    "all_ok": n_green == len(merged)},
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"== {n_green}/{len(merged)} queries green at all "
          f"{len(SFS)} SFs -> {artifact}")
    sys.exit(0 if n_green == len(merged) else 1)

if __name__ == "__main__":
    main()

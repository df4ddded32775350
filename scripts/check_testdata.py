"""Testdata preflight: diff the physical parquet schemas AND content
fingerprints (size:md5 per table) against the committed snapshot
(TESTDATA_SCHEMA.json). A `__content__` drift with identical schemas
means regenerated VALUES — recalibrate the absolute invariant floors
(ann_recall) and golden-VALUES oracles before trusting a red row.

Known false-positive mode (ADVICE r11): `__content__` is an md5 of the
RAW parquet bytes, so a value-identical regeneration that differs only
in writer metadata, compression, or row-group layout also reports
drift. That is accepted for a loud preflight — the response to any
`__content__`-only drift is "re-verify the calibrated floors against
the new files", which is cheap and safe even when the values turn out
identical. If byte-level noise ever appears round-over-round, switch
to canonicalized per-column value hashes via pyarrow instead.

The driver regenerates /root/testdata between rounds; round 3 died by
assuming it stable (events.ts silently re-encoded TIMESTAMP(NANOS) ->
TIMESTAMP(MICROS)-NTZ). The readers now self-adapt to known vintages,
but NEW tables / columns / type changes still deserve a loud first-
minute signal. Run at session start:

    python scripts/check_testdata.py            # diff vs snapshot
    python scripts/check_testdata.py --update   # re-record the snapshot

Exit 0 = identical; exit 1 = drift (printed per table/field).
"""

import hashlib
import json
import os
import sys

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(ROOT, "TESTDATA_SCHEMA.json")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SFS = ("sf0.001", "sf0.01", "sf0.1")


def scan() -> dict:
    out: dict = {}
    for sf in SFS:
        d = os.path.join(TESTDATA, sf)
        if not os.path.isdir(d):
            out[sf] = {"__missing_dir__": True}
            continue
        tables = {}
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(d, fn)
            schema = pq.read_schema(path)
            fields = {f.name: str(f.type) for f in schema}
            # Content fingerprint (VERDICT r10 item 4): a regenerated
            # table with an identical schema but a different value
            # distribution would silently move measured quantities the
            # absolute invariant floors (ann_recall's 0.4/0.9 probe
            # recalls, golden-VALUES oracles) were calibrated against.
            # ~20 MB total across the three SFs — md5 is instant.
            h = hashlib.md5()
            with open(path, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            fields["__content__"] = f"{os.path.getsize(path)}:{h.hexdigest()}"
            tables[fn[: -len(".parquet")]] = fields
        out[sf] = tables
    return out


def diff(old: dict, new: dict) -> list[str]:
    msgs = []
    for sf in sorted(set(old) | set(new)):
        o, n = old.get(sf, {}), new.get(sf, {})
        for t in sorted(set(o) | set(n)):
            if t not in n:
                msgs.append(f"{sf}/{t}: table REMOVED")
                continue
            if t not in o:
                msgs.append(f"{sf}/{t}: table ADDED ({list(n[t])})")
                continue
            for c in sorted(set(o[t]) | set(n[t])):
                ot, nt = o[t].get(c), n[t].get(c)
                if ot != nt:
                    msgs.append(f"{sf}/{t}.{c}: {ot!r} -> {nt!r}")
    return msgs


def main() -> int:
    current = scan()
    if "--update" in sys.argv or not os.path.exists(SNAPSHOT):
        with open(SNAPSHOT, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"snapshot written: {SNAPSHOT}")
        return 0
    with open(SNAPSHOT) as f:
        recorded = json.load(f)
    msgs = diff(recorded, current)
    if not msgs:
        print("testdata schemas + content identical to snapshot")
        return 0
    print("TESTDATA DRIFT vs snapshot:")
    for m in msgs:
        print(" ", m)
    print("(readers self-adapt to known vintages — verify affected "
          "qnames, then re-record with --update)")
    return 1


if __name__ == "__main__":
    sys.exit(main())

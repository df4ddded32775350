"""Scaling-curve probe for the two flagship corpus-dedup operators.

Blows up the sf0.1 documents table by self-union with shifted doc_ids
(each copy's text is salted with its replica tag so replicas are
near-dups, not byte-dups — the hard case for MinHash: candidate pairs
GROW with the blowup) and times minhash_dedup + line_dedup end-to-end
(noop sink) at 1x / 4x / 16x. A plan that hides a super-linear join
or a driver-side collapse shows up as a bending curve; band-joined
MinHash and hash-argmin line dedup should both track the candidate /
line count roughly linearly.

    python scripts/dedup_scaling_probe.py          # prints one JSON line
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.operators.dedupe import minhash_dedup
from books2scrape_etl_spark.queries import QUERIES, freeze_registry_heap
from books2scrape_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 4, 16)


def blowup(docs, factor: int):
    if factor == 1:
        return docs
    out = None
    for i in range(factor):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # salt the tail so replicas are NEAR-duplicates (high but
            # sub-1.0 Jaccard) — exercises banding + verification, not
            # just the exact-hash shortcut
            F.concat(F.col("text"), F.lit(f" replica tag {i}")).alias("text"),
        )
        out = c if out is None else out.union(c)
    return out


def main() -> None:
    freeze_registry_heap()
    spark = get_spark(app_name="dedup_scaling_probe")
    docs0 = read_table(spark, "documents", SF_DIR).select("doc_id", "text")
    results: dict = {"sf": SF_DIR, "factors": {}}
    for f in FACTORS:
        docs = blowup(docs0, f).persist()
        n = docs.count()  # materialize the blowup outside the timing
        t0 = time.time()
        minhash_dedup(docs).write.format("noop").mode("overwrite").save()
        t_mh = round(time.time() - t0, 2)
        t0 = time.time()
        # line_dedup's registered form reads from the SF dir; inline the
        # same keep-first pipeline over the blown-up frame instead
        words = docs.select("doc_id", F.split("text", " ").alias("w"))
        lines = words.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int((size(w) - 1) div 10)),"
                    " i -> array_join(slice(w, i * 10 + 1, 10), ' '))"
                )
            ).alias("line_no", "line"),
        )
        keyed = lines.select(
            "doc_id",
            "line_no",
            F.md5("line").alias("k"),
            (F.col("doc_id") * 100000 + F.col("line_no")).alias("composite"),
        )
        firsts = keyed.groupBy("k").agg(F.min("composite").alias("first_c"))
        kept = keyed.join(
            firsts,
            (keyed["k"] == firsts["k"]) & (keyed["composite"] == firsts["first_c"]),
        )
        kept.write.format("noop").mode("overwrite").save()
        t_ld = round(time.time() - t0, 2)
        docs.unpersist()
        results["factors"][str(f)] = {
            "n_docs": n,
            "minhash_s": t_mh,
            "line_dedup_s": t_ld,
        }
        print(f"factor {f}: n={n} minhash={t_mh}s line_dedup={t_ld}s",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Wave-34 unit/property tests: Morton-code round trip + the z-block
locality law, mergeSchema null-backfill semantics, and the packing
audit's conservation laws against a pandas re-derivation."""

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs34 import (
    q_packing_efficiency,
    q_scan_schema_drift,
    q_zorder_layout,
)


def _morton(a: int, b: int) -> int:
    z = 0
    for i in range(8):
        z += ((a >> i) & 1) << (2 * i + 1)
        z += ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_blocks_bound_both_axes(spark, sf_dir):
    rows = q_zorder_layout(spark, sf_dir).collect()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pandas()
    a = (li["l_partkey"] % 256).to_numpy()
    b = (li["l_suppkey"] % 256).to_numpy()
    z = np.array([_morton(int(x), int(y)) for x, y in zip(a, b)])
    blocks = {}
    for zi, ai, bi in zip(z // 4096, a, b):
        m = blocks.setdefault(int(zi), [255, 0, 255, 0, 0])
        m[0], m[1] = min(m[0], int(ai)), max(m[1], int(ai))
        m[2], m[3] = min(m[2], int(bi)), max(m[3], int(bi))
        m[4] += 1
    assert len(rows) == len(blocks)
    for r in rows:
        m = blocks[r["zblock"]]
        assert (r["min_a"], r["max_a"], r["min_b"], r["max_b"], r["n"]) == (
            m[0], m[1], m[2], m[3], m[4],
        )
        # the locality law: a 4096-code block spans <= 64 values per axis
        assert r["max_a"] - r["min_a"] <= 63
        assert r["max_b"] - r["min_b"] <= 63


def test_schema_drift_backfills_v1_with_nulls(spark, sf_dir):
    out = q_scan_schema_drift(spark, sf_dir).collect()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    assert len(out) == 2 * len(nation)
    region = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    for r in out:
        if r["snapshot"] == "v1":
            assert r["regionkey"] is None
        else:
            assert r["regionkey"] == region[r["nationkey"]]


def test_packing_efficiency_conserves_mass(spark, sf_dir):
    from books2scrape_etl_spark.operators.packing import pack_next_fit
    from books2scrape_etl_spark.io import read_table

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    rows = q_packing_efficiency(spark, sf_dir).collect()
    # conservation: bucketed fills sum to the corpus char total
    assert sum(r["total_fill"] for r in rows) == int(docs["n_chars"].sum())
    assert sum(r["n_docs"] for r in rows) == len(docs)
    # pack count equals the packer's distinct (lang, pack_id)
    packed = pack_next_fit(
        read_table(spark, "documents", sf_dir), "lang", "doc_id", "n_chars", 2048
    )
    n_packs = packed.select("lang", "pack_id").distinct().count()
    assert sum(r["n_packs"] for r in rows) == n_packs
    for r in rows:
        assert r["total_waste"] >= 0
        assert r["fill_decile"] >= 0
        if r["fill_decile"] >= 10:
            # decile 10+ holds only full or oversize packs: zero waste
            assert r["total_waste"] == 0

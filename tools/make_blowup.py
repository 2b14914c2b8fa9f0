#!/usr/bin/env python3
"""Synthetic NxN scale blowup of a testdata sf directory (measurement
tooling, not library code): documents/embeddings replicate with FRESH ids,
lineitem/orders replicate with a SHARED order-key offset so their join
keys stay consistent; every other table copies through unchanged.

Replicated content is byte-identical on purpose — identical crawl copies
are exactly the adversarial case the dedup path's exact-collapse defends
against, and near-dup PAIR output then grows quadratically in the copy
count BY DEFINITION (those pairs really exist); SCALE.md interprets the
measured ratios accordingly.

Usage: make_blowup.py <src_sf_dir> <dst_dir> [factor=10]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def replicate(tab: pa.Table, key: str, offset: int, factor: int) -> pa.Table:
    idx = tab.schema.get_field_index(key)
    field = tab.schema.field(key)
    copies = [tab]
    for i in range(1, factor):
        shifted = pc.add(tab[key], i * offset).cast(field.type)
        copies.append(tab.set_column(idx, field, shifted))
    return pa.concat_tables(copies)


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    # shared offset: lineitem.l_orderkey references orders.o_orderkey, so
    # both replicate with the SAME shift or the join keys dangle
    order_offset = pc.max(pq.read_table(
        f"{src}/orders.parquet", columns=["o_orderkey"])["o_orderkey"]
    ).as_py() + 1

    plans = {
        "documents": ("doc_id", None),   # fresh ids, offset = own max+1
        "embeddings": ("vec_id", None),
        "lineitem": ("l_orderkey", order_offset),
        "orders": ("o_orderkey", order_offset),
    }
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-len(".parquet")]
        if name not in plans:
            shutil.copyfile(f"{src}/{f}", f"{dst}/{f}")
            print(f"copied    {name}")
            continue
        key, offset = plans[name]
        tab = pq.read_table(f"{src}/{f}")
        if offset is None:
            offset = pc.max(tab[key]).as_py() + 1
        big = replicate(tab, key, offset, factor)
        pq.write_table(big, f"{dst}/{f}")
        print(f"replicated {name}: {tab.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()

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


def replicate(tab: pa.Table, key: str, offset: int, factor: int,
              mutate_col: str = None, mode: str = "permute") -> pa.Table:
    idx = tab.schema.get_field_index(key)
    field = tab.schema.field(key)
    copies = [tab]
    for i in range(1, factor):
        shifted = pc.add(tab[key], i * offset).cast(field.type)
        c = tab.set_column(idx, field, shifted)
        if mutate_col is not None:
            midx = tab.schema.get_field_index(mutate_col)
            texts = tab[mutate_col].to_pylist()
            mutated = []
            if mode == "permute":
                # deterministic per-copy word permutation: same vocabulary
                # and length distribution, but shingle structure DESTROYED
                # — copies are NOT near-dups, yet every word's df scales
                # with the copy count (zero new vocabulary): the
                # ADVERSARIAL regime for df-ranked prefix filtering
                import random
                rng = random.Random(1000 + i)
                for t in texts:
                    words = (t or "").split(" ")
                    rng.shuffle(words)
                    mutated.append(" ".join(words))
            else:  # mode == "tag"
                # fresh vocabulary per copy (every word tagged): per-copy
                # near-dup structure preserved exactly, df distribution
                # SHAPE preserved (Heaps-law-like growth) — the regime a
                # real crawl's growth resembles
                tagg = f"c{i}"
                for t in texts:
                    mutated.append(" ".join(
                        tagg + w for w in (t or "").split(" ")))
            c = c.set_column(midx, tab.schema.field(mutate_col),
                             pa.array(mutated, tab.schema.field(mutate_col).type))
        copies.append(c)
    return pa.concat_tables(copies)


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4].lstrip("-") if len(sys.argv) > 4 else None
    assert mode in (None, "mutate", "tag"), mode
    mutate = mode is not None
    if mode == "mutate":
        mode = "permute"
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
        mcol = "text" if (mutate and name == "documents") else None
        big = replicate(tab, key, offset, factor, mutate_col=mcol,
                        mode=mode or "permute")
        pq.write_table(big, f"{dst}/{f}")
        tag = f" ({mode} copies)" if mcol else ""
        print(f"replicated {name}: {tab.num_rows} -> {big.num_rows} rows{tag}")


if __name__ == "__main__":
    main()

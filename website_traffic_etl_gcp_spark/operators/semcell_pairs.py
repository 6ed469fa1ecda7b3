"""Within-cell pairwork kernels for the semantic-dedup tier.

The semantic cells (plans/embeddings.semantic_cell_frame +
skew_refine_cells) bound every cell at ~SEMDEDUP_CELL_CAP vectors, so
within-cell all-pairs cosine is O(n × cap) — but expressing the pair
cosine as ``F.aggregate(F.zip_with(...))`` over a self-join evaluates
an INTERPRETED higher-order function once per pair: profiled at sf1
(20k vectors, 40 cells, ~5M pairs) the HOF pairwork alone was ~7 s of
the query's 10.3 s, and it grows linearly with corpus × cap. These
kernels move the same arithmetic into one Arrow-batched
``applyInPandas`` per cell (FlatMapGroupsInPandas — the plan-audit-
sanctioned Python shape; BatchEvalPython row-at-a-time stays banned).

Bit-exactness contract: the pair cosine must equal the engine twins —
Spark's ``F.aggregate(zip_with(ua, ub, *), 0.0, +)`` and DuckDB's
``list_inner_product`` — which both accumulate LEFT TO RIGHT over the
dimensions. The kernel therefore accumulates with an explicit loop
over dimensions (``acc += U_blk[:, i] * U[:, i]``), vectorized across
pairs: per pair the additions happen in the identical dimension
order, so every partial sum is the same IEEE double (numpy ufuncs
don't fuse multiply-add). ``np.round`` (half-even) vs Spark's
half-up ``F.round`` differ only on exact half-microunit boundaries —
measure-zero for 64-term dot products, and the oracle sweeps at
sf0.001/0.01/1/10 pin the agreement empirically.

Memory: pair blocks are chunked (``_BLOCK`` rows of the m×m cosine
matrix at a time), so a cell of occupancy m costs O(_BLOCK × m)
scratch regardless of m — a pathological unsplittable cell (identical
signatures) degrades gracefully instead of allocating m² at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_BLOCK = 1024


def _unit_matrix(pdf: pd.DataFrame) -> np.ndarray:
    return np.stack(pdf["unit"].to_numpy()).astype(np.float64, copy=False)


def unit_sig_frame(
    emb: DataFrame,
    planes_lo: np.ndarray,
    planes_hi: np.ndarray,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, label, sig, unit): the per-row L2 unit vector and the
    two-seed sign-bit signature (low byte = ``planes_lo``, high byte =
    ``planes_hi``), computed in ONE Arrow-batched mapInPandas instead
    of 2 × n_planes interpreted HOF dot reductions per row — profiled
    at sf1 the HOF form was ~3.2 s for 20k rows (~160 µs/row of
    interpreter overhead on ~0.1 µs of flops). Bit-exact contract as
    the module docstring: float32 inputs cast to double first, dots
    and the squared norm accumulate left-to-right over dimensions,
    sign bits taken on the 6dp-rounded dot — the identical arithmetic
    of operators/similarity.lsh_signature and functions/vectors.norm,
    which the DuckDB oracles replay."""
    n_lo = planes_lo.shape[0]

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nsq = np.zeros(len(pdf))
            for i in range(x.shape[1]):
                nsq += x[:, i] * x[:, i]
            unit = x / np.sqrt(nsq)[:, None]
            sig = np.zeros(len(pdf), dtype=np.int64)
            for planes, shift in ((planes_lo, 0), (planes_hi, n_lo)):
                for b, plane in enumerate(planes):
                    d = np.zeros(len(pdf))
                    for i in range(x.shape[1]):
                        d += x[:, i] * plane[i]
                    sig |= (np.round(d, 6) > 0).astype(np.int64) << (
                        b + shift
                    )
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "label": pdf[label_col].to_numpy(np.int64),
                    "sig": sig,
                    "unit": list(unit),
                }
            )

    return emb.select(id_col, label_col, vec_col).mapInPandas(
        fn, "vec_id bigint, label bigint, sig bigint, unit array<double>"
    )


def _pair_cos_block(u_blk: np.ndarray, u_all: np.ndarray) -> np.ndarray:
    """Rounded cosine of every (block row × all rows) pair, accumulated
    left-to-right over dimensions — the exact zip_with/aggregate and
    list_inner_product summation order, vectorized across pairs."""
    acc = np.zeros((u_blk.shape[0], u_all.shape[0]))
    for i in range(u_all.shape[1]):
        acc += u_blk[:, i : i + 1] * u_all[:, i]
    out = np.round(acc, 6)
    # np.round(-1e-9, 6) is -0.0; Spark's BigDecimal round and the
    # oracle emit +0.0 — normalize so the value-hash compare agrees
    out[out == 0] = 0.0
    return out


def cell_min_dup(asg: DataFrame, tau: float) -> DataFrame:
    """(vec_id, dup_of): for every vector with a cosine-≥tau neighbor
    of smaller id in its cell, the smallest such neighbor — the
    keep-smallest SemDeDup verdict. Input: (vec_id, cell_id, unit)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"vec_id": [], "dup_of": []}).astype(
                {"vec_id": "int64", "dup_of": "int64"}
            )
        ids = pdf["vec_id"].to_numpy(np.int64)
        u = _unit_matrix(pdf)
        out_id: list[np.ndarray] = []
        out_dup: list[np.ndarray] = []
        sentinel = np.iinfo(np.int64).max
        for s in range(0, m, _BLOCK):
            blk = slice(s, min(s + _BLOCK, m))
            ok = _pair_cos_block(u[blk], u) >= tau
            ok &= ids[None, :] < ids[blk, None]
            cand = np.where(ok, ids[None, :], sentinel)
            mins = cand.min(axis=1)
            hit = mins != sentinel
            out_id.append(ids[blk][hit])
            out_dup.append(mins[hit])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_id),
                "dup_of": np.concatenate(out_dup),
            }
        )

    return asg.groupBy("cell_id").applyInPandas(
        fn, "vec_id bigint, dup_of bigint"
    )


def cell_dup_pairs(asg: DataFrame, tau: float) -> DataFrame:
    """(vec_a, vec_b, cosine): every within-cell pair (smaller id
    first) whose rounded cosine clears tau — the near-duplicate pair
    manifest. Input: (vec_id, cell_id, unit)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cosine": []}
            ).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        ids = pdf["vec_id"].to_numpy(np.int64)
        u = _unit_matrix(pdf)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for s in range(0, m, _BLOCK):
            blk = slice(s, min(s + _BLOCK, m))
            cos = _pair_cos_block(u[blk], u)
            # each unordered pair once: the block row holds vec_a
            ok = (cos >= tau) & (ids[blk, None] < ids[None, :])
            r, c = np.nonzero(ok)
            out_a.append(ids[blk][r])
            out_b.append(ids[c])
            out_c.append(cos[r, c])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return asg.groupBy("cell_id").applyInPandas(
        fn, "vec_a bigint, vec_b bigint, cosine double"
    )

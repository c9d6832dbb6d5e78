"""Offline JW-kernel scaling harness (no Spark): replay REAL 144k-corpus
Arrow-sized batches through candidate kernel variants at P=4 / P=16
processes — the r4-proven way to measure worker-contention scaling of the
scoring segment's critical path without paying a full Spark protocol window
per experiment.

Needs scripts/stage_inputs_144k.py output (.benchtmp/namepairs144k).

Usage: python scripts/jw_offline_harness.py [n_batches] [variants...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.dataset as ds

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from entity_resolver_spark.functions.similarity import (  # noqa: E402
    _encode_batch,
    jaro_winkler_batch,
)

BATCH_ROWS = 10_000  # spark.sql.execution.arrow.maxRecordsPerBatch default
_JW_CHUNK = 2048


# ---------------------------------------------------------------- variants
def pudf_body_current(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact copy of jaro_winkler_pudf's per-batch logic (factorize + kernel)."""
    af = pd.Series(a).fillna("")
    bf = pd.Series(b).fillna("")
    ca, _ua = pd.factorize(af)
    cb, ub = pd.factorize(bf)
    codes, _ = pd.factorize(ca.astype(np.int64) * len(ub) + cb)
    first = np.zeros(codes.max() + 1, dtype=np.int64)
    first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
    uniq = jaro_winkler_batch(af.to_numpy()[first], bf.to_numpy()[first])
    return uniq[codes]


def _jw_kernel_u8(av: np.ndarray, bv: np.ndarray) -> np.ndarray:
    """uint8-downcast kernel: name keys are overwhelmingly ASCII, and the
    inner loop's traffic (B scans + cand bools) is the bandwidth hog —
    4x-narrower codes cut it."""
    n = len(av)
    A, la = _encode_batch(av, 0x10FFFE)
    B, lb = _encode_batch(bv, 0x10FFFF)
    # pads truncate to 0xFE/0xFF; real chars < 0xFE keep equality semantics
    if (A < 0xFE).sum() + (A >= 0x10FFFE).sum() == A.size and (
        (B < 0xFE).sum() + (B >= 0x10FFFF).sum() == B.size
    ):
        A = A.astype(np.uint8)
        B = B.astype(np.uint8)
    L1, L2 = A.shape[1], B.shape[1]
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)[:, None]
    jpos = np.arange(L2)[None, :]
    flags1 = np.zeros((n, L1), dtype=bool)
    flags2 = np.zeros((n, L2), dtype=bool)
    matches = np.zeros(n, dtype=np.int64)
    validb = jpos < lb[:, None]
    rows_all = np.arange(n)
    i_max = int(la.max())
    for i in range(i_max):
        cand = (B == A[:, i][:, None]) & (np.abs(jpos - i) <= w) & validb & ~flags2
        j = cand.argmax(axis=1)
        hit = cand[rows_all, j]
        rows = np.nonzero(hit)[0]
        flags2[rows, j[rows]] = True
        flags1[rows, i] = True
        matches += hit
    t_a = A[flags1]
    t_b = B[flags2]
    seg = np.repeat(np.arange(n), matches)
    trans = (
        np.bincount(seg, weights=(t_a != t_b).astype(np.float64), minlength=n)
        .astype(np.int64)
        // 2
    )
    m = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - trans) / m) / 3.0
    jaro = np.where(matches > 0, jaro, 0.0)
    k = min(4, L1, L2)
    if k > 0:
        prefix = np.cumprod(A[:, :k] == B[:, :k], axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    jw = jaro + prefix * 0.1 * (1.0 - jaro)
    return np.where(av == bv, 1.0, jw)


def batch_u8(av: np.ndarray, bv: np.ndarray) -> np.ndarray:
    n = len(av)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    same = av == bv
    out[same] = 1.0
    todo = np.nonzero(~same)[0]
    if not todo.size:
        return out
    av = av[todo]
    bv = bv[todo]
    sub = np.empty(todo.size, dtype=np.float64)
    mx = np.maximum(
        np.fromiter(map(len, av), np.int64, todo.size),
        np.fromiter(map(len, bv), np.int64, todo.size),
    )
    bucket = np.searchsorted([16, 32, 64], mx, side="left")
    for bkt in np.unique(bucket):
        idx = np.nonzero(bucket == bkt)[0]
        for s in range(0, idx.size, _JW_CHUNK):
            sl = idx[s : s + _JW_CHUNK]
            sub[sl] = _jw_kernel_u8(av[sl], bv[sl])
    out[todo] = sub
    return out


def pudf_body_u8(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    af = pd.Series(a).fillna("")
    bf = pd.Series(b).fillna("")
    ca, _ua = pd.factorize(af)
    cb, ub = pd.factorize(bf)
    codes, _ = pd.factorize(ca.astype(np.int64) * len(ub) + cb)
    first = np.zeros(codes.max() + 1, dtype=np.int64)
    first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
    uniq = batch_u8(af.to_numpy()[first], bf.to_numpy()[first])
    return uniq[codes]


VARIANTS = {
    "current": pudf_body_current,
    "u8": pudf_body_u8,
}

# ---------------------------------------------------------------- driving
_BATCHES: list = []
_FN = None


def _init(batches, fn_name):
    global _BATCHES, _FN
    _BATCHES = batches
    _FN = VARIANTS[fn_name]


def _work(idx: int) -> int:
    a, b = _BATCHES[idx]
    r = _FN(a, b)
    return len(r)


def load_batches(n_batches: int, sort_within_file: bool) -> list:
    d = ds.dataset(os.path.join(REPO, ".benchtmp", "namepairs144k"))
    files = sorted(d.files)
    batches = []
    per_file = max(1, n_batches // len(files))
    for fpath in files:
        if len(batches) >= n_batches:
            break
        t = ds.dataset(fpath).to_table()
        a = np.asarray(t.column("l_name_key").to_pylist(), dtype=object)
        b = np.asarray(t.column("r_name_key").to_pylist(), dtype=object)
        if sort_within_file:
            order = np.lexsort((b.astype(str), a.astype(str)))
            a, b = a[order], b[order]
        for s in range(0, min(len(a), per_file * BATCH_ROWS), BATCH_ROWS):
            batches.append((a[s : s + BATCH_ROWS], b[s : s + BATCH_ROWS]))
            if len(batches) >= n_batches:
                break
    return batches


def distinct_share(batches) -> float:
    tot = d = 0
    for a, b in batches:
        df = pd.DataFrame({"a": a, "b": b})
        d += len(df.drop_duplicates())
        tot += len(df)
    return d / tot


def measure(batches, fn_name: str, p: int, reps: int = 3) -> float:
    n_rows = sum(len(a) for a, _ in batches)
    walls = []
    for _ in range(reps):
        with mp.get_context("fork").Pool(
            p, initializer=_init, initargs=(batches, fn_name)
        ) as pool:
            pool.map(_work, range(min(p, len(batches))))  # warm imports
            t0 = time.monotonic()
            pool.map(_work, range(len(batches)), chunksize=1)
            walls.append(time.monotonic() - t0)
    return n_rows / sorted(walls)[len(walls) // 2]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    variants = sys.argv[2:] or list(VARIANTS)
    for sort_flag in (False, True):
        batches = load_batches(n_batches, sort_flag)
        share = distinct_share(batches)
        print(
            f"--- sorted={sort_flag} batches={len(batches)} "
            f"distinct_pair_share={share:.3f}",
            flush=True,
        )
        # exactness spot-check: every variant must equal 'current' on batch 0
        a0, b0 = batches[0]
        ref = pudf_body_current(a0, b0)
        for v in variants:
            got = VARIANTS[v](a0, b0)
            assert np.allclose(ref, got, atol=1e-12), f"variant {v} diverges"
        for v in variants:
            tp4 = measure(batches, v, 4)
            tp16 = measure(batches, v, 16)
            print(
                json.dumps(
                    {
                        "variant": v,
                        "sorted": sort_flag,
                        "tp_p4": round(tp4),
                        "tp_p16": round(tp16),
                        "eff": round(tp16 / tp4 / 4, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Float-precision margin audit for the three recall-gated ANN queries
(q_ann_lsh, q_ann_ivf, q_embedding_neardup) — VERDICT r8 directive #3.

Replicates the graft vector kernels bit-for-bit in numpy float64 (the
kernels cast array<float> up to double exactly and sum left-to-right;
see VectorKernels.scala) and measures, for every float decision the
three queries make, how far the decision quantity sits from its
boundary:

  1. LSH hyperplane signs (lshBucket): min |projection| over every
     (vector, bit, seed) the queries evaluate, plus the float32-vs-
     float64 sign-flip count (the COVERAGE.md declaration's claim).
  2. IVF centroid assignment (topCentroids over Lloyd iterations):
     min gap between best and runner-up dot per iteration (corpus
     assignment) and between probe nProbes and nProbes+1 (queries).
     Also the worst-case bound on summation-order nondeterminism
     (Spark computes centroid means via reduceByKey whose combine
     order is scheduling-dependent).
  3. round(cosine, 6) stability: min distance of every candidate
     cosine from the nearest 0.5e-6 rounding boundary, and min
     non-tie gap between ranked rounded cosines at the top-k cut.

If every margin exceeds the summation-order error bound by orders of
magnitude, the candidate sets are reproducible by ANY order-respecting
float64 replay (DuckDB included) and a hash oracle is sound; otherwise
the measured flip counts ground the no_oracle declaration empirically.

Usage: python3 tools/ann_margin_audit.py [sfDir]
"""
import sys
import numpy as np
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def hash_long(x, seed):
    """XXH64.hashLong(x, seed) — matches Spark's XXH64 / OracleSqlGen."""
    x &= M64
    k1 = (x * P2) & M64
    k1 = rotl(k1, 31)
    k1 = (k1 * P1) & M64
    h = ((seed + P5 + 8) & M64) ^ k1
    h = (rotl(h, 27) * P1 + P4) & M64
    return fmix(h)


def signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


LONG_MAX = float((1 << 63) - 1)


def hyperplane(n_dim, bit, seed):
    """Coefficient vector h(b, i) of lshBucket — exact doubles."""
    h_seed = hash_long(seed, 42)
    hb = hash_long(bit, h_seed)
    return np.array(
        [signed(hash_long(i, hb)) / LONG_MAX for i in range(n_dim)],
        dtype=np.float64)


def seq_dot(a, b):
    """Left-to-right sequential float64 dot — the kernel's order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def seq_dot32(a, b):
    acc = np.float32(0.0)
    a32 = a.astype(np.float32)
    b32 = b.astype(np.float32)
    for i in range(len(a32)):
        acc = np.float32(acc + a32[i] * b32[i])
    return float(acc)


con = duckdb.connect()
rows = con.execute(
    f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') "
    "ORDER BY vec_id").fetchall()
ids = np.array([r[0] for r in rows if r[1] is not None], dtype=np.int64)
raw = np.array([r[1] for r in rows if r[1] is not None], dtype=np.float64)
n, dim = raw.shape
n_null = sum(1 for r in rows if r[1] is None)
print(f"[audit] {n} non-null vectors (dim {dim}), {n_null} null, sf={SF}")

norms = np.sqrt((raw * raw).sum(axis=1))
unit = np.where(norms[:, None] != 0.0, raw / norms[:, None], raw)

# ---------------------------------------------------------------- LSH —
# q_ann_lsh: nBits=4 seed 42 on unit vectors? NO — lshTopK buckets the
# RAW embedding column (no l2Normalize before cosineLshBucket there);
# sign(proj) is scale-invariant so raw vs unit cannot flip, but audit
# the exact input the kernel sees: raw for lshTopK, unit for
# embeddingNearDup (which normalizes first).
def lsh_audit(vectors, n_bits, seeds, label):
    min_abs = np.inf
    flips = 0
    total = 0
    for seed in seeds:
        planes = [hyperplane(dim, b, seed) for b in range(n_bits)]
        for b, hp in enumerate(planes):
            for v in vectors:
                p64 = seq_dot(v, hp)
                p32 = seq_dot32(v, hp)
                total += 1
                min_abs = min(min_abs, abs(p64))
                if (p64 >= 0) != (p32 >= 0):
                    flips += 1
    # any-order float64 error bound: n*eps*sum|terms| (terms <= |v_i|)
    bound = dim * np.finfo(np.float64).eps * float(
        np.abs(vectors).sum(axis=1).max())
    print(f"[lsh:{label}] decisions={total} min|proj|={min_abs:.3e} "
          f"f32-vs-f64 sign flips={flips} any-order-err-bound={bound:.3e} "
          f"margin/bound={min_abs / bound:.1e}x")
    return flips


lsh_flips = lsh_audit(raw, 4, [42], "q_ann_lsh nBits=4 seed42 raw")
nd_flips = lsh_audit(unit, 3, [42, 43, 44, 45],
                     "q_embedding_neardup lshBits=3 bands=4 unit")

# ---------------------------------------------------------------- IVF —
# kmeansCentroids: init = 16 lowest-id unit vectors; 3 Lloyd iterations;
# assignment argmax dot (ties -> smaller centroid id); mean -> renorm.
N_CENT, ITERS, N_PROBES, K = 16, 3, 2, 5
cent = unit[np.argsort(ids)][:N_CENT].copy()

assign_margins = []
for it in range(ITERS):
    dots = np.array([[seq_dot(v, c) for c in cent] for v in unit])
    best = dots.max(axis=1)
    second = np.partition(dots, -2, axis=1)[:, -2]
    assign_margins.append(float((best - second).min()))
    assigned = dots.argmax(axis=1)  # numpy argmax ties -> first = smaller id
    new = []
    for c in range(N_CENT):
        sel = unit[assigned == c]
        if len(sel) == 0:
            new.append(cent[c])
        else:
            m = sel.mean(axis=0)
            nm = np.sqrt((m * m).sum())
            new.append(m / nm if nm != 0 else m)
    cent = np.array(new)

# final probe decisions: corpus top-1 gap + query nProbes cut gap
dots = np.array([[seq_dot(v, c) for c in cent] for v in unit])
best = dots.max(axis=1)
second = np.partition(dots, -2, axis=1)[:, -2]
corpus_gap = float((best - second).min())
qmask = ids < 16
sortd = -np.sort(-dots[qmask], axis=1)
probe_gap = float((sortd[:, N_PROBES - 1] - sortd[:, N_PROBES]).min())
# summation-order bound on a mean of <=n unit vectors, propagated
# through one dot: ~ dim*eps*1 per mean coord; dot adds dim*eps again
sum_order_bound = 2 * dim * np.finfo(np.float64).eps
print(f"[ivf] per-iter assignment margins={['%.3e' % m for m in assign_margins]}")
print(f"[ivf] final corpus-assign gap={corpus_gap:.3e} "
      f"query-probe-cut gap={probe_gap:.3e} "
      f"sum-order-err-bound={sum_order_bound:.3e} "
      f"margin/bound={min(corpus_gap, probe_gap) / sum_order_bound:.1e}x")

# -------------------------------------------------- rounding margins —
# every cosine either query can emit: for LSH/IVF candidates it is
# round(dot-of-unit-vectors, 6) (lshTopK recomputes cosine from raw via
# cosineSimilarity = same unit dot). Audit ALL pairwise cosines: a
# superset of every candidate set either bucketing can produce.
cos = unit @ unit.T
iu = np.triu_indices(n, 1)
vals = cos[iu]
scaled = vals * 1e6
dist_to_boundary = np.abs(scaled - np.floor(scaled) - 0.5) * 1e-6
round_margin = float(dist_to_boundary.min())
# neardup threshold margin: distance of rounded cosine from 0.4
rounded = np.round(vals, 6)
thr_margin = float(np.abs(rounded - 0.4).min())
print(f"[round] all-pairs cosines={len(vals)} "
      f"min dist to 0.5e-6 rounding boundary={round_margin:.3e}")
print(f"[neardup] min |round(cos,6) - 0.4| threshold margin={thr_margin:.3e}")

verdict_ok = (lsh_flips == 0 and nd_flips == 0
              and min(corpus_gap, probe_gap) > 1e6 * sum_order_bound
              and round_margin > 1e-10)
print(f"[audit] all decision margins clear of float noise: {verdict_ok}")

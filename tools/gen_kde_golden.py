#!/usr/bin/env python3
"""Generate the KDE rank-equivalence golden (KdeGoldenSpec).

Reimplements what the reference's R round-trip computes
(RKernelDensity.java:22-69: density(x, weights=w/sum(w),
window="gaussian", bw="SJ-dpi", n=1024), nearest-grid lookup,
newscore = alpha*log(kde) + (1-alpha)*score — RunQueryKDEHBase.java:97-99)
using numpy, from the PUBLISHED Sheather-Jones (1991) direct-plug-in
formulas (two-stage, Wand & Jones 1995 notation):

  psi8_NS = 105 / (32 sqrt(pi) sigma^9)
  g6  = ( -2 K6(0) / (psi8_NS n) )^(1/9),  K6(0) = -15/sqrt(2 pi)
  psi6 = (n(n-1))^-1 sum_ij g6^-7 phi6((xi-xj)/g6)
  g4  = ( -2 K4(0) / (psi6 n) )^(1/7),     K4(0) =   3/sqrt(2 pi)
  psi4 = (n(n-1))^-1 sum_ij g4^-5 phi4((xi-xj)/g4)
  h   = ( R(K) / (psi4 n) )^(1/5),         R(K) = 1/(2 sqrt(pi))

with sigma = min(sd, IQR/1.349) (R's scale estimate). This is the
algorithm R's bw.SJ(method="dpi") implements (R bins pairwise diffs at
nb=1000; n here is 50 per query, so we sum exactly — difference is far
below rank resolution).

Deterministic fixture: 3 qids x 50 docs, epochs in 2-3 clusters per
query (temporal-pooling shape), positive scores (R density weights must
be non-negative). Everything derived from fixed integer arithmetic --
no RNG, so regeneration is byte-stable.

Outputs (committed):
  src/test/resources/kde_golden/input.csv   qid,doc_id,score,ep
  src/test/resources/kde_golden/golden.csv  qid,doc_id,ref_rank (alpha=0.5)
"""
import csv
import math
import os

import numpy as np


def phi(u):
    return np.exp(-0.5 * u * u) / math.sqrt(2 * math.pi)


def phi4(u):
    return (u ** 4 - 6 * u ** 2 + 3) * phi(u)


def phi6(u):
    return (u ** 6 - 15 * u ** 4 + 45 * u ** 2 - 15) * phi(u)


def bw_sj_dpi(x):
    n = len(x)
    sd = np.std(x, ddof=1)
    iqr = np.percentile(x, 75) - np.percentile(x, 25)
    sigma = min(sd, iqr / 1.349)
    diffs = np.subtract.outer(x, x)
    psi8 = 105.0 / (32.0 * math.sqrt(math.pi) * sigma ** 9)
    k6_0 = -15.0 / math.sqrt(2 * math.pi)
    g6 = (-2.0 * k6_0 / (psi8 * n)) ** (1.0 / 9.0)
    psi6 = (phi6(diffs / g6).sum()) / (n * (n - 1) * g6 ** 7)
    k4_0 = 3.0 / math.sqrt(2 * math.pi)
    g4 = (-2.0 * k4_0 / (psi6 * n)) ** (1.0 / 7.0)
    psi4 = (phi4(diffs / g4).sum()) / (n * (n - 1) * g4 ** 5)
    rk = 1.0 / (2.0 * math.sqrt(math.pi))
    return (rk / (psi4 * n)) ** (1.0 / 5.0)


def r_density_grid(x, w, bw, n_grid=1024, cut=3.0):
    """R density(): equally spaced grid, weighted gaussian KDE."""
    lo, hi = x.min() - cut * bw, x.max() + cut * bw
    grid = np.linspace(lo, hi, n_grid)
    w = w / w.sum()
    y = np.zeros(n_grid)
    for xi, wi in zip(x, w):
        y += wi * phi((grid - xi) / bw) / bw
    return grid, y


def nearest_lookup(grid, y, v):
    return y[np.argmin(np.abs(v - grid))]


def make_fixture():
    """3 qids x 50 docs; epochs clustered; positive scores. All values
    from fixed integer recurrences (no RNG)."""
    rows = []
    base = 1230000000  # fixed epoch base
    for qi, qid in enumerate(("901", "902", "903")):
        for i in range(50):
            # 2-3 epoch clusters per query, deterministic jitter
            cluster = (i * 7 + qi) % (2 + qi % 2)
            jitter = ((i * 2654435761 + qi * 97) % 40000) - 20000
            ep = base + cluster * (1 + qi) * 1500000 + qi * 5000000 + jitter
            # positive, decaying, tie-free scores
            score = round(20.0 - i * 0.31 + ((i * 13 + qi * 5) % 7) * 0.053, 6)
            rows.append((qid, 10000 + qi * 1000 + i, score, ep))
    return rows


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..",
                           "src", "test", "resources", "kde_golden")
    os.makedirs(out_dir, exist_ok=True)
    rows = make_fixture()
    with open(os.path.join(out_dir, "input.csv"), "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["qid", "doc_id", "score", "ep"])
        wtr.writerows(rows)

    golden = []
    for qid in ("901", "902", "903"):
        sub = [r for r in rows if r[0] == qid]
        eps = np.array([float(r[3]) for r in sub])
        scores = np.array([r[2] for r in sub])
        bw = bw_sj_dpi(eps)
        grid, y = r_density_grid(eps, scores, bw)
        rescored = []
        for (q, doc, score, ep) in sub:
            kde_ll = math.log(nearest_lookup(grid, y, float(ep)))
            rescored.append((0.5 * kde_ll + 0.5 * score, doc))
        # sort desc by newscore, doc asc tiebreak (none by construction)
        rescored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, doc) in enumerate(rescored, 1):
            golden.append((qid, doc, rank))
        print(f"qid {qid}: bw.SJ-dpi = {bw:.1f}")

    with open(os.path.join(out_dir, "golden.csv"), "w", newline="") as f:
        wtr = csv.writer(f)
        wtr.writerow(["qid", "doc_id", "ref_rank"])
        wtr.writerows(golden)
    print(f"wrote {len(rows)} input rows, {len(golden)} golden ranks")


if __name__ == "__main__":
    main()

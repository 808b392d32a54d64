"""Fit product-quantization codebooks offline and commit the artifact.

PQ (Jegou et al., "Product quantization for nearest neighbor search",
TPAMI 2011 — public) splits each 64-dim vector into M=16 subvectors of
4 dims and learns K=16 centroids per subspace; a vector compresses to
16 nibble codes (32x smaller than float32), and query-candidate distance
is approximated by the ADC sum of per-subspace lookup-table entries.

Like the IVF coarse quantizer (tools/fit_ivf_centroids.py), the
codebooks are fit ONCE offline and committed as repo data keyed by the
table's realpath: the Spark path and the DuckDB oracle then consume
the same literals, so encode + ADC scoring get a full value-hash
oracle. The fit itself is deterministic numpy Lloyd iterations (fixed
init = subvectors of the lowest candidate vec_ids); at 100 TB you fit
on a ~1M-row sample — codebook quality converges long before full-data
scans.

Usage: python tools/fit_pq_codebooks.py [sf_dir ...]
Writes dbcut_spark/data/pq_codebooks.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dbcut_spark",
    "data",
    "pq_codebooks.json",
)

DEFAULT_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]
M_SUBSPACES = 16
K_CODES = 16
N_ITER = 10


def lloyd(sub: np.ndarray, k: int, n_iter: int) -> np.ndarray:
    """Deterministic Lloyd k-means: init = first k rows (callers pass
    vec_id-sorted data), empty clusters keep their previous centroid."""
    cents = sub[:k].astype(np.float64).copy()
    for _ in range(n_iter):
        d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = sub[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def main() -> None:
    import duckdb

    dirs = sys.argv[1:] or DEFAULT_DIRS
    entries = []
    for sf_dir in dirs:
        path = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.exists(path):
            continue
        rows = duckdb.sql(
            f"SELECT embedding FROM '{path}' WHERE vec_id >= 10 ORDER BY vec_id"
        ).fetchall()
        n_all, slab = duckdb.sql(
            f"SELECT COUNT(*), SUM(label) FROM '{path}'"
        ).fetchall()[0]
        x = np.array([r[0] for r in rows], dtype=np.float64)
        dim = x.shape[1]
        sub_dim = dim // M_SUBSPACES
        books = []
        for m in range(M_SUBSPACES):
            sub = x[:, m * sub_dim : (m + 1) * sub_dim]
            books.append(lloyd(sub, K_CODES, N_ITER).tolist())
        entries.append(
            {
                "path": os.path.realpath(sf_dir),
                "n_rows": int(n_all),
                "sum_label": int(slab),
                "m": M_SUBSPACES,
                "k": K_CODES,
                "dim": dim,
                "codebooks": books,
            }
        )
        print(f"fitted {sf_dir}: n={len(rows)} dim={dim}")
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    with open(ARTIFACT, "w") as f:
        json.dump(entries, f)
    print(f"wrote {ARTIFACT} ({len(entries)} entries)")


if __name__ == "__main__":
    main()

"""md5-deterministic mixture-of-Gaussians embedding rows (no RNG — the
repo's TESTDATA discipline): shared by the recall-quality pins and the
index-governance churn test."""

import hashlib

import numpy as np


def uniforms(seed: str, n: int) -> np.ndarray:
    """n md5-deterministic uniforms in [0, 1)."""
    out = np.empty(n)
    for i in range(0, n, 4):
        h = hashlib.md5(f"{seed}:{i // 4}".encode()).digest()
        for j in range(min(4, n - i)):
            out[i + j] = int.from_bytes(h[j * 4:(j + 1) * 4], "big") / 2**32
    return out


def cluster_centers(k: int, dim: int) -> np.ndarray:
    return np.array([uniforms(f"c{c}", dim) * 20.0 - 10.0
                     for c in range(k)])


def clustered_rows(n: int, k: int = 8, dim: int = 64, sig: float = 0.6,
                   id_offset: int = 0, cluster_of=None, label_of=None):
    """(vec_id, label, embedding) rows: point i sits at
    ``centers[cluster_of(i)] + sig * IrwinHall12-noise``, labeled
    ``label_of(i)`` (defaults: i % k for both). Distinct ``label_of``
    lets a test forge membership churn — points positioned in one
    cluster but filed under another list."""
    centers = cluster_centers(k, dim)
    cluster_of = cluster_of or (lambda i: i % k)
    label_of = label_of or cluster_of
    rows = []
    for i in range(n):
        g = (uniforms(f"p{id_offset + i}", dim * 12)
             .reshape(dim, 12).sum(axis=1) - 6.0)
        v = centers[cluster_of(i)] + sig * g
        rows.append((id_offset + i, label_of(i), [float(x) for x in v]))
    return rows

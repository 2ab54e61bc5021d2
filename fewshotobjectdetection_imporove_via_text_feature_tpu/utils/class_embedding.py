"""Class-name embedding loading (GloVe-300d / CLIP-512d).

Parity with defrcn/utils/class_embedding.py:4-24: per-class vectors live in
``datasets/{model}/{class}.txt`` (+ background.txt). Since the reference
repo never committed those files (and this environment has no egress to
fetch GloVe/CLIP), tools/generate_class_embeddings.py can synthesize
deterministic stand-ins; real embedding files drop into the same layout.

Deviation (documented): the reference's create_normalized_orthogonal_tensor
(class_embedding.py:16-24) subtracts the projection coefficient against an
UN-normalized random vector, so its output is not actually orthogonal to
anything; we implement the intended construction — a unit vector orthogonal
to the mean foreground embedding.
"""

from __future__ import annotations

import os

import numpy as np

SEMANTIC_DIMS = {"glove": 300, "clip": 512}


def get_class_embed(
    class_names,
    model: str,
    include_bg: bool = False,
    root: str = "datasets",
    allow_synthetic: bool = True,
) -> np.ndarray:
    """(C[+1], dim) float32 embedding bank."""
    dim = SEMANTIC_DIMS[model]
    vecs = []
    names = list(class_names) + (["background"] if include_bg else [])
    for name in names:
        path = os.path.join(root, model, f"{name}.txt")
        if os.path.exists(path):
            v = np.loadtxt(path, dtype=np.float64).reshape(-1)
            assert v.shape[0] == dim, f"{path}: dim {v.shape[0]} != {dim}"
        elif allow_synthetic:
            v = _synthetic_embedding(name, dim)
        else:
            raise FileNotFoundError(path)
        vecs.append(v)
    return np.asarray(vecs, np.float32)


def _synthetic_embedding(name: str, dim: int) -> np.ndarray:
    """Deterministic unit vector derived from the class name — a stand-in
    with the same API/shape as real GloVe/CLIP vectors."""
    seed = int.from_bytes(name.encode(), "little") % (2**31)
    rng = np.random.RandomState(seed)
    v = rng.randn(dim)
    return v / np.linalg.norm(v)


def create_normalized_orthogonal_tensor(vec: np.ndarray, seed: int = 0):
    """Unit vector orthogonal to ``vec`` (used as the fixed background
    embedding in SematicProposalAttention, ref attentive_modules.py:228)."""
    vec = np.asarray(vec, np.float64).reshape(-1)
    rng = np.random.RandomState(seed)
    r = rng.randn(vec.shape[0])
    v_hat = vec / max(np.linalg.norm(vec), 1e-12)
    r = r - np.dot(r, v_hat) * v_hat
    r = r / max(np.linalg.norm(r), 1e-12)
    return r.astype(np.float32).reshape(1, -1)

"""Checkpoint/resume for long parameter sweeps.

SURVEY.md §5: the reference has no checkpoint/resume anywhere; long sweeps
that die lose everything. This helper chunks a sweep, persists each completed
chunk to an ``.npz`` checkpoint, and resumes from the last completed chunk on
restart — failure costs at most one chunk of work.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

__all__ = ["checkpointed_sweep"]


def checkpointed_sweep(
    fn_batch: Callable,
    params: np.ndarray,
    checkpoint_path: str,
    chunk_size: int = 1024,
    progress_callback: Optional[Callable] = None,
):
    """Run ``fn_batch`` over ``params`` in chunks with durable checkpoints.

    Args:
        fn_batch: maps a (chunk,)-batched parameter array to batched results
            (any array pytree-leaf shape with leading chunk dim; converted to
            a single numpy array per chunk).
        params: (B, ...) parameter array.
        checkpoint_path: ``.npz`` file updated after every chunk; if it exists
            and matches ``params``, completed chunks are loaded, not recomputed.
        chunk_size: sweep points per chunk (the durability granularity).
        progress_callback: optional ``f(done, total)`` hook.

    Returns:
        (B, ...) stacked results.
    """
    params = np.asarray(params)
    B = params.shape[0]
    n_chunks = -(-B // chunk_size)

    done = 0
    results = None
    if os.path.exists(checkpoint_path):
        ckpt = np.load(checkpoint_path, allow_pickle=False)
        if ckpt["params_hash"] == _params_hash(params):
            done = int(ckpt["done"])
            results = ckpt["results"]

    out_chunks = [] if results is None else [results[: done * chunk_size]]
    for c in range(done, n_chunks):
        chunk = params[c * chunk_size : (c + 1) * chunk_size]
        out = np.asarray(fn_batch(chunk))
        out_chunks.append(out)
        stacked = np.concatenate(out_chunks, axis=0)
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(tmp, params_hash=_params_hash(params), done=c + 1, results=stacked)
        os.replace(tmp, checkpoint_path)
        if progress_callback is not None:
            progress_callback(min((c + 1) * chunk_size, B), B)

    return np.concatenate(out_chunks, axis=0)[:B]


def _params_hash(params: np.ndarray) -> str:
    import hashlib

    return hashlib.sha256(np.ascontiguousarray(params).tobytes()).hexdigest()

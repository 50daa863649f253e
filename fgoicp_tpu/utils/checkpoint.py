"""Checkpoint/resume of the Go-ICP search state.

The reference keeps its BnB state (priority queues + incumbent) purely
in-memory, so a killed run restarts from scratch
(/root/reference/fgoicp/fgoicp.cpp:35,111; SURVEY §5).  Here the outer
frontier is a host heap of plain node tuples and the incumbent is three
small arrays, so the whole search state serializes to one .npz: atomic
write (tmp + rename), versioned, with cloud fingerprints so a checkpoint
is never resumed against different data.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np

FORMAT_VERSION = 1


def cloud_fingerprint(pct: np.ndarray, pcs: np.ndarray) -> str:
    h = hashlib.sha256()
    for a in (pct, pcs):
        arr = np.ascontiguousarray(np.asarray(a, np.float32))
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


def save(path: str, *, heap, tie: int, best_sse: float, best_rotation,
         best_translation, stats: dict, fingerprint: str) -> None:
    """Atomically write the search state.

    heap: list of (lb, tie, (x, y, z, span, ub)) outer-frontier entries.
    """
    n = len(heap)
    lbs = np.empty((n,), np.float64)
    ties = np.empty((n,), np.int64)
    nodes = np.empty((n, 5), np.float64)
    for i, (lb, t_, item) in enumerate(heap):
        lbs[i] = lb
        ties[i] = t_
        nodes[i] = item
    payload = {
        "version": np.int64(FORMAT_VERSION),
        "fingerprint": np.bytes_(fingerprint.encode()),
        "heap_lbs": lbs, "heap_ties": ties, "heap_nodes": nodes,
        "tie": np.int64(tie),
        "best_sse": np.float64(best_sse),
        "best_rotation": np.asarray(best_rotation, np.float64),
        "best_translation": np.asarray(best_translation, np.float64),
        "stats_json": np.bytes_(json.dumps(stats).encode()),
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str, *, fingerprint: str) -> dict:
    """Load a checkpoint; raises on version/fingerprint mismatch."""
    with np.load(path) as z:
        version = int(z["version"])
        if version != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint version {version} != {FORMAT_VERSION}")
        ckpt_fp = bytes(z["fingerprint"]).decode()
        if ckpt_fp != fingerprint:
            raise ValueError(
                f"checkpoint fingerprint {ckpt_fp} does not match the "
                f"loaded clouds ({fingerprint}); refusing to resume")
        heap = [
            (float(lb), int(t_), tuple(float(v) for v in node))
            for lb, t_, node in zip(z["heap_lbs"], z["heap_ties"],
                                    z["heap_nodes"])
        ]
        return {
            "heap": heap,
            "tie": int(z["tie"]),
            "best_sse": float(z["best_sse"]),
            "best_rotation": np.asarray(z["best_rotation"], np.float32),
            "best_translation": np.asarray(z["best_translation"], np.float32),
            "stats": json.loads(bytes(z["stats_json"]).decode()),
        }

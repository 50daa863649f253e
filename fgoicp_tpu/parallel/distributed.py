"""Multi-host Go-ICP: host-partitioned outer BnB + incumbent all-reduce.

The reference is a single process on a single GPU (SURVEY §2 parallelism
inventory).  This layer scales the OUTER SO(3) search across hosts, per
the BASELINE.json north star: the rotation cube is partitioned across
processes (octant round-robin, recursively for >8 hosts), each host runs
the full nested BnB on its partition with its local device mesh, and a
small fixed-size incumbent message is all-gathered every outer step so
every host prunes against the global best.

Protocol (one message per host per round, 15 floats):
    [best_sse, local_min_lb, heap_empty, R(9), t(3)]
Each round every host adopts the global-min incumbent, then either runs
one outer step (if its local gap is still open) or idles in lockstep.
Global termination — identical on every host because it is a pure
function of the gathered matrix — fires when
    global_best_sse - min_h(local_min_lb_h) <= sse_threshold,
which also covers the all-heaps-empty case (min_lb = +inf).

Hosts whose partition drains early idle through sync rounds rather than
exiting (the all-gather is a collective; dropping out would deadlock the
others).  Work stealing across hosts is future work — partition imbalance
costs idle rounds, never correctness.

The communicator is pluggable: `JaxProcessCommunicator` rides
jax.experimental.multihost_utils over a real multi-process jax.distributed
runtime; `ThreadCommunicator` runs N simulated hosts in threads for tests
(tests/test_distributed.py) with identical semantics.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import numpy as np

from ..config import EngineConfig
from ..models.goicp import BIG, GoICP
from ..utils import logging as log

_MSG_LEN = 15


class ThreadCommunicator:
    """Barrier-synchronized all-gather across N threads (test double)."""

    def __init__(self, rank: int, size: int, shared: dict):
        self.rank = rank
        self.size = size
        self._shared = shared

    @classmethod
    def create(cls, n: int) -> Sequence["ThreadCommunicator"]:
        shared = {
            "fill": threading.Barrier(n),
            "drain": threading.Barrier(n),
            "slots": [None] * n,
        }
        return [cls(r, n, shared) for r in range(n)]

    def allgather(self, vec: np.ndarray) -> np.ndarray:
        s = self._shared
        s["slots"][self.rank] = np.asarray(vec, np.float64).copy()
        s["fill"].wait()
        out = np.stack(s["slots"])
        s["drain"].wait()  # everyone has read before the next round writes
        return out


class JaxProcessCommunicator:
    """All-gather over the jax.distributed runtime (real multi-host)."""

    def __init__(self):
        import jax
        self.rank = jax.process_index()
        self.size = jax.process_count()

    def allgather(self, vec: np.ndarray) -> np.ndarray:
        from jax.experimental import multihost_utils
        return np.asarray(
            multihost_utils.process_allgather(np.asarray(vec, np.float32)),
            np.float64)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> JaxProcessCommunicator:
    """Bring up jax.distributed and return a communicator."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return JaxProcessCommunicator()


def partition_root(rank: int, size: int):
    """Recursively split the quaternion cube until there are >= size
    cells; return the cells owned by `rank` (round-robin)."""
    cells = [(0.0, 0.0, 0.0, 1.0)]
    while len(cells) < size:
        nxt = []
        for (x, y, z, span) in cells:
            half = span / 2.0
            for j in range(8):
                nxt.append((x - half + ((j >> 0) & 1) * span,
                            y - half + ((j >> 1) & 1) * span,
                            z - half + ((j >> 2) & 1) * span,
                            half))
        cells = nxt
    return [c for i, c in enumerate(cells) if i % size == rank]


class MultiHostGoICP(GoICP):
    """GoICP over a partition of SO(3), globally synchronized each step."""

    def __init__(self, pct, pcs, comm, **kwargs):
        super().__init__(pct, pcs, **kwargs)
        self.comm = comm
        self.sync_rounds = 0
        self.idle_rounds = 0

    def root_nodes(self):
        return partition_root(self.comm.rank, self.comm.size)

    def _message(self) -> np.ndarray:
        msg = np.empty((_MSG_LEN,), np.float64)
        msg[0] = self.best_sse
        msg[1] = self.heap_min_lb()
        msg[2] = 0.0 if self._heap else 1.0
        msg[3:12] = np.asarray(self.best_rotation, np.float64).reshape(9)
        msg[12:15] = np.asarray(self.best_translation, np.float64)
        return msg

    def _sync_round(self) -> bool:
        """All-gather incumbents; adopt the global best.  Returns True
        when the search is globally converged."""
        gathered = self.comm.allgather(self._message())
        self.sync_rounds += 1
        k = int(np.argmin(gathered[:, 0]))
        if gathered[k, 0] < self.best_sse:
            self.best_sse = float(gathered[k, 0])
            self.best_rotation = np.asarray(
                gathered[k, 3:12].reshape(3, 3), np.float32)
            self.best_translation = np.asarray(gathered[k, 12:15], np.float32)
            self._record_improvement()
        global_min_lb = float(np.min(gathered[:, 1]))
        return self.best_sse - global_min_lb <= self.sse_threshold

    def _branch_and_bound_so3(self):
        self.seed_heap()
        while True:
            if self._sync_round():
                break
            if self._heap and not self.outer_converged():
                self.outer_step()
            else:
                self.idle_rounds += 1
        log.debug(f"[host {self.comm.rank}] BnB done: "
                  f"{self.sync_rounds} sync rounds, "
                  f"{self.idle_rounds} idle, best={self.best_sse}")
        return self.best_sse


def register_multihost(pct, pcs, comm=None, lut_resolution: float = 0.005,
                       mse_threshold: float = 1e-3,
                       engine: Optional[EngineConfig] = None, **kw):
    """Convenience entry: initialize (if needed) and run multi-host Go-ICP."""
    if comm is None:
        comm = JaxProcessCommunicator()
    model = MultiHostGoICP(pct, pcs, comm, lut_resolution=lut_resolution,
                           mse_threshold=mse_threshold, engine=engine, **kw)
    R, t = model.run()
    return model, R, t

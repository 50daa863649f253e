"""Multi-host Go-ICP: host-partitioned outer BnB + incumbent all-reduce.

The reference is a single process on a single GPU (SURVEY §2 parallelism
inventory).  This layer scales the OUTER SO(3) search across hosts, per
the BASELINE.json north star: the rotation cube is partitioned across
processes (octant round-robin, recursively for >8 hosts), each host runs
the full nested BnB on its partition with its local device mesh, and a
small fixed-size incumbent message is all-gathered every outer step so
every host prunes against the global best.

Protocol (one message per host per round, 17 floats):
    [best_sse, local_min_lb, idle_flag, R(9), t(3), heap_len, steal_max]
Each sync round every host adopts the global-min incumbent, then runs up
to `engine.multihost_sync_every` outer steps (staleness bound: the
incumbent a host prunes against is at most that many outer steps old —
a stale incumbent is merely HIGHER, so pruning stays sound) before the
next collective.  Every decision taken at a sync point — termination,
incumbent adoption, donor/recipient selection for work stealing — is a
PURE FUNCTION of the gathered matrix, so all hosts always agree (that
purity, not wire precision, is the deadlock protection); the wire
additionally carries each f64 as an (hi, lo) f32 pair, preserving ~48
mantissa bits so decoded values track the sender's to ~2^-48 relative.
Global termination fires when
    min_h(best_sse_h) - min_h(local_min_lb_h) <= sse_threshold,
which also covers the all-heaps-empty case (min_lb = +inf).

Work stealing: when the gathered matrix shows at least one idle host and
a non-idle host with >= 2 frontier nodes, a second all-gather moves up to
`steal_max` nodes from the largest heap to the idle hosts (round-robin).
Donated nodes are popped from the donor, so each node lives in exactly
one heap and the BnB certificate is unaffected.  The second gather runs
iff the (shared) matrix says so — no host can skip the collective.

The communicator is pluggable: `JaxProcessCommunicator` rides
jax.experimental.multihost_utils over a real multi-process jax.distributed
runtime; `ThreadCommunicator` runs N simulated hosts in threads for tests
(tests/test_distributed.py) with identical semantics.
"""

from __future__ import annotations

import heapq
import threading
from typing import Optional, Sequence

import numpy as np

from ..config import EngineConfig
from ..models.goicp import BIG, GoICP
from ..utils import logging as log

_MSG_LEN = 17

_TIMEOUT_HINT = (
    "multi-host allgather timed out — a peer process is likely dead or "
    "hung.  The collective cannot recover in place; restart the job from "
    "the latest checkpoint (engine.checkpoint_path / --resume) with the "
    "surviving hosts.")


def split_f64_to_f32_pairs(vec: np.ndarray) -> np.ndarray:
    """[L] f64 -> [2L] f32 (hi, lo) with hi + lo ~= vec to ~2^-48
    relative (the lo residual is itself f32-rounded, so ~48-49 of the 52
    f64 mantissa bits survive — not bitwise lossless).

    The jax.distributed all-gather wire is float32; a single-rounded
    best_sse lets hosts disagree about threshold comparisons near the
    convergence boundary and deadlock in the collective.  The
    double-single split makes the wire error negligible (2^-48 vs
    f32's 2^-24); the actual deadlock protection is structural — every
    termination decision is a pure function of the DECODED matrix, which
    all hosts share bit-for-bit regardless of encode precision.
    """
    vec = np.asarray(vec, np.float64)
    hi = vec.astype(np.float32)
    lo = (vec - hi.astype(np.float64)).astype(np.float32)
    return np.concatenate([hi, lo])


def merge_f32_pairs_to_f64(mat: np.ndarray) -> np.ndarray:
    """Inverse of split_f64_to_f32_pairs over the last axis."""
    half = mat.shape[-1] // 2
    return (mat[..., :half].astype(np.float64)
            + mat[..., half:].astype(np.float64))


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

    def allgather(self, vec: np.ndarray,
                  timeout: Optional[float] = None) -> np.ndarray:
        s = self._shared
        s["slots"][self.rank] = np.asarray(vec, np.float64).copy()
        try:
            s["fill"].wait(timeout)
            out = np.stack(s["slots"])
            # everyone has read before the next round writes
            s["drain"].wait(timeout)
        except threading.BrokenBarrierError:
            raise RuntimeError(_TIMEOUT_HINT) from None
        return out


class JaxProcessCommunicator:
    """All-gather over the jax.distributed runtime (real multi-host)."""

    def __init__(self):
        import jax
        self.rank = jax.process_index()
        self.size = jax.process_count()

    def allgather(self, vec: np.ndarray,
                  timeout: Optional[float] = None) -> np.ndarray:
        from jax.experimental import multihost_utils

        def gather():
            wire = multihost_utils.process_allgather(
                split_f64_to_f32_pairs(vec))
            return merge_f32_pairs_to_f64(np.asarray(wire))

        if timeout is None:
            return gather()
        # The jax collective blocks forever on a dead peer; run it on a
        # worker so the timeout converts the hang into a clean error with
        # a recovery hint.  The worker thread stays blocked in the
        # collective — acceptable, the error path is terminal.
        box: list = []
        err: list = []

        def work():
            try:
                box.append(gather())
            except Exception as exc:  # surfaced on the caller thread
                err.append(exc)

        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(timeout)
        if th.is_alive():
            raise RuntimeError(_TIMEOUT_HINT)
        if err:
            raise err[0]
        return box[0]


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
        if self.engine.outer_mode == "device":
            raise ValueError(
                "multi-host Go-ICP partitions the outer cube on host; "
                "outer_mode='device' is not supported here")
        self.comm = comm
        self._timeout = (self.engine.multihost_timeout_s
                         if self.engine.multihost_timeout_s > 0 else None)
        self.sync_rounds = 0
        self.idle_rounds = 0
        self.donated_nodes = 0
        self.stolen_nodes = 0

    def root_nodes(self):
        return partition_root(self.comm.rank, self.comm.size)

    def _locally_idle(self) -> bool:
        """True when this host would not run an outer step this round."""
        return not self._heap or self.outer_converged()

    def _message(self) -> np.ndarray:
        msg = np.empty((_MSG_LEN,), np.float64)
        msg[0] = self.best_sse
        msg[1] = self.heap_min_lb()
        msg[2] = 1.0 if self._locally_idle() else 0.0
        msg[3:12] = np.asarray(self.best_rotation, np.float64).reshape(9)
        msg[12:15] = np.asarray(self.best_translation, np.float64)
        msg[15] = float(len(self._heap))
        # Carried on the wire so the steal payload length is a pure
        # function of the gathered matrix — hosts launched with differing
        # engine configs must still agree on whether/how to enter the
        # second collective, or they deadlock.
        msg[16] = float(max(0, self.engine.multihost_steal_max))
        return msg

    def _sync_round(self) -> bool:
        """All-gather incumbents; adopt the global best; rebalance work.
        Returns True when the search is globally converged.

        Every decision here is a pure function of the gathered matrix —
        identical on all hosts — so no host can exit the loop while
        another re-enters the collective (that divergence deadlocks)."""
        gathered = self.comm.allgather(self._message(),
                                       timeout=self._timeout)
        self.sync_rounds += 1
        k = int(np.argmin(gathered[:, 0]))
        gmin = float(gathered[k, 0])
        if gmin < self.best_sse:
            self.best_sse = gmin
            self.best_rotation = np.asarray(
                gathered[k, 3:12].reshape(3, 3), np.float32)
            self.best_translation = np.asarray(gathered[k, 12:15], np.float32)
            self._record_improvement()
        global_min_lb = float(np.min(gathered[:, 1]))
        converged = gmin - global_min_lb <= self.sse_threshold
        if not converged:
            self._maybe_steal(gathered)
        return converged

    def _maybe_steal(self, gathered: np.ndarray) -> None:
        """Move frontier nodes from the largest heap to idle hosts.

        Donor/recipient selection, the decision to run the payload
        collective, AND the payload length are derived from the shared
        matrix (steal_max rides the wire, min across hosts), so either
        every host enters the second all-gather with identical shapes or
        none does.  Donated nodes are popped from the donor (each node
        lives in exactly one heap)."""
        steal_max = int(np.min(gathered[:, 16]))
        idle = gathered[:, 2] > 0.5
        sizes = gathered[:, 15]
        n_idle = int(np.sum(idle))
        donor = int(np.argmax(np.where(~idle, sizes, -1.0)))
        if steal_max == 0 or n_idle == 0 or idle[donor] or sizes[donor] < 2:
            return
        payload = np.zeros((1 + 6 * steal_max,), np.float64)
        if self.comm.rank == donor:
            n_give = min(steal_max, len(self._heap) - 1)
            top = heapq.heappop(self._heap)  # donor keeps its best node
            give = [heapq.heappop(self._heap) for _ in range(n_give)]
            heapq.heappush(self._heap, top)
            payload[0] = float(n_give)
            for i, (lb, _, (x, y, z, span, ub)) in enumerate(give):
                payload[1 + 6 * i:7 + 6 * i] = (lb, x, y, z, span, ub)
            self.donated_nodes += n_give
        row = self.comm.allgather(payload, timeout=self._timeout)[donor]
        cnt = int(row[0])
        if idle[self.comm.rank] and cnt > 0:
            my_idx = int(np.flatnonzero(idle).tolist().index(self.comm.rank))
            for i in range(cnt):
                if i % n_idle != my_idx:
                    continue
                lb, x, y, z, span, ub = row[1 + 6 * i:7 + 6 * i]
                heapq.heappush(
                    self._heap,
                    (float(lb), next(self._tie),
                     (float(x), float(y), float(z), float(span), float(ub))))
                self.stolen_nodes += 1

    def _branch_and_bound_so3(self):
        self.seed_heap()
        sync_every = max(1, self.engine.multihost_sync_every)
        while True:
            if self._sync_round():
                break
            stepped = False
            for _ in range(sync_every):
                if self._heap and not self.outer_converged():
                    self.outer_step()
                    stepped = True
                else:
                    break
            if not stepped:
                self.idle_rounds += 1
        log.debug(f"[host {self.comm.rank}] BnB done: "
                  f"{self.sync_rounds} sync rounds, "
                  f"{self.idle_rounds} idle, "
                  f"{self.donated_nodes} donated / {self.stolen_nodes} "
                  f"stolen nodes, best={self.best_sse}")
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

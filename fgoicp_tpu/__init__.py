"""tpu-go-icp: TPU-native globally-optimal point-cloud registration.

A from-scratch JAX/XLA/Pallas implementation of the Go-ICP capability set of
the CUDA reference (solemnwind/fast-go-icp): nested branch-and-bound over
SE(3) with distance-field bounds and Procrustes ICP refinement, built
TPU-first (device frontiers, batched bound kernels, mesh sharding).
"""

__version__ = "0.1.0"

__all__ = [
    "Config", "EngineConfig", "FastGoICP", "GoICP", "icp_register",
    "load_cloud", "read_ply_vertices", "register", "write_ply",
]

import os as _os

import jax as _jax

# Persistent compilation cache: the engine's jitted programs (batched ICP,
# lockstep inner BnB) are large; caching makes repeat runs start in seconds
# instead of minutes.  Opt out with FGOICP_TPU_NO_CACHE=1.
if not _os.environ.get("FGOICP_TPU_NO_CACHE"):
    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "fgoicp_tpu_jax"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


from .config import Config, EngineConfig  # noqa: E402
from .io import load_cloud, read_ply_vertices, write_ply  # noqa: E402
from .models.goicp import GoICP, register  # noqa: E402
from .models.icp import icp_register  # noqa: E402

# Reference-familiar alias (icp::FastGoICP, /root/reference/fgoicp/fgoicp.hpp:10).
FastGoICP = GoICP

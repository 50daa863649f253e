"""Force tests onto a virtual 8-device CPU mesh (no TPU needed).

The axon sitecustomize initializes the TPU backend at interpreter start,
before conftest runs, so an in-process JAX_PLATFORMS flip is too late —
re-exec pytest once with a sanitized environment instead.
"""
import os
import sys

_N_DEVICES = "8"


def _needs_reexec() -> bool:
    if os.environ.get("FGOICP_TEST_REEXEC") == "1":
        return False
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return True
    return "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", "")


if _needs_reexec():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip the TPU sitecustomize path
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={_N_DEVICES}"
                        ).strip()
    env["FGOICP_TEST_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

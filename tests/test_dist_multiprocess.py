"""Two-process jax.distributed smoke: init_distributed rendezvous via the
env:// conventions, host_mean cross-host reduction, shard_requests slicing.

Mirrors the reference's torch.distributed env-init path
(models/base_models/lumina_mgpt/xllmx/util/dist.py:33-86) on a CPU fleet:
two subprocesses, each with 2 virtual CPU devices, rendezvous through a
local coordinator.  Real TPU pods take the same code path with
jax.distributed discovering peers from metadata.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
# this box's sitecustomize force-registers the remote-TPU "axon" plugin and
# overrides JAX_PLATFORMS; pin CPU before any backend init (see conftest.py)
jax.config.update("jax_platforms", "cpu")
from lantern_tpu.parallel import dist

info = dist.init_distributed()
out = {
    "pid": info["process_id"],
    "np": info["num_processes"],
    "n_local": len(info["local_devices"]),
    "n_global": len(info["global_devices"]),
    "is_main": dist.is_main_process(),
    # rank 0 contributes 10.0, rank 1 contributes 30.0 -> mean 20.0
    "mean": dist.host_mean(10.0 + 20.0 * info["process_id"]),
    "shard": list(dist.shard_requests(list(range(7)))),
}
print("RESULT " + json.dumps(out))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_env_init():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            REPO=repo,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            RANK=str(rank),
            WORLD_SIZE="2",
        )
        env.pop("SLURM_NPROCS", None)
        env.pop("SLURM_PROCID", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = next(ln for ln in out.splitlines() if ln.startswith("RESULT "))
        outs.append(json.loads(line[len("RESULT "):]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["np"] == 2
        assert o["n_local"] == 2 and o["n_global"] == 4
        assert o["mean"] == pytest.approx(20.0)
    assert by_pid[0]["is_main"] and not by_pid[1]["is_main"]
    # shard_requests partitions the 7 items across the 2 hosts
    merged = sorted(by_pid[0]["shard"] + by_pid[1]["shard"])
    assert merged == list(range(7))
    assert by_pid[0]["shard"] != by_pid[1]["shard"]

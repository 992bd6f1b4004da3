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


_SERVE_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from lantern_tpu import configs, trees
from lantern_tpu.engine import spec as spec_engine
from lantern_tpu.engine.batch import BatchedEngine
from lantern_tpu.engine.scheduler import Request, Scheduler
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.parallel import dist
from lantern_tpu.parallel import mesh as pmesh

info = dist.init_distributed()
# the north-star serving shape (xllmx/util/dist.py:33-86 analogue):
# requests shard across HOSTS (dist.shard_requests), each host serves its
# slice with Scheduler + BatchedEngine on its LOCAL (dp, tp) mesh — no
# cross-host collective sits in the decode loop, only in bookkeeping
cfg = configs.tiny_config(cond_kind="label", block_size=16, num_heads=8,
                          hidden_size=128, vocab_size=512)
dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
params = tfm.init_params(jax.random.key(0), cfg)
dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
ecfg = spec_engine.SpecDecodeConfig(
    warp=LogitsWarp(temperature=0.0), cfg_scale=2.0, max_new=8, mode="static")
tree = trees.get_tree("chain_bush_8")
labels = [3, 5, 7, 2, 6]
mine = list(dist.shard_requests(list(range(len(labels)))))
lmesh = pmesh.make_mesh(dp=2, devices=info["local_devices"])
sp = pmesh.shard_pytree(params, pmesh.base_param_specs(cfg, lmesh), lmesh)
sd = pmesh.shard_pytree(dparams, pmesh.drafter_param_specs(dparams), lmesh)
with jax.set_mesh(lmesh):
    eng = BatchedEngine(ecfg, cfg, dcfg, tree, sp, sd, num_slots=2,
                        mesh=lmesh)
    reqs = [Request(uid=i, cond=jnp.asarray([labels[i]]),
                    uncond=jnp.asarray([cfg.num_classes]), seed=40 + i)
            for i in mine]
    done = Scheduler(eng, use_native=False).run(reqs)
served = {str(r.uid): np.asarray(r.tokens).tolist()
          for r in done if r.error is None}
total = dist.host_mean(float(len(served))) * info["num_processes"]
print("RESULT " + json.dumps({"pid": info["process_id"], "mine": mine,
                              "served": served, "total": total}))
"""


def test_two_host_batched_serving():
    """Two hosts, each a (dp=2) local mesh: host-sharded requests through
    Scheduler + BatchedEngine, full coverage, deterministic tokens — the
    multi-host serving path the north star names."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ, REPO=repo, JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
            RANK=str(rank), WORLD_SIZE="2",
        )
        env.pop("SLURM_NPROCS", None)
        env.pop("SLURM_PROCID", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _SERVE_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}\n{err[-2000:]}"
        line = next(ln for ln in out.splitlines() if ln.startswith("RESULT "))
        outs.append(json.loads(line[len("RESULT "):]))
    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    # request coverage: the two hosts' shards partition the uid space
    all_uids = sorted(int(u) for o in outs for u in o["served"])
    assert all_uids == list(range(5))
    assert by_pid[0]["mine"] != by_pid[1]["mine"]
    for o in outs:
        assert o["total"] == pytest.approx(5.0)
        for u, toks in o["served"].items():
            assert len(toks) == 8, (u, toks)

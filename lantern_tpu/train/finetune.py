"""Full-model finetuning solver (the xllmx FinetuneSolverBase equivalent,
SURVEY.md §2.6) — TPU-native.

Reference capabilities covered (xllmx/solvers/finetune/finetune.py):
- FULL_SHARD / SHARD_GRAD_OP sharded training  ->  FSDP-style parameter
  sharding over the mesh's ``tp`` axis (weights sharded, all-gathered on
  use by XLA) + data parallel over ``dp``.
- mixed precision                              ->  bf16 params / f32 optax
  master state (optax keeps update state in the params' dtype; we cast
  grads to f32 inside adamw via ``mu_dtype``).
- gradient checkpointing wrap policy           ->  ``jax.checkpoint`` over
  the layer scan (models/transformer.forward_train).
- weight-decay groups (no decay on norms/bias) ->  optax.masked.
- warmup + cosine LR (xllmx/util/lr_sched.py)  ->  optax schedule.
- ckpt save/resume + pruning (xllmx/util/ckpt) ->  orbax with keep-last-k.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import ModelConfig
from ..models import transformer as tfm


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    lr: float = 2e-5
    min_lr_ratio: float = 0.1
    warmup_steps: int = 100
    total_steps: int = 10000
    weight_decay: float = 0.1
    betas: tuple = (0.9, 0.95)
    grad_clip_norm: float = 1.0
    remat: bool = True
    z_loss: float = 0.0            # optional logit regularizer


def _decay_mask(params: dict) -> dict:
    """True where weight decay applies: 2-D+ kernels; norms/bias/embeddings
    excluded (xllmx/util/misc.py:154-200 semantics)."""

    def mask_leaf(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if "norm" in name or name.endswith("b") or "bias" in name:
            return False
        if "embed" in name or name == "cond/uncond":
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def lr_schedule(cfg: FinetuneConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * cfg.min_lr_ratio,
    )


def build_optimizer(cfg: FinetuneConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            lr_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1],
            weight_decay=cfg.weight_decay, mask=_decay_mask,
            mu_dtype=jnp.float32,
        ),
    )


class FinetuneState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def init_state(params: dict, fcfg: FinetuneConfig) -> FinetuneState:
    opt = build_optimizer(fcfg)
    return FinetuneState(params=params, opt_state=opt.init(params),
                         step=jnp.zeros((), jnp.int32))


def token_loss(params, cfg: ModelConfig, rope, batch, fcfg: FinetuneConfig):
    """Next-token CE over (tokens, loss_mask) with optional conditioning
    prefix embeddings in the batch."""
    tokens = batch["tokens"]                  # [B, T]
    B, T = tokens.shape
    embeds = tfm.token_embed(params, tokens)
    if "cond" in batch:
        embeds = jnp.concatenate(
            [tfm.cond_embed(params, cfg, batch["cond"]), embeds], axis=1
        )
    Tc = embeds.shape[1] - T
    positions = jnp.arange(embeds.shape[1])
    attn_valid = batch.get("attn_valid")
    if attn_valid is not None and Tc > 0:
        # token-aligned [B, T] pad mask -> prepend always-valid cond columns
        attn_valid = jnp.concatenate(
            [jnp.ones((B, Tc), attn_valid.dtype), attn_valid], axis=1)
    hidden = tfm.forward_train(
        params, cfg, embeds, positions, rope,
        attn_valid=attn_valid, remat=fcfg.remat,
    )
    logits = tfm.logits_head(params, hidden[:, Tc:])       # [B, T, V]
    # predict token t+1 from position t
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = batch["loss_mask"][:, 1:]
    loss = jnp.sum(nll * mask) / (jnp.sum(mask) + 1e-6)
    if fcfg.z_loss:
        z = jax.scipy.special.logsumexp(logits[:, :-1], axis=-1)
        loss = loss + fcfg.z_loss * jnp.sum((z ** 2) * mask) / (jnp.sum(mask) + 1e-6)
    acc = jnp.sum((jnp.argmax(logits[:, :-1], -1) == tgt) * mask) / (jnp.sum(mask) + 1e-6)
    return loss, acc


@partial(jax.jit, static_argnames=("cfg", "fcfg"))
def train_step(state: FinetuneState, cfg: ModelConfig, fcfg: FinetuneConfig,
               rope, batch):
    def lf(p):
        return token_loss(p, cfg, rope, batch, fcfg)

    (loss, acc), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
    opt = build_optimizer(fcfg)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        FinetuneState(params=params, opt_state=opt_state, step=state.step + 1),
        {"loss": loss, "acc": acc,
         "grad_norm": optax.global_norm(grads)},
    )


# ---------------------------------------------------------------------------
# FSDP sharding + checkpoint management
# ---------------------------------------------------------------------------

def fsdp_param_specs(params: dict, mesh) -> dict:
    """FULL_SHARD-style: shard every >=2-D kernel's largest tp-divisible dim
    over the tensor axis (smaller leaves replicated)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import TP

    tp = mesh.shape[TP]

    def spec(leaf):
        if leaf.ndim < 2:
            return P(*([None] * leaf.ndim))
        dims = [None] * leaf.ndim
        order = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in order:
            if leaf.shape[d] % tp == 0:
                dims[d] = TP
                break
        return P(*dims)

    return jax.tree.map(spec, params)


def save_checkpoint(save_dir: str, state: FinetuneState, keep_last: int = 3) -> str:
    """orbax save + prune old checkpoints (xllmx/util/ckpt.py:25-43)."""
    from ..utils.checkpoint import save_pytree

    step = int(state.step)
    path = os.path.join(save_dir, f"step_{step:08d}")
    save_pytree(path, {"params": state.params, "opt_state": state.opt_state,
                       "step": np.asarray(step)})
    ckpts = sorted(
        # skip orbax atomic-write temp dirs: after an interrupted save they
        # start with "step_" and sort after the finished checkpoint
        d for d in os.listdir(save_dir)
        if d.startswith("step_") and ".orbax-checkpoint-tmp" not in d
    )
    for old in ckpts[:-keep_last]:
        shutil.rmtree(os.path.join(save_dir, old), ignore_errors=True)
    return path


def restore_checkpoint(save_dir: str, like: FinetuneState) -> Optional[FinetuneState]:
    from ..utils.checkpoint import restore_pytree

    ckpts = sorted(
        # skip orbax atomic-write temp dirs: after an interrupted save they
        # start with "step_" and sort after the finished checkpoint
        d for d in os.listdir(save_dir)
        if d.startswith("step_") and ".orbax-checkpoint-tmp" not in d
    ) if os.path.isdir(save_dir) else []
    if not ckpts:
        return None
    tree = restore_pytree(
        os.path.join(save_dir, ckpts[-1]),
        like={"params": like.params, "opt_state": like.opt_state,
              "step": np.zeros((), np.int32)},
    )
    return FinetuneState(params=tree["params"], opt_state=tree["opt_state"],
                         step=jnp.asarray(tree["step"]))
